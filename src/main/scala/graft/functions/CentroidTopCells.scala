package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd IVF cell assignment: the `m` nearest centroids (by exact
  * integer-scaled cosine, ties to the lower cent_id) for a scaled vector,
  * as an array of cent_ids.
  *
  * The composable form — `transform(centroidLiteral, …cos…)` +
  * `array_sort(comparator)` + `slice` — is the right PLAN (map-only, no
  * crossJoin/Window), but every element evaluates through Catalyst's
  * interpreted higher-order-function path: one lambda frame per centroid
  * per row plus an interpreted when-chain comparator per sort step. This
  * expression embeds the centroid set (small by contract — a coarse
  * quantizer) and runs a straight dot/insert loop.
  *
  * Numeric contract (oracle-identical): cosine = dot.toDouble /
  * (sqrt(n2(v)) · sqrtNorm(c)) — same operations, same association as
  * the SQL form; ordering via Double.compare, which treats NaN as
  * greater than every number, matching Spark's and DuckDB's DESC
  * ordering of NaN cosines (zero vectors).
  */
case class CentroidTopCells(
    child: Expression,
    centIds: IndexedSeq[Long],
    centVecs: IndexedSeq[IndexedSeq[Long]],
    centSqrtNorms: IndexedSeq[Double],
    m: Int) extends UnaryExpression {

  require(m >= 1, s"m must be >= 1, got $m")
  require(centIds.length == centVecs.length && centIds.length == centSqrtNorms.length)

  // fields are IndexedSeq (NOT Array) so the case-class equals/hashCode
  // are structural — Array fields would make semantically identical
  // instances unequal and silently defeat Catalyst canonicalization,
  // common-subexpression elimination, and exchange reuse. The kernel
  // still runs on primitive arrays, materialized once per instance.
  @transient private lazy val idsArr: Array[Long] = centIds.toArray
  @transient private lazy val vecsArr: Array[Array[Long]] = centVecs.map(_.toArray).toArray
  @transient private lazy val snsArr: Array[Double] = centSqrtNorms.toArray

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(LongType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"centroid_top_cells expects array<bigint>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // null input => null output (nullSafeEval): lets Catalyst infer the
  // cheap isnotnull(child) instead of pushing this whole kernel into a
  // scan filter (PlanAuditSpec kernel-in-DataFilters check)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    CentroidTopCells.topCellsKernel(v.asInstanceOf[ArrayData],
      idsArr, vecsArr, snsArr, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ids = ctx.addReferenceObj("centIds", idsArr, "long[]")
    val vecs = ctx.addReferenceObj("centVecs", vecsArr, "long[][]")
    val sns = ctx.addReferenceObj("centSqrtNorms", snsArr, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CentroidTopCells.topCellsKernel($c, $ids, $vecs, $sns, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidTopCells =
    copy(child = newChild)

  override def prettyName: String = "centroid_top_cells"
}

object CentroidTopCells {

  /** The kernel — also called from generated code. Straight loops:
    * one dot per centroid, insertion into a sorted top-m. */
  def topCellsKernel(sv: ArrayData, ids: Array[Long], vecs: Array[Array[Long]],
                     sns: Array[Double], m: Int): ArrayData = {
    val len = sv.numElements()
    val v = new Array[Long](len)
    var n2 = 0L
    var i = 0
    while (i < len) {
      val x = sv.getLong(i); v(i) = x; n2 += x * x; i += 1
    }
    val denomBase = math.sqrt(n2.toDouble)
    val k = ids.length
    val keep = math.min(m, k)
    val topCos = new Array[Double](keep)
    val topId = new Array[Long](keep)
    var cnt = 0
    var c = 0
    while (c < k) {
      val cv = vecs(c)
      val d = math.min(len, cv.length)
      var dot = 0L
      var j = 0
      while (j < d) { dot += v(j) * cv(j); j += 1 }
      val cos = dot.toDouble / (denomBase * sns(c))
      val id = ids(c)
      // insertion position: cos DESC (NaN greatest, like Spark/DuckDB),
      // then id ASC
      var p = cnt
      while (p > 0 && {
        val cmp = java.lang.Double.compare(topCos(p - 1), cos)
        cmp < 0 || (cmp == 0 && topId(p - 1) > id)
      }) p -= 1
      if (p < keep) {
        var q = math.min(cnt, keep - 1)
        while (q > p) { topCos(q) = topCos(q - 1); topId(q) = topId(q - 1); q -= 1 }
        topCos(p) = cos; topId(p) = id
        if (cnt < keep) cnt += 1
      }
      c += 1
    }
    val out = new Array[Long](cnt)
    System.arraycopy(topId, 0, out, 0, cnt)
    new GenericArrayData(out)
  }

  /** Column API over a driver-side centroid snapshot
    * (cent_id, scaled vector, sqrt of its norm²). */
  def topCells(sv: Column, cents: Seq[(Long, Seq[Long], Double)], m: Int): Column =
    GraftColumnBridge.column(CentroidTopCells(
      GraftColumnBridge.expression(sv),
      cents.map(_._1).toIndexedSeq,
      cents.map(_._2.toIndexedSeq).toIndexedSeq,
      cents.map(_._3).toIndexedSeq,
      m))
}
