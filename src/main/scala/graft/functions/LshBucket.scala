package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd sign-of-projection LSH bucket of a scaled `array<bigint>`
  * vector: bit p (of `planes`) is set iff the exact integer dot product
  * with deterministic hyperplane p is strictly positive.
  *
  * Hyperplane weights are the same pure-arithmetic LCG family the
  * composable form and every DuckDB oracle use
  * (SimilarityOps.planeWeight / planeWeightSql):
  * w(p, j) = (j·48271·(p+1) + p·65537 + 11) mod 2001 − 1000 — all
  * operands non-negative before the mod, so Java `%`, Spark `%` and
  * DuckDB `%` agree. The composable form ran one interpreted
  * aggregate(zip_with(...)) lambda fold per plane per row; this is one
  * straight loop, and the weights cost two multiplies each — no
  * hashing, no allocation. Null input → null (UnaryExpression
  * null-safe); a null ELEMENT cannot occur (scaled() arrays are
  * containsNull = false by construction), and planes ≤ 48 keeps the
  * bucket positive in int64. */
case class LshBucket(child: Expression, planes: Int,
                     planeOffset: Int = 0) extends UnaryExpression {

  require(planes >= 1 && planes <= 48, s"planes must be in [1,48], got $planes")
  require(planeOffset >= 0 && planeOffset <= 65536,
    s"planeOffset must be in [0, 65536], got $planeOffset")

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(LongType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lsh_bucket expects array<bigint>, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType

  // null input => null output (nullSafeEval): lets Catalyst infer the
  // cheap isnotnull(child) instead of pushing this whole kernel into a
  // scan filter (PlanAuditSpec kernel-in-DataFilters check)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    LshBucket.compute(v.asInstanceOf[ArrayData], planes, planeOffset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LshBucket.compute($c, $planes, $planeOffset)")

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)

  override def prettyName: String = "lsh_bucket"
}

object LshBucket {

  /** The kernel — also called from generated code. `planeOffset`
    * selects a disjoint slice of the same deterministic hyperplane
    * family (plane index = planeOffset + p), which is what gives
    * banded sign-LSH its independent bands without a second weight
    * scheme — band b of width r uses planes [b*r, (b+1)*r). */
  def compute(sv: ArrayData, planes: Int, planeOffset: Int = 0): Long = {
    val n = sv.numElements()
    var bucket = 0L
    var p0 = 0
    while (p0 < planes) {
      val p = planeOffset + p0
      val a = 48271L * (p + 1)
      val b = p * 65537L + 11
      var proj = 0L
      var j = 0
      while (j < n) {
        proj += sv.getLong(j) * ((j * a + b) % 2001 - 1000)
        j += 1
      }
      if (proj > 0) bucket |= 1L << p0
      p0 += 1
    }
    bucket
  }

  /** Column API: `planes`-bit LSH bucket of a scaled vector column. */
  def bucket(sv: Column, planes: Int): Column =
    GraftColumnBridge.column(LshBucket(GraftColumnBridge.expression(sv), planes))

  /** Column API with a plane offset — band b of a banded scheme. */
  def bucket(sv: Column, planes: Int, planeOffset: Int): Column =
    GraftColumnBridge.column(
      LshBucket(GraftColumnBridge.expression(sv), planes, planeOffset))
}
