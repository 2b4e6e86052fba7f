package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd proximity-window counter over one (query, doc) pair's
  * occurrence list — the hot kernel of
  * [[graft.pipeline.RetrievalOps.bm25ProximityTopK]].
  *
  * Input: the pair's query-term occurrences as `array<struct<pos:
  * bigint, token: string>>` (order irrelevant) and `m`, the query's
  * distinct-term count. Output: how many ANCHORS (distinct occurrence
  * positions `o`) have all `m` distinct tokens occurring in
  * [o, o + w − 1] — exactly the matcher's window semantics ("minimal
  * covering span ≤ w", since a minimal span always starts at an
  * occurrence).
  *
  * The composable form — nested `filter`/`transform`/`array_distinct`
  * per anchor — runs through Catalyst's interpreted higher-order-
  * function path: a lambda frame and two array allocations PER ANCHOR
  * (~50M interpreted element visits on the sf0.1 stopword workload —
  * measured as the row's dominant cost). This kernel sorts the
  * encoded (pos, token-id) pairs once and sweeps a two-pointer window
  * with a stamp array for the distinct count: O(n log n + Σ spans)
  * per pair, zero per-anchor allocation.
  *
  * Token ids pack into the low 7 bits of the sort key, positions in
  * the rest — safe because the occurrence list holds ONE query's
  * terms ([[graft.pipeline.RetrievalOps.MaxQueryTerms]] = 64 ≤ 128,
  * guarded loudly here) and positions are 1-based token indexes
  * (< 2^56 for any physical document).
  */
case class ProximityWindows(left: Expression, right: Expression, w: Int)
  extends BinaryExpression {

  require(w >= 1, s"proximity window must be >= 1, got $w")

  override def checkInputDataTypes() = {
    val okLeft = left.dataType match {
      case ArrayType(st: StructType, _) if st.length == 2 =>
        st(0).dataType == LongType && st(1).dataType == StringType
      case _ => false
    }
    if (okLeft && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "proximity_windows expects (array<struct<bigint, string>>, " +
          s"bigint), got (${left.dataType.catalogString}, " +
          s"${right.dataType.catalogString})")
  }

  override def dataType: DataType = LongType

  // null input => null output (nullSafeEval): lets Catalyst infer the
  // cheap isnotnull(child) instead of pushing this whole kernel into a
  // scan filter (PlanAuditSpec kernel-in-DataFilters check)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    ProximityWindows.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[Long], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (occ, m) => s"graft.functions.ProximityWindows.compute($occ, $m, $w)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression)
      : ProximityWindows = copy(left = newLeft, right = newRight)

  override def prettyName: String = "proximity_windows"
}

object ProximityWindows {

  /** The kernel — also called from generated code. */
  def compute(occ: ArrayData, m: Long, w: Int): Long = {
    val n = occ.numElements()
    if (n == 0 || m <= 0L) return 0L
    // token interning: string -> dense id; fewer than m distinct
    // tokens can match no window, so bail before sorting
    val ids = new java.util.HashMap[UTF8String, Integer]()
    val enc = new Array[Long](n)
    var i = 0
    while (i < n) {
      val row = occ.getStruct(i, 2)
      val pos = row.getLong(0)
      val tok = row.getUTF8String(1)
      var id = ids.get(tok)
      if (id == null) {
        id = Integer.valueOf(ids.size())
        ids.put(tok.clone(), id)
      }
      if (id.intValue() > 127)
        throw new IllegalStateException(
          "proximity_windows: more than 128 distinct tokens in one " +
            "pair's occurrence list — the query-term bound " +
            "(MaxQueryTerms = 64) should have prevented this")
      enc(i) = (pos << 7) | id.intValue()
      i += 1
    }
    if (ids.size() < m) return 0L
    java.util.Arrays.sort(enc)
    val stamp = new Array[Int](ids.size())
    java.util.Arrays.fill(stamp, -1)
    var windows = 0L
    var a = 0
    while (a < n) {
      val lo = enc(a) >>> 7
      // one anchor per distinct position (positions are unique per
      // doc under the tokenizer seam; the guard keeps duplicates from
      // double-counting anyway)
      if (a == 0 || (enc(a - 1) >>> 7) != lo) {
        val hi = lo + (w - 1)
        var j = a
        var distinct = 0L
        while (j < n && (enc(j) >>> 7) <= hi) {
          val id = (enc(j) & 0x7fL).toInt
          if (stamp(id) != a) { stamp(id) = a; distinct += 1L }
          j += 1
        }
        if (distinct == m) windows += 1L
      }
      a += 1
    }
    windows
  }

  /** `proximity_windows(occ, m)` as a Column. */
  def windows(occ: Column, m: Column, w: Int): Column =
    GraftColumnBridge.column(ProximityWindows(
      GraftColumnBridge.expression(occ),
      GraftColumnBridge.expression(m), w))
}
