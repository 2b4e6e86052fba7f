package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Bounded "k lexicographically-smallest (a, b) long pairs" buffer —
  * [[LongMinKHeap]] widened to a compound sort key. The ranked-retrieval
  * selection needs top-K by (score DESC, doc_id ASC); callers encode
  * that as the k SMALLEST (−score, doc_id) pairs, so one aggregate
  * replaces the `row_number() OVER (PARTITION BY query ORDER BY score
  * DESC, doc_id)` shape whose per-query window sort is unbounded when a
  * stopword query term matches the whole corpus. State is O(k) pairs
  * regardless of group size; partial aggregation combines map-side.
  *
  * Heap layout: one flat array of 2k longs, pair i at (2i, 2i+1); the
  * root is the LARGEST retained pair, so a candidate either beats the
  * root (replace + sift down) or is discarded in O(1). */
final class LongPairMinKHeap(val k: Int) {
  val values = new Array[Long](2 * k)
  var size = 0

  @inline private def lt(a1: Long, b1: Long, a2: Long, b2: Long): Boolean =
    a1 < a2 || (a1 == a2 && b1 < b2)

  @inline private def swap(i: Int, j: Int): Unit = {
    var t = values(2 * i); values(2 * i) = values(2 * j); values(2 * j) = t
    t = values(2 * i + 1); values(2 * i + 1) = values(2 * j + 1)
    values(2 * j + 1) = t
  }

  def add(a: Long, b: Long): Unit = {
    if (size < k) {
      values(2 * size) = a
      values(2 * size + 1) = b
      size += 1
      var i = size - 1
      while (i > 0 && lt(values(2 * ((i - 1) / 2)),
          values(2 * ((i - 1) / 2) + 1), values(2 * i), values(2 * i + 1))) {
        val p = (i - 1) / 2
        swap(p, i)
        i = p
      }
    } else if (lt(a, b, values(0), values(1))) {
      values(0) = a
      values(1) = b
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = 2 * i + 2
        var m = i
        if (l < size && lt(values(2 * m), values(2 * m + 1),
            values(2 * l), values(2 * l + 1))) m = l
        if (r < size && lt(values(2 * m), values(2 * m + 1),
            values(2 * r), values(2 * r + 1))) m = r
        if (m == i) done = true
        else {
          swap(m, i)
          i = m
        }
      }
    }
  }

  /** Retained pairs sorted ascending by (a, b). */
  def sortedPairs(): Array[(Long, Long)] = {
    val out = new Array[(Long, Long)](size)
    var i = 0
    while (i < size) {
      out(i) = (values(2 * i), values(2 * i + 1))
      i += 1
    }
    java.util.Arrays.sort(out, new java.util.Comparator[(Long, Long)] {
      override def compare(x: (Long, Long), y: (Long, Long)): Int = {
        val c = java.lang.Long.compare(x._1, y._1)
        if (c != 0) c else java.lang.Long.compare(x._2, y._2)
      }
    })
    out
  }
}

/** Aggregate returning the `k` lexicographically-smallest non-null
  * (a, b) bigint pairs, sorted ascending, as
  * `array<struct<a: bigint, b: bigint>>` — the compound-key sibling of
  * [[LongMinK]]. A row where EITHER component is null is skipped (the
  * pair has no defined order); a group with only skipped rows yields
  * null. Duplicate pairs are kept — callers aggregating per-(group,
  * candidate) rows, as the BM25 top-K does, never feed duplicates. */
case class LongPairMinK(a: Expression, b: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongPairMinKHeap] {

  require(k >= 1 && k <= (1 << 20),
    s"long_pair_min_k: k must be in [1, ${1 << 20}], got $k")

  override def children: Seq[Expression] = Seq(a, b)

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): LongPairMinKHeap = null

  override def update(buffer: LongPairMinKHeap,
                      input: InternalRow): LongPairMinKHeap = {
    val va = a.eval(input)
    if (va == null) return buffer
    val vb = b.eval(input)
    if (vb == null) return buffer
    val buf = if (buffer == null) new LongPairMinKHeap(k) else buffer
    buf.add(va.asInstanceOf[Long], vb.asInstanceOf[Long])
    buf
  }

  override def merge(x: LongPairMinKHeap,
                     y: LongPairMinKHeap): LongPairMinKHeap = {
    if (x == null) return y
    if (y == null) return x
    var i = 0
    while (i < y.size) {
      x.add(y.values(2 * i), y.values(2 * i + 1))
      i += 1
    }
    x
  }

  override def eval(buffer: LongPairMinKHeap): Any = {
    if (buffer == null) return null
    val pairs = buffer.sortedPairs()
    new GenericArrayData(pairs.map { case (pa, pb) =>
      InternalRow(pa, pb)
    })
  }

  override def serialize(buffer: LongPairMinKHeap): Array[Byte] = {
    if (buffer == null) return Array(0.toByte)
    val bb = java.nio.ByteBuffer.allocate(1 + 4 + 16 * buffer.size)
    bb.put(1.toByte)
    bb.putInt(buffer.size)
    var i = 0
    while (i < 2 * buffer.size) { bb.putLong(buffer.values(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongPairMinKHeap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    if (bb.get() == 0.toByte) return null
    val n = bb.getInt()
    val h = new LongPairMinKHeap(k)
    var i = 0
    while (i < n) {
      val pa = bb.getLong()
      val pb = bb.getLong()
      h.add(pa, pb)
      i += 1
    }
    h
  }

  override def withNewMutableAggBufferOffset(offset: Int): LongPairMinK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): LongPairMinK =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LongPairMinK =
    copy(a = newChildren(0), b = newChildren(1))

  override def prettyName: String = "long_pair_min_k"
}

object LongPairMinK {
  /** Column API: the k lexicographically-smallest non-null (a, b)
    * pairs, sorted ascending, as `array<struct<a, b>>`. */
  def minK(a: Column, b: Column, k: Int): Column =
    GraftColumnBridge.column(
      LongPairMinK(GraftColumnBridge.expression(a),
        GraftColumnBridge.expression(b), k).toAggregateExpression())
}
