package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded "k smallest longs" buffer: a size-capped binary max-heap.
  * Root is the LARGEST retained value, so a new candidate either beats
  * the root (replace + sift down) or is discarded in O(1). State is
  * O(k) regardless of group size — the property that makes postings
  * selection a partial-aggregated shuffle instead of a per-key window
  * sort. */
final class LongMinKHeap(val k: Int) {
  val values = new Array[Long](k)
  var size = 0

  def add(v: Long): Unit = {
    if (size < k) {
      values(size) = v
      size += 1
      // sift up
      var i = size - 1
      while (i > 0 && values((i - 1) / 2) < values(i)) {
        val p = (i - 1) / 2
        val t = values(p); values(p) = values(i); values(i) = t
        i = p
      }
    } else if (v < values(0)) {
      values(0) = v
      // sift down
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = 2 * i + 2
        var m = i
        if (l < size && values(l) > values(m)) m = l
        if (r < size && values(r) > values(m)) m = r
        if (m == i) done = true
        else {
          val t = values(m); values(m) = values(i); values(i) = t
          i = m
        }
      }
    }
  }

  def sortedAscending(): Array[Long] = {
    val out = java.util.Arrays.copyOf(values, size)
    java.util.Arrays.sort(out)
    out
  }
}

/** Aggregate returning the `k` smallest non-null values of a bigint
  * column, sorted ascending — the bounded top-K selection the inverted
  * index's capped posting list needs. Replaces the
  * `row_number() OVER (PARTITION BY key)` shape whose single-task sort
  * is unbounded when one key (a stopword) covers the whole corpus:
  * here the per-group state is a k-slot heap, partial aggregation
  * combines map-side, and the shuffle carries at most k longs per
  * (group, partition).
  *
  * Ties and duplicates are kept (a doc_id appearing twice in the input
  * occupies two slots) — callers aggregating per-(key, doc) rows, as
  * the inverted index does, never feed duplicates. Null inputs are
  * skipped like built-in aggregates; a group with only nulls yields
  * null. */
case class LongMinK(child: Expression, k: Int,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongMinKHeap] {

  require(k >= 1 && k <= (1 << 20),
    s"long_min_k: k must be in [1, ${1 << 20}], got $k")

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // null marks "no value seen yet", matching LongVectorSum's convention
  override def createAggregationBuffer(): LongMinKHeap = null

  override def update(buffer: LongMinKHeap, input: InternalRow): LongMinKHeap = {
    val v = child.eval(input)
    if (v == null) return buffer
    val b = if (buffer == null) new LongMinKHeap(k) else buffer
    b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(a: LongMinKHeap, b: LongMinKHeap): LongMinKHeap = {
    if (a == null) return b
    if (b == null) return a
    var i = 0
    while (i < b.size) { a.add(b.values(i)); i += 1 }
    a
  }

  override def eval(buffer: LongMinKHeap): Any =
    if (buffer == null) null else new GenericArrayData(buffer.sortedAscending())

  override def serialize(buffer: LongMinKHeap): Array[Byte] = {
    if (buffer == null) return Array(0.toByte)
    val bb = java.nio.ByteBuffer.allocate(1 + 4 + 8 * buffer.size)
    bb.put(1.toByte)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) { bb.putLong(buffer.values(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongMinKHeap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    if (bb.get() == 0.toByte) return null
    val n = bb.getInt()
    val h = new LongMinKHeap(k)
    var i = 0
    while (i < n) { h.add(bb.getLong()); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(offset: Int): LongMinK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): LongMinK =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LongMinK =
    copy(child = newChildren.head)

  override def prettyName: String = "long_min_k"
}

object LongMinK {
  /** Column API: the k smallest non-null values of a bigint column,
    * sorted ascending. */
  def minK(c: Column, k: Int): Column =
    GraftColumnBridge.column(
      LongMinK(GraftColumnBridge.expression(c), k).toAggregateExpression())
}
