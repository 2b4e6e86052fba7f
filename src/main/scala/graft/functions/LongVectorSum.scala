package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Element-wise sum of `array<bigint>` vectors — the aggregation the
  * centroid family (k-means update, mean-pool, PQ codebook training)
  * actually needs, expressed as one `TypedImperativeAggregate` instead
  * of `posexplode` + a (group, dim) aggregation.
  *
  * Why: the explode form materializes dim× as many rows as the input
  * before the partial aggregation can absorb them, and needs a SECOND
  * aggregation (plus a sort_array rebuild) to fold the dimensions back
  * into a vector. This buffer sums in place — the shuffle carries one
  * `long[dim]` per (group, partition), partial aggregation works
  * normally (the sum is associative), and there is no row explosion and
  * no rebuild. Same exact integer arithmetic, so every oracle that
  * unrolls the per-dimension sums is unchanged.
  *
  * Contract (loud, like the rest of the pipeline): mixing vector
  * lengths inside one group throws (a silently dim-dependent
  * denominator is how centroids go wrong); element overflow throws
  * (`Math.addExact`) instead of wrapping. Null input vectors are
  * skipped like built-in `sum`; a group with only nulls yields null. */
case class LongVectorSum(child: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // null marks "no vector seen yet" — distinguishable from a real
  // zero-length vector, which becomes an empty (non-null) buffer
  override def createAggregationBuffer(): Array[Long] = null

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (buffer == null) {
      val fresh = new Array[Long](n)
      var i = 0
      while (i < n) { fresh(i) = arr.getLong(i); i += 1 }
      fresh
    } else {
      if (buffer.length != n)
        throw new IllegalArgumentException(
          s"long_vector_sum: vector length $n != ${buffer.length} in the same group")
      var i = 0
      while (i < n) { buffer(i) = Math.addExact(buffer(i), arr.getLong(i)); i += 1 }
      buffer
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a == null) return b
    if (b == null) return a
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"long_vector_sum: vector length ${b.length} != ${a.length} in the same group")
    var i = 0
    while (i < a.length) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
    a
  }

  override def eval(buffer: Array[Long]): Any =
    if (buffer == null) null else new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    if (buffer == null) return Array(0.toByte)
    val bb = java.nio.ByteBuffer.allocate(1 + 8 * buffer.length)
    bb.put(1.toByte)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    if (bb.get() == 0.toByte) return null
    val out = new Array[Long]((bytes.length - 1) / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): LongVectorSum =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): LongVectorSum =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LongVectorSum =
    copy(child = newChildren.head)

  override def prettyName: String = "long_vector_sum"
}

object LongVectorSum {
  /** Column API: element-wise sum aggregate of an array<bigint> column. */
  def vectorSum(c: Column): Column =
    GraftColumnBridge.column(
      LongVectorSum(GraftColumnBridge.expression(c)).toAggregateExpression())
}
