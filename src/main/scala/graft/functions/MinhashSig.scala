package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd one-pass MinHash signature of a string column:
  * `array<bigint>` of length numHashes — min over the document's k-gram
  * hashes of (h·a_i + b_i) mod prime per permutation i, with the
  * all-`prime` sentinel for documents that have no shingles (fewer than
  * k tokens).
  *
  * Semantics are bit-identical to the relational form (explode shingle
  * hashes → numHashes partial-aggregated min() columns → join back):
  * shingling is the same TokenShingleHash byte fold, the permutation
  * family (a_i, b_i, prime) is passed in by the caller (DedupOps owns
  * the constants and the matching oracle SQL), and every product stays
  * under 2^63 (h < 1e9+7, a_i < prime ≈ 4.3e9 → h·a_i < 4.3e18).
  *
  * Why a kernel: the relational form paid an explode (one row per
  * shingle), a numHashes-column aggregation, and a JOIN BACK to the
  * input to restore non-shingle columns — because a columnar staging of
  * the hash array could be silently re-inlined by CollapseProject
  * (recomputing every shingle hash numHashes-fold). One expression that
  * tokenizes, hashes, and folds all minima in a single pass over the
  * UTF-8 bytes has no staging to lose: signatures become a MAP-ONLY
  * projection — no shuffle, no join — which is their correct shape at
  * any scale (a signature depends on nothing outside the doc). */
case class MinhashSig(child: Expression, shingleK: Int,
                      a: Array[Long], b: Array[Long], prime: Long)
  extends UnaryExpression {

  require(shingleK >= 1, s"shingle size must be >= 1, got $shingleK")
  require(a.length == b.length && a.nonEmpty,
    s"permutation arrays must be same non-empty length, got ${a.length}/${b.length}")

  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects string, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // null input => null output (nullSafeEval): lets Catalyst infer the
  // cheap isnotnull(child) instead of pushing this whole kernel into a
  // scan filter (PlanAuditSpec kernel-in-DataFilters check)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    MinhashSig.compute(v.asInstanceOf[UTF8String], shingleK, a, b, prime)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", a, "long[]")
    val bRef = ctx.addReferenceObj("mhB", b, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinhashSig.compute($c, $shingleK, $aRef, $bRef, ${prime}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)

  // Array fields compare by reference under case-class equality, which
  // would make structurally identical kernels never canonicalize equal —
  // defeating subexpression elimination and ReuseExchange. Compare and
  // hash the permutation tables by content.
  override def equals(other: Any): Boolean = other match {
    case o: MinhashSig => child == o.child && shingleK == o.shingleK &&
      prime == o.prime && java.util.Arrays.equals(a, o.a) &&
      java.util.Arrays.equals(b, o.b)
    case _ => false
  }
  override def hashCode(): Int =
    (child, shingleK, java.util.Arrays.hashCode(a),
      java.util.Arrays.hashCode(b), prime).hashCode()

  override def prettyName: String = "minhash_sig"
}

object MinhashSig {

  /** The kernel — also called from generated code. */
  def compute(s: UTF8String, shingleK: Int, a: Array[Long], b: Array[Long],
              prime: Long): ArrayData = {
    val hs = TokenShingleHash.compute(s, shingleK)
    val numHashes = a.length
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, prime) // sentinel when no shingles
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < numHashes) {
        val v = (h * a(j) + b(j)) % prime
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: minhash signature of a string column under the given
    * permutation family. */
  def sig(text: Column, shingleK: Int, a: Array[Long], b: Array[Long],
          prime: Long): Column =
    GraftColumnBridge.column(MinhashSig(
      GraftColumnBridge.expression(text), shingleK, a, b, prime))
}
