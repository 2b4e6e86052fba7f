package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd one-pass 48-bit SimHash over a string column:
  * struct(simhash bigint, n_tok bigint).
  *
  * Semantics are bit-identical to the relational form it replaces
  * (explode tokens → 48 conditional ±1 sums → pack): tokens are single-
  * space splits with `split(text, ' ')` semantics (empty text → one
  * empty token, consecutive spaces → empty tokens), each token's 60-bit
  * hash is the first 15 hex chars of its MD5 (HashFns.hash60 — the
  * engine-portable hash every oracle reproduces), bit b of the result
  * is set iff bit b is set in a strict majority of token hashes, and
  * n_tok is the token count.
  *
  * Why a kernel: the relational form explodes every token into its own
  * row and shuffles 48 aggregation buffers per doc — at sf0.1 that is
  * ~2M rows through a 49-column partial agg for 5k docs of output. One
  * doc-local pass needs no explode, no aggregation, NO SHUFFLE AT ALL:
  * simhash becomes a map-only projection, which is also its correct
  * 100 TB shape (the signature of a doc depends on nothing outside the
  * doc). MD5 stays the hash exactly so the DuckDB oracles are
  * untouched; the digest instance is thread-cached (one per executor
  * thread, reset per token). */
case class SimHash48(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash48 expects string, got ${child.dataType.catalogString}")

  override def dataType: DataType = StructType(Seq(
    StructField("simhash", LongType, nullable = false),
    StructField("n_tok", LongType, nullable = false)))

  // null input => null output (nullSafeEval): lets Catalyst infer the
  // cheap isnotnull(child) instead of pushing this whole kernel into a
  // scan filter (PlanAuditSpec kernel-in-DataFilters check)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    SimHash48.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash48.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash48 =
    copy(child = newChild)

  override def prettyName: String = "simhash48"
}

object SimHash48 {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The kernel — also called from generated code. One pass over the
    * UTF-8 bytes: split on single spaces, MD5 each token, fold the
    * top-60-bit value into 48 majority counters, pack. */
  def compute(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val md = digest.get()
    val counters = new Array[Int](48)
    var nTok = 0L
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        // first 15 hex chars of the md5 = bytes 0..6 + high nibble of
        // byte 7, exactly conv(substring(md5(x),1,15), 16, 10)
        var h = 0L
        var j = 0
        while (j < 7) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
        h = (h << 4) | ((d(7) & 0xffL) >>> 4)
        var b = 0
        while (b < 48) {
          counters(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
        nTok += 1
        start = i + 1
      }
      i += 1
    }
    var packed = 0L
    var b = 0
    while (b < 48) {
      if (counters(b) > 0) packed |= 1L << b
      b += 1
    }
    InternalRow(packed, nTok)
  }

  /** Column API: struct(simhash, n_tok) of a string column. */
  def simhash48(c: Column): Column =
    GraftColumnBridge.column(SimHash48(GraftColumnBridge.expression(c)))
}
