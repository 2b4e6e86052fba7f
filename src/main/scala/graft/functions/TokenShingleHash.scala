package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd word k-shingle hashes in ONE pass over the UTF-8 bytes —
  * no shingle-string materialization.
  *
  * The composable form (`transform(sequence(...), i -> poly_hash(
  * concat_ws(" ", slice(tokens, i+1, k))))`) builds every shingle as a
  * string first: each input byte is copied into ~k shingle strings and
  * then re-folded — the dominant cost of the MinHash signature stage.
  * This expression tokenizes on single spaces (exactly `split(text, ' ')`
  * semantics: empty text → one empty token, consecutive spaces → empty
  * tokens), hashes each token once with the StringPolyHash byte fold,
  * and combines each k-window of token hashes with the SAME fold over
  * hashes instead of bytes:
  *
  *   shingle_i = fold(th[i..i+k-1], 0, (acc, h) → (acc·31 + h) mod 1e9+7)
  *
  * Every intermediate stays below 2^63 (th < 1e9+7, acc·31 + th <
  * 2^35), so the DuckDB oracle reproduces it exactly in int64
  * (`tokenShingleHashSql`). Returns an empty array when the text has
  * fewer than k tokens.
  */
case class TokenShingleHash(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"token_shingle_hash expects string, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // null input => null output (nullSafeEval): lets Catalyst infer the
  // cheap isnotnull(child) instead of pushing this whole kernel into a
  // scan filter (PlanAuditSpec kernel-in-DataFilters check)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    TokenShingleHash.compute(v.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenShingleHash.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): TokenShingleHash =
    copy(child = newChild)

  override def prettyName: String = "token_shingle_hash"
}

object TokenShingleHash {
  import StringPolyHash.Mod

  /** The kernel — also called from generated code. One pass: token
    * hashes into a k-ring, each full window combined into one shingle
    * hash. */
  def compute(s: UTF8String, k: Int): ArrayData = {
    val bytes = s.getBytes
    val nTokens = {
      var c = 1; var i = 0
      while (i < bytes.length) { if (bytes(i) == ' ') c += 1; i += 1 }
      c
    }
    val nShingles = nTokens - k + 1
    if (nShingles <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](nShingles)
    val ring = new Array[Long](k)
    var acc = 0L        // current token's rolling hash
    var tokenIdx = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        ring(tokenIdx % k) = acc
        acc = 0L
        if (tokenIdx >= k - 1) {
          // combine the window's token hashes in token order: the ring
          // slot of the OLDEST token in the window is (tokenIdx+1) % k
          var comb = 0L
          var j = 0
          while (j < k) {
            comb = (comb * 31 + ring((tokenIdx + 1 + j) % k)) % Mod
            j += 1
          }
          out(tokenIdx - (k - 1)) = comb
        }
        tokenIdx += 1
      } else {
        acc = (acc * 31 + (bytes(i) & 0xff)) % Mod
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: array of word-k-shingle hashes of a string column. */
  def shingleHashes(c: Column, k: Int): Column =
    GraftColumnBridge.column(TokenShingleHash(GraftColumnBridge.expression(c), k))

  /** DuckDB equivalent over a precomputed token-hash list expression
    * (`list_transform(string_split(text,' '), t -> polyHash(t))`). */
  def combineSql(thExpr: String, k: Int): String =
    s"CASE WHEN len($thExpr) < $k THEN CAST([] AS BIGINT[]) " +
      s"ELSE list_transform(range(1, len($thExpr) - $k + 2), " +
      s"i -> list_reduce(list_prepend(0::BIGINT, ($thExpr)[i:i+${k - 1}]), " +
      s"(acc, x) -> (acc * 31 + x) % $Mod)) END"
}
