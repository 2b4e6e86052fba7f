package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd polynomial string hash over the UTF-8 bytes:
  * h = fold(bytes, 0, (acc, b) → (acc·31 + b) mod 1e9+7).
  *
  * Exists for the oracle-checked hashing pipeline: MD5 is portable but
  * costs microseconds per call (digest + hex + conv); this is a ~ns/byte
  * loop with an exact DuckDB counterpart
  * (`list_reduce` over `ascii(substr(...))` — identical for ASCII text,
  * which the document corpus is; for non-ASCII the oracle-side ascii()
  * yields code points, not bytes, so restrict oracle-checked use to
  * ASCII corpora). Modulus 1e9+7 keeps every intermediate below 2^63
  * (DuckDB errors on int64 overflow; the JVM would wrap).
  */
case class StringPolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"string_poly_hash expects string, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType

  // null input => null output (nullSafeEval): lets Catalyst infer the
  // cheap isnotnull(child) instead of pushing this whole kernel into a
  // scan filter (PlanAuditSpec kernel-in-DataFilters check)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    StringPolyHash.hash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StringPolyHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): StringPolyHash =
    copy(child = newChild)

  override def prettyName: String = "string_poly_hash"
}

object StringPolyHash {
  final val Mod = 1000000007L

  /** The kernel — also called from generated code. */
  def hash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31 + (bytes(i) & 0xff)) % Mod
      i += 1
    }
    acc
  }

  def polyHash(c: Column): Column =
    GraftColumnBridge.column(StringPolyHash(GraftColumnBridge.expression(c)))

  /** DuckDB equivalent (ASCII text: ascii(char) == byte). */
  def polyHashSql(expr: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(" +
      s"range(1, length($expr) + 1), " +
      s"i -> ascii(substr($expr, CAST(i AS INTEGER), 1))::BIGINT)), " +
      s"(acc, x) -> (acc * 31 + x) % $Mod)"
}
