package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hash primitives.
  *
  * Everything is built on MD5 because it is bit-identical across engines
  * (Spark `md5` and DuckDB `md5` both emit lowercase hex over UTF-8), which
  * lets every hashing operator carry an exact DuckDB oracle. All expressions
  * are Spark built-ins → whole-stage codegen, no UDFs.
  */
object HashFns {

  /** 32-bit hash: first 8 hex chars of md5 as an unsigned int in a long. */
  def hash32(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long")

  /** 60-bit hash: first 15 hex chars of md5 (stays positive in int64). */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Keyed 32-bit hash family: h_i(x) = hash32(i || ':' || x). */
  def keyedHash32(i: Column, x: Column): Column =
    hash32(concat(i.cast("string"), lit(":"), x))

  /** DuckDB SQL equivalents (text fragments for oracle strings). */
  def hash32Sql(expr: String): String =
    s"('0x'||substr(md5($expr),1,8))::BIGINT"
  def hash60Sql(expr: String): String =
    s"('0x'||substr(md5($expr),1,15))::BIGINT"
  def keyedHash32Sql(iExpr: String, xExpr: String): String =
    hash32Sql(s"$iExpr || ':' || $xExpr")
}
