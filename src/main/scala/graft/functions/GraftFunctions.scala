package graft.functions

import graft.plans.BboWindowAggregate
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType}

/** SQL-surface registration: makes the engine's custom expressions
  * callable from `spark.sql` —
  *
  * {{{
  *   SELECT *, bbo_from_price_updates(price, qty, is_bid, 2) OVER (
  *     PARTITION BY product ORDER BY seq
  *     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bbo
  *   FROM events_stream
  * }}}
  *
  * The trailing integer literal is `n` (top-N depth), mirroring the
  * reference's `n` kwarg (reference __init__.py:22-210).
  */
object GraftFunctions {

  /** Name → expression builder for every SQL-surface function; shared by
    * session-local registration (registerAll) and the
    * spark.sql.extensions path (GraftExtensions.injectFunction). */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "long_array_dot" -> { exprs =>
      require(exprs.size == 2, "long_array_dot(a, b)")
      LongArrayDot(exprs(0), exprs(1))
    },
    "token_shingle_hashes" -> { exprs =>
      require(exprs.size == 2, "token_shingle_hashes(text, k literal)")
      val k = exprs(1) match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"k must be an integer literal, got $other")
      }
      TokenShingleHash(exprs.head, k)
    },
    "bbo_from_price_updates" -> (exprs => mkBbo(0, 4, exprs)),
    "bbo_from_price_mutations" -> (exprs => mkBbo(1, 4, exprs)),
    "bbo_from_price_mutations_with_modify" -> (exprs => mkBbo(2, 6, exprs)))

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }

  private def mkBbo(mode: Int, arity: Int, exprs: Seq[Expression]): Expression = {
    require(exprs.size == arity,
      s"expected $arity arguments (event columns..., n literal), got ${exprs.size}")
    val n = exprs.last match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"the last argument must be an integer literal for n, got $other")
    }
    // Cast event children to the fold's types at analysis time (the Scala
    // BboWindow API casts; without this an INT price column would fail at
    // execution with a ClassCastException instead of resolving cleanly).
    // Child order is (price, qty, is_bid[, prev_price, prev_qty]).
    val casted = exprs.init.zipWithIndex.map {
      case (e, 2) => Cast(e, BooleanType)
      case (e, _) => Cast(e, LongType)
    }
    BboWindowAggregate(mode, n, casted.toIndexedSeq).toAggregateExpression()
  }
}
