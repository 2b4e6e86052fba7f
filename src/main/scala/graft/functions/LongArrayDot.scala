package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd dot product of two `array<bigint>` columns.
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0, _+_)` — is
  * correct but evaluates through Catalyst's interpreted higher-order-
  * function path, allocating a lambda frame per element. This expression
  * generates a straight `long` loop inside whole-stage codegen: the hot
  * kernel of every similarity operator (dot, and norms via dot(a, a)).
  *
  * Semantics match the composable form exactly: index-ordered
  * multiply-accumulate; NULL if either array is null, any element is
  * null, or the lengths differ (zip_with null-pads the shorter array, so
  * the composable form also yields NULL on a length mismatch — returning
  * a min-length partial sum here would silently diverge).
  */
case class LongArrayDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes() = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"long_array_dot expects (array<bigint>, array<bigint>), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def dataType: DataType = LongType

  // null input => null output (nullSafeEval): lets Catalyst infer the
  // cheap isnotnull(child) instead of pushing this whole kernel into a
  // scan filter (PlanAuditSpec kernel-in-DataFilters check)
  override def nullIntolerant: Boolean = true

  // always nullable: a null input array OR a null element yields null
  // (ev.isNull must be assignable in the generated loop)
  override def nullable: Boolean = true

  // a null ELEMENT nulls the whole result, matching the composable
  // aggregate(zip_with(...)) form (null * x = null, null + x = null)
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val len = x.numElements()
    var sum = 0L
    var i = 0
    while (i < len) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      sum += x.getLong(i) * y.getLong(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val len = ctx.freshName("len")
      val sum = ctx.freshName("sum")
      s"""
         |long $sum = 0L;
         |if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  int $len = $a.numElements();
         |  for (int $i = 0; $i < $len; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "long_array_dot"
}

object LongArrayDot {
  /** Column API: exact integer dot product of two array<bigint> columns. */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(LongArrayDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
