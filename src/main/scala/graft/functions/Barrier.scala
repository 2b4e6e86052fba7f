package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Nondeterministic IDENTITY — the repo-owned optimizer barrier.
  *
  * Evaluates (and code-generates) exactly as its child; the only thing
  * it changes is `deterministic = false`, which every relevant
  * optimizer rule consults before moving an expression:
  *
  *  - predicate pushdown will not push a filter containing it into a
  *    scan's DataFilters (the double-eval class PlanAuditSpec walks);
  *  - constraint inference will not lift it into a join-key constraint
  *    that would copy the wrapped kernel onto the other join side;
  *  - constant folding will not collapse it (`foldable = false`), so
  *    the pin holds even over a literal child.
  *
  * This replaces the previous always-false-disjunct idioms
  * (`rand() < -1`, then `monotonically_increasing_id() < -1` after
  * Spark 4 learned to bound-fold rand comparisons): those pinned the
  * predicate only for as long as the optimizer didn't learn to fold
  * that PARTICULAR builtin, and their failure mode was silent double
  * evaluation. An opaque repo-owned identity has no arithmetic the
  * optimizer could ever fold through — the contract is the
  * `deterministic` flag itself, which is the documented, stable seam
  * every move-an-expression rule keys on. Cost: zero — codegen
  * delegates to the child, so the wrapped predicate stays inside
  * whole-stage codegen unchanged. */
case class NondetBarrier(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    child.genCode(ctx)
  override protected def withNewChildInternal(
      newChild: Expression): NondetBarrier = copy(child = newChild)
  override def prettyName: String = "nondet_barrier"
}

/** Column API for [[NondetBarrier]]. */
object Barrier {
  /** Pin `c` to its current evaluation site: same values, same codegen,
    * but opaque to pushdown / constraint-inference / folding. Used by
    * every bloom-probe prescreen that sits over a bare projection (a
    * probe below a Generate or mapPartitions gets its barrier from
    * that operator for free). */
  def pin(c: Column): Column =
    GraftColumnBridge.column(NondetBarrier(GraftColumnBridge.expression(c)))
}
