package graft.plans

import graft.core.{OrderBook, OrderBookException, Transitions}
import graft.operators.OrderBookOps
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types.LongType

/** Whole-operator form of the book replay: a custom LogicalPlan +
  * SparkStrategy + SparkPlan (SURVEY.md §4 "custom pieces actually
  * needed"), the fastest embodiment — the fold runs directly over
  * UnsafeRows with Spark-planned exchange + sort, no per-row Row boxing
  * (flatMapGroups) and no per-row aggregation-buffer eval (window form).
  *
  * Planner contract: `requiredChildDistribution` = clustered on the
  * partition keys (AllTuples when none → single global book) and
  * `requiredChildOrdering` = (partition keys, order keys), so
  * EnsureRequirements inserts exactly one hash exchange and one
  * in-partition sort — the same minimal plan as a window function, with a
  * straight-line fold instead of frame machinery.
  */
case class BboReplayNode(
    mode: Int, // 0 updates, 1 mutations, 2 modify
    n: Int,
    price: Expression, qty: Expression, isBid: Expression,
    prevPrice: Option[Expression], prevQty: Option[Expression],
    partitionKeys: Seq[Expression],
    orderKeys: Seq[Expression],
    bboAttrs: Seq[Attribute],
    child: LogicalPlan) extends UnaryNode {

  override def output: Seq[Attribute] = child.output ++ bboAttrs

  override def producedAttributes: AttributeSet = AttributeSet(bboAttrs)

  override protected def withNewChildInternal(newChild: LogicalPlan): BboReplayNode =
    copy(child = newChild)
}

object BboReplayNode {
  /** Fresh output attributes for the 4·n level columns. */
  def mkBboAttrs(n: Int): Seq[Attribute] =
    OrderBookOps.bboFieldNames(n)
      .map(f => AttributeReference(f, LongType, nullable = true)())
}

case class BboReplayExec(
    mode: Int, n: Int,
    price: Expression, qty: Expression, isBid: Expression,
    prevPrice: Option[Expression], prevQty: Option[Expression],
    partitionKeys: Seq[Expression],
    orderKeys: Seq[Expression],
    bboAttrs: Seq[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ bboAttrs

  override def producedAttributes: AttributeSet = AttributeSet(bboAttrs)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partitionKeys.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partitionKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq((partitionKeys ++ orderKeys).map(SortOrder(_, Ascending)))

  override def outputPartitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numBooks" -> SQLMetrics.createMetric(sparkContext, "number of books replayed"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numBooks = longMetric("numBooks")
    val modeL = mode; val nL = n
    val childOutput = child.output
    val boundPrice = BindReferences.bindReference(price, childOutput)
    val boundQty = BindReferences.bindReference(qty, childOutput)
    val boundBid = BindReferences.bindReference(isBid, childOutput)
    val boundPP = prevPrice.map(BindReferences.bindReference(_, childOutput))
    val boundPQ = prevQty.map(BindReferences.bindReference(_, childOutput))
    val keyExprs = partitionKeys
    val outputAttrs = output

    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // identity projection materializing (input ++ bbo) to one UnsafeRow
      val outProj = UnsafeProjection.create(outputAttrs, outputAttrs)
      val bboRow = new GenericInternalRow(4 * nL)
      val joined = new JoinedRow
      var book: OrderBook = null
      var curKey: UnsafeRow = null
      val snap = new Array[Any](4 * nL)

      it.map { row =>
        if (keyExprs.nonEmpty) {
          val k = keyProj(row)
          if (curKey == null || !curKey.equals(k)) {
            curKey = k.copy()
            book = new OrderBook(nL)
            numBooks += 1
          }
        } else if (book == null) {
          book = new OrderBook(nL)
          numBooks += 1
        }

        val pv = boundPrice.eval(row)
        val qv = boundQty.eval(row)
        val bv = boundBid.eval(row)
        if (bv == null) OrderBookException.missingValue("is_bid")
        if (pv == null) OrderBookException.missingValue("price")
        if (qv == null) OrderBookException.missingValue("qty")
        val p = pv.asInstanceOf[Long]
        val q = qv.asInstanceOf[Long]
        val b = bv.asInstanceOf[Boolean]
        modeL match {
          case 0 => Transitions.applyUpdate(book, b, p, q)
          case 1 => Transitions.applyMutation(book, b, p, q)
          case 2 =>
            val ppv = boundPP.get.eval(row)
            val pqv = boundPQ.get.eval(row)
            Transitions.applyMutationWithModify(book, b, p, q,
              ppv != null, if (ppv != null) ppv.asInstanceOf[Long] else 0L,
              pqv != null, if (pqv != null) pqv.asInstanceOf[Long] else 0L)
        }
        book.snapshotInto(snap, 0)
        var i = 0
        while (i < 4 * nL) {
          if (snap(i) == null) bboRow.setNullAt(i)
          else bboRow.setLong(i, snap(i).asInstanceOf[Long])
          i += 1
        }
        numOutputRows += 1
        outProj(joined(row, bboRow))
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): BboReplayExec =
    copy(child = newChild)
}

/** Planner strategy mapping the logical node to its exec. Registered
  * idempotently on the session by the OrderBookOps API (and available via
  * `GraftExtensions` for spark.sql.extensions-based setups). */
object BboReplayStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case BboReplayNode(mode, n, p, q, b, pp, pq, keys, ord, attrs, child) =>
      BboReplayExec(mode, n, p, q, b, pp, pq, keys, ord, attrs,
        planLater(child)) :: Nil
    case _ => Nil
  }

  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(this))
      spark.experimental.extraStrategies = cur :+ this
  }
}
