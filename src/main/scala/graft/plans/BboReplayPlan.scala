package graft.plans

import graft.core.{BookKernel, OrderBookException, Transitions}
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
    val priceE = price; val qtyE = qty; val bidE = isBid
    val ppE = prevPrice; val pqE = prevQty
    val keyExprs = partitionKeys
    val outputAttrs = output

    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // identity projection materializing (input ++ bbo) to one UnsafeRow
      val outProj = UnsafeProjection.create(outputAttrs, outputAttrs)
      // plan-time-resolved ordinal readers: the event expressions are
      // bare casts over attributes, so each field is a direct primitive
      // getter — no interpreted Cast.eval, no boxing per row
      val priceF = BboReplayExec.longField(priceE, childOutput)
      val qtyF = BboReplayExec.longField(qtyE, childOutput)
      val bidF = BboReplayExec.boolField(bidE, childOutput)
      val ppF = ppE.map(BboReplayExec.longField(_, childOutput))
      val pqF = pqE.map(BboReplayExec.longField(_, childOutput))
      val bboRow = new GenericInternalRow(4 * nL)
      val joined = new JoinedRow
      var book: BookKernel = null
      var curKey: UnsafeRow = null
      val snap = new Array[Any](4 * nL)

      it.map { row =>
        if (keyExprs.nonEmpty) {
          val k = keyProj(row)
          if (curKey == null || !curKey.equals(k)) {
            curKey = k.copy()
            book = BookKernel(nL)
            numBooks += 1
          }
        } else if (book == null) {
          book = BookKernel(nL)
          numBooks += 1
        }

        if (bidF.isNull(row)) OrderBookException.missingValue("is_bid")
        if (priceF.isNull(row)) OrderBookException.missingValue("price")
        if (qtyF.isNull(row)) OrderBookException.missingValue("qty")
        val b = bidF.get(row)
        val p = priceF.get(row)
        val q = qtyF.get(row)
        modeL match {
          case 0 => Transitions.applyUpdate(book, b, p, q)
          case 1 => Transitions.applyMutation(book, b, p, q)
          case 2 =>
            val hasPP = !ppF.get.isNull(row)
            val hasPQ = !pqF.get.isNull(row)
            Transitions.applyMutationWithModify(book, b, p, q,
              hasPP, if (hasPP) ppF.get.get(row) else 0L,
              hasPQ, if (hasPQ) pqF.get.get(row) else 0L)
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

object BboReplayExec {
  import org.apache.spark.sql.types._

  /** Primitive field reader: `isNull` must be called before `get` on each
    * row (the generic fallback evaluates once in isNull and caches). */
  sealed abstract class LongField {
    def isNull(r: InternalRow): Boolean
    def get(r: InternalRow): Long
  }
  sealed abstract class BoolField {
    def isNull(r: InternalRow): Boolean
    def get(r: InternalRow): Boolean
  }

  private def ordinalOf(a: Attribute, output: Seq[Attribute]): Int =
    output.indexWhere(_.exprId == a.exprId)

  /** Resolve an event expression to a direct ordinal getter when it is a
    * bare (possibly cast) attribute — the shape the operator API always
    * produces — else fall back to one interpreted eval per row. */
  def longField(e: Expression, output: Seq[Attribute]): LongField = {
    def direct(a: Attribute): Option[LongField] = {
      val i = ordinalOf(a, output)
      if (i < 0) None
      else a.dataType match {
        case LongType => Some(new LongField {
          def isNull(r: InternalRow) = r.isNullAt(i)
          def get(r: InternalRow) = r.getLong(i)
        })
        case IntegerType => Some(new LongField {
          def isNull(r: InternalRow) = r.isNullAt(i)
          def get(r: InternalRow) = r.getInt(i).toLong
        })
        case ShortType => Some(new LongField {
          def isNull(r: InternalRow) = r.isNullAt(i)
          def get(r: InternalRow) = r.getShort(i).toLong
        })
        case ByteType => Some(new LongField {
          def isNull(r: InternalRow) = r.isNullAt(i)
          def get(r: InternalRow) = r.getByte(i).toLong
        })
        case _ => None
      }
    }
    val resolved = e match {
      case a: Attribute => direct(a)
      case c: Cast if c.dataType == LongType =>
        c.child match {
          case a: Attribute => direct(a)
          case _ => None
        }
      case _ => None
    }
    resolved.getOrElse {
      val bound = BindReferences.bindReference(e, output)
      new LongField {
        private var v: Any = _
        def isNull(r: InternalRow) = { v = bound.eval(r); v == null }
        def get(r: InternalRow) = v.asInstanceOf[Long]
      }
    }
  }

  def boolField(e: Expression, output: Seq[Attribute]): BoolField = {
    def direct(a: Attribute): Option[BoolField] = {
      val i = ordinalOf(a, output)
      if (i >= 0 && a.dataType == BooleanType) Some(new BoolField {
        def isNull(r: InternalRow) = r.isNullAt(i)
        def get(r: InternalRow) = r.getBoolean(i)
      }) else None
    }
    val resolved = e match {
      case a: Attribute => direct(a)
      case c: Cast if c.dataType == BooleanType =>
        c.child match {
          case a: Attribute => direct(a)
          case _ => None
        }
      case _ => None
    }
    resolved.getOrElse {
      val bound = BindReferences.bindReference(e, output)
      new BoolField {
        private var v: Any = _
        def isNull(r: InternalRow) = { v = bound.eval(r); v == null }
        def get(r: InternalRow) = v.asInstanceOf[Boolean]
      }
    }
  }
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
