package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd product-quantization kernels — the per-row hot paths of the
  * PQ / IVF-PQ family.
  *
  * The composable forms are correct but evaluate through Catalyst's
  * interpreted higher-order-function path: encoding one vector runs
  * numSubspaces × numCodes `aggregate(zip_with(...))` lambda chains
  * (~64 interpreted folds per row at the default 4×16 layout), and every
  * ADC-scored candidate pair pays one more `aggregate(zip_with(
  * sequence(...)))` with two `element_at`s per subspace. These
  * expressions generate straight Java loops instead — the same
  * interpreted-HOF → codegen move that made LongArrayDot 3-4× faster on
  * the dot-product path, applied to the two kernels that dominate
  * `q_embed_pq*` / `q_embed_ivfpq*`.
  *
  * Semantics are bit-identical to the composable forms (exact integer
  * arithmetic; argmin ties to the LOWER code, which is exactly the
  * lexicographic `array_min` over (dist, code, …) structs they replace),
  * so the DuckDB oracles are untouched.
  */
object PqKernels {

  /** Flattened, contract-checked codebook constants: codeword values
    * `books[(m·numCodes + c)·subDim + d]` and norms² `n2[m·numCodes + c]`.
    * Requires each subspace's codes to be exactly 0..numCodes−1 (the
    * shape both codebook builders produce). */
  def flatten(codebooks: Seq[Seq[(Int, Seq[Long], Long)]]): (Array[Long], Array[Long], Int, Int, Int) = {
    val numSubspaces = codebooks.length
    require(numSubspaces >= 1, "empty codebooks")
    val numCodes = codebooks.head.length
    val subDim = codebooks.head.head._2.length
    codebooks.foreach { cb =>
      require(cb.map(_._1).sorted == (0 until numCodes),
        s"subspace codes must be exactly 0..${numCodes - 1}, got ${cb.map(_._1)}")
      cb.foreach { case (_, cw, _) => require(cw.length == subDim,
        s"codeword length ${cw.length} != subDim $subDim") }
    }
    val books = new Array[Long](numSubspaces * numCodes * subDim)
    val n2 = new Array[Long](numSubspaces * numCodes)
    codebooks.zipWithIndex.foreach { case (cb, m) =>
      cb.foreach { case (c, cw, cn2) =>
        var d = 0
        while (d < subDim) { books((m * numCodes + c) * subDim + d) = cw(d); d += 1 }
        n2(m * numCodes + c) = cn2
      }
    }
    (books, n2, numSubspaces, numCodes, subDim)
  }

  /** Encode kernel (called from generated code): per subspace, the
    * L2-nearest codeword (exact integer distances, ties to the lower
    * code); returns struct(codes array<int>, rec_n2 bigint). */
  def encode(sv: ArrayData, books: Array[Long], n2: Array[Long],
             numSubspaces: Int, numCodes: Int, subDim: Int): InternalRow = {
    val codes = new Array[Int](numSubspaces)
    var recN2 = 0L
    var m = 0
    while (m < numSubspaces) {
      var best = 0
      var bestDist = Long.MaxValue
      var c = 0
      while (c < numCodes) {
        val base = (m * numCodes + c) * subDim
        var dist = 0L
        var d = 0
        while (d < subDim) {
          val diff = sv.getLong(m * subDim + d) - books(base + d)
          dist += diff * diff
          d += 1
        }
        if (dist < bestDist) { bestDist = dist; best = c } // tie: lower c wins
        c += 1
      }
      codes(m) = best
      recN2 += n2(m * numCodes + best)
      m += 1
    }
    InternalRow(new GenericArrayData(codes), recN2)
  }

  /** ADC dot kernel (called from generated code):
    * Σ_m dt[m][codes[m]]. */
  def adcDot(codes: ArrayData, dt: ArrayData): Long = {
    var sum = 0L
    var m = 0
    val n = codes.numElements()
    while (m < n) {
      sum += dt.getArray(m).getLong(codes.getInt(m))
      m += 1
    }
    sum
  }

  /** Column API: struct(codes array<int>, rec_n2 bigint) of a scaled
    * vector under the given codebooks. */
  def pqEncode(sv: Column, codebooks: Seq[Seq[(Int, Seq[Long], Long)]]): Column = {
    val (books, n2, numSubspaces, numCodes, subDim) = flatten(codebooks)
    GraftColumnBridge.column(PqEncode(
      GraftColumnBridge.expression(sv), books, n2, numSubspaces, numCodes, subDim))
  }

  /** Column API: ADC table-lookup dot of a codes column against a
    * per-query dot table column (array<array<bigint>>). */
  def adcDotCol(codes: Column, dt: Column): Column =
    GraftColumnBridge.column(AdcDot(
      GraftColumnBridge.expression(codes), GraftColumnBridge.expression(dt)))
}

/** PQ-encode a scaled `array<bigint>` vector against planning-constant
  * codebooks (one flat `long[]` reference object shared by the stage).
  * Requires vector length = numSubspaces·subDim — a mismatch is a data
  * error, surfaced loudly rather than truncated. */
case class PqEncode(child: Expression, books: Array[Long], n2: Array[Long],
                    numSubspaces: Int, numCodes: Int, subDim: Int)
  extends UnaryExpression {

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(LongType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_encode expects array<bigint>, got ${t.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("rec_n2", LongType, nullable = false)))

  // null input => null output (nullSafeEval): lets Catalyst infer the
  // cheap isnotnull(child) instead of pushing this whole kernel into a
  // scan filter (PlanAuditSpec kernel-in-DataFilters check)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val sv = v.asInstanceOf[ArrayData]
    PqEncode.checkLen(sv, numSubspaces * subDim)
    PqKernels.encode(sv, books, n2, numSubspaces, numCodes, subDim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books, "long[]")
    val n2Ref = ctx.addReferenceObj("pqN2", n2, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqKernels.encode(graft.functions.PqEncode.checkLen($c, " +
        s"${numSubspaces * subDim}), $booksRef, $n2Ref, $numSubspaces, $numCodes, $subDim)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)

  // Array fields compare by reference under case-class equality, which
  // would make structurally identical kernels never canonicalize equal —
  // defeating subexpression elimination and ReuseExchange. Compare and
  // hash the codebooks by content.
  override def equals(other: Any): Boolean = other match {
    case o: PqEncode => child == o.child &&
      numSubspaces == o.numSubspaces && numCodes == o.numCodes &&
      subDim == o.subDim && java.util.Arrays.equals(books, o.books) &&
      java.util.Arrays.equals(n2, o.n2)
    case _ => false
  }
  override def hashCode(): Int =
    (child, java.util.Arrays.hashCode(books), java.util.Arrays.hashCode(n2),
      numSubspaces, numCodes, subDim).hashCode()

  override def prettyName: String = "pq_encode"
}

object PqEncode {
  /** Loud dimension guard, shared by interpreted and generated paths. */
  def checkLen(sv: ArrayData, expected: Int): ArrayData = {
    if (sv.numElements() != expected)
      throw new IllegalArgumentException(
        s"pq_encode: vector has ${sv.numElements()} dims, codebooks expect $expected")
    sv
  }
}

/** ADC dot: Σ_m dt[m][codes[m]] over (array<int>, array<array<bigint>>).
  * Null inputs yield null (BinaryExpression default); elements are
  * non-null by construction on both sides. */
case class AdcDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes() = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(ArrayType(LongType, _), _)) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"adc_dot expects (array<int>, array<array<bigint>>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
  }

  override def dataType: DataType = LongType

  // null input => null output (nullSafeEval): lets Catalyst infer the
  // cheap isnotnull(child) instead of pushing this whole kernel into a
  // scan filter (PlanAuditSpec kernel-in-DataFilters check)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    PqKernels.adcDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.PqKernels.adcDot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "adc_dot"
}
