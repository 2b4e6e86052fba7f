package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{col, explode, expr}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Codegen'd Bloom-filter probe over a 64-bit hash column, plus the
  * distributed bitmap build.
  *
  * Why this exists: the decontamination / incremental-dedup screens hold
  * their "known hashes" side as a broadcast relation, which costs
  * O(64 bits + hashmap overhead) per distinct hash on EVERY executor.
  * A Bloom bitmap at ~10 bits/element (k=4, ~2% fpp) is ~20× smaller,
  * lives in one flat `long[]` referenced from generated code, and probes
  * with k dependent loads — no hashing container, no autoboxing. At
  * 100 TB the screen's big side is scanned once either way; what the
  * bloom changes is (a) the per-executor memory for the screen set and
  * (b) the shuffle volume when the exact verify join can no longer
  * broadcast — only bloom-positive candidates (true matches + fpp noise)
  * reach the exchange.
  *
  * False positives are expected and harmless here because every caller
  * re-verifies candidates with an exact join; false negatives are
  * impossible by construction, which is what keeps bloom-screened
  * results bit-identical to the unscreened oracle.
  *
  * Probe positions use Kirsch–Mitzenmacher double hashing over two
  * splitmix64 finalizations of the input hash: pos_i = (h1 + i·h2) mod m.
  * The arithmetic wraps in Java `long` inside the kernel (never in
  * Column space, where ANSI mode would throw on overflow).
  */
object BloomFilter {

  /** splitmix64 finalizer — the standard public-domain bit mixer. */
  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** The k probe positions of `h` in an m-bit filter (each in [0, m)). */
  def positions(h: Long, numHashes: Int, numBits: Int): Array[Long] = {
    val h1 = mix64(h)
    val h2 = mix64(h ^ 0x5851F42D4C957F2DL) | 1L // odd => full-period stride
    val out = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      out(i) = ((h1 + i * h2) & Long.MaxValue) % numBits
      i += 1
    }
    out
  }

  /** positions(...) boxed for Catalyst (called from generated code). */
  def positionsArrayData(h: Long, numHashes: Int, numBits: Int): ArrayData =
    new GenericArrayData(positions(h, numHashes, numBits))

  /** Probe kernel (called from generated code): all k bits set? */
  def mightContain(h: Long, words: Array[Long], numHashes: Int,
                   numBits: Int): Boolean = {
    val h1 = mix64(h)
    val h2 = mix64(h ^ 0x5851F42D4C957F2DL) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = ((h1 + i * h2) & Long.MaxValue) % numBits
      if ((words((pos >>> 6).toInt) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Distributed bitmap build: explode each hash's k positions, OR the
    * per-word bits with a partial-aggregated `bit_or`, and assemble the
    * `long[]` on the driver. The collect is at most numBits/64 rows —
    * i.e. exactly the bitmap being built (≤16 MB at the hard cap), never
    * proportional to the input. One shuffle on word index, map-side
    * combined. */
  def build(hashes: DataFrame, hashCol: String, numBits: Int,
            numHashes: Int): Array[Long] = {
    require(numBits >= 64 && numBits % 64 == 0,
      s"numBits must be a positive multiple of 64, got $numBits")
    require(numBits <= (1 << 27),
      s"numBits capped at ${1 << 27} (16 MB bitmap), got $numBits — a " +
        "bigger screen set wants a partitioned exact join, not a bloom")
    require(numHashes >= 1 && numHashes <= 16,
      s"numHashes must be in [1,16], got $numHashes")
    val words = new Array[Long](numBits / 64)
    hashes
      .select(explode(positionsCol(col(hashCol), numHashes, numBits)).as("pos"))
      .select(expr("CAST(shiftright(pos, 6) AS INT) AS word_idx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)) AS bit"))
      .groupBy("word_idx").agg(expr("bit_or(bit) AS word"))
      .collect()
      .foreach(r => words(r.getInt(0)) = r.getLong(1))
    words
  }

  /** Column API: `array<bigint>` of the k probe positions (build side). */
  def positionsCol(hash: Column, numHashes: Int, numBits: Int): Column =
    GraftColumnBridge.column(BloomPositions(
      GraftColumnBridge.expression(hash), numHashes, numBits))

  /** Column API: boolean bloom probe against a built bitmap. */
  def mightContainCol(hash: Column, words: Array[Long], numHashes: Int,
                      numBits: Int): Column =
    GraftColumnBridge.column(BloomMightContain(
      GraftColumnBridge.expression(hash), words, numHashes, numBits))
}

/** k probe positions of a bigint hash — the build-side expression. */
case class BloomPositions(child: Expression, numHashes: Int, numBits: Int)
  extends UnaryExpression {

  override def checkInputDataTypes() =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_positions expects bigint, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // null input => null output (nullSafeEval): lets Catalyst infer the
  // cheap isnotnull(child) instead of pushing this whole kernel into a
  // scan filter (PlanAuditSpec kernel-in-DataFilters check)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    BloomFilter.positionsArrayData(v.asInstanceOf[Long], numHashes, numBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BloomFilter.positionsArrayData($c, $numHashes, $numBits)")

  override protected def withNewChildInternal(newChild: Expression): BloomPositions =
    copy(child = newChild)

  override def prettyName: String = "bloom_positions"
}

/** Bloom probe of a bigint hash against a driver-built bitmap. The
  * bitmap rides into generated code as one reference object (`long[]`),
  * shared across the whole stage — no broadcast relation, no per-row
  * allocation. */
case class BloomMightContain(child: Expression, words: Array[Long],
                             numHashes: Int, numBits: Int)
  extends UnaryExpression {

  require(words.length.toLong * 64 == numBits,
    s"bitmap has ${words.length} words but numBits=$numBits")

  override def checkInputDataTypes() =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects bigint, got ${child.dataType.catalogString}")

  override def dataType: DataType = BooleanType

  // null input => null output (nullSafeEval): lets Catalyst infer the
  // cheap isnotnull(child) instead of pushing this whole kernel into a
  // scan filter (PlanAuditSpec kernel-in-DataFilters check)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(v: Any): Any =
    BloomFilter.mightContain(v.asInstanceOf[Long], words, numHashes, numBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wordsRef = ctx.addReferenceObj("bloomBits", words, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BloomFilter.mightContain($c, $wordsRef, $numHashes, $numBits)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)

  // Array fields compare by reference under case-class equality, which
  // would make structurally identical probes never canonicalize equal —
  // defeating subexpression elimination and ReuseExchange. Compare and
  // hash the bitmap by content.
  override def equals(other: Any): Boolean = other match {
    case o: BloomMightContain => child == o.child &&
      numHashes == o.numHashes && numBits == o.numBits &&
      java.util.Arrays.equals(words, o.words)
    case _ => false
  }
  override def hashCode(): Int =
    (child, java.util.Arrays.hashCode(words), numHashes, numBits).hashCode()

  override def prettyName: String = "bloom_might_contain"
}
