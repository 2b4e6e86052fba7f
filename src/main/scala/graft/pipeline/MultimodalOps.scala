package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample plumbing.
  *
  * The actual codec work is STUBBED — this container has no image/audio
  * libraries — with a deterministic fake decoder over the bytes. What is
  * real (and what matters at 100 TB) is the Spark-side shape:
  * - payloads stay opaque binary end-to-end (no driver materialization);
  * - cheap metadata (sizes, digests, fake dimensions) is columnar,
  *   columnar built-in expression work;
  * - the expensive "decode" runs batch-wise via `mapPartitions` with a
  *   declared output schema — exactly where a Pandas-UDF/JNI decoder
  *   would slot in — so partitioning, schema, and batch shape are all
  *   exercised for real.
  */
object MultimodalOps {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("digest", StringType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("channels", LongType, nullable = false)))

  /** PNG signature bytes (\x89 P N G \r \n \x1a \n). */
  private val PngSigHex = "89504E470D0A1A0A"

  /** Build a real PNG prefix (signature + IHDR chunk: 4-byte big-endian
    * width and height, bit depth 8, color type 6 = RGBA) around an
    * arbitrary body — synthetic payloads with honest, parseable headers.
    * Pure hex-string assembly, reproducible bit-for-bit in the oracle. */
  def pngPayload(body: Column, width: Column, height: Column): Column =
    unhex(concat(
      lit(PngSigHex + "0000000D" + "49484452"), // len=13, "IHDR"
      lpad(hex(width), 8, "0"),
      lpad(hex(height), 8, "0"),
      lit("0806000000"), // bit depth 8, color 6 (RGBA), comp/filter/interlace 0
      hex(body.cast("binary"))))

  /** Columnar metadata extraction over the opaque payload. PNG payloads
    * get a REAL header parse — width/height as big-endian ints from the
    * IHDR chunk, channels from the color type — in pure byte arithmetic
    * (binary slice → hex → conv), no codec library. Non-PNG payloads
    * fall back to the deterministic digest-derived fake (the remaining
    * stub for formats whose headers need real decoders). */
  def extractMeta(content: Column): Column = {
    def be(pos: Int, len: Int): Column =
      conv(hex(substring(content, pos, len)), 16, 10).cast("long")
    val isPng = octet_length(content) >= 29 &&
      substring(content, 1, 8) === lit(PngSigHex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray) &&
      substring(content, 13, 4) === lit("IHDR".getBytes("US-ASCII"))
    val colorType = be(26, 1)
    val pngChannels = when(colorType === 0, 1L).when(colorType === 2, 3L)
      .when(colorType === 3, 1L).when(colorType === 4, 2L)
      .when(colorType === 6, 4L)
    val h = HashFns.hash32(content)
    struct(
      octet_length(content).cast("long").as("n_bytes"),
      md5(content).as("digest"),
      when(isPng, be(17, 4)).otherwise(h % 1024 + 1).as("width"),
      when(isPng, be(21, 4)).otherwise(shiftright(h, 10) % 1024 + 1).as("height"),
      // coalesce: a PNG with an unrecognized color type must still fall
      // back to the deterministic value, not a NULL that would violate
      // the declared non-nullable schema
      coalesce(when(isPng, pngChannels), h % 3 + 1).as("channels"))
  }

  /** STUB resize: the real implementation would decode, resample, and
    * re-encode; the stub scales the fake dimensions and passes the payload
    * through, keeping the pipeline shape (binary in → binary + meta out). */
  def resizeStub(df: DataFrame, contentCol: String, maxDim: Long): DataFrame = {
    val meta = extractMeta(col(contentCol))
    val scale = greatest(meta.getField("width"), meta.getField("height"))
      .cast("double") / lit(maxDim.toDouble)
    df.withColumn("resized_width",
        when(scale > 1, floor(meta.getField("width").cast("double") / scale).cast("long"))
          .otherwise(meta.getField("width")))
      .withColumn("resized_height",
        when(scale > 1, floor(meta.getField("height").cast("double") / scale).cast("long"))
          .otherwise(meta.getField("height")))
  }

  /** STUB frame sampling for video payloads: emits `numFrames` (frame_idx,
    * frame_digest) rows per media row — the real implementation would
    * demux and decode; the plumbing (generator shape, one-to-many) is
    * real. */
  def frameSampleStub(df: DataFrame, contentCol: String, idCol: String,
                      numFrames: Int): DataFrame =
    df.select(col(idCol).as("media_id"),
        posexplode(transform(sequence(lit(0), lit(numFrames - 1)),
          i => md5(concat(md5(col(contentCol).cast("binary")), i.cast("string"))
            .cast("binary")))).as(Seq("frame_idx", "frame_digest")))

  /** Batch "decode + featurize" via mapPartitions — the slot where a real
    * decoder (JNI/Pandas-UDF equivalent) would run. The stub features are
    * deterministic byte statistics so the plumbing is testable: schema
    * declared up front, payload consumed per-batch, output 1:1. */
  def decodeFeaturesStub(df: DataFrame, contentCol: String, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("byte_sum", LongType, nullable = false),
      StructField("byte_mean_x1000", LongType, nullable = false)))
    val in = df.select(col(idCol).cast("long").as("media_id"),
      col(contentCol).cast("binary").as("content"))
    val enc = Encoders.row(outSchema)
    in.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        // ??? real decoder goes here — deterministic byte stats stand in
        var s = 0L
        var i = 0
        while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
        val mean = if (bytes.length == 0) 0L else s * 1000L / bytes.length
        new GenericRowWithSchema(
          Array[Any](id, bytes.length.toLong, s, mean), outSchema): Row
      }
    }(enc)
  }
}
