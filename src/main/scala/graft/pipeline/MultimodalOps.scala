package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample plumbing.
  *
  * Decode is REAL across modalities, all on JDK-only codecs: images
  * (PNG/JPEG via `javax.imageio.ImageIO`, plus the repo's own WebP
  * lossless decoder), audio (WAV via `javax.sound`, plus FLAC and
  * MPEG-1 Layer II stream parsers), and video (MP4/fMP4/MKV/AVI
  * demuxers in [[MkvOps]] and friends, frames decoded through
  * ImageIO); `encodeSynthetic*` builders round-trip formula content
  * through the real encoders so decode output is oracle-checkable.
  * The deterministic byte-stat path survives only as
  * `mediaByteStats` — the cheap pre-decode triage column, not a stub.
  * The Spark-side shape is the part that matters at 100 TB:
  * - payloads stay opaque binary end-to-end (no driver materialization);
  * - cheap metadata (sizes, digests, header dimensions) is columnar
  *   built-in expression work;
  * - the expensive decode runs batch-wise via `mapPartitions` with a
  *   declared output schema — partition-parallel, 1:1, no shuffle.
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

  /** Standard JFIF prelude: SOI + APP0 (version 1.1, no thumbnail) + a
    * COM segment — two non-SOF segments the parser must WALK THROUGH, so
    * the round-trip test exercises real marker traversal, not a
    * fixed-offset peek. */
  private val JpegPreludeHex =
    "FFD8" +                                   // SOI
      "FFE000104A46494600010100000100010000" + // APP0, len 16, "JFIF\0"
      "FFFE00076772616674"                     // COM, len 7, "graft"

  /** SOF0 header up to the dimension fields (len 17 = 8 + 3 components,
    * precision 8). */
  private val JpegSof0Head = "FFC0001108"
  private val JpegSof0Tail = "03012200021101031101" // 3 comps: Y 2x2, Cb, Cr

  /** Assemble a baseline-JPEG prefix (SOI → APP0 → COM → SOF0 with
    * 2-byte big-endian height/width) around an arbitrary body. Pure hex
    * assembly, bit-reproducible in the oracle. */
  def jpegPayload(body: Column, width: Column, height: Column): Column = {
    // SOF0 dimensions are 2-byte fields; lpad(hex(d), 4) would silently
    // KEEP THE HIGH nibbles of an oversized value (65552 → "1001" =
    // 4097), producing a well-formed header with a wrong dimension —
    // fail loudly instead
    def dim(d: Column, name: String): Column =
      when(d.between(0, 65535), lpad(hex(d), 4, "0"))
        .otherwise(raise_error(concat(
          lit(s"jpegPayload: $name out of the 2-byte SOF0 range [0, 65535]: "),
          d.cast("string"))))
    unhex(concat(
      lit(JpegPreludeHex + JpegSof0Head),
      dim(height, "height"),
      dim(width, "width"),
      lit(JpegSof0Tail),
      hex(body.cast("binary"))))
  }

  /** REAL JPEG dimension parse: walk the marker-segment chain from the
    * byte after SOI — each segment is FF, marker, 2-byte big-endian
    * length (self-inclusive) — until a SOF0/1/2 frame header, and read
    * height/width/components from it in pure byte arithmetic. Bounded at
    * `maxSegments` hops (real JFIF files put SOF within the first few
    * segments; entropy-coded data is never walked because SOS stops the
    * scan).
    *
    * DataFrame-level (adds `jpeg_width`/`jpeg_height`/`jpeg_channels`,
    * null for non-JPEG or SOF-not-found) rather than a single Column:
    * each hop's offset feeds the next hop TWICE (marker test + length
    * read), so inlining would nest 2^maxSegments substrings — staged
    * withColumn projections keep each offset computed once (the
    * multi-reference keeps CollapseProject from re-inlining). */
  def withJpegMeta(df: DataFrame, contentCol: String,
                   maxSegments: Int = 8): DataFrame = {
    val reserved = Set("jpeg_width", "jpeg_height", "jpeg_channels") ++
      (0 to maxSegments).map(i => s"__jp_pos$i") ++
      (0 until maxSegments).map(i => s"__jp_sof$i")
    val clash = df.columns.toSet.intersect(reserved)
    require(clash.isEmpty, s"input already has reserved/output columns: $clash")
    val content = col(contentCol)
    def be(pos: Column, n: Int): Column =
      conv(hex(substring(content, pos.cast("int"), lit(n))), 16, 10).cast("long")
    val isJpeg = octet_length(content) >= 4 &&
      substring(content, 1, 2) === lit(Array(0xFF.toByte, 0xD8.toByte))
    var out = df.withColumn("__jp_pos0", when(isJpeg, lit(3L)))
    val sofCols = (0 until maxSegments).map { i =>
      val pos = col(s"__jp_pos$i")
      val m1 = be(pos, 1); val m2 = be(pos + 1, 1)
      val sofName = s"__jp_sof$i"
      out = out
        .withColumn(sofName,
          when(m1 === 255 && m2.isin(192L, 193L, 194L),
            struct(be(pos + 5, 2).as("h"), be(pos + 7, 2).as("w"),
              be(pos + 9, 1).as("c"))))
        // stop at SOS (FFDA): beyond it lies entropy-coded data, not
        // segments. A malformed/truncated segment yields null positions,
        // which null out every later hop.
        .withColumn(s"__jp_pos${i + 1}",
          when(m1 === 255 && m2 =!= 218, pos + 2 + be(pos + 2, 2)))
      col(sofName)
    }
    val sof = coalesce(sofCols: _*)
    val drop = (0 to maxSegments).map(i => s"__jp_pos$i") ++
      (0 until maxSegments).map(i => s"__jp_sof$i")
    out.withColumn("jpeg_width", sof.getField("w"))
      .withColumn("jpeg_height", sof.getField("h"))
      .withColumn("jpeg_channels", sof.getField("c"))
      .drop(drop: _*)
  }

  /** Resize TARGET dimension as a pure column formula — the same
    * integer rule as [[resizeImages]]' kernel (passthrough when the
    * image already fits, else max(1, d·maxDim / max(w,h))), for
    * metadata-only plans that know dimensions without decoding pixels
    * (a header parse planning a downstream resample). Exact LONG
    * arithmetic — Catalyst's IntegralDivide (the SQL `div` operator),
    * never a double quotient whose rounding could disagree with the
    * kernel or the oracle at a boundary (Column./ on longs is DOUBLE
    * division — imprecise past 2^53, the same class this repo's
    * sharded shard count was bitten by). */
  def resizedDim(d: Column, w: Column, h: Column, maxDim: Long): Column = {
    val m = greatest(w.cast("long"), h.cast("long"))
    val a = d.cast("long") * lit(maxDim)
    val q = org.apache.spark.sql.GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(m)))
    when(m <= maxDim, d.cast("long"))
      .otherwise(greatest(q.cast("long"), lit(1L)))
  }

  // ---- REAL image decode (JDK ImageIO) ----------------------------------

  /** Synthetic-image formulas, shared by the encoder and the
    * q_media_decode oracle (which recomputes the pixel sums in pure SQL
    * arithmetic — the decode output must match them exactly, so any
    * decoder deviation breaks oracle parity). Dimensions stay small
    * (8..16 × 8..14) so a corpus-sized image table is cheap. */
  def synthDims(id: Long): (Int, Int) =
    ((8 + id % 9).toInt, (8 + id % 7).toInt)
  def synthRgb(id: Long, x: Int, y: Int): Int = {
    val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
    val g = ((id * 17 + x * 11 + y * 3) % 256).toInt
    val b = ((id * 23 + x * 5 + y * 19) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  /** id → real PNG bytes through the JDK encoder: a formula-pixel RGB
    * image per id. PNG is lossless and profile-free, so a subsequent
    * real decode recovers the formula pixels bit-exactly. */
  def encodeSyntheticPng(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val in = df.select(col(idCol).cast("long").as("media_id"))
    in.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
      it.map { r =>
        val id = r.getLong(0)
        new GenericRowWithSchema(
          Array[Any](id, synthPngBytes(id)), outSchema): Row
      }
    }(Encoders.row(outSchema))
  }

  /** One formula image's real PNG bytes — the single-image form of
    * [[encodeSyntheticPng]], shared with the media-WARC encoder (whose
    * image responses embed exactly these bytes as HTTP payloads). */
  private[pipeline] def synthPngBytes(id: Long): Array[Byte] = {
    // re-establish the no-temp-file invariant HERE, not only in
    // encodeSyntheticPng's partition init: this runs inside other
    // encoders' partitions too (the media-WARC records), and a fresh
    // executor JVM otherwise writes a FileCacheImageOutputStream temp
    // per image — churn at best, task failure on a full/read-only tmpdir
    javax.imageio.ImageIO.setUseCache(false)
    val (w, h) = synthDims(id)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, synthRgb(id, x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** NON-PERIODIC synthetic images for fingerprint-scale soaks. The
    * linear formulas above repeat with period lcm(9, 7, 256) = 16,128 —
    * past that corpus size a "novel" id is a byte-identical copy of an
    * earlier image, so distinct aHash fingerprints CAP at 16,128 and a
    * larger soak silently measures duplicates. Here each pixel is a
    * 64-bit avalanche mix of (id, x, y) (the SplitMix64 finalizer —
    * public constants), so distinct ids give independent images and
    * distinct fingerprints track corpus size into the millions
    * (128-bit hashes; the expected ≤1-Hamming collision count at 10^5
    * images is ~1e-8). Deterministic, no RNG state — safe to
    * regenerate anywhere. Soak-only: the oracle-gated queries stay on
    * the SQL-recomputable linear formulas. */
  def synthMixRgb(id: Long, x: Int, y: Int): Int = {
    var z = id * 0x9E3779B97F4A7C15L + x * 0xBF58476D1CE4E5B9L +
      y * 0x94D049BB133111EBL
    z ^= z >>> 30; z *= 0xBF58476D1CE4E5B9L
    z ^= z >>> 27; z *= 0x94D049BB133111EBL
    z ^= z >>> 31
    (z & 0xFFFFFF).toInt
  }

  /** id → real PNG bytes of a hash-mixed image — the non-periodic twin
    * of [[encodeSyntheticPng]]. */
  def encodeSyntheticPngMixed(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val in = df.select(col(idCol).cast("long").as("media_id"))
    in.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val (w, h) = synthDims(id)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, synthMixRgb(id, x, y)); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        new GenericRowWithSchema(Array[Any](id, bos.toByteArray),
          outSchema): Row
      }
    }(Encoders.row(outSchema))
  }

  /** REAL decode + featurize: `ImageIO.read` (PNG/JPEG via the JDK's
    * built-in readers) in the mapPartitions slot, emitting per-channel
    * pixel sums — `decode_ok = false` with null features for payloads no
    * reader accepts (corrupt bytes, unsupported formats). 1:1,
    * partition-parallel, schema declared up front. */
  def decodeImageFeatures(df: DataFrame, contentCol: String,
                          idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("decode_ok", BooleanType, nullable = false),
      StructField("width", LongType, nullable = true),
      StructField("height", LongType, nullable = true),
      StructField("n_px", LongType, nullable = true),
      StructField("sum_r", LongType, nullable = true),
      StructField("sum_g", LongType, nullable = true),
      StructField("sum_b", LongType, nullable = true),
      StructField("mean_r_x1000", LongType, nullable = true)))
    val in = df.select(col(idCol).cast("long").as("media_id"),
      col(contentCol).cast("binary").as("content"))
    in.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case _: Exception => null }
        val vals: Array[Any] =
          if (img == null)
            Array[Any](id, false, null, null, null, null, null, null, null)
          else {
            val w = img.getWidth; val h = img.getHeight
            // row-strided bulk reads: one getRGB call per ROW into a
            // reused w-length buffer — keeps the per-pixel
            // ColorModel-conversion savings of a bulk read with O(w)
            // extra memory (a full-image int[] would be ~1 GB for a
            // 16k×16k raster, per concurrent task)
            val rowBuf = new Array[Int](w)
            var sr = 0L; var sg = 0L; var sb = 0L
            var y = 0
            while (y < h) {
              img.getRGB(0, y, w, 1, rowBuf, 0, w)
              var x = 0
              while (x < w) {
                val p = rowBuf(x)
                sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                x += 1
              }
              y += 1
            }
            val nPx = w.toLong * h
            Array[Any](id, true, w.toLong, h.toLong, nPx, sr, sg, sb,
              sr * 1000L / nPx)
          }
        new GenericRowWithSchema(vals, outSchema): Row
      }
    }(Encoders.row(outSchema))
  }

  // ---- REAL audio decode (JDK javax.sound, PCM WAV) ----------------------

  /** Synthetic-audio formulas, shared by the encoder, the oracle, and
    * the spec: mono PCM16 at 8 kHz, n = 200 + id%57 samples,
    * sample(i) = (id·31 + i·17) % 2000 − 1000 ∈ [−1000, 999]. Small and
    * integer-exact so per-id sums are oracle arithmetic, never floats. */
  val WavSampleRate = 8000
  def synthAudioSamples(id: Long): Int = (200 + id % 57).toInt
  def synthSample(id: Long, i: Int): Int = ((id * 31 + i * 17) % 2000 - 1000).toInt

  /** id → REAL RIFF/WAVE bytes (canonical 44-byte header + LE PCM16) —
    * the WAV twin of [[encodeSyntheticPng]]: honest on-disk audio a real
    * consumer (and [[decodeAudioFeatures]]' JDK decoder) accepts. */
  def encodeSyntheticWav(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val in = df.select(col(idCol).cast("long").as("media_id"))
    in.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val n = synthAudioSamples(id)
        val dataSize = n * 2
        val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
          .put("WAVE".getBytes("US-ASCII"))
          .put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1.toShort)                 // PCM
          .putShort(1.toShort)                 // mono
          .putInt(WavSampleRate)
          .putInt(WavSampleRate * 2)           // byte rate
          .putShort(2.toShort)                 // block align
          .putShort(16.toShort)                // bits per sample
          .put("data".getBytes("US-ASCII")).putInt(dataSize)
        var i = 0
        while (i < n) { bb.putShort(synthSample(id, i).toShort); i += 1 }
        new GenericRowWithSchema(Array[Any](id, bb.array()), outSchema): Row
      }
    }(Encoders.row(outSchema))
  }

  /** Columnar RIFF/WAVE header parse — the audio twin of the PNG IHDR
    * walk in [[extractMeta]]: pure byte arithmetic (binary slice → hex →
    * conv, little-endian recomposed per byte), no codec library. Emits
    * `format_ok = false` with null fields for anything that is not a
    * canonical-layout PCM WAV (the fmt chunk at offset 12, data at 36 —
    * the layout every standard writer including the JDK's produces). */
  def wavMeta(content: Column): Column = {
    def u8(pos: Int): Column =
      conv(hex(substring(content, pos, 1)), 16, 10).cast("long")
    def le(pos: Int, len: Int): Column =
      (0 until len).map(i => u8(pos + i) * lit(1L << (8 * i))).reduce(_ + _)
    val isWav = octet_length(content) >= 44 &&
      substring(content, 1, 4) === lit("RIFF".getBytes("US-ASCII")) &&
      substring(content, 9, 8) === lit("WAVEfmt ".getBytes("US-ASCII")) &&
      le(21, 2) === 1L && // PCM
      substring(content, 37, 4) === lit("data".getBytes("US-ASCII"))
    val bits = le(35, 2)
    val channels = le(23, 2)
    val frames = when(channels > 0 && bits >= 8,
      call_function("div", le(41, 4), channels * call_function("div", bits, lit(8L))))
    struct(
      octet_length(content).cast("long").as("n_bytes"),
      isWav.as("format_ok"),
      when(isWav, channels).as("n_channels"),
      when(isWav, le(25, 4)).as("sample_rate"),
      when(isWav, bits).as("bits_per_sample"),
      when(isWav, frames).as("n_samples"))
  }

  // ---- WEBP (modern web image metadata) ----------------------------------
  // The image format real crawls actually carry: a RIFF container (the
  // AVI grammar, image-sized) whose FIRST chunk names the coding —
  // 'VP8 ' (lossy: sync code + 14-bit LE dims), 'VP8L' (lossless: one
  // packed 32-bit word holding w-1 | h-1<<14 | alpha<<28), 'VP8X'
  // (extended: flags byte + two 24-bit LE canvas dims). All three
  // variants parse columnar at fixed offsets — the bit-packed fields
  // unpack with integer div/mod, no codec.

  /** Deterministic WEBP formulas, mirrored verbatim by the oracle. */
  def synthWebpVariant(id: Long): Int = (id % 3).toInt // 0 lossy, 1 lossless, 2 extended
  def synthWebpWidth(id: Long): Int = (16 + id % 200).toInt
  def synthWebpHeight(id: Long): Int = (16 + (id * 7) % 150).toInt
  /** Alpha exists only in the lossless and extended variants. */
  def synthWebpAlpha(id: Long): Boolean = id % 3 != 0 && id % 2 == 1
  def synthWebpTail(id: Long): Int = (10 + id % 20).toInt

  /** id → honest WEBP bytes: RIFF/WEBP envelope, one coding chunk per
    * the variant formula with spec-layout headers, then opaque coded
    * bytes (no VP8 codec here — the metadata pass never needs one). */
  def encodeSyntheticWebp(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val in = df.select(col(idCol).cast("long").as("media_id"))
    in.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val w = synthWebpWidth(id); val h = synthWebpHeight(id)
        val alpha = synthWebpAlpha(id)
        val tail = synthWebpTail(id)
        val variant = synthWebpVariant(id)
        val (fourcc, header) = variant match {
          case 0 => // VP8 lossy: 3-byte frame tag, sync, 2x u16le dims
            val hdr = new Array[Byte](10)
            hdr(3) = 0x9D.toByte; hdr(4) = 0x01; hdr(5) = 0x2A
            hdr(6) = (w & 0xFF).toByte; hdr(7) = ((w >> 8) & 0x3F).toByte
            hdr(8) = (h & 0xFF).toByte; hdr(9) = ((h >> 8) & 0x3F).toByte
            ("VP8 ", hdr)
          case 1 => // VP8L: signature + packed (w-1) | (h-1)<<14 | a<<28
            val packed = (w - 1).toLong | ((h - 1).toLong << 14) |
              (if (alpha) 1L << 28 else 0L)
            val hdr = new Array[Byte](5)
            hdr(0) = 0x2F
            (0 until 4).foreach(i =>
              hdr(1 + i) = ((packed >> (8 * i)) & 0xFF).toByte)
            ("VP8L", hdr)
          case _ => // VP8X: flags + 3 reserved + 24-bit LE (dims - 1)
            val hdr = new Array[Byte](10)
            hdr(0) = (if (alpha) 0x10 else 0x00).toByte
            (0 until 3).foreach(i =>
              hdr(4 + i) = (((w - 1) >> (8 * i)) & 0xFF).toByte)
            (0 until 3).foreach(i =>
              hdr(7 + i) = (((h - 1) >> (8 * i)) & 0xFF).toByte)
            ("VP8X", hdr)
        }
        val payload = header.length + tail
        val pad = payload & 1
        val bb = java.nio.ByteBuffer.allocate(12 + 8 + payload + pad)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + 8 + payload + pad)
        bb.put("WEBP".getBytes("US-ASCII"))
        bb.put(fourcc.getBytes("US-ASCII")).putInt(payload)
        bb.put(header)
        (0 until tail).foreach(j => bb.put(((id + j * 17) % 251).toByte))
        if (pad == 1) bb.put(0.toByte)
        require(bb.remaining() == 0, "webp encoder layout bug")
        new GenericRowWithSchema(Array[Any](id, bb.array()), outSchema): Row
      }
    }(Encoders.row(outSchema))
  }

  /** Columnar WEBP metadata parse: RIFF/WEBP envelope check, then the
    * first chunk's fourcc routes to the variant's fixed-offset field
    * layout — lossy 14-bit LE dims behind the sync code, lossless's
    * single packed word, extended's 24-bit canvas fields. Pure
    * substring/hex/conv arithmetic; `format_ok = false` with null
    * fields for anything else. Emits (n_bytes, format_ok, variant,
    * width, height, has_alpha). */
  def webpMeta(content: Column): Column = {
    def u8(pos: Int): Column =
      conv(hex(substring(content, pos, 1)), 16, 10).cast("long")
    def le(pos: Int, len: Int): Column =
      (0 until len).map(i => u8(pos + i) * lit(1L << (8 * i))).reduce(_ + _)
    val isRiff = octet_length(content) >= 21 &&
      substring(content, 1, 4) === lit("RIFF".getBytes("US-ASCII")) &&
      substring(content, 9, 4) === lit("WEBP".getBytes("US-ASCII"))
    val cc = substring(content, 13, 4)
    val isLossy = cc === lit("VP8 ".getBytes("US-ASCII")) &&
      octet_length(content) >= 30 &&
      substring(content, 24, 3) === lit(Array[Byte](0x9D.toByte, 0x01, 0x2A))
    val isLossless = cc === lit("VP8L".getBytes("US-ASCII")) &&
      octet_length(content) >= 25 && u8(21) === 0x2FL
    val isExt = cc === lit("VP8X".getBytes("US-ASCII")) &&
      octet_length(content) >= 30
    val ok = isRiff && (isLossy || isLossless || isExt)
    // lossy: u16le with the top 2 bits a scale factor — dims are the
    // low 14 bits
    val lossyW = pmod(le(27, 2), lit(1L << 14))
    val lossyH = pmod(le(29, 2), lit(1L << 14))
    // lossless: packed (w-1) | (h-1)<<14 | alpha<<28
    val packed = le(22, 4)
    val llW = pmod(packed, lit(1L << 14)) + 1L
    val llH = pmod(call_function("div", packed, lit(1L << 14)),
      lit(1L << 14)) + 1L
    val llA = pmod(call_function("div", packed, lit(1L << 28)), lit(2L)) === 1L
    // extended: flags bit 0x10 + two 24-bit LE (dim - 1) canvas fields
    val extA = pmod(call_function("div", u8(21), lit(16L)), lit(2L)) === 1L
    val extW = le(25, 3) + 1L
    val extH = le(28, 3) + 1L
    val variant = when(isLossy, lit("lossy"))
      .when(isLossless, lit("lossless"))
      .when(isExt, lit("extended"))
    struct(
      octet_length(content).cast("long").as("n_bytes"),
      ok.as("format_ok"),
      when(ok, variant).as("variant"),
      when(ok, when(isLossy, lossyW).when(isLossless, llW).otherwise(extW))
        .as("width"),
      when(ok, when(isLossy, lossyH).when(isLossless, llH).otherwise(extH))
        .as("height"),
      when(ok, when(isLossy, lit(false)).when(isLossless, llA)
        .otherwise(extA)).as("has_alpha"))
  }

  // ---- FLAC (compressed-audio metadata) ----------------------------------
  // The compressed-audio analogue of [[wavMeta]]: real corpora carry
  // FLAC/MP3, not PCM WAV, and the metadata a pipeline filters on
  // (rate/channels/bits/length/MD5) lives in FLAC's STREAMINFO block at
  // FIXED offsets — fLaC magic, then the mandatory-first STREAMINFO
  // (34 bytes) whose tail packs rate(20b)|channels-1(3b)|bits-1(5b)|
  // total-samples(36b) into one big-endian 64-bit word plus the
  // 16-byte decoded-audio MD5. Pure columnar byte arithmetic — the
  // audio FRAMES stay opaque (no FLAC codec in this container, and the
  // metadata pass never needs one).

  /** Deterministic FLAC formulas, mirrored verbatim by the oracle. */
  def synthFlacSampleRate(id: Long): Int =
    ((id % 3): @unchecked) match { case 0 => 8000; case 1 => 22050; case 2 => 44100 }
  def synthFlacChannels(id: Long): Int = (1 + id % 2).toInt
  def synthFlacBits(id: Long): Int = (8 + (id % 3) * 8).toInt
  /** Every 5th clip crosses 2^33 — the 36-bit field's raison d'être. */
  def synthFlacTotalSamples(id: Long): Long =
    1000L + id * 37 + (if (id % 5 == 0) 1L << 33 else 0L)
  def synthFlacPad(id: Long): Int = (id % 17).toInt
  def synthFlacTail(id: Long): Int = (10 + id % 23).toInt
  def synthFlacMd5Byte(id: Long, j: Int): Int = ((id * 11 + j * 29) % 256).toInt

  /** id → honest FLAC file head: fLaC magic, STREAMINFO first (as the
    * spec mandates), a last-flagged PADDING block, then opaque
    * frame-section bytes. Audio frames are NOT real FLAC frames (no
    * codec here — the seam is documented); every byte the metadata
    * walk reads is laid out exactly per the spec. */
  def encodeSyntheticFlac(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val in = df.select(col(idCol).cast("long").as("media_id"))
    in.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val pad = synthFlacPad(id); val tail = synthFlacTail(id)
        val bb = java.nio.ByteBuffer.allocate(46 + pad + tail) // big-endian
        bb.put("fLaC".getBytes("US-ASCII"))
        bb.put(0.toByte)                       // STREAMINFO, not last
        bb.put(0.toByte).put(0.toByte).put(34.toByte) // 24-bit length
        bb.putShort(4096.toShort).putShort(4096.toShort) // min/max blocksize
        (0 until 6).foreach(_ => bb.put(0.toByte)) // min/max framesize: unknown
        val packed = (synthFlacSampleRate(id).toLong << 44) |
          ((synthFlacChannels(id) - 1).toLong << 41) |
          ((synthFlacBits(id) - 1).toLong << 36) |
          synthFlacTotalSamples(id)
        bb.putLong(packed)
        (0 until 16).foreach(j => bb.put(synthFlacMd5Byte(id, j).toByte))
        bb.put(0x81.toByte)                    // PADDING, last block
        bb.put(0.toByte).put(0.toByte).put(pad.toByte)
        (0 until pad).foreach(_ => bb.put(0.toByte))
        (0 until tail).foreach(j => bb.put(((id + j * 13) % 251).toByte))
        require(bb.remaining() == 0, "flac encoder layout bug")
        new GenericRowWithSchema(Array[Any](id, bb.array()), outSchema): Row
      }
    }(Encoders.row(outSchema))
  }

  /** Columnar FLAC STREAMINFO parse — fixed-offset byte arithmetic
    * (binary slice → hex → conv, BIG-endian recomposition, bit fields
    * unpacked with integer div/mod), no codec. `format_ok = false`
    * with null fields unless the payload starts with fLaC + a
    * 34-byte STREAMINFO first block (the only layout the spec allows).
    * Emits the same field set as [[wavMeta]] plus the 16-byte
    * decoded-audio MD5 as uppercase hex — the per-file content
    * fingerprint FLAC carries natively. */
  def flacMeta(content: Column): Column = {
    def u8(pos: Int): Column =
      conv(hex(substring(content, pos, 1)), 16, 10).cast("long")
    def be(pos: Int, len: Int): Column =
      (0 until len).map(i =>
        u8(pos + i) * lit(1L << (8 * (len - 1 - i)))).reduce(_ + _)
    val isFlac = octet_length(content) >= 42 &&
      substring(content, 1, 4) === lit("fLaC".getBytes("US-ASCII")) &&
      pmod(u8(5), lit(128L)) === 0L && // first block must be STREAMINFO
      be(6, 3) === 34L
    // bytes 19..26 pack rate(20) | channels-1(3) | bits-1(5) | total(36)
    val rate = be(19, 2) * 16L + call_function("div", u8(21), lit(16L))
    val channels =
      pmod(call_function("div", u8(21), lit(2L)), lit(8L)) + 1L
    val bits = pmod(u8(21), lit(2L)) * 16L +
      call_function("div", u8(22), lit(16L)) + 1L
    val total = pmod(u8(22), lit(16L)) * lit(1L << 32) + be(23, 4)
    struct(
      octet_length(content).cast("long").as("n_bytes"),
      isFlac.as("format_ok"),
      when(isFlac, channels).as("n_channels"),
      when(isFlac, rate).as("sample_rate"),
      when(isFlac, bits).as("bits_per_sample"),
      when(isFlac, total).as("n_samples"),
      when(isFlac, hex(substring(content, 27, 16))).as("md5_hex"))
  }

  // ---- MP3 (MPEG-1 Layer III frame stream) -------------------------------
  // The third real-world audio grammar, and a different CLASS from the
  // box/chunk containers: no table and no length-prefixed envelope —
  // a self-synchronizing stream of frames whose lengths derive from
  // each frame's OWN 4-byte header (sync + bitrate/samplerate indexes
  // + padding bit), optionally preceded by an ID3v2 tag with a
  // syncsafe length. The walker below accumulates per-clip stream
  // facts (frame count, exact sample count, rate, channels, CBR/VBR)
  // without any codec — audio payloads stay opaque.

  /** MPEG-1 Layer III bitrate table, kbps, index 1..14. */
  private val Mp3BitrateKbps =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3SampleRates = Array(44100, 48000, 32000)

  /** Deterministic MP3 formulas, mirrored verbatim by the oracle. */
  def synthMp3Frames(id: Long): Int = (20 + id % 30).toInt
  def synthMp3RateIdx(id: Long): Int = (id % 3).toInt
  def synthMp3Channels(id: Long): Int = (1 + id % 2).toInt
  def synthMp3IsVbr(id: Long): Boolean = id % 4 == 0
  def synthMp3BitrateIdx(id: Long, i: Int): Int =
    if (synthMp3IsVbr(id)) (1 + (id + i * 7) % 14).toInt
    else (1 + id % 14).toInt
  def synthMp3Padding(id: Long, i: Int): Int = ((id + i) % 2).toInt
  /** One frame's full on-wire length — the Layer III formula over the
    * frame's own formula fields (kept HERE so specs never hand-copy
    * the private bitrate/rate tables). */
  def synthMp3FrameLen(id: Long, i: Int): Int =
    (144000L * Mp3BitrateKbps(synthMp3BitrateIdx(id, i)) /
      Mp3SampleRates(synthMp3RateIdx(id))).toInt + synthMp3Padding(id, i)
  /** Every 5th clip leads with an ID3v2 tag of this payload size. */
  def synthMp3Id3Size(id: Long): Int =
    if (id % 5 == 0) (id % 40).toInt else -1

  /** id → an honest MPEG-1 Layer III byte stream: optional ID3v2 tag
    * (syncsafe size), then `synthMp3Frames` frames whose 4-byte
    * headers encode the formula bitrate/samplerate/padding/channel
    * fields and whose lengths follow the Layer III formula
    * 144000·kbps/rate + padding. Frame PAYLOADS are opaque formula
    * bytes (no MP3 codec here — the metadata walk never needs one). */
  def encodeSyntheticMp3(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val in = df.select(col(idCol).cast("long").as("media_id"))
    in.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val k = synthMp3Frames(id)
        val srIdx = synthMp3RateIdx(id)
        val rate = Mp3SampleRates(srIdx)
        val mono = synthMp3Channels(id) == 1
        val id3 = synthMp3Id3Size(id)
        val frameLens = (0 until k).map { i =>
          144000L * Mp3BitrateKbps(synthMp3BitrateIdx(id, i)) / rate +
            synthMp3Padding(id, i)
        }
        val total = (if (id3 >= 0) 10 + id3 else 0) + frameLens.sum.toInt
        val bb = java.nio.ByteBuffer.allocate(total)
        if (id3 >= 0) {
          bb.put("ID3".getBytes("US-ASCII"))
          bb.put(4.toByte).put(0.toByte).put(0.toByte) // version 2.4, flags
          // syncsafe 28-bit size, 7 bits per byte
          bb.put(((id3 >> 21) & 0x7F).toByte).put(((id3 >> 14) & 0x7F).toByte)
          bb.put(((id3 >> 7) & 0x7F).toByte).put((id3 & 0x7F).toByte)
          (0 until id3).foreach(j => bb.put(((id + j) % 251).toByte))
        }
        (0 until k).foreach { i =>
          val bIdx = synthMp3BitrateIdx(id, i)
          val pad = synthMp3Padding(id, i)
          bb.put(0xFF.toByte)
          bb.put(0xFB.toByte) // sync tail + MPEG-1 + Layer III + no CRC
          bb.put(((bIdx << 4) | (srIdx << 2) | (pad << 1)).toByte)
          bb.put((if (mono) 0xC0 else 0x00).toByte)
          val body = frameLens(i).toInt - 4
          (0 until body).foreach(j => bb.put(((id + i * 31 + j) % 251).toByte))
        }
        require(bb.remaining() == 0, "mp3 encoder layout bug")
        new GenericRowWithSchema(Array[Any](id, bb.array()), outSchema): Row
      }
    }(Encoders.row(outSchema))
  }

  /** MP3 stream facts from the frame-header walk: one row per clip —
    * frame count, EXACT decoded sample count (1152 samples per MPEG-1
    * Layer III frame, no codec needed for it), sample rate, channels,
    * min/max frame bitrate, and the CBR/VBR verdict (more than one
    * distinct frame bitrate). Pure byte arithmetic in mapPartitions:
    * an ID3v2 tag is skipped by its syncsafe length, each frame's
    * length comes from its own header (144000·kbps/rate + padding),
    * and the walk is SELF-CHECKING — a header that fails the sync /
    * version / layer / index validity checks ends the walk at the
    * last good frame (honest truncation: a cut tail or corrupt region
    * keeps the complete leading frames). Clips with no valid leading
    * frame yield no row. */
  def mp3Meta(df: DataFrame, contentCol: String, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_frames", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("sample_rate", LongType, nullable = false),
      StructField("n_channels", LongType, nullable = false),
      StructField("bitrate_min_kbps", LongType, nullable = false),
      StructField("bitrate_max_kbps", LongType, nullable = false),
      StructField("is_vbr", BooleanType, nullable = false)))
    val in = df.select(col(idCol).cast("long").as("media_id"),
      col(contentCol).cast("binary").as("content"))
    in.mapPartitions { it =>
      val tally = new MediaUnresolvedTally(None, "mp3Meta")
      it.flatMap { r =>
        val id = r.getLong(0)
        val b = r.getAs[Array[Byte]](1)
        tally.walked(try {
          var p = 0
          def u8(i: Int): Int = b(i) & 0xFF
          // ID3v2: "ID3" + 2 version + 1 flags + 4-byte syncsafe size
          if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
            val sz = (u8(6) << 21) | (u8(7) << 14) | (u8(8) << 7) | u8(9)
            p = 10 + sz
          }
          var nFrames = 0L
          var rate = -1; var mono = false
          var kbMin = Long.MaxValue; var kbMax = Long.MinValue
          var distinct = Set.empty[Long]
          var ok = true
          while (ok && p + 4 <= b.length) {
            val h1 = u8(p); val h2 = u8(p + 1); val h3 = u8(p + 2)
            val bIdx = h3 >> 4; val srIdx = (h3 >> 2) & 3
            if (h1 != 0xFF || (h2 & 0xE0) != 0xE0 ||
                ((h2 >> 3) & 3) != 3 ||          // MPEG-1 only
                ((h2 >> 1) & 3) != 1 ||          // Layer III only
                bIdx == 0 || bIdx == 15 || srIdx == 3) {
              ok = false
            } else {
              val kbps = Mp3BitrateKbps(bIdx).toLong
              val sr = Mp3SampleRates(srIdx)
              val len = (144000L * kbps / sr + ((h3 >> 1) & 1)).toInt
              if (p + len > b.length) ok = false // truncated tail
              else {
                if (nFrames == 0) {
                  rate = sr
                  mono = (u8(p + 3) >> 6) == 3
                }
                nFrames += 1
                if (kbps < kbMin) kbMin = kbps
                if (kbps > kbMax) kbMax = kbps
                distinct += kbps
                p += len
              }
            }
          }
          if (nFrames == 0) Nil
          else Seq(new GenericRowWithSchema(Array[Any](
            id, nFrames, nFrames * 1152L, rate.toLong,
            (if (mono) 1L else 2L), kbMin, kbMax, distinct.size > 1),
            outSchema): Row)
        } catch {
          // truncated/garbage byte streams are DATA (counted); walker
          // bugs propagate — the MP4 walk's discipline
          case _: IndexOutOfBoundsException => Nil
          case _: IllegalArgumentException => Nil
        })
      } ++ tally.closeIter()
    }(Encoders.row(outSchema))
  }

  /** REAL audio decode + featurize: `AudioSystem.getAudioInputStream`
    * (the JDK's built-in PCM WAV reader — no external codec) in the
    * mapPartitions slot, emitting exact integer amplitude statistics:
    * sample count, signed sum, absolute sum, peak, and the fixed-point
    * mean absolute amplitude. `decode_ok = false` with null features
    * for payloads the reader rejects. 1:1, partition-parallel. Multi-
    * channel input folds all channels into the stats (frames × channels
    * samples) — the stats are per-SAMPLE, documented. */
  def decodeAudioFeatures(df: DataFrame, contentCol: String,
                          idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("decode_ok", BooleanType, nullable = false),
      StructField("n_samples", LongType, nullable = true),
      StructField("sum_amp", LongType, nullable = true),
      StructField("sum_abs", LongType, nullable = true),
      StructField("peak_abs", LongType, nullable = true),
      StructField("mean_abs_x1000", LongType, nullable = true)))
    val in = df.select(col(idCol).cast("long").as("media_id"),
      col(contentCol).cast("binary").as("content"))
    in.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val vals: Array[Any] =
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            try {
              val fmt = ais.getFormat
              require(fmt.getEncoding ==
                javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
                fmt.getSampleSizeInBits == 16)
              val data = ais.readAllBytes()
              val bb = java.nio.ByteBuffer.wrap(data).order(
                if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
                else java.nio.ByteOrder.LITTLE_ENDIAN)
              var nS = 0L; var sum = 0L; var sAbs = 0L; var peak = 0L
              while (bb.remaining() >= 2) {
                val v = bb.getShort.toLong
                nS += 1; sum += v
                val a = math.abs(v); sAbs += a; if (a > peak) peak = a
              }
              if (nS == 0) Array[Any](id, false, null, null, null, null, null)
              else Array[Any](id, true, nS, sum, sAbs, peak, sAbs * 1000L / nS)
            } finally ais.close()
          } catch { case _: Exception =>
            Array[Any](id, false, null, null, null, null, null)
          }
        new GenericRowWithSchema(vals, outSchema): Row
      }
    }(Encoders.row(outSchema))
  }

  /** Frame-level energy rows from REAL audio decode: the clip splits
    * into `frameSize`-sample windows (partial tail kept) and each frame
    * emits its exact integer absolute-amplitude sum — the time-local
    * signature stream audio fingerprinting consumes ([[wavMeta]]'s
    * decoder economy: one pass, partition-parallel; undecodable
    * payloads emit no rows — the generator-style soft failure). */
  def audioFrameEnergies(df: DataFrame, contentCol: String, idCol: String,
                         frameSize: Int): DataFrame = {
    require(frameSize >= 1, s"frameSize must be >= 1, got $frameSize")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("energy", LongType, nullable = false)))
    val in = df.select(col(idCol).cast("long").as("media_id"),
      col(contentCol).cast("binary").as("content"))
    in.mapPartitions { it =>
      val tally = new MediaUnresolvedTally(None, "audioFrameEnergies")
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        tally.walked(try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val fmt = ais.getFormat
            require(fmt.getEncoding ==
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
              fmt.getSampleSizeInBits == 16)
            val data = ais.readAllBytes()
            val bb = java.nio.ByteBuffer.wrap(data).order(
              if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
              else java.nio.ByteOrder.LITTLE_ENDIAN)
            val frames = scala.collection.mutable.ArrayBuffer.empty[Row]
            var fIdx = 0L; var inFrame = 0; var acc = 0L
            while (bb.remaining() >= 2) {
              acc += math.abs(bb.getShort.toLong)
              inFrame += 1
              if (inFrame == frameSize) {
                frames += new GenericRowWithSchema(
                  Array[Any](id, fIdx, acc), outSchema)
                fIdx += 1; inFrame = 0; acc = 0L
              }
            }
            if (inFrame > 0)
              frames += new GenericRowWithSchema(
                Array[Any](id, fIdx, acc), outSchema)
            frames.toSeq
          } finally ais.close()
        } catch {
          // non-audio / non-PCM16 / truncated payloads are DATA
          // (counted); anything else is a decoder-walk bug and fails
          // the query
          case _: javax.sound.sampled.UnsupportedAudioFileException => Nil
          case _: java.io.IOException => Nil
          case _: IllegalArgumentException => Nil
        })
      } ++ tally.closeIter()
    }(Encoders.row(outSchema))
  }

  // ---- REAL frame container (length-prefixed PNG frames) -----------------

  /** Synthetic-video formula: clip id holds 3 + id%4 frames, frame j is
    * the formula image of fid = id·8 + j (dims/pixels via [[synthDims]]/
    * [[synthRgb]] — shared with the oracle). */
  def synthFrameCount(id: Long): Int = (3 + id % 4).toInt
  def synthFrameImageId(id: Long, j: Int): Long = id * 8 + j

  private val FramePackMagic = "GFRM".getBytes("US-ASCII")

  /** id → a REAL frame-container byte stream: magic + LE frame count +
    * length-prefixed real PNG frames (each through the JDK encoder).
    * The I-frame-only container case — an MP4/MKV demuxer plugs in at
    * exactly this seam; everything downstream (walk, sample, decode,
    * feature) is already real. */
  def encodeSyntheticFramePack(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val in = df.select(col(idCol).cast("long").as("media_id"))
    in.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val k = synthFrameCount(id)
        val frames = (0 until k).map { j =>
          val fid = synthFrameImageId(id, j)
          val (w, h) = synthDims(fid)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, synthRgb(fid, x, y)); x += 1 }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          bos.toByteArray
        }
        val total = 8 + frames.map(4 + _.length).sum
        val bb = java.nio.ByteBuffer.allocate(total)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put(FramePackMagic).putInt(k)
        frames.foreach { f => bb.putInt(f.length); bb.put(f) }
        new GenericRowWithSchema(Array[Any](id, bb.array()), outSchema): Row
      }
    }(Encoders.row(outSchema))
  }

  /** REAL frame sampling + decode over the container: walk the
    * length-prefixed entries (pure byte arithmetic), keep frames with
    * index ≡ 0 (mod `stride`), and push each kept frame through the
    * REAL ImageIO decode into per-channel pixel sums — the
    * keyframe-extraction shape (decode cost ∝ SAMPLED frames, never the
    * whole clip). Malformed containers or frames emit no rows (soft). */
  def sampleFrames(df: DataFrame, contentCol: String, idCol: String,
                   stride: Int,
                   unresolvedCounter: Option[
                     org.apache.spark.util.LongAccumulator] = None)
      : DataFrame =
    framePackSample(df, contentCol, idCol, stride, unresolvedCounter,
      "sampleFrames", widthName = "width", heightName = "height")(
      frameChannelSums)

  /** [[sampleFrames]] with a THUMBNAIL featurizer: each kept frame is
    * decoded, nearest-downscaled to fit `maxDim` ([[nearestResize]] —
    * exact integer arithmetic, so the SQL oracle recomputes every
    * thumbnail pixel), and summed per channel — the keyframe-thumbnail
    * shape of a VLM training pipeline (decode + resample cost ∝
    * sampled frames; thumbnails bounded by maxDim² regardless of
    * source dimensions). */
  def sampleFrameThumbs(df: DataFrame, contentCol: String, idCol: String,
                        stride: Int, maxDim: Long,
                        unresolvedCounter: Option[
                          org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    require(maxDim >= 1, s"maxDim must be >= 1, got $maxDim")
    framePackSample(df, contentCol, idCol, stride, unresolvedCounter,
      "sampleFrameThumbs", widthName = "thumb_width",
      heightName = "thumb_height")(frameThumbSums(_, maxDim))
  }

  /** The shared frame-pack walk behind [[sampleFrames]] and
    * [[sampleFrameThumbs]]: length-prefixed entries by pure byte
    * arithmetic, stride-kept frames through `featurize` — which owns
    * what "width/height/sums" mean (full frame vs thumbnail). */
  private def framePackSample(df: DataFrame, contentCol: String,
                              idCol: String, stride: Int,
                              unresolvedCounter: Option[
                                org.apache.spark.util.LongAccumulator],
                              label: String, widthName: String,
                              heightName: String)(
      featurize: Array[Byte] => Option[(Long, Long, Long, Long, Long)])
      : DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField(widthName, LongType, nullable = false),
      StructField(heightName, LongType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false)))
    val in = df.select(col(idCol).cast("long").as("media_id"),
      col(contentCol).cast("binary").as("content"))
    in.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val tally = new MediaUnresolvedTally(unresolvedCounter, label)
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        tally.walked(try {
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val magic = new Array[Byte](4); bb.get(magic)
          require(java.util.Arrays.equals(magic, FramePackMagic))
          val k = bb.getInt
          require(k >= 0 && k < 1000000)
          val out = scala.collection.mutable.ArrayBuffer.empty[Row]
          var j = 0
          var intact = true
          // a truncated tail stops the walk but KEEPS the complete
          // frames already decoded — honest degradation, not all-or-nothing
          while (intact && j < k && bb.remaining() >= 4) {
            val len = bb.getInt
            if (len < 0 || len > bb.remaining()) {
              intact = false
            } else {
              val frame = new Array[Byte](len); bb.get(frame)
              if (j % stride == 0)
                featurize(frame).foreach { case (w, h, sr, sg, sb) =>
                  out += new GenericRowWithSchema(
                    Array[Any](id, j.toLong, w, h, sr, sg, sb),
                    outSchema)
                }
              j += 1
            }
          }
          out.toSeq
        } catch {
          // not-a-frame-pack (require), truncated reads, undecodable
          // frames are DATA — counted by the tally; a walker bug
          // propagates and fails the query (the MP4 walk's discipline)
          case _: IllegalArgumentException => Nil
          case _: java.nio.BufferUnderflowException => Nil
          case _: IndexOutOfBoundsException => Nil
          case _: java.io.IOException => Nil
        })
      } ++ tally.closeIter()
    }(Encoders.row(outSchema))
  }

  /** Decode one in-memory coded frame via the REAL JDK decoder into
    * (w, h, sum_r, sum_g, sum_b) channel sums; None when the decoder
    * rejects the payload. Shared by every container walker, so a new
    * container format only has to supply the byte walk. */
  private[pipeline] def frameChannelSums(
      frame: Array[Byte]): Option[(Long, Long, Long, Long, Long)] = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(frame))
    if (img == null) None else Some(imgChannelSums(img))
  }

  /** Per-channel pixel sums of a decoded image, row-strided (one bulk
    * getRGB per row into a reused buffer — O(w) extra memory). */
  private def imgChannelSums(img: java.awt.image.BufferedImage)
      : (Long, Long, Long, Long, Long) = {
    val w = img.getWidth; val h = img.getHeight
    val rowBuf = new Array[Int](w)
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, rowBuf, 0, w)
      var x = 0
      while (x < w) {
        val px = rowBuf(x)
        sr += (px >> 16) & 0xff; sg += (px >> 8) & 0xff
        sb += px & 0xff
        x += 1
      }
      y += 1
    }
    (w.toLong, h.toLong, sr, sg, sb)
  }

  /** Nearest-neighbor downscale to fit `maxDim` (aspect preserved,
    * target dims max(1, d·maxDim / max(w,h)) in LONG arithmetic — the
    * exact rule the SQL oracles mirror with `//`). Returns the input
    * image itself when it already fits. Row-strided: the x-mapping is
    * precomputed once, the source read one row at a time (O(w + tw·th)
    * memory — the output raster is bounded by maxDim², the source is
    * not). Shared by [[resizeImages]] (which re-encodes the result)
    * and the thumbnail featurizers (which sum its channels directly). */
  private def nearestResize(img: java.awt.image.BufferedImage,
                            maxDim: Long): java.awt.image.BufferedImage = {
    val w = img.getWidth.toLong; val h = img.getHeight.toLong
    val m = math.max(w, h)
    if (m <= maxDim) img
    else {
      val tw = math.max(1L, w * maxDim / m).toInt
      val th = math.max(1L, h * maxDim / m).toInt
      val wi = w.toInt
      val xmap = new Array[Int](tw)
      var x = 0
      while (x < tw) { xmap(x) = (x.toLong * w / tw).toInt; x += 1 }
      val srcRow = new Array[Int](wi)
      val outRow = new Array[Int](tw)
      val dst = new java.awt.image.BufferedImage(
        tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < th) {
        img.getRGB(0, (y.toLong * h / th).toInt, wi, 1, srcRow, 0, wi)
        var i = 0
        while (i < tw) { outRow(i) = srcRow(xmap(i)); i += 1 }
        dst.setRGB(0, y, tw, 1, outRow, 0, tw)
        y += 1
      }
      dst
    }
  }

  /** Decode one coded frame, nearest-downscale it to fit `maxDim`, and
    * sum the THUMBNAIL's channels — (thumb_w, thumb_h, sum_r, sum_g,
    * sum_b); None when the decoder rejects the payload. */
  private[pipeline] def frameThumbSums(frame: Array[Byte], maxDim: Long)
      : Option[(Long, Long, Long, Long, Long)] = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(frame))
    if (img == null) None
    else Some(imgChannelSums(nearestResize(img, maxDim)))
  }

  // ---- REAL RIFF/AVI container (Motion-PNG video stream) -----------------
  //
  // The second real container at the demuxer seam: where the frame pack
  // above is the minimal length-prefixed layout, this is the STANDARD
  // RIFF/AVI file structure — 'RIFF' size 'AVI ', an avih+strl header
  // LIST declaring one 'vids' stream with the MPNG (Motion-PNG) codec,
  // and a movi LIST whose '00dc' chunks each carry one real PNG-coded
  // frame, with RIFF's even-byte chunk padding throughout. It reuses
  // the RIFF byte discipline the WAV encoder established (same
  // fourcc + LE-size chunk grammar wavMeta walks) and feeds the SAME
  // stride-sample + real ImageIO decode as the frame pack — proving the
  // "a demuxer plugs in at exactly this seam" claim generalizes: only
  // the walk changed. An MP4/MKV demuxer differs in box grammar, not in
  // anything downstream.

  private val AviListFourcc = "LIST".getBytes("US-ASCII")
  private val AviMoviFourcc = "movi".getBytes("US-ASCII")
  private val AviFrameFourcc = "00dc".getBytes("US-ASCII")

  /** id → REAL RIFF/AVI bytes holding the same clip as
    * [[encodeSyntheticFramePack]] (same frame formulas), so the two
    * containers are two on-disk encodings of ONE logical video and the
    * AVI query can share the frame pack's formula oracle. Headers are
    * complete enough for a standards-following demuxer: avih carries
    * the true frame count and dims of frame 0, strh declares
    * vids/MPNG, strf is a BITMAPINFOHEADER with biCompression
    * 'MPNG'. Every chunk is even-padded per the RIFF rule (PNG
    * payloads routinely have odd lengths, so the padding path is live
    * in real data, and AviContainerSpec pins it). */
  def encodeSyntheticAvi(df: DataFrame, idCol: String,
                         codec: String = "MPNG"): DataFrame = {
    require(codec == "MPNG" || codec == "MJPG",
      s"codec must be MPNG (Motion-PNG) or MJPG (Motion-JPEG), got $codec")
    // MJPG is the real-world compressed-video leg: the SAME container
    // walk and the SAME ImageIO decode (it sniffs the payload), only
    // the per-frame coding changes — and because JPEG is LOSSY, decoded
    // pixel sums are JVM-codec facts, not formula facts; only the dims
    // (and count/order) stay formula-checkable (see MjpegAviSpec)
    val imageioFormat = if (codec == "MJPG") "jpg" else "png"
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val in = df.select(col(idCol).cast("long").as("media_id"))
    in.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val k = synthFrameCount(id)
        val frames = (0 until k).map { j =>
          val fid = synthFrameImageId(id, j)
          val (w, h) = synthDims(fid)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, synthRgb(fid, x, y)); x += 1 }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, imageioFormat, bos)
          bos.toByteArray
        }
        val (w0, h0) = synthDims(synthFrameImageId(id, 0))
        def pad(n: Int) = n + (n & 1)
        val strlInner = 4 + (8 + 56) + (8 + 40)         // 'strl' + strh + strf
        val hdrlInner = 4 + (8 + 56) + (8 + strlInner)  // 'hdrl' + avih + LIST strl
        val moviInner = 4 + frames.map(f => 8 + pad(f.length)).sum
        val riffInner = 4 + (8 + hdrlInner) + (8 + moviInner)
        val bb = java.nio.ByteBuffer.allocate(8 + riffInner)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def fcc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
        fcc("RIFF"); bb.putInt(riffInner); fcc("AVI ")
        fcc("LIST"); bb.putInt(hdrlInner); fcc("hdrl")
        fcc("avih"); bb.putInt(56)
        bb.putInt(40000)        // dwMicroSecPerFrame (25 fps)
          .putInt(0).putInt(0)  // dwMaxBytesPerSec, dwPaddingGranularity
          .putInt(0)            // dwFlags
          .putInt(k)            // dwTotalFrames
          .putInt(0)            // dwInitialFrames
          .putInt(1)            // dwStreams
          .putInt(0)            // dwSuggestedBufferSize
          .putInt(w0).putInt(h0)
          .putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved
        fcc("LIST"); bb.putInt(strlInner); fcc("strl")
        fcc("strh"); bb.putInt(56)
        fcc("vids"); fcc(codec)
        bb.putInt(0)                     // dwFlags
          .putShort(0).putShort(0)       // wPriority, wLanguage
          .putInt(0)                     // dwInitialFrames
          .putInt(1).putInt(25)          // dwScale, dwRate (25 fps)
          .putInt(0)                     // dwStart
          .putInt(k)                     // dwLength (frames)
          .putInt(0)                     // dwSuggestedBufferSize
          .putInt(-1)                    // dwQuality
          .putInt(0)                     // dwSampleSize
          .putShort(0).putShort(0)       // rcFrame
          .putShort(w0.toShort).putShort(h0.toShort)
        fcc("strf"); bb.putInt(40)
        bb.putInt(40)                    // biSize
          .putInt(w0).putInt(h0)
          .putShort(1).putShort(24)      // biPlanes, biBitCount
        fcc(codec)                       // biCompression
        bb.putInt(0)                     // biSizeImage
          .putInt(0).putInt(0)           // biXPelsPerMeter, biYPelsPerMeter
          .putInt(0).putInt(0)           // biClrUsed, biClrImportant
        fcc("LIST"); bb.putInt(moviInner); fcc("movi")
        frames.foreach { f =>
          fcc("00dc"); bb.putInt(f.length); bb.put(f)
          if ((f.length & 1) == 1) bb.put(0.toByte) // RIFF even padding
        }
        new GenericRowWithSchema(Array[Any](id, bb.array()), outSchema): Row
      }
    }(Encoders.row(outSchema))
  }

  /** REAL AVI demux + frame sampling + decode: a pure byte-arithmetic
    * RIFF walk (fourcc + LE size, even-padding rule) finds the movi
    * LIST, iterates its '00dc' video chunks in stream order, keeps
    * frame indices ≡ 0 (mod `stride`), and pushes each kept payload
    * through the same real ImageIO decode as [[sampleFrames]]. Output
    * schema and semantics are identical to sampleFrames — decode cost
    * ∝ SAMPLED frames, a truncated tail stops the walk but KEEPS the
    * complete frames already decoded, non-AVI or malformed payloads
    * emit no rows, and non-video chunks ('01wb' audio, 'idx1'
    * indexes…) are skipped by the padding-aware grammar rather than
    * tripping it. */
  def sampleAviFrames(df: DataFrame, contentCol: String, idCol: String,
                      stride: Int,
                      unresolvedCounter: Option[
                        org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false)))
    val in = df.select(col(idCol).cast("long").as("media_id"),
      col(contentCol).cast("binary").as("content"))
    in.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val tally = new MediaUnresolvedTally(unresolvedCounter,
        "sampleAviFrames")
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        tally.walked(try {
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          def fourcc(): Array[Byte] = {
            val a = new Array[Byte](4); bb.get(a); a
          }
          require(bytes.length >= 12)
          require(java.util.Arrays.equals(fourcc(),
            "RIFF".getBytes("US-ASCII")))
          bb.getInt                       // riff size (trust the walk, not it)
          require(java.util.Arrays.equals(fourcc(),
            "AVI ".getBytes("US-ASCII")))
          val out = scala.collection.mutable.ArrayBuffer.empty[Row]
          // top-level chunk walk: find the movi LIST, skip everything
          // else (hdrl, JUNK, idx1) by its declared padded size
          var moviEnd = -1
          var corrupt = false
          while (moviEnd < 0 && !corrupt && bb.remaining() >= 8) {
            val cc = fourcc(); val size = bb.getInt
            if (size < 0) {
              corrupt = true
            } else if (java.util.Arrays.equals(cc, AviListFourcc) &&
                size >= 4 && bb.remaining() >= 4) {
              val listType = fourcc()
              if (java.util.Arrays.equals(listType, AviMoviFourcc))
                // clamp to the actual buffer: a truncated movi still
                // yields its complete leading frames (honest degradation)
                moviEnd = math.min(bb.position() + size - 4, bytes.length)
              else if (size - 4 + (size & 1) > bb.remaining()) corrupt = true
              else bb.position(bb.position() + size - 4 + (size & 1))
            } else if (size + (size & 1) > bb.remaining()) {
              corrupt = true // truncated before movi: nothing decoded yet
            } else bb.position(bb.position() + size + (size & 1))
          }
          if (moviEnd < 0 || corrupt) Nil
          else {
            var j = 0L
            var intact = true
            while (intact && bb.position() + 8 <= moviEnd) {
              val cc = fourcc(); val len = bb.getInt
              if (len < 0 || bb.position() + len > moviEnd ||
                  len > bb.remaining()) {
                intact = false   // truncated tail: keep what's decoded
              } else if (java.util.Arrays.equals(cc, AviFrameFourcc)) {
                val frame = new Array[Byte](len); bb.get(frame)
                if ((len & 1) != 0 && bb.remaining() >= 1) bb.get()
                if (j % stride == 0)
                  frameChannelSums(frame).foreach {
                    case (w, h, sr, sg, sb) =>
                      out += new GenericRowWithSchema(
                        Array[Any](id, j, w, h, sr, sg, sb), outSchema)
                  }
                j += 1
              } else {
                // skip a non-video chunk, guarding the RIFF pad byte
                // against a truncated buffer: an odd-length '01wb'
                // whose data fits exactly must END the walk (keeping
                // the frames already decoded), not throw into the
                // blanket catch and lose them
                val next = bb.position() + len + (len & 1)
                if (next > bb.limit()) intact = false
                else bb.position(next)
              }
            }
            out.toSeq
          }
        } catch {
          // non-AVI payloads (require), truncated reads, undecodable
          // frames are DATA — counted; walker bugs propagate
          case _: IllegalArgumentException => Nil
          case _: java.nio.BufferUnderflowException => Nil
          case _: IndexOutOfBoundsException => Nil
          case _: java.io.IOException => Nil
        })
      } ++ tally.closeIter()
    }(Encoders.row(outSchema))
  }

  // ---- ISO-BMFF (MP4) ----------------------------------------------------
  // The 90%-of-real-corpora video container: big-endian (size, fourcc)
  // boxes, nested moov/trak/mdia/minf/stbl metadata, samples addressed
  // indirectly through five parallel tables (stts timing, stsz sizes,
  // stsc sample→chunk runs, stco/co64 chunk offsets, stss sync marks).
  // The walker below emits the RESOLVED per-sample table — the rows a
  // frame extractor seeks by — from pure byte arithmetic, no codec.

  /** Deterministic MP4 formulas, mirrored verbatim by the oracle SQL. */
  def synthMp4Samples(id: Long): Int = (4 + id % 5).toInt
  def synthMp4SampleSize(id: Long, i: Int): Int =
    (50 + (id * 7 + i * 13) % 90).toInt
  def synthMp4Timescale(id: Long): Int =
    ((id % 3): @unchecked) match { case 0 => 600; case 1 => 1000; case 2 => 90000 }
  def synthMp4Delta(id: Long): Int = (100 + id % 50).toInt
  /** Unreferenced pad bytes between the two chunks — makes the chunk
    * arithmetic observable (offsets are NOT one contiguous prefix sum). */
  def synthMp4Gap(id: Long): Int = (id % 7).toInt + 1

  /** id → REAL ISO-BMFF bytes: ftyp + mdat + moov (camera layout), or
    * moov before mdat with `faststart` (the progressive-download
    * layout — also what makes honest mdat truncation testable, since
    * the tail-moov layout loses the sample table with the tail). One
    * video trak; two chunks (ceil(k/2) + floor(k/2) samples) with a
    * deliberate unreferenced gap between them; stss marks every 3rd
    * sample; odd ids use co64 (64-bit chunk offsets) and ids ≡ 3 (mod
    * 4) a version-1 mdhd, so the walker's width/version branches are
    * exercised corpus-wide, invisibly to the formula oracle. */
  def encodeSyntheticMp4(df: DataFrame, idCol: String,
                         faststart: Boolean = false): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val in = df.select(col(idCol).cast("long").as("media_id"))
    in.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val k = synthMp4Samples(id)
        val samples = IndexedSeq.tabulate(k) { i =>
          val sz = synthMp4SampleSize(id, i)
          Array.tabulate[Byte](sz)(j => ((id + i * 7 + j) % 251).toByte)
        }
        new GenericRowWithSchema(Array[Any](id,
          buildMp4(id, samples, synthMp4Timescale(id), synthMp4Delta(id),
            synthMp4Gap(id), faststart)), outSchema): Row
      }
    }(Encoders.row(outSchema))
  }

  /** One ISO-BMFF file from explicit sample payloads — the writer
    * behind [[encodeSyntheticMp4]] (formula-sized opaque samples) and
    * [[encodeSyntheticMp4Video]] (real PNG frames as samples). */
  private def buildMp4(id: Long, samples: IndexedSeq[Array[Byte]],
                       ts: Int, delta: Int, gap: Int,
                       faststart: Boolean): Array[Byte] = {
    locally {
        val k = samples.size
        val sizes = samples.map(_.length)
        val c1 = (k + 1) / 2; val c2 = k - c1
        val useCo64 = id % 2 == 1
        val mdhdV1 = id % 4 == 3
        val payload = sizes.sum + gap
        val ftypSz = 24
        val mdatSz = 8 + payload
        val moovSz = mp4MoovSize(k, (0 until k).count(_ % 3 == 0), 2, 2,
          useCo64, mdhdV1)
        val mdatPayloadOff =
          (if (faststart) ftypSz + moovSz else ftypSz) + 8L
        val chunkOffs = Array(mdatPayloadOff,
          mdatPayloadOff + sizes.take(c1).sum + gap)
        val moov = mp4MoovBytes(sizes, ts, delta, chunkOffs,
          Seq((1, c1), (2, c2)), useCo64, mdhdV1)
        require(moov.length == moovSz,
          s"mp4 encoder layout bug: moov ${moov.length} != sized $moovSz")
        val bb = java.nio.ByteBuffer.allocate(ftypSz + mdatSz + moovSz)
        // ISO-BMFF is big-endian — ByteBuffer's default order
        def fcc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
        def box(sz: Int, tp: String): Unit = { bb.putInt(sz); fcc(tp) }
        def writeFtyp(): Unit = {
          box(ftypSz, "ftyp"); fcc("isom"); bb.putInt(0x200)
          fcc("isom"); fcc("mp41")
        }
        def writeMdat(): Unit = {
          box(mdatSz, "mdat")
          var i = 0
          while (i < k) {
            if (i == c1) (0 until gap).foreach(_ => bb.put(0xEE.toByte))
            bb.put(samples(i))
            i += 1
          }
          if (c1 == k) (0 until gap).foreach(_ => bb.put(0xEE.toByte))
        }
        writeFtyp()
        if (faststart) { bb.put(moov); writeMdat() }
        else { writeMdat(); bb.put(moov) }
        require(bb.remaining() == 0,
          s"mp4 encoder layout bug: ${bb.remaining()} bytes unwritten")
        bb.array()
    }
  }

  /** Exact byte size of the moov box [[mp4MoovBytes]] will emit — needed
    * up front when moov precedes mdat (faststart) because the chunk
    * offsets inside moov depend on moov's own length. */
  private[graft] def mp4MoovSize(k: Int, nSyncs: Int, nChunks: Int,
                                 nStscRuns: Int, useCo64: Boolean,
                                 mdhdV1: Boolean): Int = {
    val stsdSz = 102; val sttsSz = 24
    val stssSz = 16 + 4 * nSyncs
    val stszSz = 20 + 4 * k; val stscSz = 16 + 12 * nStscRuns
    val stcoSz = 16 + (if (useCo64) 8 else 4) * nChunks
    val stblSz = 8 + stsdSz + sttsSz + stssSz + stszSz + stscSz + stcoSz
    val minfSz = 8 + 20 + 36 + stblSz        // vmhd + dinf + stbl
    val mdhdSz = if (mdhdV1) 44 else 32
    val mdiaSz = 8 + mdhdSz + 33 + minfSz    // mdhd + hdlr + minf
    val trakSz = 8 + 92 + mdiaSz             // tkhd + mdia
    8 + 108 + trakSz                         // mvhd + trak
  }

  /** A complete standalone moov box for one video trak: constant-rate
    * stts, every-3rd-sample stss, explicit per-sample stsz, caller's
    * stsc runs ((first_chunk, samples_per_chunk), 1-based) and chunk
    * offsets (file-absolute; stco or co64). Factored out of the
    * in-memory encoder so harnesses can compose files whose mdat is
    * written by OTHER means — e.g. the giant sparse clips the ranged
    * soak uses to prove there is no file-size ceiling. */
  private[graft] def mp4MoovBytes(sizes: IndexedSeq[Int], ts: Int, delta: Int,
                                  chunkOffs: Array[Long],
                                  stscRuns: Seq[(Int, Int)],
                                  useCo64: Boolean,
                                  mdhdV1: Boolean): Array[Byte] = {
    val k = sizes.size
    val syncs = (0 until k).filter(_ % 3 == 0) // 0-based; stored 1-based
    val duration = k.toLong * delta
    val stsdSz = 102; val sttsSz = 24
    val stssSz = 16 + 4 * syncs.size
    val stszSz = 20 + 4 * k; val stscSz = 16 + 12 * stscRuns.size
    val stcoSz = 16 + (if (useCo64) 8 else 4) * chunkOffs.length
    val stblSz = 8 + stsdSz + sttsSz + stssSz + stszSz + stscSz + stcoSz
    val minfSz = 8 + 20 + 36 + stblSz
    val mdhdSz = if (mdhdV1) 44 else 32
    val mdiaSz = 8 + mdhdSz + 33 + minfSz
    val trakSz = 8 + 92 + mdiaSz
    val moovSz = 8 + 108 + trakSz
    val bb = java.nio.ByteBuffer.allocate(moovSz)
    def fcc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    def box(sz: Int, tp: String): Unit = { bb.putInt(sz); fcc(tp) }
    box(moovSz, "moov")
    box(108, "mvhd"); bb.putInt(0)         // version 0 + flags
    bb.putInt(0).putInt(0)                  // creation, modification
      .putInt(ts).putInt(duration.toInt)
      .putInt(0x00010000).putShort(0x0100.toShort) // rate, volume
      .putShort(0).putLong(0L)              // reserved
    Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
      .foreach(bb.putInt)                   // unity matrix
    (0 until 6).foreach(_ => bb.putInt(0))  // pre_defined
    bb.putInt(2)                            // next_track_ID
    box(trakSz, "trak")
    box(92, "tkhd"); bb.putInt(7)           // v0, flags: enabled+in-movie+in-preview
    bb.putInt(0).putInt(0).putInt(1).putInt(0) // times, track_ID, reserved
      .putInt(duration.toInt).putLong(0L)
      .putShort(0).putShort(0).putShort(0).putShort(0) // layer, group, volume, rsvd
    Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
      .foreach(bb.putInt)
    bb.putInt(16 << 16).putInt(16 << 16)    // width, height (16.16)
    box(mdiaSz, "mdia")
    if (mdhdV1) {
      box(44, "mdhd"); bb.putInt(0x01000000) // version 1
      bb.putLong(0L).putLong(0L).putInt(ts).putLong(duration)
        .putShort(0x55C4.toShort).putShort(0)  // language 'und', pre_defined
    } else {
      box(32, "mdhd"); bb.putInt(0)
      bb.putInt(0).putInt(0).putInt(ts).putInt(duration.toInt)
        .putShort(0x55C4.toShort).putShort(0)
    }
    box(33, "hdlr"); bb.putInt(0); bb.putInt(0); fcc("vide")
    (0 until 3).foreach(_ => bb.putInt(0)); bb.put(0.toByte) // name ""
    box(minfSz, "minf")
    box(20, "vmhd"); bb.putInt(1)           // v0, flags=1
    bb.putShort(0); (0 until 3).foreach(_ => bb.putShort(0)) // graphicsmode, opcolor
    box(36, "dinf"); box(28, "dref"); bb.putInt(0).putInt(1)
    box(12, "url "); bb.putInt(1)           // flags: self-contained
    box(stblSz, "stbl")
    box(stsdSz, "stsd"); bb.putInt(0).putInt(1)
    box(86, "mp4v")                         // visual sample entry
    (0 until 6).foreach(_ => bb.put(0.toByte)); bb.putShort(1) // reserved, data_ref_idx
    bb.putShort(0).putShort(0); (0 until 3).foreach(_ => bb.putInt(0)) // pre_defined
    bb.putShort(16).putShort(16)            // width, height
      .putInt(0x00480000).putInt(0x00480000) // 72 dpi
      .putInt(0).putShort(1)                // reserved, frame_count
    (0 until 32).foreach(_ => bb.put(0.toByte)) // compressorname
    bb.putShort(24).putShort(-1)            // depth, pre_defined
    box(sttsSz, "stts"); bb.putInt(0).putInt(1)
    bb.putInt(k).putInt(delta)
    box(stssSz, "stss"); bb.putInt(0).putInt(syncs.size)
    syncs.foreach(s => bb.putInt(s + 1))    // 1-based sample numbers
    box(stszSz, "stsz"); bb.putInt(0).putInt(0).putInt(k)
    sizes.foreach(bb.putInt)
    box(stscSz, "stsc"); bb.putInt(0).putInt(stscRuns.size)
    stscRuns.foreach { case (first, spc) =>
      bb.putInt(first).putInt(spc).putInt(1)
    }
    if (useCo64) {
      box(stcoSz, "co64"); bb.putInt(0).putInt(chunkOffs.length)
      chunkOffs.foreach(bb.putLong)
    } else {
      box(stcoSz, "stco"); bb.putInt(0).putInt(chunkOffs.length)
      chunkOffs.foreach(o => bb.putInt(o.toInt))
    }
    require(bb.remaining() == 0,
      s"mp4 moov layout bug: ${bb.remaining()} bytes unwritten")
    bb.array()
  }

  // ---- Fragmented MP4 (fMP4: moof/traf/trun — the DASH/HLS layout) ------

  /** Deterministic fMP4 formulas, mirrored verbatim by the oracle SQL. */
  def synthFmp4Fragments(id: Long): Int = (2 + id % 3).toInt
  def synthFmp4FragSamples(id: Long, f: Int): Int = (2 + (id + f) % 3).toInt
  def synthFmp4SampleSize(id: Long, i: Int): Int =
    (40 + (id * 11 + i * 7) % 60).toInt

  /** id → REAL fragmented ISO-BMFF bytes: ftyp + an empty-stbl moov
    * (mvhd/trak with zero-length sample tables + mvex/trex — the
    * streaming-init-segment shape) followed by one moof+mdat pair per
    * fragment, each moof carrying mfhd/traf(tfhd, trun). Branch
    * coverage rides the corpus: EVEN ids carry per-sample durations in
    * trun entries (8-byte entries, flags 0x301), ODD ids hoist the
    * duration into tfhd's default-sample-duration (4-byte entries,
    * flags 0x201, tfhd flags 0x020008) — both under
    * default-base-is-moof addressing with an explicit trun
    * data_offset. */
  def encodeSyntheticFmp4(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val in = df.select(col(idCol).cast("long").as("media_id"))
    in.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        var i = 0
        val frags = (0 until synthFmp4Fragments(id)).map { f =>
          IndexedSeq.fill(synthFmp4FragSamples(id, f)) {
            val sz = synthFmp4SampleSize(id, i)
            val a = Array.tabulate[Byte](sz)(j => ((id + i * 7 + j) % 251).toByte)
            i += 1
            a
          }
        }
        new GenericRowWithSchema(Array[Any](id,
          buildFmp4(id, frags, synthMp4Timescale(id), synthMp4Delta(id))),
          outSchema): Row
      }
    }(Encoders.row(outSchema))
  }

  /** The fMP4 twin of [[encodeSyntheticMp4Video]]: the SAME logical
    * clip (frame formulas synthFrameCount/synthFrameImageId, real JDK
    * PNG frames) split across two fragments (ceil(k/2) + rest), so
    * [[sampleMp4Frames]] over it shares the one frame-formula oracle
    * with the pack, AVI, and progressive-MP4 forms. */
  def encodeSyntheticFmp4Video(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val in = df.select(col(idCol).cast("long").as("media_id"))
    in.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val k = synthFrameCount(id)
        val frames = IndexedSeq.tabulate(k) { j =>
          val fid = synthFrameImageId(id, j)
          val (w, h) = synthDims(fid)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, synthRgb(fid, x, y)); x += 1 }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          bos.toByteArray
        }
        val c1 = (k + 1) / 2
        new GenericRowWithSchema(Array[Any](id,
          buildFmp4(id, Seq(frames.take(c1), frames.drop(c1)), ts = 25,
            delta = 1)), outSchema): Row
      }
    }(Encoders.row(outSchema))
  }

  /** One fragmented file from explicit per-fragment payloads — the
    * writer behind both fMP4 encoders. */
  private def buildFmp4(id: Long, frags: Seq[IndexedSeq[Array[Byte]]],
                        ts: Int, delta: Int): Array[Byte] = {
    val even = id % 2 == 0
    val moov = fmp4MoovBytes(ts)
    val fragBytes = frags.zipWithIndex.map { case (payloads, f) =>
      val m = payloads.size
      val tfhdSz = if (even) 16 else 20
      val trunSz = 20 + (if (even) 8 else 4) * m
      val trafSz = 8 + tfhdSz + trunSz
      val moofSz = 8 + 16 + trafSz
      val mdatSz = 8 + payloads.map(_.length).sum
      val bb = java.nio.ByteBuffer.allocate(moofSz + mdatSz)
      def fcc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
      def box(sz: Int, tp: String): Unit = { bb.putInt(sz); fcc(tp) }
      box(moofSz, "moof")
      box(16, "mfhd"); bb.putInt(0).putInt(f + 1) // sequence_number
      box(trafSz, "traf")
      if (even) { box(16, "tfhd"); bb.putInt(0x020000); bb.putInt(1) }
      else {
        box(20, "tfhd"); bb.putInt(0x020008); bb.putInt(1)
        bb.putInt(delta) // default_sample_duration
      }
      box(trunSz, "trun")
      bb.putInt(if (even) 0x000301 else 0x000201)
      bb.putInt(m).putInt(moofSz + 8) // data_offset → first mdat payload byte
      payloads.foreach { pl =>
        if (even) bb.putInt(delta)
        bb.putInt(pl.length)
      }
      box(mdatSz, "mdat")
      payloads.foreach(bb.put)
      require(bb.remaining() == 0,
        s"fmp4 fragment layout bug: ${bb.remaining()} bytes unwritten")
      bb.array()
    }
    val total = 24 + moov.length + fragBytes.map(_.length).sum
    val bb = java.nio.ByteBuffer.allocate(total)
    bb.putInt(24); bb.put("ftypisom".getBytes("US-ASCII")).putInt(0x200)
    bb.put("isommp41".getBytes("US-ASCII"))
    bb.put(moov)
    fragBytes.foreach(bb.put)
    require(bb.remaining() == 0,
      s"fmp4 layout bug: ${bb.remaining()} bytes unwritten")
    bb.array()
  }

  /** The fragmented layout's init moov: mvhd + one video trak whose
    * stbl tables are legally EMPTY (the samples live in the fragments)
    * + mvex/trex declaring the track's fragment defaults. Fixed 571
    * bytes. */
  private def fmp4MoovBytes(ts: Int): Array[Byte] = {
    val stsdSz = 102
    val stblSz = 8 + stsdSz + 16 + 20 + 16 + 16 // + empty stts/stsz/stsc/stco
    val minfSz = 8 + 20 + 36 + stblSz
    val mdiaSz = 8 + 32 + 33 + minfSz
    val trakSz = 8 + 92 + mdiaSz
    val mvexSz = 8 + 32
    val moovSz = 8 + 108 + trakSz + mvexSz
    val bb = java.nio.ByteBuffer.allocate(moovSz)
    def fcc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    def box(sz: Int, tp: String): Unit = { bb.putInt(sz); fcc(tp) }
    box(moovSz, "moov")
    box(108, "mvhd"); bb.putInt(0)
    bb.putInt(0).putInt(0).putInt(ts).putInt(0) // duration 0: lives in fragments
      .putInt(0x00010000).putShort(0x0100.toShort)
      .putShort(0).putLong(0L)
    Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(bb.putInt)
    (0 until 6).foreach(_ => bb.putInt(0))
    bb.putInt(2)
    box(trakSz, "trak")
    box(92, "tkhd"); bb.putInt(7)
    bb.putInt(0).putInt(0).putInt(1).putInt(0).putInt(0).putLong(0L)
      .putShort(0).putShort(0).putShort(0).putShort(0)
    Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(bb.putInt)
    bb.putInt(16 << 16).putInt(16 << 16)
    box(mdiaSz, "mdia")
    box(32, "mdhd"); bb.putInt(0)
    bb.putInt(0).putInt(0).putInt(ts).putInt(0)
      .putShort(0x55C4.toShort).putShort(0)
    box(33, "hdlr"); bb.putInt(0); bb.putInt(0); fcc("vide")
    (0 until 3).foreach(_ => bb.putInt(0)); bb.put(0.toByte)
    box(minfSz, "minf")
    box(20, "vmhd"); bb.putInt(1)
    bb.putShort(0); (0 until 3).foreach(_ => bb.putShort(0))
    box(36, "dinf"); box(28, "dref"); bb.putInt(0).putInt(1)
    box(12, "url "); bb.putInt(1)
    box(stblSz, "stbl")
    box(stsdSz, "stsd"); bb.putInt(0).putInt(1)
    box(86, "mp4v")
    (0 until 6).foreach(_ => bb.put(0.toByte)); bb.putShort(1)
    bb.putShort(0).putShort(0); (0 until 3).foreach(_ => bb.putInt(0))
    bb.putShort(16).putShort(16)
      .putInt(0x00480000).putInt(0x00480000)
      .putInt(0).putShort(1)
    (0 until 32).foreach(_ => bb.put(0.toByte))
    bb.putShort(24).putShort(-1)
    box(16, "stts"); bb.putInt(0).putInt(0)
    box(20, "stsz"); bb.putInt(0).putInt(0).putInt(0)
    box(16, "stsc"); bb.putInt(0).putInt(0)
    box(16, "stco"); bb.putInt(0).putInt(0)
    box(40, "mvex"); box(32, "trex"); bb.putInt(0)
    bb.putInt(1)      // track_ID
      .putInt(1)      // default_sample_description_index
      .putInt(0)      // default_sample_duration (fragments carry their own)
      .putInt(0)      // default_sample_size
      .putInt(0)      // default_sample_flags
    require(bb.remaining() == 0,
      s"fmp4 moov layout bug: ${bb.remaining()} bytes unwritten")
    bb.array()
  }

  /** id → a REAL playable-shape MP4 of REAL PNG frames: the frame-pack
    * / AVI clip re-encoded through [[buildMp4]] with each sample a
    * JDK-encoded PNG of the SAME frame formulas (synthFrameCount /
    * synthFrameImageId / synthDims / synthRgb) — the third container
    * grammar over one video, so the frame-formula oracle carries over
    * unchanged. */
  def encodeSyntheticMp4Video(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    val in = df.select(col(idCol).cast("long").as("media_id"))
    in.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val k = synthFrameCount(id)
        val frames = IndexedSeq.tabulate(k) { j =>
          val fid = synthFrameImageId(id, j)
          val (w, h) = synthDims(fid)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, synthRgb(fid, x, y)); x += 1 }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          bos.toByteArray
        }
        new GenericRowWithSchema(Array[Any](id,
          buildMp4(id, frames, ts = 25, delta = 1, gap = synthMp4Gap(id),
            faststart = false)), outSchema): Row
      }
    }(Encoders.row(outSchema))
  }

  /** REAL MP4 demux + frame sampling + decode: [[mp4SampleTable]]'s
    * resolved per-sample rows drive the payload fetch — samples with
    * index ≡ 0 (mod `stride`) are sliced straight out of mdat by their
    * resolved (offset, size) and pushed through the same real ImageIO
    * decode as the frame-pack and AVI walks. Output schema and
    * semantics identical to [[sampleFrames]]: decode cost ∝ SAMPLED
    * frames, honest truncation inherited from the sample-table walk
    * (a sample the table resolves is by construction fully present). */
  def sampleMp4Frames(df: DataFrame, contentCol: String, idCol: String,
                      stride: Int,
                      unresolvedCounter: Option[
                        org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false)))
    val in = df.select(col(idCol).cast("long").as("media_id"),
      col(contentCol).cast("binary").as("content"))
    in.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val tally = new MediaUnresolvedTally(unresolvedCounter, "sampleMp4Frames")
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        tally.walked(
          try mp4WalkOne(id, bytes, Mp4SampleTableSchema)
          catch { case _: IndexOutOfBoundsException => Nil }).iterator
          .filter(_.getLong(1) % stride == 0)
          .flatMap { s =>
            val off = s.getLong(2).toInt; val sz = s.getLong(3).toInt
            // a resolved sample can still be undecodable BYTES (the
            // codec's verdict, not the walker's) — data, so count+skip;
            // NonFatal because the JDK decoders throw RuntimeExceptions
            // on some fuzzed payloads, and this catch is scoped to
            // exactly the decode call (walker bugs live outside it)
            (try frameChannelSums(
              java.util.Arrays.copyOfRange(bytes, off, off + sz))
            catch {
              case _: java.io.IOException => tally.undecodable(); None
              case scala.util.control.NonFatal(_) =>
                tally.undecodable(); None
            })
              .map { case (w, h, sr, sg, sb) =>
                new GenericRowWithSchema(Array[Any](
                  id, s.getLong(1), w, h, sr, sg, sb), outSchema): Row
              }
          }
      } ++ tally.closeIter()
    }(Encoders.row(outSchema))
  }

  /** ISO-BMFF sample-table walk: resolves the five stbl tables of the
    * file's first video trak into one row per sample — media_id,
    * sample_idx, absolute byte offset, size, decode timestamp (stts
    * cumulative), sync flag (stss; a trak WITHOUT an stss box is
    * all-sync, per the spec), and the mdhd timescale the timestamps
    * are denominated in. Pure byte arithmetic in the mapPartitions
    * slot (big-endian reads, size-1 largesize and size-0 to-EOF
    * accepted at top level, stco and co64 both resolved, mdhd v0/v1
    * both read), no codec anywhere; 1:1 per clip, partition-parallel,
    * no shuffle — the metadata pass a 100 TB video corpus runs before
    * deciding which samples are worth fetching.
    *
    * Honest truncation, the AVI walk's discipline: a file whose moov
    * is damaged or incomplete yields NO rows (a partial sample table
    * cannot be trusted); an intact moov over a truncated mdat (the
    * interrupted progressive download — moov-first layouts) yields
    * exactly the leading samples whose payload bytes are fully
    * present, dropping the rest. Non-MP4 payloads yield no rows. */
  /** The resolved sample table's row shape — ONE definition, shared by
    * the metadata walk and the frame-fetch walk (their positional
    * field reads must agree with it). */
  private val Mp4SampleTableSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("sample_idx", LongType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("dts", LongType, nullable = false),
    StructField("is_sync", BooleanType, nullable = false),
    StructField("timescale", LongType, nullable = false)))

  def mp4SampleTable(df: DataFrame, contentCol: String, idCol: String,
                     unresolvedCounter: Option[
                       org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    val outSchema = Mp4SampleTableSchema
    val in = df.select(col(idCol).cast("long").as("media_id"),
      col(contentCol).cast("binary").as("content"))
    in.mapPartitions { it =>
      val tally = new MediaUnresolvedTally(unresolvedCounter, "mp4SampleTable")
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        tally.walked(
          try mp4WalkOne(id, bytes, outSchema)
          catch { case _: IndexOutOfBoundsException => Nil })
      } ++ tally.closeIter()
    }(Encoders.row(outSchema))
  }

  /** Big-endian box-walk helpers over ONE in-memory buffer — shared by
    * the whole-file walk ([[mp4WalkOne]]: buffer = the file) and the
    * ranged walk ([[mp4SampleTableRanged]]: buffer = just the moov
    * payload fetched by a positioned read). Positions are
    * buffer-relative; only the chunk offsets READ FROM the tables are
    * file-absolute, and those are bounded by the caller's
    * `payloadBound`, never by this buffer. */
  private final class Mp4Buf(val bb: java.nio.ByteBuffer) {
    def u32(pos: Long): Long = bb.getInt(pos.toInt).toLong & 0xFFFFFFFFL
    def u64(pos: Long): Long = bb.getLong(pos.toInt)
    def u8(pos: Long): Int = bb.get(pos.toInt) & 0xFF
    def fourcc(pos: Long): String = {
      val a = new Array[Byte](4)
      var i = 0
      while (i < 4) { a(i) = bb.get(pos.toInt + i); i += 1 }
      new String(a, "US-ASCII")
    }
    /** Children of [start, end) as (type, payloadStart, payloadEnd);
      * null on any malformed child (overrun, undersized header). */
    def children(start: Long, end: Long): Seq[(String, Long, Long)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
      var p = start
      while (p < end) {
        if (p + 8 > end) return null
        val sz0 = u32(p); val tp = fourcc(p + 4)
        val (payStart, boxEnd) =
          if (sz0 == 1L) {
            if (p + 16 > end) return null
            (p + 16, p + u64(p + 8))
          } else if (sz0 == 0L) (p + 8, end) // to end-of-enclosing
          else (p + 8, p + sz0)
        if (boxEnd < payStart || boxEnd > end) return null
        out += ((tp, payStart, boxEnd))
        p = boxEnd
      }
      out.toSeq
    }
    def child(cs: Seq[(String, Long, Long)],
              tp: String): Option[(Long, Long)] =
      Option(cs).flatMap(_.collectFirst { case (`tp`, s, e) => (s, e) })
  }

  /** Malformed-media accounting for the container walks, one instance per
    * partition: inputs that resolve to NO samples (non-MP4 bytes,
    * truncated or damaged tables, byte-access overruns, vanished
    * files) are DATA — counted here, into the caller's accumulator
    * when given, and surfaced as one stderr line per non-clean
    * partition — while any other exception is a WALKER BUG and now
    * propagates to fail the query instead of vanishing into an empty
    * result (the catch blocks are narrowed to exactly the
    * byte-access/IO failure modes malformed data can cause). */
  private[pipeline] final class MediaUnresolvedTally(
      acc: Option[org.apache.spark.util.LongAccumulator],
      label: String) extends Serializable {
    private var unresolved = 0L
    private var badFrames = 0L
    def walked(rows: Seq[Row]): Seq[Row] = {
      if (rows.isEmpty) { unresolved += 1L; acc.foreach(_.add(1L)) }
      rows
    }
    def undecodable(): Unit = { badFrames += 1L; acc.foreach(_.add(1L)) }
    /** Append to the partition's row iterator: runs after exhaustion. */
    def closeIter(): Iterator[Row] = {
      if (unresolved > 0 || badFrames > 0)
        System.err.println(
          f"[graft] $label: $unresolved%,d payload(s) resolved to no " +
            f"samples and $badFrames%,d sampled frame(s) failed to decode " +
            "in this partition (non-MP4, truncated, or damaged bytes — " +
            "counted and skipped; a walker fault would fail the query)")
      Iterator.empty
    }
  }

  /** TEST-ONLY fault seam: invoked with the clip id at the top of every
    * [[mp4WalkOne]] call so specs can plant a walker fault and pin that
    * it FAILS the query (the narrowed catches must not swallow it).
    * No-op in production; only same-JVM (local-mode) tests can set it. */
  private[graft] object Mp4WalkFault {
    @volatile var inject: Long => Unit = _ => ()
  }

  /** One clip's resolved sample rows (or Nil) — see [[mp4SampleTable]]. */
  private def mp4WalkOne(id: Long, bytes: Array[Byte],
                         outSchema: StructType): Seq[Row] = {
    Mp4WalkFault.inject(id)
    val m = new Mp4Buf(java.nio.ByteBuffer.wrap(bytes)) // big-endian by default
    import m.{children, u32, u64, fourcc}
    if (bytes.length < 8) return Nil
    val top = children(0L, bytes.length.toLong)
    // a truncated or malformed top level may still hold a complete moov
    // box before the damage — scan what parsed; moov itself must be
    // intact (children() of its range returning null rejects it)
    val topBoxes =
      if (top != null) top
      else {
        // re-walk leniently: keep leading well-formed boxes only
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
        var p = 0L; var ok = true
        while (ok && p + 8 <= bytes.length) {
          val sz0 = u32(p); val tp = fourcc(p + 4)
          val (payStart, boxEnd) =
            if (sz0 == 1L) {
              if (p + 16 > bytes.length) (0L, -1L) else (p + 16, p + u64(p + 8))
            } else if (sz0 == 0L) (p + 8, bytes.length.toLong)
            else (p + 8, p + sz0)
          if (boxEnd < payStart || boxEnd > bytes.length) ok = false
          else { out += ((tp, payStart, boxEnd)); p = boxEnd }
        }
        out.toSeq
      }
    val moov = topBoxes.collectFirst { case ("moov", s, e) => (s, e) }
      .getOrElse(return Nil)
    mp4ResolveStbl(id, m, moov._1, moov._2, bytes.length.toLong, outSchema) match {
      case None => Nil
      case Some((rows, ts)) =>
        if (rows.nonEmpty) rows
        else {
          // a legally empty stbl is the FRAGMENTED layout's signature:
          // the samples live in moof/traf/trun fragments after moov.
          // Box STARTS are re-derived exactly from the walk order (a
          // box starts where its predecessor ends) — `payStart - 8`
          // would be wrong by 8 for a largesize moof header and shift
          // every default-base-is-moof offset silently
          var prevEnd = 0L
          val moofs = topBoxes.flatMap { case (tp, ps, pe) =>
            val boxStart = prevEnd
            prevEnd = pe
            if (tp == "moof") Some((m, ps, pe, boxStart)) else None
          }
          if (moofs.isEmpty) rows
          else mp4ResolveMoofs(id, moofs, ts, bytes.length.toLong, outSchema)
        }
    }
  }

  /** Resolve sample rows from a run of movie fragments (fMP4 — the
    * DASH/HLS streaming layout: an empty-stbl moov up front, then
    * moof/traf/trun boxes carrying per-fragment sample tables with the
    * payload in each fragment's mdat). Subset implemented, stated
    * plainly: one traf + one trun per moof; base offset from
    * base-data-offset when present, else the moof's own start (the
    * default-base-is-moof convention — compact box headers assumed);
    * per-sample duration/size from trun entries or tfhd defaults
    * (trex-level defaults are OUT of the subset — a fragment relying
    * on them resolves to nothing rather than guessing); sync = each
    * fragment's leading sample (keyframe-aligned fragmentation, the
    * reason fragment boundaries exist). dts and sample_idx accumulate
    * ACROSS fragments. Honest truncation at fragment granularity: a
    * damaged fragment stops the walk keeping all prior fragments'
    * samples, and a truncated mdat keeps exactly the leading samples
    * whose payload is fully present.
    *
    * Each entry of `moofs`: (buffer, payloadStart, payloadEnd,
    * absolute moof box offset) — the in-memory walk passes the
    * whole-file buffer with payload spans inside it; the ranged walk
    * passes one fetched buffer per moof. */
  private def mp4ResolveMoofs(id: Long,
                              moofs: Seq[(Mp4Buf, Long, Long, Long)],
                              timescale: Long, payloadBound: Long,
                              outSchema: StructType): Seq[Row] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    var sampleIdx = 0L
    var dts = 0L
    moofs.foreach { case (m, payS, payE, moofStart) =>
      import m.{children, child, u32}
      val kids = children(payS, payE)
      if (kids == null) return out.toSeq
      val traf = child(kids, "traf").getOrElse(return out.toSeq)
      val tkids = children(traf._1, traf._2)
      if (tkids == null) return out.toSeq
      val tfhd = child(tkids, "tfhd").getOrElse(return out.toSeq)
      if (tfhd._2 - tfhd._1 < 8) return out.toSeq
      val tfFlags = u32(tfhd._1) & 0xFFFFFFL
      var p = tfhd._1 + 8 // version/flags + track_ID
      var base = moofStart // default-base-is-moof and the spec default alike
      if ((tfFlags & 0x1) != 0) {
        if (p + 8 > tfhd._2) return out.toSeq
        base = m.u64(p); p += 8
      }
      if ((tfFlags & 0x2) != 0) p += 4 // sample_description_index
      val defDur =
        if ((tfFlags & 0x8) != 0) {
          if (p + 4 > tfhd._2) return out.toSeq
          val v = u32(p); p += 4; v
        } else -1L
      val defSize =
        if ((tfFlags & 0x10) != 0) {
          if (p + 4 > tfhd._2) return out.toSeq
          val v = u32(p); p += 4; v
        } else -1L
      val trun = child(tkids, "trun").getOrElse(return out.toSeq)
      if (trun._2 - trun._1 < 8) return out.toSeq
      val trFlags = u32(trun._1) & 0xFFFFFFL
      val n = u32(trun._1 + 4).toInt
      if (n < 0 || n > (1 << 26)) return out.toSeq
      var q = trun._1 + 8
      var off = base
      if ((trFlags & 0x1) != 0) {
        if (q + 4 > trun._2) return out.toSeq
        off = base + u32(q).toInt; q += 4 // data_offset is SIGNED 32-bit
      }
      if ((trFlags & 0x4) != 0) q += 4 // first_sample_flags (sync stays fragment-leading)
      val entry = (if ((trFlags & 0x100) != 0) 4 else 0) +
        (if ((trFlags & 0x200) != 0) 4 else 0) +
        (if ((trFlags & 0x400) != 0) 4 else 0) +
        (if ((trFlags & 0x800) != 0) 4 else 0)
      if (q + entry.toLong * n > trun._2) return out.toSeq
      var j = 0
      while (j < n) {
        var r = q + entry.toLong * j
        val dur =
          if ((trFlags & 0x100) != 0) { val v = u32(r); r += 4; v } else defDur
        val sz =
          if ((trFlags & 0x200) != 0) { val v = u32(r); r += 4; v } else defSize
        // no per-sample value and no tfhd default: trex defaults are out
        // of the subset — refuse the fragment rather than guess
        if (dur < 0 || sz < 0) return out.toSeq
        if (off < 0 || off > payloadBound - sz) return out.toSeq
        out += new GenericRowWithSchema(Array[Any](
          id, sampleIdx, off, sz, dts, j == 0, timescale), outSchema)
        off += sz; dts += dur; sampleIdx += 1
        j += 1
      }
    }
    out.toSeq
  }

  /** Resolve the first video trak's sample table from a moov payload at
    * [moovS, moovE) inside `m`'s buffer. `payloadBound` is the length
    * of the FILE the chunk offsets address — the buffer itself for the
    * in-memory walk, the on-disk file length for the ranged walk (where
    * the buffer holds only moov) — and bounds both the honest-truncation
    * emit check and the uniform-stsz allocation plausibility guard.
    * Returns None when the moov is damaged or has no video trak;
    * Some((rows, timescale)) otherwise — rows EMPTY for a fragmented
    * (fMP4) moov whose stbl tables are legally zero-length, which is
    * the callers' cue to walk the moof boxes instead. */
  private def mp4ResolveStbl(id: Long, m: Mp4Buf, moovS: Long, moovE: Long,
                             payloadBound: Long,
                             outSchema: StructType)
      : Option[(Seq[Row], Long)] = {
    import m.{children, child, u32, u64, fourcc}
    val moovKids = children(moovS, moovE)
    if (moovKids == null) return None
    // first trak whose handler is video
    val trak = moovKids.collect { case ("trak", s, e) => (s, e) }
      .find { case (s, e) =>
        val t = for {
          md <- child(children(s, e), "mdia")
          h <- child(children(md._1, md._2), "hdlr")
        } yield fourcc(h._1 + 8) // after version/flags + pre_defined
        t.contains("vide")
      }.getOrElse(return None)
    val mdia = child(children(trak._1, trak._2), "mdia").getOrElse(return None)
    val mdiaKids = children(mdia._1, mdia._2)
    if (mdiaKids == null) return None
    val mdhd = child(mdiaKids, "mdhd").getOrElse(return None)
    val mdhdVersion = m.u8(mdhd._1)
    val timescale =
      if (mdhdVersion == 1) u32(mdhd._1 + 20) else u32(mdhd._1 + 12)
    val minf = child(mdiaKids, "minf").getOrElse(return None)
    val stbl = child(children(minf._1, minf._2), "stbl").getOrElse(return None)
    val stblKids = children(stbl._1, stbl._2)
    if (stblKids == null) return None
    // stsz: per-sample sizes (or the uniform sample_size shortcut)
    val stsz = child(stblKids, "stsz").getOrElse(return None)
    val uniform = u32(stsz._1 + 4)
    val nSamples = u32(stsz._1 + 8).toInt
    if (nSamples < 0 || (uniform == 0 && stsz._1 + 12 + 4L * nSamples > stsz._2))
      return None
    // Plausibility bounds BEFORE allocating nSamples-sized arrays: with a
    // uniform sample size the declared samples must fit the addressed
    // payload (a corrupt header claiming ~2^31 samples would otherwise
    // drive a multi-GB allocation whose OutOfMemoryError — an Error, not
    // an Exception — escapes the callers' parse-failure handling and
    // kills the executor). uniform == 0 is already bounded by the stsz
    // box extent above, itself inside the buffer. The payload bound
    // alone is NOT enough on the ranged path, where payloadBound is a
    // file length that can dwarf any sane sample count (a >2 GB file
    // claiming 2^31 uniform-size-1 samples passes it and still
    // allocates ~34 GB of per-sample arrays) — so a flat cap rejects
    // counts no real video reaches (2^26 ≈ 67M samples ≈ 12 days at
    // 60 fps) as corrupt.
    if (nSamples > (1 << 26)) return None
    if (uniform != 0 && nSamples.toLong * math.max(uniform, 1L) > payloadBound)
      return None
    val sizes = Array.tabulate(nSamples)(i =>
      if (uniform != 0) uniform else u32(stsz._1 + 12 + 4L * i))
    // stts: run-length (count, delta) -> cumulative dts
    val stts = child(stblKids, "stts").getOrElse(return None)
    val nRuns = u32(stts._1 + 4).toInt
    if (nRuns < 0 || stts._1 + 8 + 8L * nRuns > stts._2) return None
    val dts = new Array[Long](nSamples)
    var si = 0; var t = 0L; var run = 0
    while (run < nRuns && si < nSamples) {
      val cnt = u32(stts._1 + 8 + 8L * run)
      val d = u32(stts._1 + 8 + 8L * run + 4)
      var c = 0L
      while (c < cnt && si < nSamples) { dts(si) = t; t += d; si += 1; c += 1 }
      run += 1
    }
    if (si < nSamples) return None // timing table shorter than the sample count
    // stss: 1-based sync samples; ABSENT means all-sync (spec default)
    val sync: Int => Boolean = child(stblKids, "stss") match {
      case None => _ => true
      case Some((s, e)) =>
        // n < 0 (wrapped u32 count) must REJECT the table, not silently
        // report every sample non-sync via an empty (0 until n) range —
        // same convention as the nSamples guard above.
        val n = u32(s + 4).toInt
        if (n < 0 || s + 8 + 4L * n > e) return None
        val set = (0 until n).map(i => u32(s + 8 + 4L * i)).toSet
        i => set.contains(i + 1L)
    }
    // chunk offsets: stco (32-bit) or co64 (64-bit)
    val chunkOffs: Array[Long] = child(stblKids, "stco") match {
      case Some((s, e)) =>
        val n = u32(s + 4).toInt
        if (n < 0 || s + 8 + 4L * n > e) return None
        Array.tabulate(n)(i => u32(s + 8 + 4L * i))
      case None => child(stblKids, "co64") match {
        case Some((s, e)) =>
          val n = u32(s + 4).toInt
          if (n < 0 || s + 8 + 8L * n > e) return None
          Array.tabulate(n)(i => u64(s + 8 + 8L * i))
        case None => return None
      }
    }
    // stsc: (first_chunk, samples_per_chunk) runs -> per-chunk counts
    val stsc = child(stblKids, "stsc").getOrElse(return None)
    val nScRuns = u32(stsc._1 + 4).toInt
    if (nScRuns < 0 || stsc._1 + 8 + 12L * nScRuns > stsc._2) return None
    val scRuns = Array.tabulate(nScRuns)(i =>
      (u32(stsc._1 + 8 + 12L * i), u32(stsc._1 + 8 + 12L * i + 4)))
    // resolve: walk chunks in order, spending samples per the active
    // stsc run; emit while the payload is fully inside the buffer
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    var sample = 0; var chunk = 0; var scIdx = 0
    while (sample < nSamples && chunk < chunkOffs.length) {
      while (scIdx + 1 < nScRuns && scRuns(scIdx + 1)._1 <= chunk + 1) scIdx += 1
      val spc = scRuns(scIdx)._2
      var within = 0L; var off = chunkOffs(chunk)
      while (within < spc && sample < nSamples) {
        val sz = sizes(sample)
        // overflow-safe payload-in-buffer check: co64 offsets are read as
        // signed u64, so a near-Long.MaxValue (or negative) chunk offset
        // would make off + sz wrap negative and slip past a naive
        // `off + sz > payloadBound` comparison
        if (off < 0 || sz < 0 || off > payloadBound - sz)
          return Some((out.toSeq, timescale)) // truncated payload: keep complete leading samples
        out += new GenericRowWithSchema(Array[Any](
          id, sample.toLong, off, sz, dts(sample), sync(sample),
          timescale), outSchema)
        off += sz; sample += 1; within += 1
      }
      chunk += 1
    }
    Some((out.toSeq, timescale))
  }

  // ---- Ranged media reads (no whole-file materialization) ----------------
  //
  // `readBinaryDir` is one-file-one-row: it hard-fails above the
  // binaryFile source's ~2.1 GB ceiling and turns multi-GB clips into
  // multi-GB single rows. The walks above already resolve exact
  // per-sample (offset, size); this path exploits that: list files
  // WITHOUT reading content, then per file (a) walk top-level box
  // headers via positioned 16-byte reads, (b) fetch ONLY the moov
  // payload, (c) resolve the sample table against the FILE length, and
  // (d) for frame sampling, fetch only the sampled byte ranges. Bytes
  // read per file = moov + sampled payloads, independent of file size —
  // on HDFS/S3A positioned reads become ranged GETs, so a 100 TB video
  // crawl pays for metadata + the frames it keeps, nothing else.

  /** Resolve one file's sample table from ranged reads only: top-level
    * headers by positioned read, then the moov payload (rejected above
    * `maxMoovBytes` — the allocation guard the whole-file path gets
    * from the source's own ceiling). Same leniency as [[mp4WalkOne]]:
    * leading well-formed top-level boxes only. */
  private def mp4ResolveRanged(in: org.apache.hadoop.fs.FSDataInputStream,
                               fileLen: Long, id: Long, maxMoovBytes: Long,
                               outSchema: StructType): Seq[Row] = {
    Mp4WalkFault.inject(id)
    val hdr = new Array[Byte](16)
    def be32(o: Int): Long =
      ((hdr(o) & 0xFFL) << 24) | ((hdr(o + 1) & 0xFFL) << 16) |
        ((hdr(o + 2) & 0xFFL) << 8) | (hdr(o + 3) & 0xFFL)
    def be64(o: Int): Long = {
      var v = 0L; var i = 0
      while (i < 8) { v = (v << 8) | (hdr(o + i) & 0xFFL); i += 1 }
      v
    }
    // full top-level header walk by positioned reads: (type, payS, payE)
    // of every leading well-formed box — moov for the sample tables,
    // moof runs for the fragmented layout
    val boxes =
      scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Long)]
    var p = 0L
    var walking = true
    while (walking && p + 8 <= fileLen) {
      val want = math.min(16L, fileLen - p).toInt
      in.readFully(p, hdr, 0, want)
      val sz0 = be32(0)
      val tp = new String(hdr, 4, 4, "US-ASCII")
      val (payStart, boxEnd) =
        if (sz0 == 1L) {
          if (want < 16) { walking = false; (0L, -1L) }
          else (p + 16, p + be64(8))
        } else if (sz0 == 0L) (p + 8, fileLen)
        else (p + 8, p + sz0)
      if (!walking || boxEnd < payStart || boxEnd > fileLen)
        walking = false // keep leading well-formed boxes only
      else { boxes += ((tp, payStart, boxEnd, p)); p = boxEnd }
    }
    val (moovPay, moovEnd) = boxes
      .collectFirst { case ("moov", ps, pe, _) => (ps, pe) }
      .getOrElse(return Nil)
    val mSz = moovEnd - moovPay
    if (mSz < 8 || mSz > maxMoovBytes || mSz > Int.MaxValue - 16) return Nil
    val buf = new Array[Byte](mSz.toInt)
    in.readFully(moovPay, buf, 0, mSz.toInt)
    mp4ResolveStbl(id, new Mp4Buf(java.nio.ByteBuffer.wrap(buf)),
      0L, mSz, fileLen, outSchema) match {
      case None => Nil
      case Some((rows, ts)) =>
        if (rows.nonEmpty) rows
        else {
          // fragmented layout: fetch ONLY each moof's payload (tiny —
          // the per-fragment tables), never the mdat between them; the
          // moov cap doubles as the per-moof allocation guard, and an
          // out-of-bounds moof STOPS the collection (prefix truncation
          // — skipping it and continuing would emit later fragments
          // with shifted sample_idx/dts, silently diverging from the
          // in-memory walk)
          val moofs =
            scala.collection.mutable.ArrayBuffer.empty[(Mp4Buf, Long, Long, Long)]
          var stop = false
          boxes.foreach {
            case ("moof", ps, pe, boxStart) if !stop =>
              if (pe - ps < 8 || pe - ps > maxMoovBytes ||
                pe - ps > Int.MaxValue - 16) stop = true
              else {
                val fb = new Array[Byte]((pe - ps).toInt)
                in.readFully(ps, fb, 0, fb.length)
                moofs += ((new Mp4Buf(java.nio.ByteBuffer.wrap(fb)),
                  0L, pe - ps, boxStart))
              }
            case _ => ()
          }
          if (moofs.isEmpty) rows
          else mp4ResolveMoofs(id, moofs.toSeq, ts, fileLen, outSchema)
        }
    }
  }

  /** [[mp4SampleTable]] over ON-DISK files via ranged reads: input is
    * (id, path) rows — e.g. `TableSources.listBinaryDir` plus an id
    * parsed from the filename — and per file only the top-level box
    * headers and the moov payload are ever fetched, so there is NO file
    * size ceiling and no whole-file row. Output schema and semantics
    * identical to [[mp4SampleTable]] (offsets are file-absolute in both;
    * honest truncation bounds against the on-disk length). Files that
    * vanish or error mid-read resolve to no rows, like non-MP4 bytes. */
  def mp4SampleTableRanged(files: DataFrame, pathCol: String, idCol: String,
                           maxMoovBytes: Long = 256L << 20,
                           unresolvedCounter: Option[
                             org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    val outSchema = Mp4SampleTableSchema
    val bconf = files.sparkSession.sparkContext.broadcast(
      new graft.sources.SerializableHadoopConf(
        files.sparkSession.sparkContext.hadoopConfiguration))
    val in = files.select(col(idCol).cast("long").as("media_id"),
      col(pathCol).cast("string").as("p"))
    in.mapPartitions { it =>
      val conf = bconf.value.value
      val tally = new MediaUnresolvedTally(unresolvedCounter,
        "mp4SampleTableRanged")
      it.flatMap { r =>
        val id = r.getLong(0)
        tally.walked(
          try {
            val path = new org.apache.hadoop.fs.Path(r.getString(1))
            val fs = path.getFileSystem(conf)
            val len = fs.getFileStatus(path).getLen
            val s = fs.open(path)
            try mp4ResolveRanged(s, len, id, maxMoovBytes, outSchema)
            finally (try s.close() catch { case _: java.io.IOException => () })
          } catch {
            // bad/vanished paths and byte overruns are data, not bugs
            case _: java.io.IOException => Nil
            case _: IndexOutOfBoundsException => Nil
            case _: IllegalArgumentException => Nil
          })
      } ++ tally.closeIter()
    }(Encoders.row(outSchema))
  }

  /** [[sampleAviFrames]] over ON-DISK files via ranged reads — the
    * RIFF twin of [[sampleMp4FramesRanged]], with the honest
    * container contrast stated: AVI has no sample table, so the walk
    * must still HOP every chunk header (one 8-byte positioned read per
    * chunk — O(chunks) round-trips where MP4 pays one moov fetch), but
    * payload bytes are fetched ONLY for the stride-kept '00dc' frames,
    * so the dominant cost of a frame-heavy clip still scales with
    * frames KEPT, and there is no file-size ceiling and no whole-file
    * row. Semantics mirror the in-memory walk exactly (same skip/pad
    * grammar, same honest truncation, same whole-clip abort on an
    * undecodable frame), so the two forms share oracles verbatim. */
  /** RIFF '00dc' frame TABLE off on-disk files by header hops alone —
    * (media_id, frame_idx, offset, size) with payload bytes untouched:
    * the table-then-fetch split the other containers already have,
    * giving AVI a phase-1 for [[sampleAviFramesRangedParallel]]. RIFF
    * interleaves chunk headers with payload (no central sample table),
    * so resolving the table is O(chunks) 8-byte hops — the honest RIFF
    * property — but the hops never read frame bytes. Same truncation
    * discipline as the one-phase walk (a cut chunk ends the file's
    * table keeping prior frames). */
  def aviFrameTableRanged(files: DataFrame, pathCol: String, idCol: String,
                          unresolvedCounter: Option[
                            org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("offset", LongType, nullable = false),
      StructField("size", LongType, nullable = false)))
    val bconf = files.sparkSession.sparkContext.broadcast(
      new graft.sources.SerializableHadoopConf(
        files.sparkSession.sparkContext.hadoopConfiguration))
    val in = files.select(col(idCol).cast("long").as("media_id"),
      col(pathCol).cast("string").as("p"))
    in.mapPartitions { it =>
      val conf = bconf.value.value
      val tally = new MediaUnresolvedTally(unresolvedCounter,
        "aviFrameTableRanged")
      it.flatMap { r =>
        val id = r.getLong(0)
        tally.walked(try {
          val path = new org.apache.hadoop.fs.Path(r.getString(1))
          val fs = path.getFileSystem(conf)
          val fileLen = fs.getFileStatus(path).getLen
          val s = fs.open(path)
          try aviTableWalk(s, fileLen, id, outSchema)
          finally (try s.close() catch { case _: java.io.IOException => () })
        } catch {
          case _: java.io.IOException => Nil
          case _: IllegalArgumentException => Nil
          case _: IndexOutOfBoundsException => Nil
        })
      } ++ tally.closeIter()
    }(Encoders.row(outSchema))
  }

  /** [[sampleAviFramesRanged]] with INTRA-FILE parallelism — the RIFF
    * edition of the two-phase decode: [[aviFrameTableRanged]] resolves
    * the frame table per file (headers only), then the kept frames go
    * through the shared range-partitioned fetch+decode core. */
  def sampleAviFramesRangedParallel(files: DataFrame, pathCol: String,
                                    idCol: String, stride: Int,
                                    unresolvedCounter: Option[
                                      org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    rangedFrameDecodeCore(files, pathCol, idCol,
      "sampleAviFramesRangedParallel", unresolvedCounter) {
      aviFrameTableRanged(files, pathCol, idCol, unresolvedCounter)
        .filter(col("frame_idx") % stride === 0)
        .select(col("media_id"), col("frame_idx"), col("offset"),
          col("size"))
    }
  }

  def sampleAviFramesRanged(files: DataFrame, pathCol: String, idCol: String,
                            stride: Int,
                            unresolvedCounter: Option[
                              org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false)))
    val bconf = files.sparkSession.sparkContext.broadcast(
      new graft.sources.SerializableHadoopConf(
        files.sparkSession.sparkContext.hadoopConfiguration))
    val in = files.select(col(idCol).cast("long").as("media_id"),
      col(pathCol).cast("string").as("p"))
    in.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val conf = bconf.value.value
      val tally = new MediaUnresolvedTally(unresolvedCounter,
        "sampleAviFramesRanged")
      it.flatMap { r =>
        val id = r.getLong(0)
        tally.walked(try {
          val path = new org.apache.hadoop.fs.Path(r.getString(1))
          val fs = path.getFileSystem(conf)
          val fileLen = fs.getFileStatus(path).getLen
          val s = fs.open(path)
          try aviRangedWalk(s, fileLen, id, stride, outSchema)
          finally (try s.close() catch { case _: java.io.IOException => () })
        } catch {
          case _: java.io.IOException => Nil
          case _: IllegalArgumentException => Nil
          case _: IndexOutOfBoundsException => Nil
        })
      } ++ tally.closeIter()
    }(Encoders.row(outSchema))
  }

  /** One file's ranged RIFF/AVI walk — see [[sampleAviFramesRanged]];
    * every bound mirrors the in-memory walk with `fileLen` standing in
    * for the buffer length. */
  /** The header-hop loop of [[aviRangedWalk]] emitting the '00dc'
    * frame TABLE instead of decoding — payload bytes never read. Kept
    * separate from the decoding walk (not parameterized) because the
    * two differ in exactly the hot line and a merged form would hide
    * which one reads payloads. */
  private def aviTableWalk(s: org.apache.hadoop.fs.FSDataInputStream,
                           fileLen: Long, id: Long,
                           outSchema: StructType): Seq[Row] = {
    val hdr = new Array[Byte](12)
    def le32(o: Int): Int =
      (hdr(o) & 0xFF) | ((hdr(o + 1) & 0xFF) << 8) |
        ((hdr(o + 2) & 0xFF) << 16) | ((hdr(o + 3) & 0xFF) << 24)
    def cc(o: Int, want: String): Boolean = {
      var i = 0
      while (i < 4) { if (hdr(o + i) != want.charAt(i).toByte) return false; i += 1 }
      true
    }
    require(fileLen >= 12)
    s.readFully(0L, hdr, 0, 12)
    require(cc(0, "RIFF")) // riff size at 4 intentionally untrusted
    require(cc(8, "AVI "))
    var p = 12L
    var moviStart = -1L; var moviEnd = -1L
    var corrupt = false
    while (moviEnd < 0 && !corrupt && p + 8 <= fileLen) {
      s.readFully(p, hdr, 0, 8)
      val size = le32(4)
      if (size < 0) corrupt = true
      else if (cc(0, "LIST") && size >= 4 && p + 12 <= fileLen) {
        s.readFully(p + 8, hdr, 8, 4)
        if (cc(8, "movi")) {
          moviStart = p + 12
          moviEnd = math.min(p + 12 + (size - 4), fileLen)
        } else if (p + 8 + size + (size & 1) > fileLen) corrupt = true
        else p = p + 8 + size + (size & 1)
      } else if (p + 8 + size + (size & 1) > fileLen) corrupt = true
      else p = p + 8 + size + (size & 1)
    }
    if (moviEnd < 0 || corrupt) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    var q = moviStart
    var j = 0L
    var intact = true
    while (intact && q + 8 <= moviEnd) {
      s.readFully(q, hdr, 0, 8)
      val len = le32(4)
      val body = q + 8
      if (len < 0 || body + len > moviEnd || len > fileLen - body) {
        intact = false // truncated tail: keep the table so far
      } else if (cc(0, "00dc")) {
        out += new GenericRowWithSchema(
          Array[Any](id, j, body, len.toLong), outSchema)
        q = body + len
        if ((len & 1) != 0 && q < fileLen) q += 1
        j += 1
      } else {
        val next = body + len + (len & 1)
        if (next > fileLen) intact = false
        else q = next
      }
    }
    out.toSeq
  }

  private def aviRangedWalk(s: org.apache.hadoop.fs.FSDataInputStream,
                            fileLen: Long, id: Long, stride: Int,
                            outSchema: StructType): Seq[Row] = {
    val hdr = new Array[Byte](12)
    def le32(o: Int): Int =
      (hdr(o) & 0xFF) | ((hdr(o + 1) & 0xFF) << 8) |
        ((hdr(o + 2) & 0xFF) << 16) | ((hdr(o + 3) & 0xFF) << 24)
    def cc(o: Int, want: String): Boolean = {
      var i = 0
      while (i < 4) { if (hdr(o + i) != want.charAt(i).toByte) return false; i += 1 }
      true
    }
    require(fileLen >= 12)
    s.readFully(0L, hdr, 0, 12)
    require(cc(0, "RIFF")) // riff size at 4 intentionally untrusted
    require(cc(8, "AVI "))
    var p = 12L
    var moviStart = -1L; var moviEnd = -1L
    var corrupt = false
    while (moviEnd < 0 && !corrupt && p + 8 <= fileLen) {
      s.readFully(p, hdr, 0, 8)
      val size = le32(4)
      if (size < 0) corrupt = true
      else if (cc(0, "LIST") && size >= 4 && p + 12 <= fileLen) {
        s.readFully(p + 8, hdr, 8, 4)
        if (cc(8, "movi")) {
          moviStart = p + 12
          moviEnd = math.min(p + 12 + (size - 4), fileLen)
        } else if (p + 8 + size + (size & 1) > fileLen) corrupt = true
        else p = p + 8 + size + (size & 1)
      } else if (p + 8 + size + (size & 1) > fileLen) corrupt = true
      else p = p + 8 + size + (size & 1)
    }
    if (moviEnd < 0 || corrupt) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    var q = moviStart
    var j = 0L
    var intact = true
    while (intact && q + 8 <= moviEnd) {
      s.readFully(q, hdr, 0, 8)
      val len = le32(4)
      val body = q + 8
      if (len < 0 || body + len > moviEnd || len > fileLen - body) {
        intact = false // truncated tail: keep what's decoded
      } else if (cc(0, "00dc")) {
        if (j % stride == 0) {
          val frame = new Array[Byte](len)
          s.readFully(body, frame, 0, len)
          frameChannelSums(frame).foreach { case (w, h, sr, sg, sb) =>
            out += new GenericRowWithSchema(
              Array[Any](id, j, w, h, sr, sg, sb), outSchema)
          }
        }
        q = body + len
        if ((len & 1) != 0 && q < fileLen) q += 1
        j += 1
      } else {
        val next = body + len + (len & 1)
        if (next > fileLen) intact = false
        else q = next
      }
    }
    out.toSeq
  }

  /** [[sampleMp4Frames]] over ON-DISK files via ranged reads: the moov
    * fetch resolves the table, stride keeps every `stride`-th sample,
    * and ONLY those samples' byte ranges are fetched and decoded —
    * bytes read ∝ moov + kept frames, independent of clip size. Output
    * schema and semantics identical to [[sampleMp4Frames]]. */
  /** [[sampleMp4FramesRanged]] with INTRA-FILE parallelism — the
    * decode-straggler fix: the one-phase form resolves AND decodes a
    * whole file inside one task, so a single ten-hour clip serializes
    * its decode while the cluster idles. This form splits the phases:
    * the (cheap, metadata-only) ranged sample-table resolve stays
    * per-file, then the KEPT sample rows — a narrow relation of
    * (id, frame_idx, offset, size) — are RANGE-partitioned on
    * (path, offset), so a clip dominating the kept set spreads its
    * frame fetches/decodes across tasks while every partition remains
    * a contiguous offset slice of one or a few files (stream reuse,
    * offset-ordered positioned reads). Output and error discipline are
    * identical to the one-phase form (per-frame accounting); the cost
    * is one narrow shuffle of the kept sample rows. */
  def sampleMp4FramesRangedParallel(files: DataFrame, pathCol: String,
                                    idCol: String, stride: Int,
                                    maxMoovBytes: Long = 256L << 20,
                                    unresolvedCounter: Option[
                                      org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    rangedFrameDecodeCore(files, pathCol, idCol,
      "sampleMp4FramesRangedParallel", unresolvedCounter) {
      mp4SampleTableRanged(files, pathCol, idCol, maxMoovBytes,
          unresolvedCounter)
        .filter(col("sample_idx") % stride === 0)
        .select(col("media_id"), col("sample_idx").as("frame_idx"),
          col("offset"), col("size"))
    }
  }

  /** The shared phase-2 engine behind the intra-file-parallel frame
    * decodes (MP4 and MKV): `keptBlocks` is the phase-1 resolver's
    * stride-kept NARROW relation of (media_id, frame_idx, offset,
    * size); this core joins it to paths (refusing duplicate ids —
    * the id-keyed join would fetch ranges from the wrong file), SEVERS
    * it (RangePartitioner's bounds-sampling job would otherwise
    * re-execute the whole phase-1 resolve, doubling positioned reads
    * and tallies), range-partitions on (path, offset) so one giant
    * clip's decodes spread across tasks while each partition stays a
    * contiguous offset slice (one reused stream), and fetches + REALLY
    * decodes each payload. Error discipline: open/read failures and
    * decode rejections count per frame; a RuntimeException OUTSIDE the
    * codec call is a walker/infra bug and fails the query. */
  private[pipeline] def rangedFrameDecodeCore(
      files: DataFrame, pathCol: String, idCol: String, label: String,
      unresolvedCounter: Option[org.apache.spark.util.LongAccumulator])(
      keptBlocks: => DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false)))
    val bconf = files.sparkSession.sparkContext.broadcast(
      new graft.sources.SerializableHadoopConf(
        files.sparkSession.sparkContext.hadoopConfiguration))
    val paths = files.select(col(idCol).cast("long").as("media_id"),
      col(pathCol).cast("string").as("p"))
    val dupIds = paths.groupBy(col("media_id")).count()
      .filter(col("count") > 1).limit(1).count()
    require(dupIds == 0L,
      s"$label: duplicate $idCol values in the file listing — phase-2 " +
        "fetches are keyed by id, so duplicates are ambiguous; " +
        "deduplicate the listing or use the one-phase form")
    val kept = graft.pipeline.Checkpoints.sever(
        keptBlocks.join(paths, "media_id"))
      .repartitionByRange(col("p"), col("offset"))
      .sortWithinPartitions(col("p"), col("offset"))
    kept.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val streams = new graft.sources.ReusedFsStream(bconf.value.value)
      val tally = new MediaUnresolvedTally(unresolvedCounter, label)
      it.flatMap { r =>
        val id = r.getLong(0)
        val frameIdx = r.getLong(1)
        val off = r.getLong(2)
        val szL = r.getLong(3)
        val p = r.getString(4)
        val frame =
          if (szL < 0 || szL > Int.MaxValue - 16) { tally.undecodable(); None }
          else try {
            val f = new Array[Byte](szL.toInt)
            streams.forPath(p).readFully(off, f, 0, f.length)
            Some(f)
          } catch {
            // open/read failures only — a RuntimeException here is a
            // walker/infra bug and must FAIL the query (one-phase parity)
            case _: java.io.IOException => tally.undecodable(); None
          }
        frame.flatMap { bytes =>
          try frameChannelSums(bytes)
          catch {
            case _: java.io.IOException => tally.undecodable(); None
            // JDK decoders throw RuntimeExceptions on fuzzed payloads —
            // scoped to the DECODE call only, that is the codec's data
            // verdict, not a walker bug
            case scala.util.control.NonFatal(_) =>
              tally.undecodable(); None
          }
        }.map { case (w, h, sr, sg, sb) =>
          new GenericRowWithSchema(Array[Any](
            id, frameIdx, w, h, sr, sg, sb), outSchema): Row
        }
      } ++ tally.closeIter()
    }(Encoders.row(outSchema))
  }

  def sampleMp4FramesRanged(files: DataFrame, pathCol: String, idCol: String,
                            stride: Int,
                            maxMoovBytes: Long = 256L << 20,
                            unresolvedCounter: Option[
                              org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("width", LongType, nullable = false),
      StructField("height", LongType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false)))
    val bconf = files.sparkSession.sparkContext.broadcast(
      new graft.sources.SerializableHadoopConf(
        files.sparkSession.sparkContext.hadoopConfiguration))
    val in = files.select(col(idCol).cast("long").as("media_id"),
      col(pathCol).cast("string").as("p"))
    in.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val conf = bconf.value.value
      val tally = new MediaUnresolvedTally(unresolvedCounter,
        "sampleMp4FramesRanged")
      it.flatMap { r =>
        val id = r.getLong(0)
        try {
          val path = new org.apache.hadoop.fs.Path(r.getString(1))
          val fs = path.getFileSystem(conf)
          val len = fs.getFileStatus(path).getLen
          val s = fs.open(path)
          try {
            tally.walked(
              mp4ResolveRanged(s, len, id, maxMoovBytes, Mp4SampleTableSchema))
              .filter(_.getLong(1) % stride == 0)
              .flatMap { sm =>
                val off = sm.getLong(2); val szL = sm.getLong(3)
                // the resolved size is only bounded by the FILE length
                // on this path — a corrupt >2 GB entry would wrap
                // .toInt negative and throw past the catches below
                (if (szL < 0 || szL > Int.MaxValue - 16) {
                  tally.undecodable(); None
                } else try {
                  val sz = szL.toInt
                  val frame = new Array[Byte](sz)
                  s.readFully(off, frame, 0, sz)
                  frameChannelSums(frame)
                } catch {
                  case _: java.io.IOException => tally.undecodable(); None
                  // the JDK decoders throw RuntimeExceptions on some
                  // fuzzed payloads — scoped to the decode call, that
                  // is the codec's data verdict, not a walker bug
                  case scala.util.control.NonFatal(_) =>
                    tally.undecodable(); None
                }).map { case (w, h, sr, sg, sb) =>
                  new GenericRowWithSchema(Array[Any](
                    id, sm.getLong(1), w, h, sr, sg, sb), outSchema): Row
                }
              }
          } finally (try s.close() catch { case _: java.io.IOException => () })
        } catch {
          case _: java.io.IOException => tally.walked(Nil)
          case _: IndexOutOfBoundsException => tally.walked(Nil)
          case _: IllegalArgumentException => tally.walked(Nil)
        }
      } ++ tally.closeIter()
    }(Encoders.row(outSchema))
  }

  /** REAL perceptual average-hash (aHash) over decoded images — the
    * image near-dup signature: the raster is average-pooled onto an
    * 8×8 cell grid (cell of pixel (x,y) is ((x·8)/w, (y·8)/h) —
    * integer division, so both engines agree on boundaries), and a
    * cell's bit is set iff its gray MEAN exceeds the image's global
    * gray mean, compared exactly by cross-multiplication
    * (v_cell·N > G·n_cell — no FP, no rounding; v·N ≤ 765·N² stays
    * under 2^63 up to ~100-megapixel rasters). gray = r+g+b (a sum,
    * not a weighted luma — division-free and engine-exact). The 64
    * bits ship as two bigint halves (ahash_a = cells 0..31 row-major,
    * ahash_b = 32..63) because a single 2^63 bit overflows DuckDB's
    * signed shift — and two exact halves group/join identically.
    * Re-encoded or slightly-retouched copies of an image keep their
    * hash (per-cell means move negligibly), so groupBy(ahash_a,
    * ahash_b) is the image analogue of exact text dedup, and a small
    * Hamming radius over the halves the analogue of SimHash.
    * Undecodable payloads → decode_ok = false, null hashes. 1:1,
    * partition-parallel, same row-strided decode economy as
    * [[decodeImageFeatures]]. */
  def imageAHash(df: DataFrame, contentCol: String, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("decode_ok", BooleanType, nullable = false),
      StructField("ahash_a", LongType, nullable = true),
      StructField("ahash_b", LongType, nullable = true)))
    val in = df.select(col(idCol).cast("long").as("media_id"),
      col(contentCol).cast("binary").as("content"))
    in.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case _: Exception => null }
        val vals: Array[Any] =
          if (img == null) Array[Any](id, false, null, null)
          else {
            val w = img.getWidth; val h = img.getHeight
            val v = new Array[Long](64)
            val n = new Array[Long](64)
            val rowBuf = new Array[Int](w)
            var g = 0L
            var y = 0
            while (y < h) {
              img.getRGB(0, y, w, 1, rowBuf, 0, w)
              val cj = y * 8 / h
              var x = 0
              while (x < w) {
                val p = rowBuf(x)
                val gray = ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
                val idx = cj * 8 + x * 8 / w
                v(idx) += gray; n(idx) += 1; g += gray
                x += 1
              }
              y += 1
            }
            val npx = w.toLong * h
            var a = 0L; var b = 0L
            var i = 0
            while (i < 64) {
              val bit = if (n(i) > 0 && v(i) * npx > g * n(i)) 1L else 0L
              if (i < 32) a |= bit << i else b |= bit << (i - 32)
              i += 1
            }
            Array[Any](id, true, a, b)
          }
        new GenericRowWithSchema(vals, outSchema): Row
      }
    }(Encoders.row(outSchema))
  }

  /** The `<img src alt>` tag pattern [[imageTextPairs]] mines — src
    * required, alt may be empty; same pattern semantics in Java regex
    * (Spark) and RE2 (DuckDB), so the miner carries an exact oracle. A
    * production system swaps its own HTML extractor in at this seam
    * (the [[TextOps.redactPii]] pattern-pack convention). */
  val ImgTagPattern: String = "<img src=\"([^\"]+)\" alt=\"([^\"]*)\"/>"

  /** Image-text PAIR MINING — the CLIP/LAION-style move (Schuhmann et
    * al., arXiv:2210.08402: mine (image, alt-text) training pairs from
    * a web crawl's `<img>` reference graph): extract every `<img src
    * alt>` tag from the crawled pages, fingerprint every fetched image
    * payload, and join the two on the image URI. Returns one row per
    * RESOLVED reference — (page_uri, img_uri, alt_text, ahash_a,
    * ahash_b); dangling references (no fetched image at that URI) and
    * undecodable payloads drop out of the inner join, exactly like a
    * real crawl's broken edges.
    *
    * `images` must carry a UNIQUE long id per image record (`imgIdCol`
    * — the fingerprint kernel's key) and a unique `imgUriCol` (a
    * duplicate URI would multiply every pair that references it).
    * Scale shape: tag extraction is map-only over the pages; the
    * fingerprint kernel is 1:1 over the images; the resolve join is
    * ONE equi-join on the URI — both sides corpus-proportional, AQE
    * handles the popular-image skew (a hot logo's URI is one key). */
  def imageTextPairs(pages: DataFrame, pageUriCol: String, htmlCol: String,
                     images: DataFrame, imgIdCol: String,
                     imgUriCol: String, contentCol: String): DataFrame = {
    val refs = pages.select(col(pageUriCol).as("page_uri"),
        regexp_extract_all(col(htmlCol), lit(ImgTagPattern), lit(1))
          .as("__srcs"),
        regexp_extract_all(col(htmlCol), lit(ImgTagPattern), lit(2))
          .as("__alts"))
      .select(col("page_uri"), col("__alts"),
        posexplode(col("__srcs")).as(Seq("__j", "img_uri")))
      .select(col("page_uri"), col("img_uri"),
        element_at(col("__alts"), col("__j") + 1).as("alt_text"))
    val fps = imageAHash(images, contentCol, imgIdCol)
      .filter(col("decode_ok"))
    val uris = images.select(col(imgIdCol).cast("long").as("media_id"),
      col(imgUriCol).as("img_uri"))
    val resolved = fps.join(uris, Seq("media_id"))
      .select(col("img_uri"), col("ahash_a"), col("ahash_b"))
    refs.join(resolved, Seq("img_uri"))
      .select(col("page_uri"), col("img_uri"), col("alt_text"),
        col("ahash_a"), col("ahash_b"))
  }

  /** The `bands` bit-chunks of a 64-bit aHash pair as an array column —
    * pigeonhole banding's key material, shared by the in-memory pair
    * join ([[ahashPairs]]) and the persisted fingerprint index. Chunks
    * are contiguous bit runs (bits = 64/bands ≤ 32 divides 32, so a
    * chunk never straddles the two halves). */
  private def ahashChunkArr(a: Column, b: Column, bands: Int): Column = {
    val bits = 64 / bands
    val mask = (1L << bits) - 1
    array((0 until bands).map { c =>
      val half = if (c * bits < 32) a else b
      shiftrightunsigned(half, (c * bits) % 32).bitwiseAND(lit(mask))
    }: _*)
  }

  /** Hamming-radius near-dup pairs over [[imageAHash]] hashes — the
    * SimHash-analogue small-radius screen for RETOUCHED images (exact
    * hash equality only catches re-encodes; a light edit flips a bit
    * or two). Pigeonhole banding, the [[DedupOps.simhashPairs]] trick
    * over the two bigint halves: the logical 64 bits split into
    * `bands` equal chunks; two hashes within `maxHamming` differing
    * bits agree exactly on at least one chunk (maxHamming < bands), so
    * candidates come from equi-joined (chunk_idx, chunk_val) buckets —
    * never an all-pairs compare — and the exact popcount distance
    * verifies each candidate. Output: (id_a, id_b, hamming) with
    * id_a < id_b, distance ≤ maxHamming; undecodable rows (null
    * hashes) never pair.
    *
    * Scale shape: one map-only chunk explode (bands rows per image),
    * one equi-join on the chunk buckets, exact verify inline — the
    * same linear-in-corpus, bucketed shape as every similarity screen
    * here. Degenerate buckets (e.g. the all-dark all-zero chunk) carry
    * the usual hot-bucket quadratic risk; cap them upstream by
    * exact-payload dedup first ([[queries.MultimodalQueries]] hashes
    * one row per DISTINCT payload, which is the batch economy that
    * matters). */
  def ahashPairs(hashed: DataFrame, idCol: String,
                 maxHamming: Int = 1, bands: Int = 4): DataFrame = {
    require(bands >= 2 && 64 % bands == 0,
      s"bands must be >= 2 and divide 64, got $bands")
    require(maxHamming >= 0 && maxHamming < bands,
      s"pigeonhole recall requires maxHamming < bands, got $maxHamming/$bands")
    val valid = hashed
      .filter(col("ahash_a").isNotNull && col("ahash_b").isNotNull)
      .select(col(idCol).as("__ah_id"), col("ahash_a"), col("ahash_b"))
    val chunks = valid.select(col("__ah_id"), col("ahash_a"), col("ahash_b"),
      posexplode(ahashChunkArr(col("ahash_a"), col("ahash_b"), bands))
        .as(Seq("chunk_idx", "chunk_val")))
    val x = chunks.as("x"); val y = chunks.as("y")
    x.join(y, col("x.chunk_idx") === col("y.chunk_idx") &&
        col("x.chunk_val") === col("y.chunk_val") &&
        col("x.__ah_id") < col("y.__ah_id"))
      .select(col("x.__ah_id").as("id_a"), col("y.__ah_id").as("id_b"),
        (bit_count(col("x.ahash_a").bitwiseXOR(col("y.ahash_a"))) +
          bit_count(col("x.ahash_b").bitwiseXOR(col("y.ahash_b"))))
          .cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Transitive duplicate classes over [[ahashPairs]]: connected
    * components (min-label), every input image labeled — singletons
    * are their own component. Output: (idCol, component). */
  def ahashDupComponents(hashed: DataFrame, idCol: String,
                         maxHamming: Int = 1, bands: Int = 4): DataFrame = {
    val pairs = ahashPairs(hashed, idCol, maxHamming, bands)
      .select(col("id_a"), col("id_b"))
      .persist()
    try {
      val labels = DedupOps.connectedComponents(pairs)
      val comp =
        try labels.localCheckpoint()
        finally labels.unpersist()
      hashed.select(col(idCol))
        .join(comp, col(idCol) === col("id"), "left")
        .select(col(idCol),
          coalesce(col("component"), col(idCol)).as("component"))
    } finally pairs.unpersist()
  }

  // ---- the PERSISTED media-fingerprint index (eleventh artifact) ---------

  /** Meta row: chunk-band geometry pin + bloom geometry + epoch
    * consistency pointer + covered-hash count (interrupted-append
    * detection, the minhash `sig_count` discipline) + the last applied
    * streaming batch id ([[ingestMediaHashBatch]]; -1 = never
    * stream-fed, batch-API appends leave it untouched). */
  private[graft] final case class MediaHashIndexMeta(
      bands: Int, bloomBits: Int, bloomHashes: Int, epoch: Long,
      hashCount: Long, lastBatchId: Long = -1L, hashBase: Long = 0L)

  private[graft] def mediaHashDerivedDir(path: String, epoch: Long): String =
    s"$path/derived/e$epoch"

  /** One fingerprint epoch's directory. The stored hashes live in
    * epoch'd subdirectories with a RANGE pointer ([hash_base, epoch] in
    * meta — the WARC index's layout): each append lands its delta as
    * ONE fresh immutable epoch dir instead of `mode("append")` file-sets
    * into a flat relation, so (a) a torn append's orphan rows are
    * INVISIBLE to readers (the window never covers an unswapped epoch)
    * and (b) compaction is an ordinary epoch commit — rewrite the
    * window's union as one file-set, re-base the pointer — with no
    * delete-and-rename of a live relation under racing probes. */
  private[graft] def mediaHashesDir(path: String, epoch: Long): String =
    s"$path/hashes/e$epoch"

  /** The index's visible fingerprint snapshot: the union of the meta
    * window's epoch dirs, resolved from ONE meta read — racing appends
    * or compactions never change what this snapshot covers (superseded
    * generations get one commit's grace before the janitor). */
  private[graft] def readStoredMediaHashes(
      spark: org.apache.spark.sql.SparkSession, path: String,
      meta: MediaHashIndexMeta): DataFrame =
    spark.read.parquet(
      (meta.hashBase to meta.epoch).map(mediaHashesDir(path, _)): _*)

  private def readMediaHashIndexMeta(
      spark: org.apache.spark.sql.SparkSession,
      path: String): MediaHashIndexMeta = {
    val r = MetaIO.readMetaRow(spark, path, "media-hash index", "index")
    MediaHashIndexMeta(r.getAs[Int]("bands"), r.getAs[Int]("bloom_bits"),
      r.getAs[Int]("bloom_hashes"), r.getAs[Long]("epoch"),
      r.getAs[Long]("hash_count"),
      // pre-streaming-format meta has no batch pointer: never-stream-fed
      if (r.schema.fieldNames.contains("last_batch_id"))
        r.getAs[Long]("last_batch_id")
      else -1L,
      // a meta with no hash_base is the PRE-round-16 FLAT layout
      // (fingerprints as loose part files, not epoch dirs) — a default
      // would send every read to hashes/e<N> paths that don't exist.
      // Refuse with the migration instead of a path error.
      if (r.schema.fieldNames.contains("hash_base"))
        r.getAs[Long]("hash_base")
      else throw new IllegalStateException(
        s"media-hash index at $path uses the legacy FLAT fingerprint " +
          "layout (no hash_base in meta); this build reads epoch'd " +
          "windows only — rebuild via writeMediaHashIndex, or migrate " +
          "by moving the loose files into hashes/e0 and adding " +
          "hash_base=0 to meta"))
  }

  private def swapMediaHashMeta(spark: org.apache.spark.sql.SparkSession,
                                path: String,
                                meta: MediaHashIndexMeta): Unit = {
    import spark.implicits._
    MetaIO.swapMetaRow(spark, path, "media-hash index",
      Seq((meta.bands, meta.bloomBits, meta.bloomHashes, meta.epoch,
          meta.hashCount, meta.lastBatchId, meta.hashBase))
        .toDF("bands", "bloom_bits", "bloom_hashes", "epoch", "hash_count",
          "last_batch_id", "hash_base"))
  }

  /** One bloom key per (chunk_idx, chunk_val) of each stored hash. */
  private def mediaHashChunkKeys(hashes: DataFrame, bands: Int): DataFrame =
    hashes.select(
        posexplode(ahashChunkArr(col("ahash_a"), col("ahash_b"), bands))
          .as(Seq("chunk_idx", "chunk_val")))
      .select(xxhash64(col("chunk_idx"), col("chunk_val")).as("__ck"))

  private def writeMediaHashBloom(spark: org.apache.spark.sql.SparkSession,
                                  bits: Array[Long], dir: String): Unit =
    MetaIO.writeBloomWords(spark, bits, s"$dir/bloom")

  private def readMediaHashBloom(spark: org.apache.spark.sql.SparkSession,
                                 path: String,
                                 meta: MediaHashIndexMeta): Array[Long] =
    MetaIO.readBloomWords(spark,
      s"${mediaHashDerivedDir(path, meta.epoch)}/bloom", meta.bloomBits)

  /** Build the PERSISTED media-fingerprint index — perceptual image
    * dedup's stored form, completing the family the text side already
    * has (exact-digest, MinHash, decontamination indexes): a crawl's
    * images are aHashed ONCE, the fingerprints persist, and every
    * later segment dedups against all of history at probe cost.
    * Layout (the shared artifact discipline):
    *
    *   - `path/hashes/e<N>` — (id, ahash_a, ahash_b) epoch dirs under
    *     a RANGE pointer ([hash_base, epoch] in meta, the WARC index's
    *     layout): one immutable delta dir per append, re-based by
    *     [[compactMediaHashIndex]]. Three longs per image — 10^10
    *     images ≈ 240 GB, scanned only by the candidate-verify join;
    *   - `path/derived/e<N>/bloom` — the bitmap over the chunk-band
    *     keys of every stored hash (OR-idempotent, so appends
    *     delta-merge it); probes prescreen map-side against it, so a
    *     mostly-novel segment never shuffles;
    *   - `path/meta` — geometry pin (bands, bloom) + epoch pointer +
    *     hash_count (torn-append self-heal signature).
    *
    * UNDECODABLE payloads carry no fingerprint and are excluded (the
    * imageAHash `decode_ok = false` rows) — they can't near-dup by
    * pixels; route them through exact-digest dedup instead.
    *
    * Geometry at scale: pick `bands` = maxHamming + 1, the MINIMUM
    * that preserves pigeonhole recall — each extra band halves the
    * chunk width and squares the accidental-collision rate (16-bit
    * chunks birthday-collide brutally at web scale: 10^10 images over
    * 2^16 values is ~150k ids per chunk value, all candidates). The
    * default serves the default probe radius of 1: two 32-bit chunks.
    * A hot chunk value only costs verify time (the Hamming join is
    * exact), never correctness.
    *
    * Bloom sizing, stated plainly: the prescreen carries its weight
    * only while bloomBits ≳ 10 × (stored hashes × bands) — the default
    * 2^20 bits serves ~10^5 images and the build-side hard cap (2^27
    * bits = 16 MB broadcast) ~10^7. Beyond that the bitmap SATURATES:
    * every probe chunk passes, correctness holds (the Hamming join is
    * exact), but every segment pays the full shuffle the doc above
    * promises to skip. Past the cap, distinct-chunk cardinality is the
    * real prescreen — size bands so chunk values stay selective, or
    * accept the shuffle; this is the same ceiling the decontamination
    * and MinHash blooms document. */
  def writeMediaHashIndex(df: DataFrame, contentCol: String, idCol: String,
                          path: String, bands: Int = 2,
                          bloomBits: Int = 1 << 20,
                          bloomHashes: Int = 4): Unit =
    buildMediaHashIndex(df, contentCol, idCol, path, bands, bloomBits,
      bloomHashes, lastBatchId = -1L)

  private def buildMediaHashIndex(df: DataFrame, contentCol: String,
                                  idCol: String, path: String, bands: Int,
                                  bloomBits: Int, bloomHashes: Int,
                                  lastBatchId: Long): Unit = {
    require(bands >= 2 && 64 % bands == 0,
      s"bands must be >= 2 and divide 64, got $bands")
    val spark = df.sparkSession
    imageAHash(df, contentCol, idCol)
      .filter(col("ahash_a").isNotNull && col("ahash_b").isNotNull)
      .select(col("media_id").as("id"), col("ahash_a"), col("ahash_b"))
      .write.mode("overwrite").parquet(mediaHashesDir(path, 0L))
    val stored = spark.read.parquet(mediaHashesDir(path, 0L))
    val bits = graft.functions.BloomFilter.build(
      mediaHashChunkKeys(stored, bands), "__ck", bloomBits, bloomHashes)
    writeMediaHashBloom(spark, bits, mediaHashDerivedDir(path, 0L))
    val total = stored.count()
    warnIfMediaBloomSaturated(path, total, bands, bloomBits)
    swapMediaHashMeta(spark, path,
      MediaHashIndexMeta(bands, bloomBits, bloomHashes, 0L, total,
        lastBatchId))
  }

  /** Loud saturation guard — the decontamination index's capacity WARN
    * ported to this bloom: geometry is pinned at build time, but a
    * continuously-maintained index keeps folding segments in, and past
    * ~numBits/10 inserted chunk keys (< 10 bits per element) the
    * prescreen's false-positive rate climbs toward pass-everything —
    * correctness holds (the Hamming join is exact) but every segment
    * quietly pays the full shuffle the prescreen exists to skip. The
    * remedy is a rebuild with a larger bloomBits; warn on the way in
    * rather than letting the probe cost regress without a trace. */
  private def warnIfMediaBloomSaturated(path: String, hashCount: Long,
                                        bands: Int, bloomBits: Int): Unit = {
    val inserted = hashCount * bands
    val capacity = bloomBits / 10L
    if (inserted > capacity)
      System.err.println(
        s"[graft] media-hash index at $path: $hashCount stored " +
          s"fingerprints x $bands bands = $inserted bloom keys exceed " +
          s"the $bloomBits-bit bloom's design capacity (~$capacity at " +
          "10 bits/element) — the prescreen's false-positive rate is " +
          "degrading toward pass-everything; rebuild with " +
          "writeMediaHashIndex and a larger bloomBits")
  }

  /** Append a new segment's images at DELTA cost: ids already indexed
    * are skipped (narrow anti-join on the stored id column — a
    * re-dropped segment is an idempotent no-op), the fresh fingerprints
    * land as one new hash-epoch dir, and the bloom delta-merges (OR
    * over the delta's chunk keys) into a NEW derived epoch behind the
    * meta swap. A torn append (the delta dir landed, meta didn't) is
    * simply INVISIBLE — the meta window never covers an unswapped
    * epoch — and the retry overwrites the orphan dir wholesale, so
    * nothing is ever double-counted or silently surfaced. */
  def appendMediaHashIndex(spark: org.apache.spark.sql.SparkSession,
                           path: String, df: DataFrame, contentCol: String,
                           idCol: String): Unit = {
    val meta = readMediaHashIndexMeta(spark, path)
    appendMediaHashCore(spark, path, meta, df, contentCol, idCol,
      meta.lastBatchId)
  }

  /** The streaming maintenance leg — each micro-batch of landed images
    * commits through here with its batch id recorded behind the meta
    * swap (the [[graft.pipeline.WarcOps.ingestWarcIndexBatch]]
    * discipline): a crash-replayed batch is recognized and skipped
    * without hashing anything. First batch on an empty path builds the
    * artifact; a path whose meta is missing because a swap died
    * mid-commit is RECOVERED (the complete `meta__next` renames into
    * place), and a path carrying fingerprints with no recoverable meta
    * is refused loudly — never rebuilt over. Returns whether the batch
    * was applied.
    *
    * SINGLE-WRITER, NON-DECREASING batch ids — stated plainly: the
    * skip fires BEFORE the id anti-join, so a batch id at or one below
    * the stored pointer is dropped without hashing anything (the
    * crash-replay signature — the replayed batch is always the last
    * one started). An id regressing FURTHER is not a replay: it is a
    * reset checkpoint (ids restart at 0) or a second maintainer on one
    * index, and dropping it would silently lose its images — so it
    * REFUSES loudly instead, naming the backfill
    * ([[appendMediaHashIndex]], which has no pointer and always
    * anti-joins). */
  def ingestMediaHashBatch(spark: org.apache.spark.sql.SparkSession,
                           path: String, batch: DataFrame,
                           contentCol: String, idCol: String,
                           batchId: Long, bands: Int = 2,
                           bloomBits: Int = 1 << 20,
                           bloomHashes: Int = 4): Boolean = {
    if (!MetaIO.metaExistsOrRecover(spark, path)) {
      MetaIO.requireNoOrphanData(spark, "media-hash index",
        s"$path/hashes")
      buildMediaHashIndex(batch, contentCol, idCol, path, bands, bloomBits,
        bloomHashes, lastBatchId = batchId)
      true
    } else {
      val meta = readMediaHashIndexMeta(spark, path)
      if (batchId <= meta.lastBatchId) {
        MetaIO.requireReplayNotRegression("media-hash index", path,
          batchId, meta.lastBatchId, "images", "appendMediaHashIndex")
        false // replayed batch: no-op
      } else {
        appendMediaHashCore(spark, path, meta, batch, contentCol, idCol,
          batchId)
        true
      }
    }
  }

  private def appendMediaHashCore(spark: org.apache.spark.sql.SparkSession,
                                  path: String, meta: MediaHashIndexMeta,
                                  df: DataFrame, contentCol: String,
                                  idCol: String, lastBatchId: Long): Unit = {
    val visible = readStoredMediaHashes(spark, path, meta)
    // the meta window covering exactly hash_count rows is the layout
    // invariant (a torn append's orphan epoch sits OUTSIDE the window,
    // so the two can only disagree after manual surgery on the dirs);
    // on a mismatch the bloom rebuilds from the full visible snapshot
    // instead of delta-merging — defense in depth, never the hot path
    val visibleCount = visible.count()
    val healthy = visibleCount == meta.hashCount
    val delta = imageAHash(df, contentCol, idCol)
      .filter(col("ahash_a").isNotNull && col("ahash_b").isNotNull)
      .select(col("media_id").as("id"), col("ahash_a"), col("ahash_b"))
      .join(visible.select(col("id")), Seq("id"), "left_anti")
      .localCheckpoint() // consumed twice: epoch write + bloom delta
    try {
      val next = meta.epoch + 1
      // ONE fresh epoch dir per append, mode("overwrite"): a retried
      // append lands on the same epoch number and replaces the torn
      // attempt's (invisible) orphan dir wholesale — never interleaves
      // file-sets into a live relation
      delta.write.mode("overwrite").parquet(mediaHashesDir(path, next))
      val nextDir = mediaHashDerivedDir(path, next)
      if (healthy) {
        val deltaBits = graft.functions.BloomFilter.build(
          mediaHashChunkKeys(delta, meta.bands), "__ck",
          meta.bloomBits, meta.bloomHashes)
        val merged = readMediaHashBloom(spark, path, meta)
          .zip(deltaBits).map { case (a, b) => a | b }
        writeMediaHashBloom(spark, merged, nextDir)
      } else {
        val all = spark.read.parquet(
          (meta.hashBase to next).map(mediaHashesDir(path, _)): _*)
        val bits = graft.functions.BloomFilter.build(
          mediaHashChunkKeys(all, meta.bands), "__ck",
          meta.bloomBits, meta.bloomHashes)
        writeMediaHashBloom(spark, bits, nextDir)
      }
      val total = visibleCount + delta.count()
      warnIfMediaBloomSaturated(path, total, meta.bands, meta.bloomBits)
      swapMediaHashMeta(spark, path,
        meta.copy(epoch = next, hashCount = total,
          lastBatchId = lastBatchId))
      // derived epochs keep {current, superseded}; the HASH epochs are
      // the window itself — only compaction re-bases and prunes them
      MetaIO.pruneEpochs(spark, Seq(s"$path/derived"),
        superseded = meta.epoch)
    } finally delta.unpersist() // a per-segment maintenance path must
    // not accumulate one checkpointed RDD per append for the session
  }

  /** Compact the fingerprint window: rewrite the [hash_base, epoch]
    * union as ONE fresh epoch at `targetFiles` and re-base the pointer
    * onto it — [[compactWarcIndex]]'s move, one artifact over. Without
    * it a continuously-maintained index ([[ingestMediaHashBatch]] via
    * the landing-dir stream) accumulates one epoch dir per micro-batch
    * in the relation every probe scans — the tiny-files problem the
    * other lifecycles' compaction steps exist to solve. The bloom
    * rebuilds from the compacted relation into a fresh derived epoch
    * (bit-identical by construction — same fingerprints), meta swaps
    * last, and the janitor prunes hash generations below the OLD base
    * (one generation's grace for a racing probe that resolved the old
    * meta) plus derived epochs below the old pointer. Probe output is
    * byte-identical before and after — only the file layout moves. */
  def compactMediaHashIndex(spark: org.apache.spark.sql.SparkSession,
                            path: String, targetFiles: Int = 1): Unit = {
    require(targetFiles >= 1, s"targetFiles must be >= 1, got $targetFiles")
    val meta = readMediaHashIndexMeta(spark, path)
    val next = meta.epoch + 1
    readStoredMediaHashes(spark, path, meta).coalesce(targetFiles)
      .write.mode("overwrite").parquet(mediaHashesDir(path, next))
    val compacted = spark.read.parquet(mediaHashesDir(path, next))
    val bits = graft.functions.BloomFilter.build(
      mediaHashChunkKeys(compacted, meta.bands), "__ck",
      meta.bloomBits, meta.bloomHashes)
    writeMediaHashBloom(spark, bits, mediaHashDerivedDir(path, next))
    val total = compacted.count()
    warnIfMediaBloomSaturated(path, total, meta.bands, meta.bloomBits)
    swapMediaHashMeta(spark, path,
      meta.copy(epoch = next, hashBase = next, hashCount = total))
    MetaIO.pruneEpochs(spark, Seq(s"$path/derived"),
      superseded = meta.epoch)
    MetaIO.pruneEpochs(spark, Seq(s"$path/hashes"),
      superseded = meta.hashBase)
  }

  /** Compact when the live epoch window has grown to `maxEpochs` dirs
    * or more — the policy wrapper the continuous maintainer calls after
    * each batch ([[graft.pipeline.WarcOps.maybeCompactWarcIndex]]'s
    * contract). Returns whether a compaction ran. */
  def maybeCompactMediaHashIndex(spark: org.apache.spark.sql.SparkSession,
                                 path: String, maxEpochs: Int): Boolean = {
    require(maxEpochs >= 2, s"maxEpochs must be >= 2, got $maxEpochs " +
      "(1 would compact after every append — pure rewrite churn)")
    val meta = readMediaHashIndexMeta(spark, path)
    if (meta.epoch - meta.hashBase + 1 >= maxEpochs) {
      compactMediaHashIndex(spark, path)
      true
    } else false
  }

  /** Probe a stored fingerprint index: each probe image's chunk keys
    * prescreen against the bloom (codegen'd, map-side — a novel image
    * dies before any exchange), survivors join the stored hashes'
    * chunk keys, and candidates verify by exact Hamming over the
    * 128-bit pair. Output: (probe_id, match_id, hamming), one row per
    * (probe, stored) pair within `maxHamming`. Pigeonhole recall as in
    * [[ahashPairs]]: exact for maxHamming < bands. */
  def probeMediaHashIndex(spark: org.apache.spark.sql.SparkSession,
                          path: String, probes: DataFrame,
                          contentCol: String, idCol: String,
                          maxHamming: Int = 1): DataFrame = {
    val meta = readMediaHashIndexMeta(spark, path)
    require(maxHamming >= 0 && maxHamming < meta.bands,
      s"pigeonhole recall requires maxHamming < bands, " +
        s"got $maxHamming/${meta.bands}")
    val words = readMediaHashBloom(spark, path, meta)
    val probeChunks = imageAHash(probes, contentCol, idCol)
      .filter(col("ahash_a").isNotNull && col("ahash_b").isNotNull)
      .select(col("media_id").as("probe_id"),
        col("ahash_a").as("p_a"), col("ahash_b").as("p_b"),
        posexplode(ahashChunkArr(col("ahash_a"), col("ahash_b"), meta.bands))
          .as(Seq("chunk_idx", "chunk_val")))
      .filter(graft.functions.BloomFilter.mightContainCol(
        xxhash64(col("chunk_idx"), col("chunk_val")), words,
        meta.bloomHashes, meta.bloomBits))
    val storedChunks = readStoredMediaHashes(spark, path, meta)
      .select(col("id").as("match_id"),
        col("ahash_a").as("s_a"), col("ahash_b").as("s_b"),
        posexplode(ahashChunkArr(col("ahash_a"), col("ahash_b"), meta.bands))
          .as(Seq("chunk_idx", "chunk_val")))
    probeChunks.join(storedChunks, Seq("chunk_idx", "chunk_val"))
      .select(col("probe_id"), col("match_id"),
        (bit_count(col("p_a").bitwiseXOR(col("s_a"))) +
          bit_count(col("p_b").bitwiseXOR(col("s_b"))))
          .cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** OBSERVABILITY: the stored bloom's prescreen pass ratio over a
    * probe batch — (chunk keys passing, total chunk keys). Near 0 on a
    * mostly-novel batch with healthy geometry; climbing toward 1 as
    * the bitmap saturates past ~bloomBits/10 inserted keys (the
    * capacity WARN's cost story, measured instead of asserted: every
    * passing key is a row the probe join must shuffle). One map-only
    * pass over the probe batch — run it on a sampled segment when the
    * WARN starts firing to decide whether the rebuild is due. */
  def mediaBloomPassStats(spark: org.apache.spark.sql.SparkSession,
                          path: String, probes: DataFrame,
                          contentCol: String, idCol: String): (Long, Long) = {
    val meta = readMediaHashIndexMeta(spark, path)
    val words = readMediaHashBloom(spark, path, meta)
    val row = imageAHash(probes, contentCol, idCol)
      .filter(col("ahash_a").isNotNull && col("ahash_b").isNotNull)
      .select(
        posexplode(ahashChunkArr(col("ahash_a"), col("ahash_b"), meta.bands))
          .as(Seq("chunk_idx", "chunk_val")))
      .select(xxhash64(col("chunk_idx"), col("chunk_val")).as("__ck"))
      .agg(count(lit(1)).as("total"),
        count(when(graft.functions.BloomFilter.mightContainCol(
          col("__ck"), words, meta.bloomHashes, meta.bloomBits), 1))
          .as("passed"))
      .collect()(0)
    (row.getLong(1), row.getLong(0))
  }

  /** The admission filter a crawl pipeline runs on every new segment:
    * keep only probe images with NO stored near-duplicate. Undecodable
    * probes carry no fingerprint, match nothing, and are ADMITTED —
    * stated plainly; run exact-digest dedup beside this for them. */
  def dedupMediaAgainstIndex(spark: org.apache.spark.sql.SparkSession,
                             path: String, probes: DataFrame,
                             contentCol: String, idCol: String,
                             maxHamming: Int = 1): DataFrame =
    probes.join(
      probeMediaHashIndex(spark, path, probes, contentCol, idCol,
          maxHamming)
        .select(col("probe_id")).distinct(),
      probes(idCol) === col("probe_id"), "left_anti")

  /** REAL resize: decode, nearest-neighbor downscale to fit `maxDim`
    * (deterministic — no interpolation rounding to diverge on), re-encode
    * PNG. Images already within `maxDim` (and undecodable payloads) pass
    * through unchanged, the latter flagged by null dimensions. Target
    * dims in integer arithmetic: max(1, d·maxDim / max(w,h)). */
  def resizeImages(df: DataFrame, contentCol: String, idCol: String,
                   maxDim: Long): DataFrame = {
    require(maxDim >= 1, "maxDim must be >= 1")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("resized_content", BinaryType, nullable = true),
      StructField("resized_width", LongType, nullable = true),
      StructField("resized_height", LongType, nullable = true)))
    val in = df.select(col(idCol).cast("long").as("media_id"),
      col(contentCol).cast("binary").as("content"))
    in.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case _: Exception => null }
        val vals: Array[Any] =
          if (img == null) Array[Any](id, bytes, null, null)
          else {
            val dst = nearestResize(img, maxDim)
            if (dst eq img) // already fits: pass the original bytes through
              Array[Any](id, bytes, img.getWidth.toLong, img.getHeight.toLong)
            else {
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(dst, "png", bos)
              Array[Any](id, bos.toByteArray,
                dst.getWidth.toLong, dst.getHeight.toLong)
            }
          }
        new GenericRowWithSchema(vals, outSchema): Row
      }
    }(Encoders.row(outSchema))
  }

  /** Byte statistics of an opaque payload — 1:1 mapPartitions, schema
    * declared up front. NOT a decoder (for that, [[decodeImageFeatures]]
    * / [[resizeImages]] / the container walks): this is the cheap
    * format-agnostic pass a pipeline runs BEFORE deciding a payload is
    * worth decoding — size/entropy-proxy triage over blobs whose format
    * is unknown or unsupported. */
  def byteStats(df: DataFrame, contentCol: String, idCol: String): DataFrame = {
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
