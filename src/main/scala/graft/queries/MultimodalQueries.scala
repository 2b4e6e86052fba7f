package graft.queries

import graft.pipeline.MultimodalOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column queries over opaque binary media columns. Every
  * row runs REAL kernels: image decode + nearest-neighbor resize (JDK
  * ImageIO), audio decode (JDK javax.sound PCM), and the container
  * walks (frame-pack/AVI/MJPEG/MP4/fMP4/MKV) demux real PNG frame
  * payloads — no stub row remains; the one non-decoding row
  * (q_media_byte_stats) says so in its name. Oracles recompute
  * everything from the generator formulas in integer arithmetic. */
object MultimodalQueries {

  def all: Seq[GraftQuery] = Seq(
    GraftQuery("q_media_meta", mediaMeta, Some(mediaMetaSql)),
    GraftQuery("q_media_meta_jpeg", mediaMetaJpeg, Some(mediaMetaJpegSql)),
    // WEBP: the crawl-native image format — RIFF envelope + three
    // variant headers (lossy sync+14-bit dims, lossless packed word,
    // extended 24-bit canvas), columnar, oracle from formulas
    GraftQuery("q_media_meta_webp", mediaMetaWebp, Some(mediaMetaWebpSql)),
    // REAL keyframe thumbnails: frame-pack demux → stride-sample →
    // decode → nearest-neighbor downscale → thumbnail channel sums;
    // the oracle recomputes every thumbnail pixel
    GraftQuery("q_media_frames", mediaFrames, Some(mediaFramesSql)),
    // REAL resize + decode chained (resizeImages → decodeImageFeatures
    // over the re-encoded thumbnail), oracle from the pixel formulas
    GraftQuery("q_media_features", mediaFeatures, Some(mediaFeaturesSql)),
    // format-agnostic byte triage over opaque blobs (NOT a decoder —
    // the real decode rows are q_media_decode/q_media_features)
    GraftQuery("q_media_byte_stats", mediaByteStats, Some(mediaByteStatsSql)),
    GraftQuery("q_media_decode", mediaDecode, Some(mediaDecodeSql)),
    GraftQuery("q_media_ahash", mediaAHash, Some(mediaAHashSql)),
    GraftQuery("q_media_dup_groups", mediaDupGroups, Some(mediaDupGroupsSql)),
    GraftQuery("q_media_dup_radius", mediaDupRadius, Some(mediaDupRadiusSql)),
    // the PERSISTED media-fingerprint index (eleventh artifact):
    // build/append/re-append(idempotent no-op)/probe — new images dedup
    // against all of history at probe cost, bloom-prescreened
    GraftQuery("q_media_dup_index", mediaDupIndexQ, Some(mediaDupIndexSql),
      bench = true),
    // the admission filter over the same artifact: probes with no
    // stored near-duplicate survive
    GraftQuery("q_media_admit_index", mediaAdmitIndexQ,
      Some(mediaAdmitIndexSql)),
    // the MULTIMODAL crawl end to end: mixed text/PNG .warc.gz corpus →
    // byte-range index → ranged fetch of 200-survivors → payload sniff →
    // real decode + fingerprint, one plan, pixel-formula oracle
    GraftQuery("q_e2e_crawl_media", e2eCrawlMediaQ, Some(e2eCrawlMediaSql),
      bench = true),
    // CROSS-MODAL pair mining over the paired crawl: pages' <img src
    // alt> tags extracted, fetched images fingerprinted, the two joined
    // on URI — (caption, image) training pairs; dangling refs drop
    GraftQuery("q_media_text_pairs", mediaTextPairsQ,
      Some(mediaTextPairsSql), bench = true),
    // REAL audio: RIFF/WAVE round-trip — columnar header parse and JDK
    // PCM decode, oracle recomputing from the generator formulas
    GraftQuery("q_audio_meta", audioMeta, Some(audioMetaSql)),
    // COMPRESSED audio: FLAC STREAMINFO at fixed offsets (packed
    // 64-bit rate/channels/bits/total word + native MD5), columnar
    // byte arithmetic, oracle from the generator formulas only
    GraftQuery("q_audio_meta_flac", audioMetaFlac, Some(audioMetaFlacSql)),
    // MP3: the self-synchronizing frame STREAM (no table, no envelope
    // — each frame's length from its own 4-byte header), walked into
    // per-clip stream facts incl. the CBR/VBR verdict
    GraftQuery("q_audio_meta_mp3", audioMetaMp3, Some(audioMetaMp3Sql)),
    GraftQuery("q_audio_decode", audioDecode, Some(audioDecodeSql)),
    GraftQuery("q_audio_fingerprint", audioFingerprint, Some(audioFingerprintSql)),
    GraftQuery("q_video_frames", videoFrames, Some(videoFramesSql)),
    // the SAME clip through the STANDARD RIFF/AVI container (Motion-PNG
    // stream): only the byte walk differs from q_video_frames — the
    // demuxer-seam claim proven on a second, real-world grammar — so it
    // shares the frame-formula oracle, which never sees the bytes
    GraftQuery("q_video_frames_avi", videoFramesAvi, Some(videoFramesSql)),
    // ISO-BMFF: the real-world-first MP4 container at the same demuxer
    // seam — the sample TABLE (offsets/sizes/timing/sync/timescale)
    // resolved from the moov/trak/stbl byte walk, oracle recomputing
    // every cell from the encoder formulas without seeing the bytes
    GraftQuery("q_video_mp4_meta", videoMp4Meta, Some(videoMp4MetaSql),
      bench = true),
    // the SAME clip as a real MP4 of real PNG samples: the resolved
    // sample table drives the payload fetch + decode — the THIRD
    // container grammar sharing the one frame-formula oracle
    GraftQuery("q_video_frames_mp4", videoFramesMp4, Some(videoFramesSql)),
    // the SAME corpus written to real ON-DISK files and read back via
    // RANGED reads only — file listing without content, moov fetched by
    // positioned read, sample payloads fetched by byte range. No file
    // size ceiling, no whole-file rows; both ranged forms share the
    // in-memory forms' oracles verbatim because output is identical
    GraftQuery("q_video_mp4_meta_ranged", videoMp4MetaRanged,
      Some(videoMp4MetaSql)),
    GraftQuery("q_video_frames_mp4_ranged", videoFramesMp4Ranged,
      Some(videoFramesSql), bench = true),
    // the decode-straggler fix: the metadata resolve stays per-file but
    // the kept samples RANGE-partition on (path, offset) before the
    // fetch+decode, so one giant clip's frames spread across tasks;
    // identical output, shared oracle
    GraftQuery("q_video_frames_mp4_ranged_par", videoFramesMp4RangedParallel,
      Some(videoFramesSql)),
    // the AVI corpus through the ranged path: chunk headers hopped by
    // positioned read, payload bytes fetched only for kept frames —
    // the RIFF grammar's no-ceiling form, sharing the sums oracle
    GraftQuery("q_video_frames_avi_ranged", videoFramesAviRanged,
      Some(videoFramesSql)),
    // RIFF's table-then-fetch split + intra-file-parallel decode: the
    // header-hop frame table (payloads untouched) feeds the shared
    // range-partitioned decode core; identical output, shared oracle
    GraftQuery("q_video_frames_avi_ranged_par", videoFramesAviRangedParallel,
      Some(videoFramesSql)),
    // FRAGMENTED MP4 (moof/traf/trun — the DASH/HLS layout): empty-stbl
    // init moov + per-fragment sample tables, dts/sample_idx
    // accumulating across fragments, sync on fragment-leading samples;
    // even ids carry per-sample durations, odd ids tfhd defaults. The
    // oracle rebuilds every offset from the fragment-layout arithmetic
    GraftQuery("q_video_fmp4_meta", videoFmp4Meta, Some(videoFmp4MetaSql)),
    // the same fragmented corpus off real files via moof-only ranged
    // fetches (mdat between fragments never read for metadata)
    GraftQuery("q_video_fmp4_meta_ranged", videoFmp4MetaRanged,
      Some(videoFmp4MetaSql)),
    // the SAME logical clip as the pack/AVI/progressive-MP4 forms,
    // fragmented: the frame pipeline is container-blind, so the one
    // frame-formula oracle carries over a FIFTH time
    GraftQuery("q_video_frames_fmp4", videoFramesFmp4, Some(videoFramesSql)),
    // the fragmented layout's RANGED frame fetch: moof tables by
    // positioned read, kept samples by byte range, two-phase parallel
    // on the shared core — every container's ranged story is complete
    GraftQuery("q_video_frames_fmp4_ranged_par", videoFramesFmp4RangedParallel,
      Some(videoFramesSql)),
    // Matroska/EBML — the sixth container grammar CLASS (leading-zero
    // varint lengths, unlike boxes/chunks/frames/records): the video
    // track's SimpleBlocks resolved to per-block rows, every offset
    // rebuilt by the oracle from the fixed-width layout arithmetic
    GraftQuery("q_video_mkv_meta", videoMkvMeta, Some(videoMkvMetaSql),
      bench = true),
    // the one logical clip through its SIXTH container
    GraftQuery("q_video_frames_mkv", videoFramesMkv, Some(videoFramesSql)),
    // the EBML grammar's ranged + intra-file-parallel frame decode:
    // header-hop block tables per file, then range-partitioned payload
    // fetch+decode — identical output, shared one-clip frame oracle
    GraftQuery("q_video_frames_mkv_ranged", videoFramesMkvRanged,
      Some(videoFramesSql)),
    // the MKV corpus off real files via element-header hops — fetched
    // bytes O(blocks·16), frame payloads never read; shared oracle
    GraftQuery("q_video_mkv_meta_ranged", videoMkvMetaRanged,
      Some(videoMkvMetaSql)),
    // the SAME clip as REAL Motion-JPEG in the same RIFF/AVI container —
    // the first LOSSY codec through the demuxer seam: walk and real
    // ImageIO decode unchanged, but decoded pixel sums are codec facts
    // (JPEG quantization), not formula facts, so the oracle checks what
    // lossy coding preserves (dims/count/order) and MjpegAviSpec pins
    // exact-sum parity against an independent decode of the same bytes
    GraftQuery("q_video_frames_mjpeg", videoFramesMjpeg,
      Some(videoFramesDimsSql)),
    GraftQuery("q_audio_dup_groups", audioDupGroups, Some(audioDupGroupsSql)),
  )

  /** Audio dedup classes end to end: 40 distinct clips plus a PLANTED
    * byte-identical copy of each (media_id + 100), fingerprinted
    * through the real decode → energy → winnow pipeline; clips sharing
    * any fingerprint pair up and connected components label the
    * classes. Every planted copy MUST land in its original's class
    * (identical bytes → identical fingerprint sets), and any genuine
    * cross-clip fingerprint collision merges transitively the same way
    * on both engines. */
  def audioDupGroups(spark: SparkSession, sfDir: String): DataFrame = {
    val keys = Tables.read(spark, sfDir, "documents")
      .select((col("doc_id") % 40).as("clip_key")).distinct()
    val clips = MultimodalOps.encodeSyntheticWav(keys, "clip_key")
    val all = clips.unionByName(clips.select(
      (col("media_id") + 100).as("media_id"), col("content")))
    val en = MultimodalOps.audioFrameEnergies(all, "content", "media_id", 20)
    val seqs = en
      .select(col("media_id"), col("frame_idx").as("f"),
        call_function("div", col("energy"), lit(100L)).cast("string").as("t"))
      .groupBy(col("media_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("f"), col("t")))),
        s => s.getField("t")), " ").as("lvl_text"))
    // a finer step than the fingerprint query's 500: dedup wants
    // DISCRIMINATION between distinct clips, overlap detection wants
    // noise tolerance — the knob is per use-case
    val fps = graft.pipeline.TextOps.winnowFingerprints(
      seqs, "lvl_text", "media_id", shingleK = 3, window = 4)
    val a = fps.as("a"); val b = fps.as("b")
    val pairs = a.join(b, col("a.fingerprint") === col("b.fingerprint") &&
        col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("src"), col("b.media_id").as("dst"))
      .distinct()
    val comp = graft.pipeline.DedupOps.connectedComponents(
      pairs.select(col("src").as("id_a"), col("dst").as("id_b")))
    all.select(col("media_id"))
      .join(comp.select(col("id").as("media_id"), col("component")),
        Seq("media_id"), "left")
      .select(col("media_id"),
        coalesce(col("component"), col("media_id")).as("dup_class"))
  }

  def audioDupGroupsSql: String = {
    val ph = graft.functions.StringPolyHash.polyHashSql("t")
    val comb = graft.functions.TokenShingleHash.combineSql("th", 3)
    s"""WITH RECURSIVE k AS (
       |  SELECT DISTINCT doc_id % 40 AS media_id, 200 + (doc_id % 40) % 57 AS n
       |  FROM documents
       |), sm AS (
       |  SELECT media_id, n, unnest(range(0, n)) AS i FROM k
       |), fr AS (
       |  SELECT media_id, i // 20 AS f,
       |    CAST(sum(abs((media_id * 31 + i * 17) % 2000 - 1000)) AS BIGINT) AS e
       |  FROM sm GROUP BY media_id, f
       |), tht AS (
       |  SELECT media_id,
       |    list_transform(list(CAST(e // 100 AS VARCHAR) ORDER BY f),
       |      t -> $ph) AS th
       |  FROM fr GROUP BY media_id
       |), sh AS (
       |  SELECT media_id, $comb AS hs FROM tht
       |), fp0 AS (
       |  SELECT media_id,
       |    CASE WHEN len(hs) < 4 THEN [list_min(hs)]
       |    ELSE list_distinct(list_transform(range(1, len(hs) - 4 + 2),
       |      i -> list_min(hs[i:i+3]))) END AS fps
       |  FROM sh WHERE len(hs) > 0
       |), fps AS (
       |  SELECT media_id, unnest(fps) AS fingerprint FROM fp0
       |  UNION ALL
       |  SELECT media_id + 100, unnest(fps) AS fingerprint FROM fp0
       |), ids AS (
       |  SELECT media_id FROM k UNION ALL SELECT media_id + 100 FROM k
       |), pairs AS (
       |  SELECT DISTINCT a.media_id AS a, b.media_id AS b
       |  FROM fps a JOIN fps b
       |    ON a.fingerprint = b.fingerprint AND a.media_id < b.media_id
       |), edges AS (
       |  SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs
       |), reach AS (
       |  SELECT a AS id, a AS root FROM edges
       |  UNION
       |  SELECT e.b AS id, r.root FROM reach r JOIN edges e ON e.a = r.id
       |), comp AS (
       |  SELECT id, min(root) AS component FROM reach GROUP BY id
       |)
       |SELECT i.media_id, coalesce(c.component, i.media_id) AS dup_class
       |FROM ids i LEFT JOIN comp c ON c.id = i.media_id""".stripMargin
  }

  private val VF_STRIDE = 2

  /** REAL keyframe extraction: every doc_id becomes a frame-container
    * clip (length-prefixed real PNG frames — the I-frame-only container;
    * a standard demuxer plugs in at that seam), the container walk keeps
    * every 2nd frame, and each kept frame REALLY decodes to per-channel
    * pixel sums. The oracle recomputes everything from the frame
    * formulas — a green row proves container walk + sampling + decode
    * end to end. */
  def videoFrames(spark: SparkSession, sfDir: String): DataFrame = {
    val ids = Tables.read(spark, sfDir, "documents").select(col("doc_id"))
    val packs = MultimodalOps.encodeSyntheticFramePack(ids, "doc_id")
    MultimodalOps.sampleFrames(packs, "content", "media_id", VF_STRIDE)
  }

  /** [[videoFrames]] with the clip encoded as a REAL RIFF/AVI file
    * (avih/strl headers + movi LIST of '00dc' Motion-PNG chunks, RIFF
    * even-padding included): the byte-arithmetic RIFF walk demuxes the
    * movi stream, stride-samples, and really decodes each kept frame.
    * Same frame formulas as the frame pack, so the output — and the
    * oracle — are identical to q_video_frames: a green row proves the
    * second container grammar end to end without the oracle ever
    * consulting the bytes. */
  def videoFramesAvi(spark: SparkSession, sfDir: String): DataFrame = {
    val ids = Tables.read(spark, sfDir, "documents").select(col("doc_id"))
    val avis = MultimodalOps.encodeSyntheticAvi(ids, "doc_id")
    MultimodalOps.sampleAviFrames(avis, "content", "media_id", VF_STRIDE)
  }

  /** Mirrors synthFrameCount / synthFrameImageId / synthDims / synthRgb:
    * k = 3 + id%4 frames, sampled j ∈ {0, 2, 4}, fid = id·8 + j. */
  def videoFramesSql: String =
    s"""WITH d AS (
       |  SELECT doc_id AS media_id, 3 + doc_id % 4 AS k FROM documents
       |), fj AS (
       |  SELECT media_id, unnest(range(0, k)) AS j FROM d
       |), sampled AS (
       |  SELECT media_id, j, media_id * 8 + j AS fid FROM fj
       |  WHERE j % $VF_STRIDE = 0
       |), dims AS (
       |  SELECT media_id, j, fid, 8 + fid % 9 AS w, 8 + fid % 7 AS h
       |  FROM sampled
       |), xs AS (
       |  SELECT media_id, j, fid, w, h, unnest(range(0, w)) AS x FROM dims
       |), px AS (
       |  SELECT media_id, j, fid, w, h, x, unnest(range(0, h)) AS y FROM xs
       |)
       |SELECT media_id, CAST(j AS BIGINT) AS frame_idx,
       |  CAST(any_value(w) AS BIGINT) AS width,
       |  CAST(any_value(h) AS BIGINT) AS height,
       |  CAST(sum((fid * 31 + x * 7 + y * 13) % 256) AS BIGINT) AS sum_r,
       |  CAST(sum((fid * 17 + x * 11 + y * 3) % 256) AS BIGINT) AS sum_g,
       |  CAST(sum((fid * 23 + x * 5 + y * 19) % 256) AS BIGINT) AS sum_b
       |FROM px GROUP BY media_id, j""".stripMargin

  /** On-disk corpus staging for the *_ranged rows, MEMOIZED per
    * (kind, sfDir) within the JVM: the staged corpus is these rows'
    * INPUT, not the operator under test — re-encoding and re-writing
    * thousands of files on every evaluation would make a bench median
    * measure the synthetic encoder instead of the ranged read, and the
    * encoders are deterministic, so a re-stage would produce the
    * byte-identical corpus anyway. Dirs are scratch-registered (cleaned
    * at JVM exit); lookups go through `memoScratchDir`, so a session
    * that purgeScratch-ed between runs re-stages instead of listing
    * the deleted dir. Returns the listed files with media_id parsed
    * from the filename. */
  private val stagedDirs =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]
  private[queries] def stagedFiles(spark: SparkSession, sfDir: String,
                                   kind: String, ext: String)(
      build: => DataFrame): DataFrame = {
    val dir = graft.sources.TableSources.memoScratchDir(
      stagedDirs, (kind, sfDir)) {
      val d = graft.sources.TableSources.scratchDir(s"graft-$kind")
      graft.sources.TableSources.writeBinaryDir(
        build, d, "media_id", "content", ext)
      d
    }
    graft.sources.TableSources.listBinaryDir(spark, dir, s"*$ext")
      .withColumn("media_id",
        graft.sources.TableSources.pathId(col("media_path"),
          "clip_(\\d+)" + java.util.regex.Pattern.quote(ext) + "$"))
      .filter(col("media_id").isNotNull) // ANSI-safe: strays skip, not throw
  }

  /** [[videoFramesAvi]] through the ranged path: the Motion-PNG corpus
    * written to real files, chunk headers hopped by positioned 8-byte
    * reads, and ONLY the stride-kept '00dc' payloads fetched and
    * decoded — identical output to the in-memory walk, so the sums
    * oracle carries over verbatim. */
  def videoFramesAviRanged(spark: SparkSession, sfDir: String): DataFrame = {
    val files = stagedFiles(spark, sfDir, "avi-ranged", ".avi")(
      MultimodalOps.encodeSyntheticAvi(
        Tables.read(spark, sfDir, "documents").select(col("doc_id")),
        "doc_id"))
    MultimodalOps.sampleAviFramesRanged(
      files, "media_path", "media_id", VF_STRIDE)
  }

  /** [[videoFramesAviRanged]] through the table-then-fetch split +
    * shared parallel decode core; identical output, shared oracle. */
  def videoFramesAviRangedParallel(spark: SparkSession,
                                   sfDir: String): DataFrame = {
    val files = stagedFiles(spark, sfDir, "avi-ranged", ".avi")(
      MultimodalOps.encodeSyntheticAvi(
        Tables.read(spark, sfDir, "documents").select(col("doc_id")),
        "doc_id"))
    MultimodalOps.sampleAviFramesRangedParallel(
      files, "media_path", "media_id", VF_STRIDE)
  }

  /** The fragmented (DASH/HLS) layout's resolved sample table: the
    * walker detects the legally-empty stbl and resolves moof/traf/trun
    * fragments instead — dts and sample_idx accumulate across
    * fragments, sync marks each fragment's leading sample, and both
    * trun shapes (per-sample vs tfhd-default durations) ride the
    * corpus by id parity. */
  def videoFmp4Meta(spark: SparkSession, sfDir: String): DataFrame = {
    val ids = Tables.read(spark, sfDir, "documents").select(col("doc_id"))
    MultimodalOps.mp4SampleTable(
      MultimodalOps.encodeSyntheticFmp4(ids, "doc_id"), "content", "media_id")
  }

  /** [[videoFmp4Meta]] off real on-disk files via the ranged path: the
    * header walk finds every moof, fetches ONLY the per-fragment
    * tables, and never reads the mdat payload between them — the
    * metadata pass a segmented video corpus runs per segment. */
  def videoFmp4MetaRanged(spark: SparkSession, sfDir: String): DataFrame = {
    val files = stagedFiles(spark, sfDir, "fmp4-ranged", ".mp4")(
      MultimodalOps.encodeSyntheticFmp4(
        Tables.read(spark, sfDir, "documents").select(col("doc_id")),
        "doc_id"))
    MultimodalOps.mp4SampleTableRanged(files, "media_path", "media_id")
  }

  /** [[videoFramesMp4]] fragmented: real PNG frames split across two
    * moof+mdat pairs; the fragment walk resolves them and the shared
    * decode keeps/decodes every 2nd — identical output to the pack,
    * AVI, and progressive forms, so the one oracle serves a FIFTH
    * container variant. */
  def videoFramesFmp4(spark: SparkSession, sfDir: String): DataFrame = {
    val ids = Tables.read(spark, sfDir, "documents").select(col("doc_id"))
    MultimodalOps.sampleMp4Frames(
      MultimodalOps.encodeSyntheticFmp4Video(ids, "doc_id"),
      "content", "media_id", VF_STRIDE)
  }

  /** [[videoFramesFmp4]] off real ON-DISK files via ranged reads + the
    * two-phase parallel decode: the header walk fetches only the moof
    * tables (never the mdat payload runs between them — the fragment
    * resolver in `mp4SampleTableRanged` handles both layouts), then
    * the kept samples fetch by byte range through the shared
    * range-partitioned core. The DASH/HLS-shaped corpus's scale path:
    * a segment archive never materializes whole files, and one huge
    * segment splits across cores. Identical output, shared oracle. */
  def videoFramesFmp4RangedParallel(spark: SparkSession,
                                    sfDir: String): DataFrame = {
    val files = stagedFiles(spark, sfDir, "fmp4-video-ranged", ".mp4")(
      MultimodalOps.encodeSyntheticFmp4Video(
        Tables.read(spark, sfDir, "documents").select(col("doc_id")),
        "doc_id"))
    MultimodalOps.sampleMp4FramesRangedParallel(
      files, "media_path", "media_id", VF_STRIDE)
  }

  /** Mirrors synthFmp4Fragments/FragSamples/SampleSize and the fragment
    * writer's fixed layout: file prefix 595 (24 ftyp + 571 moov), moof
    * size 68+8m (even ids, per-sample durations) or 72+4m (odd ids,
    * tfhd default), payload at fragment start + moof + 8, fragments
    * advancing by moof + 8 + Σsizes. */
  def videoFmp4MetaSql: String =
    s"""WITH d AS (
       |  SELECT doc_id AS media_id, 2 + doc_id % 3 AS nf,
       |    100 + doc_id % 50 AS delta,
       |    CAST(CASE doc_id % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000
       |         ELSE 90000 END AS BIGINT) AS timescale,
       |    doc_id % 2 = 0 AS even
       |  FROM documents
       |), fr AS (
       |  SELECT media_id, delta, timescale, even, unnest(range(0, nf)) AS f
       |  FROM d
       |), fm AS (
       |  SELECT *, 2 + (media_id + f) % 3 AS m FROM fr
       |), fb AS (
       |  SELECT *, CAST(COALESCE(SUM(m) OVER (PARTITION BY media_id ORDER BY f
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS b,
       |    CASE WHEN even THEN 68 + 8 * m ELSE 72 + 4 * m END AS moof_sz
       |  FROM fm
       |), smp AS (
       |  SELECT media_id, f, b, delta, timescale, moof_sz,
       |    unnest(range(0, m)) AS j
       |  FROM fb
       |), sz AS (
       |  SELECT *, b + j AS i,
       |    40 + (media_id * 11 + (b + j) * 7) % 60 AS size
       |  FROM smp
       |), fs AS (
       |  SELECT media_id, f, CAST(SUM(size) AS BIGINT) AS s_f
       |  FROM sz GROUP BY 1, 2
       |), fo AS (
       |  SELECT fb.media_id, fb.f, fb.moof_sz,
       |    595 + CAST(COALESCE(SUM(fb.moof_sz + 8 + fs.s_f) OVER (
       |      PARTITION BY fb.media_id ORDER BY fb.f
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS frag_start
       |  FROM fb JOIN fs ON fs.media_id = fb.media_id AND fs.f = fb.f
       |)
       |SELECT z.media_id, CAST(z.i AS BIGINT) AS sample_idx,
       |  fo.frag_start + fo.moof_sz + 8
       |    + CAST(COALESCE(SUM(z.size) OVER (
       |        PARTITION BY z.media_id, z.f ORDER BY z.j
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |    AS "offset",
       |  CAST(z.size AS BIGINT) AS size,
       |  CAST(z.i * z.delta AS BIGINT) AS dts,
       |  z.j = 0 AS is_sync, z.timescale
       |FROM sz z JOIN fo ON fo.media_id = z.media_id AND fo.f = z.f""".stripMargin

  /** The EBML walk's resolved SimpleBlock table over every doc's
    * synthetic MKV: general-varint parsing on the wire, cluster
    * timestamps + signed relative block timestamps, keyframe flags —
    * while the oracle only ever sees the encoder's fixed-width layout
    * arithmetic. */
  def videoMkvMeta(spark: SparkSession, sfDir: String): DataFrame = {
    val ids = Tables.read(spark, sfDir, "documents").select(col("doc_id"))
    graft.pipeline.MkvOps.mkvBlockTable(
      graft.pipeline.MkvOps.encodeSyntheticMkv(ids, "doc_id"),
      "content", "media_id")
  }

  /** Layout mirror: EBML(18) + Segment hdr(6) + Info(14) + Tracks(27)
    * puts cluster 0 at 65; a cluster is 6 + 5 + Σ(7 + size); a block's
    * frame data sits 18 + Σ_{j'<j}(7 + size') past its cluster start. */
  def videoMkvMetaSql: String =
    s"""WITH d AS (
       |  SELECT doc_id AS media_id, 2 + doc_id % 2 AS nc FROM documents
       |), fr AS (
       |  SELECT media_id, unnest(range(0, nc)) AS c FROM d
       |), fm AS (
       |  SELECT *, 2 + (media_id + c) % 2 AS m FROM fr
       |), fb AS (
       |  SELECT *, CAST(COALESCE(SUM(m) OVER (PARTITION BY media_id ORDER BY c
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS b
       |  FROM fm
       |), smp AS (
       |  SELECT media_id, c, b, unnest(range(0, m)) AS j FROM fb
       |), sz AS (
       |  SELECT *, b + j AS i,
       |    30 + (media_id * 7 + (b + j) * 5) % 40 AS size
       |  FROM smp
       |), fs AS (
       |  SELECT media_id, c, CAST(SUM(7 + size) AS BIGINT) AS s_c
       |  FROM sz GROUP BY 1, 2
       |), fo AS (
       |  SELECT fb.media_id, fb.c,
       |    65 + CAST(COALESCE(SUM(11 + fs.s_c) OVER (
       |      PARTITION BY fb.media_id ORDER BY fb.c
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS cluster_start
       |  FROM fb JOIN fs ON fs.media_id = fb.media_id AND fs.c = fb.c
       |)
       |SELECT z.media_id, CAST(z.i AS BIGINT) AS block_idx,
       |  fo.cluster_start + 18
       |    + CAST(COALESCE(SUM(7 + z.size) OVER (
       |        PARTITION BY z.media_id, z.c ORDER BY z.j
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |    AS "offset",
       |  CAST(z.size AS BIGINT) AS size,
       |  CAST(z.c * 1000 + z.j * 40 AS BIGINT) AS ts_ms,
       |  z.j = 0 AS is_key, CAST(1 AS BIGINT) AS track_num
       |FROM sz z JOIN fo ON fo.media_id = z.media_id AND fo.c = z.c""".stripMargin

  /** [[videoMkvMeta]] off on-disk files via the ranged element-header
    * hops; identical output, shared oracle. */
  def videoMkvMetaRanged(spark: SparkSession, sfDir: String): DataFrame = {
    val files = stagedFiles(spark, sfDir, "mkv-ranged", ".mkv")(
      graft.pipeline.MkvOps.encodeSyntheticMkv(
        Tables.read(spark, sfDir, "documents").select(col("doc_id")),
        "doc_id"))
    graft.pipeline.MkvOps.mkvBlockTableRanged(files, "media_path", "media_id")
  }

  /** [[videoFramesMp4]] through EBML: real PNG frames as SimpleBlock
    * payloads across two clusters, the block table driving the shared
    * stride-sample + decode — identical output to the other five
    * container forms, one oracle. */
  def videoFramesMkv(spark: SparkSession, sfDir: String): DataFrame = {
    val ids = Tables.read(spark, sfDir, "documents").select(col("doc_id"))
    graft.pipeline.MkvOps.sampleMkvFrames(
      graft.pipeline.MkvOps.encodeSyntheticMkvVideo(ids, "doc_id"),
      "content", "media_id", VF_STRIDE)
  }

  /** [[videoFramesMkv]] off on-disk files: ranged header-hop block
    * tables + range-partitioned payload fetch/decode; identical output,
    * shared oracle. */
  def videoFramesMkvRanged(spark: SparkSession, sfDir: String): DataFrame = {
    val files = stagedFiles(spark, sfDir, "mkvv-ranged", ".mkv")(
      graft.pipeline.MkvOps.encodeSyntheticMkvVideo(
        Tables.read(spark, sfDir, "documents").select(col("doc_id")),
        "doc_id"))
    graft.pipeline.MkvOps.sampleMkvFramesRanged(
      files, "media_path", "media_id", VF_STRIDE)
  }

  /** [[videoFramesAvi]] with the frames REALLY coded as JPEG (Motion-
    * JPEG, the classic capture-card/webcam AVI codec): the identical
    * RIFF walk demuxes '00dc' chunks, the identical ImageIO decode
    * sniffs and decodes JPEG — zero new decode plumbing for a second,
    * LOSSY codec. Output keeps the decode-derived facts that survive
    * lossy coding exactly (dims, frame count, order); the pixel sums a
    * lossless codec would oracle-check are pinned JVM-side instead
    * (MjpegAviSpec: demuxed sums == an independent decode of the same
    * JPEG bytes). */
  def videoFramesMjpeg(spark: SparkSession, sfDir: String): DataFrame = {
    val ids = Tables.read(spark, sfDir, "documents").select(col("doc_id"))
    val avis = MultimodalOps.encodeSyntheticAvi(ids, "doc_id", codec = "MJPG")
    MultimodalOps.sampleAviFrames(avis, "content", "media_id", VF_STRIDE)
      .select(col("media_id"), col("frame_idx"), col("width"), col("height"))
  }

  /** [[videoFramesSql]] restricted to the lossy-safe columns. */
  def videoFramesDimsSql: String =
    s"""WITH d AS (
       |  SELECT doc_id AS media_id, 3 + doc_id % 4 AS k FROM documents
       |), fj AS (
       |  SELECT media_id, unnest(range(0, k)) AS j FROM d
       |), sampled AS (
       |  SELECT media_id, j, media_id * 8 + j AS fid FROM fj
       |  WHERE j % $VF_STRIDE = 0
       |)
       |SELECT media_id, CAST(j AS BIGINT) AS frame_idx,
       |  CAST(8 + fid % 9 AS BIGINT) AS width,
       |  CAST(8 + fid % 7 AS BIGINT) AS height
       |FROM sampled""".stripMargin

  /** The resolved ISO-BMFF sample table of every doc's synthetic MP4:
    * real big-endian box walk (moov/trak/mdia/minf/stbl;
    * stts/stss/stsz/stsc/stco-or-co64), one row per sample. Corpus-wide
    * coverage of the walker's branches is built into the encoder — odd
    * ids store 64-bit co64 offsets, ids ≡ 3 (mod 4) a version-1 mdhd —
    * while the ORACLE only ever sees the generator formulas. */
  def videoMp4Meta(spark: SparkSession, sfDir: String): DataFrame = {
    val ids = Tables.read(spark, sfDir, "documents").select(col("doc_id"))
    val mp4s = MultimodalOps.encodeSyntheticMp4(ids, "doc_id")
    MultimodalOps.mp4SampleTable(mp4s, "content", "media_id")
  }

  /** [[videoFrames]] through the ISO-BMFF container: real PNG frames
    * ride as MP4 samples, the stbl walk resolves their offsets/sizes,
    * and the sampled payloads really decode — identical output to the
    * frame-pack and AVI forms, so all three share one oracle. */
  def videoFramesMp4(spark: SparkSession, sfDir: String): DataFrame = {
    val ids = Tables.read(spark, sfDir, "documents").select(col("doc_id"))
    val mp4s = MultimodalOps.encodeSyntheticMp4Video(ids, "doc_id")
    MultimodalOps.sampleMp4Frames(mp4s, "content", "media_id", VF_STRIDE)
  }

  /** [[videoMp4Meta]]'s corpus written to real files in a fresh temp
    * dir, then resolved through the RANGED path: content-free listing +
    * id parsed from the filename + per-file positioned reads of the box
    * headers and moov payload only. Identical output to the in-memory
    * walk — the oracle carries over untouched — so a green row proves
    * the no-ceiling path end to end on real on-disk files. */
  def videoMp4MetaRanged(spark: SparkSession, sfDir: String): DataFrame = {
    val files = stagedFiles(spark, sfDir, "mp4-ranged", ".mp4")(
      MultimodalOps.encodeSyntheticMp4(
        Tables.read(spark, sfDir, "documents").select(col("doc_id")),
        "doc_id"))
    MultimodalOps.mp4SampleTableRanged(files, "media_path", "media_id")
  }

  /** [[videoFramesMp4]] through the ranged path: same on-disk corpus
    * discipline as [[videoMp4MetaRanged]], but the resolved table drives
    * BYTE-RANGE payload fetches of only the stride-kept samples, each
    * really decoded. Shares the one frame-formula oracle. */
  def videoFramesMp4Ranged(spark: SparkSession, sfDir: String): DataFrame = {
    val files = stagedFiles(spark, sfDir, "mp4v-ranged", ".mp4")(
      MultimodalOps.encodeSyntheticMp4Video(
        Tables.read(spark, sfDir, "documents").select(col("doc_id")),
        "doc_id"))
    MultimodalOps.sampleMp4FramesRanged(
      files, "media_path", "media_id", VF_STRIDE)
  }

  /** [[videoFramesMp4Ranged]] through the two-phase, intra-file-parallel
    * decode (kept samples range-partitioned on (path, offset)); identical
    * output, shared oracle. */
  def videoFramesMp4RangedParallel(spark: SparkSession,
                                   sfDir: String): DataFrame = {
    val files = stagedFiles(spark, sfDir, "mp4v-ranged", ".mp4")(
      MultimodalOps.encodeSyntheticMp4Video(
        Tables.read(spark, sfDir, "documents").select(col("doc_id")),
        "doc_id"))
    MultimodalOps.sampleMp4FramesRangedParallel(
      files, "media_path", "media_id", VF_STRIDE)
  }

  /** Mirrors synthMp4Samples/SampleSize/Timescale/Delta/Gap and the
    * encoder's fixed layout: mdat payload starts at byte 32 (24-byte
    * ftyp + 8-byte mdat header), chunk 2 = samples ≥ ceil(k/2), shifted
    * past the unreferenced inter-chunk gap; every 3rd sample is sync. */
  def videoMp4MetaSql: String =
    s"""WITH d AS (
       |  SELECT doc_id AS media_id, 4 + doc_id % 5 AS k,
       |    100 + doc_id % 50 AS delta,
       |    CAST(CASE doc_id % 3 WHEN 0 THEN 600 WHEN 1 THEN 1000
       |         ELSE 90000 END AS BIGINT) AS timescale,
       |    (doc_id % 7) + 1 AS gap
       |  FROM documents
       |), s AS (
       |  SELECT media_id, k, delta, timescale, gap,
       |    unnest(range(0, k)) AS i
       |  FROM d
       |), sz AS (
       |  SELECT *, 50 + (media_id * 7 + i * 13) % 90 AS size FROM s
       |), o AS (
       |  SELECT *, 32 + CAST(COALESCE(sum(size) OVER (
       |      PARTITION BY media_id ORDER BY i
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |    + CASE WHEN i >= (k + 1) // 2 THEN gap ELSE 0 END AS "offset"
       |  FROM sz
       |)
       |SELECT media_id, i AS sample_idx, "offset", size,
       |  i * delta AS dts, i % 3 = 0 AS is_sync, timescale
       |FROM o""".stripMargin

  private val AF_FRAME = 20   // samples per energy frame
  private val AF_QUANT = 500L // energy quantization step

  /** Audio near-dup fingerprints: REAL decode → frame energies →
    * quantized level sequence → the VERIFIED winnowing operator over it
    * (levels as tokens). Two clips sharing any w+k−1 = 6-frame run of
    * quantized energies share a fingerprint — the local-overlap
    * guarantee, now on audio; robust to amplitude noise below the
    * quantization step by construction. */
  def audioFingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    val ids = Tables.read(spark, sfDir, "documents").select(col("doc_id"))
    val wav = MultimodalOps.encodeSyntheticWav(ids, "doc_id")
    val en = MultimodalOps.audioFrameEnergies(wav, "content", "media_id", AF_FRAME)
    val seqs = en
      .select(col("media_id"), col("frame_idx").as("f"),
        call_function("div", col("energy"), lit(AF_QUANT)).cast("string").as("t"))
      .groupBy(col("media_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("f"), col("t")))),
        s => s.getField("t")), " ").as("lvl_text"))
    graft.pipeline.TextOps.winnowFingerprints(seqs, "lvl_text", "media_id",
      shingleK = 3, window = 4)
  }

  /** The oracle rebuilds the frame energies from the sample formula,
    * quantizes, hashes the level tokens, and reruns the winnow min-window
    * arithmetic — engine bytes never consulted. */
  def audioFingerprintSql: String = {
    val ph = graft.functions.StringPolyHash.polyHashSql("t")
    val comb = graft.functions.TokenShingleHash.combineSql("th", 3)
    s"""WITH d AS (
       |  SELECT doc_id AS media_id, 200 + doc_id % 57 AS n FROM documents
       |), sm AS (
       |  SELECT media_id, n, unnest(range(0, n)) AS i FROM d
       |), fr AS (
       |  SELECT media_id, i // $AF_FRAME AS f,
       |    CAST(sum(abs((media_id * 31 + i * 17) % 2000 - 1000)) AS BIGINT) AS e
       |  FROM sm GROUP BY media_id, f
       |), tht AS (
       |  SELECT media_id,
       |    list_transform(list(CAST(e // $AF_QUANT AS VARCHAR) ORDER BY f),
       |      t -> $ph) AS th
       |  FROM fr GROUP BY media_id
       |), sh AS (
       |  SELECT media_id, $comb AS hs FROM tht
       |), fp AS (
       |  SELECT media_id,
       |    CASE WHEN len(hs) < 4 THEN [list_min(hs)]
       |    ELSE list_distinct(list_transform(
       |      range(1, len(hs) - 4 + 2),
       |      i -> list_min(hs[i:i+3]))) END AS fps
       |  FROM sh WHERE len(hs) > 0
       |)
       |SELECT media_id, unnest(fps) AS fingerprint FROM fp""".stripMargin
  }

  /** Columnar RIFF header parse over REAL WAV bytes (the audio twin of
    * the PNG IHDR walk): every doc_id becomes a formula PCM16 clip via
    * the real encoder; the oracle never sees the bytes — it recomputes
    * every header field from the generator formulas, so the row only
    * matches if the 44-byte canonical header and the byte-arithmetic
    * parse agree exactly. */
  def audioMeta(spark: SparkSession, sfDir: String): DataFrame = {
    val ids = Tables.read(spark, sfDir, "documents").select(col("doc_id"))
    MultimodalOps.encodeSyntheticWav(ids, "doc_id")
      .select(col("media_id"), MultimodalOps.wavMeta(col("content")).as("m"))
      .select(col("media_id"), col("m.*"))
  }

  def audioMetaSql: String =
    """SELECT doc_id AS media_id,
      |  CAST(44 + 2 * (200 + doc_id % 57) AS BIGINT) AS n_bytes,
      |  TRUE AS format_ok,
      |  CAST(1 AS BIGINT) AS n_channels,
      |  CAST(8000 AS BIGINT) AS sample_rate,
      |  CAST(16 AS BIGINT) AS bits_per_sample,
      |  CAST(200 + doc_id % 57 AS BIGINT) AS n_samples
      |FROM documents""".stripMargin

  /** WEBP metadata round-trip: every doc becomes a spec-layout WEBP of
    * its formula variant (a third of the corpus each for lossy /
    * lossless / extended, so all three header layouts are exercised),
    * and the columnar parse recovers variant, dimensions, and the
    * alpha flag; the oracle recomputes everything from the formulas. */
  def mediaMetaWebp(spark: SparkSession, sfDir: String): DataFrame = {
    val ids = Tables.read(spark, sfDir, "documents").select(col("doc_id"))
    MultimodalOps.encodeSyntheticWebp(ids, "doc_id")
      .select(col("media_id"), MultimodalOps.webpMeta(col("content")).as("m"))
      .select(col("media_id"), col("m.*"))
  }

  def mediaMetaWebpSql: String =
    """WITH d AS (
      |  SELECT doc_id AS media_id,
      |    CASE doc_id % 3 WHEN 0 THEN 10 WHEN 1 THEN 5 ELSE 10 END
      |      + 10 + doc_id % 20 AS p
      |  FROM documents
      |)
      |SELECT media_id,
      |  CAST(20 + p + (p % 2) AS BIGINT) AS n_bytes,
      |  TRUE AS format_ok,
      |  CASE media_id % 3 WHEN 0 THEN 'lossy' WHEN 1 THEN 'lossless'
      |       ELSE 'extended' END AS variant,
      |  CAST(16 + media_id % 200 AS BIGINT) AS width,
      |  CAST(16 + (media_id * 7) % 150 AS BIGINT) AS height,
      |  media_id % 3 <> 0 AND media_id % 2 = 1 AS has_alpha
      |FROM d""".stripMargin

  /** FLAC STREAMINFO round-trip: every doc becomes a spec-layout FLAC
    * head (fLaC + STREAMINFO-first + PADDING + opaque frame bytes) and
    * the columnar fixed-offset parse recovers rate, channels, bits,
    * the 36-bit total-sample count (every 5th clip crosses 2^33), and
    * the 16-byte MD5; the oracle recomputes all of it from the
    * generator formulas without seeing a byte. */
  def audioMetaFlac(spark: SparkSession, sfDir: String): DataFrame = {
    val ids = Tables.read(spark, sfDir, "documents").select(col("doc_id"))
    MultimodalOps.encodeSyntheticFlac(ids, "doc_id")
      .select(col("media_id"), MultimodalOps.flacMeta(col("content")).as("m"))
      .select(col("media_id"), col("m.*"))
  }

  def audioMetaFlacSql: String =
    """SELECT doc_id AS media_id,
      |  CAST(46 + (doc_id % 17) + (10 + doc_id % 23) AS BIGINT) AS n_bytes,
      |  TRUE AS format_ok,
      |  CAST(1 + doc_id % 2 AS BIGINT) AS n_channels,
      |  CAST(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 22050
      |       ELSE 44100 END AS BIGINT) AS sample_rate,
      |  CAST(8 + (doc_id % 3) * 8 AS BIGINT) AS bits_per_sample,
      |  CAST(1000 + doc_id * 37
      |    + CASE WHEN doc_id % 5 = 0 THEN 8589934592 ELSE 0 END
      |    AS BIGINT) AS n_samples,
      |  list_aggregate(list_transform(range(0, 16),
      |    j -> lpad(upper(to_hex((doc_id * 11 + j * 29) % 256)), 2, '0')),
      |    'string_agg', '') AS md5_hex
      |FROM documents""".stripMargin

  /** MP3 stream-facts round-trip: every doc becomes an MPEG-1 Layer
    * III stream (optional ID3v2 with syncsafe length on every 5th
    * clip, per-frame header-derived lengths, CBR and VBR clips) and
    * the frame-header walk recovers count / exact samples / rate /
    * channels / bitrate envelope / VBR verdict; the oracle recomputes
    * everything from the formulas. */
  def audioMetaMp3(spark: SparkSession, sfDir: String): DataFrame = {
    val ids = Tables.read(spark, sfDir, "documents").select(col("doc_id"))
    MultimodalOps.mp3Meta(
      MultimodalOps.encodeSyntheticMp3(ids, "doc_id"), "content", "media_id")
  }

  def audioMetaMp3Sql: String =
    """WITH d AS (
      |  SELECT doc_id AS media_id, 20 + doc_id % 30 AS k,
      |    CAST(CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
      |         ELSE 32000 END AS BIGINT) AS rate,
      |    CAST(1 + doc_id % 2 AS BIGINT) AS ch,
      |    doc_id % 4 = 0 AS vbr
      |  FROM documents
      |), fr AS (
      |  SELECT media_id, k, rate, ch, vbr, unnest(range(0, k)) AS i FROM d
      |), kb AS (
      |  SELECT *, CAST(([32,40,48,56,64,80,96,112,128,160,192,224,256,320])[
      |    CAST(CASE WHEN vbr THEN 1 + (media_id + i * 7) % 14
      |         ELSE 1 + media_id % 14 END AS INT)] AS BIGINT) AS kbps
      |  FROM fr
      |)
      |SELECT media_id, CAST(any_value(k) AS BIGINT) AS n_frames,
      |  CAST(any_value(k) * 1152 AS BIGINT) AS n_samples,
      |  any_value(rate) AS sample_rate, any_value(ch) AS n_channels,
      |  min(kbps) AS bitrate_min_kbps, max(kbps) AS bitrate_max_kbps,
      |  count(DISTINCT kbps) > 1 AS is_vbr
      |FROM kb GROUP BY media_id""".stripMargin

  /** REAL decode round-trip for audio: formula clips through the real
    * WAV encoder, then `AudioSystem`'s real PCM reader extracts exact
    * amplitude statistics; the oracle recomputes them from the sample
    * formula in pure integer SQL. */
  def audioDecode(spark: SparkSession, sfDir: String): DataFrame = {
    val ids = Tables.read(spark, sfDir, "documents").select(col("doc_id"))
    val wav = MultimodalOps.encodeSyntheticWav(ids, "doc_id")
    MultimodalOps.decodeAudioFeatures(wav, "content", "media_id")
  }

  def audioDecodeSql: String =
    """WITH d AS (
      |  SELECT doc_id AS media_id, 200 + doc_id % 57 AS n FROM documents
      |), sm AS (
      |  SELECT media_id, n, unnest(range(0, n)) AS i FROM d
      |), v AS (
      |  SELECT media_id, n, (media_id * 31 + i * 17) % 2000 - 1000 AS s
      |  FROM sm
      |), agg AS (
      |  SELECT media_id, CAST(any_value(n) AS BIGINT) AS n_samples,
      |    CAST(sum(s) AS BIGINT) AS sum_amp,
      |    CAST(sum(abs(s)) AS BIGINT) AS sum_abs,
      |    CAST(max(abs(s)) AS BIGINT) AS peak_abs
      |  FROM v GROUP BY media_id
      |)
      |SELECT media_id, TRUE AS decode_ok, n_samples, sum_amp, sum_abs,
      |  peak_abs,
      |  CAST((sum_abs * 1000) // n_samples AS BIGINT) AS mean_abs_x1000
      |FROM agg""".stripMargin

  /** Hamming-radius image duplicate classes — the retouched-image
    * variant of [[mediaDupGroups]] (exact-equality grouping misses a
    * 1-bit hash drift): every distinct image gets a PLANTED retouched
    * copy (id+1000) whose aHash differs in exactly one deterministic
    * bit (bit id%64 — some flips land in the a half, some in b), then
    * banded Hamming-≤1 pairs + connected components label every image.
    * Each planted copy MUST land in its original's component — a class
    * exact grouping cannot recover — and genuinely 0/1-bit-apart
    * formula images merge transitively the same way on both engines. */
  def mediaDupRadius(spark: SparkSession, sfDir: String): DataFrame = {
    val keys = Tables.read(spark, sfDir, "documents")
      .select((col("doc_id") % 50).as("img_key")).distinct()
    val hashed = MultimodalOps.imageAHash(
      MultimodalOps.encodeSyntheticPng(keys, "img_key"), "content", "media_id")
      .select(col("media_id"), col("ahash_a"), col("ahash_b"))
    val variants = hashed.select(
      (col("media_id") + 1000).as("media_id"),
      expr("""CASE WHEN media_id % 64 < 32
             |  THEN ahash_a ^ shiftleft(CAST(1 AS BIGINT), CAST(media_id % 64 AS INT))
             |  ELSE ahash_a END""".stripMargin).as("ahash_a"),
      expr("""CASE WHEN media_id % 64 >= 32
             |  THEN ahash_b ^ shiftleft(CAST(1 AS BIGINT), CAST(media_id % 64 - 32 AS INT))
             |  ELSE ahash_b END""".stripMargin).as("ahash_b"))
    MultimodalOps.ahashDupComponents(hashed.unionByName(variants),
      "media_id", maxHamming = 1, bands = 2)
  }

  /** The oracle rebuilds the hashes from the pixel formulas, plants the
    * same bit flips, finds Hamming-≤1 pairs by brute force (the exact
    * verifier the banded engine path must agree with), and labels
    * components with a recursive CTE. */
  def mediaDupRadiusSql: String =
    """WITH RECURSIVE d AS (
      |  SELECT DISTINCT doc_id % 50 AS media_id,
      |    8 + (doc_id % 50) % 9 AS w, 8 + (doc_id % 50) % 7 AS h
      |  FROM documents
      |), xs AS (
      |  SELECT media_id, w, h, unnest(range(0, w)) AS x FROM d
      |), px AS (
      |  SELECT media_id, w, h, x, unnest(range(0, h)) AS y FROM xs
      |), cells AS (
      |  SELECT media_id, (y * 8) // h * 8 + (x * 8) // w AS idx,
      |    CAST(sum((media_id * 31 + x * 7 + y * 13) % 256
      |            + (media_id * 17 + x * 11 + y * 3) % 256
      |            + (media_id * 23 + x * 5 + y * 19) % 256) AS BIGINT) AS v,
      |    count(*) AS n
      |  FROM px GROUP BY media_id, idx
      |), tot AS (
      |  SELECT media_id, sum(v) AS g, sum(n) AS npx FROM cells GROUP BY media_id
      |), bits AS (
      |  SELECT c.media_id, c.idx,
      |    CASE WHEN c.v * t.npx > t.g * c.n THEN 1::BIGINT ELSE 0::BIGINT END AS bit
      |  FROM cells c JOIN tot t USING (media_id)
      |), hashes AS (
      |  SELECT media_id,
      |    CAST(sum(CASE WHEN idx < 32 THEN bit << idx ELSE 0 END) AS BIGINT) AS ahash_a,
      |    CAST(sum(CASE WHEN idx >= 32 THEN bit << (idx - 32) ELSE 0 END) AS BIGINT) AS ahash_b
      |  FROM bits GROUP BY media_id
      |), allh AS (
      |  SELECT media_id, ahash_a, ahash_b FROM hashes
      |  UNION ALL
      |  SELECT media_id + 1000,
      |    CASE WHEN media_id % 64 < 32
      |      THEN xor(ahash_a, 1::BIGINT << CAST(media_id % 64 AS INTEGER))
      |      ELSE ahash_a END,
      |    CASE WHEN media_id % 64 >= 32
      |      THEN xor(ahash_b, 1::BIGINT << CAST(media_id % 64 - 32 AS INTEGER))
      |      ELSE ahash_b END
      |  FROM hashes
      |), pairs AS (
      |  SELECT p.media_id AS a, q.media_id AS b
      |  FROM allh p JOIN allh q ON p.media_id < q.media_id
      |  WHERE bit_count(xor(p.ahash_a, q.ahash_a))
      |      + bit_count(xor(p.ahash_b, q.ahash_b)) <= 1
      |), edges AS (
      |  SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs
      |), reach AS (
      |  SELECT a AS id, a AS root FROM edges
      |  UNION
      |  SELECT e.b AS id, r.root FROM reach r JOIN edges e ON e.a = r.id
      |), comp AS (
      |  SELECT id, min(root) AS component FROM reach GROUP BY id
      |)
      |SELECT h.media_id, coalesce(c.component, h.media_id) AS component
      |FROM allh h LEFT JOIN comp c ON c.id = h.media_id""".stripMargin

  /** The stored-fingerprint lifecycle end to end: 50 distinct images
    * (keys 0..49) land as two segments — evens BUILD the artifact,
    * odds APPEND, the whole corpus re-appends as an idempotent no-op
    * (the anti-join walks nothing) — then 60 probe images (keys 0..59)
    * probe it at Hamming ≤ 1. Keys 0..49 must rediscover their stored
    * originals (hamming 0, plus whatever true ≤1 neighbours exist —
    * the oracle recomputes ALL of them from the pixel formulas, so
    * accidental near-pairs are covered, not flaky); keys 50..59 match
    * only if a genuine ≤1 neighbour exists among the stored hashes.
    * The window then COMPACTS before the probe (round 16): the oracle
    * is unchanged by construction — compaction rewrites the file
    * layout, never the fingerprints — so this row gates the whole
    * build → append → re-drop → compact → probe lifecycle. */
  def mediaDupIndexQ(spark: SparkSession, sfDir: String): DataFrame = {
    val keys = Tables.read(spark, sfDir, "documents")
      .select((col("doc_id") % 60).as("img_key")).distinct()
    val corpusImgs = MultimodalOps.encodeSyntheticPng(
      keys.filter(col("img_key") < 50), "img_key")
    val probes = MultimodalOps.encodeSyntheticPng(keys, "img_key")
    val idxPath = graft.sources.TableSources.scratchDir("graft-mediahash")
    MultimodalOps.writeMediaHashIndex(
      corpusImgs.filter(col("media_id") % 2 === 0), "content", "media_id",
      idxPath, bands = 2)
    MultimodalOps.appendMediaHashIndex(spark, idxPath,
      corpusImgs.filter(col("media_id") % 2 === 1), "content", "media_id")
    MultimodalOps.appendMediaHashIndex(spark, idxPath,
      corpusImgs, "content", "media_id") // idempotent re-drop
    MultimodalOps.compactMediaHashIndex(spark, idxPath)
    MultimodalOps.probeMediaHashIndex(spark, idxPath, probes,
      "content", "media_id", maxHamming = 1)
  }

  /** The pixel-formula aHash CTE chain (xs→…→hashes) over a
    * caller-supplied CTE `d` carrying (media_id, w, h) — shared by
    * every oracle that must recompute fingerprints. */
  private def ahashCtesFromD: String =
    """xs AS (
      |  SELECT media_id, w, h, unnest(range(0, w)) AS x FROM d
      |), px AS (
      |  SELECT media_id, w, h, x, unnest(range(0, h)) AS y FROM xs
      |), cells AS (
      |  SELECT media_id, (y * 8) // h * 8 + (x * 8) // w AS idx,
      |    CAST(sum((media_id * 31 + x * 7 + y * 13) % 256
      |            + (media_id * 17 + x * 11 + y * 3) % 256
      |            + (media_id * 23 + x * 5 + y * 19) % 256) AS BIGINT) AS v,
      |    count(*) AS n
      |  FROM px GROUP BY media_id, idx
      |), tot AS (
      |  SELECT media_id, sum(v) AS g, sum(n) AS npx FROM cells GROUP BY media_id
      |), bits AS (
      |  SELECT c.media_id, c.idx,
      |    CASE WHEN c.v * t.npx > t.g * c.n THEN 1::BIGINT ELSE 0::BIGINT END AS bit
      |  FROM cells c JOIN tot t USING (media_id)
      |), hashes AS (
      |  SELECT media_id,
      |    CAST(sum(CASE WHEN idx < 32 THEN bit << idx ELSE 0 END) AS BIGINT) AS ahash_a,
      |    CAST(sum(CASE WHEN idx >= 32 THEN bit << (idx - 32) ELSE 0 END) AS BIGINT) AS ahash_b
      |  FROM bits GROUP BY media_id
      |)""".stripMargin

  /** The shared hash CTEs: formula pixels → 8×8 cell means → the two
    * bigint halves, for keys 0..59 (probes; stored = keys < 50). */
  private def mediaHashOracleCtes: String =
    s"""WITH d AS (
       |  SELECT DISTINCT doc_id % 60 AS media_id,
       |    8 + (doc_id % 60) % 9 AS w, 8 + (doc_id % 60) % 7 AS h
       |  FROM documents
       |), $ahashCtesFromD""".stripMargin

  def mediaDupIndexSql: String =
    s"""$mediaHashOracleCtes
       |SELECT p.media_id AS probe_id, s.media_id AS match_id,
       |  CAST(bit_count(xor(p.ahash_a, s.ahash_a))
       |     + bit_count(xor(p.ahash_b, s.ahash_b)) AS BIGINT) AS hamming
       |FROM hashes p JOIN hashes s ON s.media_id < 50
       |WHERE bit_count(xor(p.ahash_a, s.ahash_a))
       |    + bit_count(xor(p.ahash_b, s.ahash_b)) <= 1""".stripMargin

  /** [[mediaDupIndexQ]]'s admission filter: probes with NO stored
    * near-duplicate survive — the per-segment gate a crawl pipeline
    * runs before admitting new images to the training corpus. */
  def mediaAdmitIndexQ(spark: SparkSession, sfDir: String): DataFrame = {
    val keys = Tables.read(spark, sfDir, "documents")
      .select((col("doc_id") % 60).as("img_key")).distinct()
    val corpusImgs = MultimodalOps.encodeSyntheticPng(
      keys.filter(col("img_key") < 50), "img_key")
    val probes = MultimodalOps.encodeSyntheticPng(keys, "img_key")
    val idxPath = graft.sources.TableSources.scratchDir("graft-mediahash-a")
    MultimodalOps.writeMediaHashIndex(
      corpusImgs, "content", "media_id", idxPath, bands = 2)
    MultimodalOps.dedupMediaAgainstIndex(spark, idxPath, probes,
        "content", "media_id", maxHamming = 1)
      .select(col("media_id"))
  }

  def mediaAdmitIndexSql: String =
    s"""$mediaHashOracleCtes
       |SELECT p.media_id FROM hashes p
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM hashes s WHERE s.media_id < 50
       |    AND bit_count(xor(p.ahash_a, s.ahash_a))
       |      + bit_count(xor(p.ahash_b, s.ahash_b)) <= 1)""".stripMargin

  /** The MULTIMODAL crawl front door end to end, one declarative plan:
    * stored mixed-modality .warc.gz files (image responses carry real
    * PNG bytes as their HTTP payload) → the windowed byte-range index →
    * status-200 survivors fetched by coalesced positioned reads →
    * payload SNIFF (PNG magic — headers lie; the body's first four
    * bytes don't) → REAL decode + perceptual fingerprint of every
    * fetched image. Output: (media_id, record_idx, ahash_a, ahash_b)
    * per 200-image-record — the relation the stored fingerprint index
    * ingests. The oracle rebuilds everything from formulas: which
    * (file, response) pairs are 200-images, which formula image each
    * carries, and that image's fingerprint from its pixels. */
  def e2eCrawlMediaQ(spark: SparkSession, sfDir: String): DataFrame = {
    val keys = Tables.read(spark, sfDir, "documents")
      .select((col("doc_id") % 40).as("warc_key")).distinct()
    val files = stagedFiles(spark, sfDir, "warc-media", ".warc.gz")(
      graft.pipeline.WarcOps.encodeSyntheticWarcGzMedia(keys, "warc_key"))
    val index = graft.pipeline.WarcOps.warcMemberIndexRanged(
      files, "media_path", "media_id")
    val survivors = index.filter(col("warc_type") === "response" &&
      col("http_status") === 200)
    val fetched = graft.pipeline.WarcOps.warcFetchRanged(
      files, "media_path", "media_id", survivors, coalesceGap = 1024L)
    val images = fetched
      .filter(substring(col("body"), 1, 4) === "\u0089PNG")
      // body is the byte-preserving ISO-8859-1 string; encode() with
      // the same charset is its exact inverse (a bare binary cast
      // would re-encode as UTF-8 and corrupt every byte >= 0x80)
      .select((col("media_id") * 100 + col("record_idx")).as("pk"),
        encode(col("body"), "ISO-8859-1").as("content"))
    MultimodalOps.imageAHash(images, "content", "pk")
      .filter(col("decode_ok"))
      .select(expr("CAST(media_id div 100 AS BIGINT)").as("media_id"),
        (col("media_id") % 100).as("record_idx"),
        col("ahash_a"), col("ahash_b"))
  }

  def e2eCrawlMediaSql: String =
    s"""WITH ids AS (
       |  SELECT DISTINCT doc_id % 40 AS wid FROM documents
       |), resp AS (
       |  SELECT wid, unnest(range(0, 3 + wid % 4)) AS r FROM ids
       |), imgs AS (
       |  SELECT wid, r, (wid * 8 + r) % 40 AS img_key FROM resp
       |  WHERE (wid + r) % 3 = 0 AND (wid + r) % 5 != 0
       |), d AS (
       |  SELECT DISTINCT img_key AS media_id,
       |    8 + img_key % 9 AS w, 8 + img_key % 7 AS h FROM imgs
       |), $ahashCtesFromD
       |SELECT i.wid AS media_id, CAST(i.r + 1 AS BIGINT) AS record_idx,
       |  h.ahash_a, h.ahash_b
       |FROM imgs i JOIN hashes h ON h.media_id = i.img_key""".stripMargin

  /** CROSS-MODAL pair mining end to end, one declarative plan: the
    * paired .warc.gz corpus (pages embed `<img src alt>` tags whose
    * targets are often in OTHER files, and sometimes dangle) →
    * byte-range index → ranged fetch of 200-survivors → page/image
    * split by payload sniff → tag extraction + real decode +
    * fingerprint → the URI resolve join. Output: one (page_uri,
    * img_uri, alt_text, ahash_a, ahash_b) row per resolved reference —
    * the CLIP-style training-pair relation. The oracle rebuilds the
    * reference graph, its dangling-edge drops, and every fingerprint
    * from the generator formulas without running any operator. */
  def mediaTextPairsQ(spark: SparkSession, sfDir: String): DataFrame = {
    val keys = Tables.read(spark, sfDir, "documents")
      .select((col("doc_id") % 40).as("warc_key")).distinct()
    val files = stagedFiles(spark, sfDir, "warc-paired", ".warc.gz")(
      graft.pipeline.WarcOps.encodeSyntheticWarcGzPaired(keys, "warc_key"))
    val index = graft.pipeline.WarcOps.warcMemberIndexRanged(
      files, "media_path", "media_id")
    val survivors = index.filter(col("warc_type") === "response" &&
      col("http_status") === 200)
    val fetched = graft.pipeline.WarcOps.warcFetchRanged(
      files, "media_path", "media_id", survivors, coalesceGap = 1024L)
    val pages = fetched.filter(substring(col("body"), 1, 5) === "<html")
      .select(col("target_uri").as("page_uri"), col("body").as("html"))
    val images = fetched
      .filter(substring(col("body"), 1, 4) === "\u0089PNG")
      .select((col("media_id") * 100 + col("record_idx")).as("pk"),
        col("target_uri").as("img_uri"),
        // byte-preserving ISO-8859-1 inverse — the e2eCrawlMediaQ seam
        encode(col("body"), "ISO-8859-1").as("content"))
    MultimodalOps.imageTextPairs(pages, "page_uri", "html",
      images, "pk", "img_uri", "content")
  }

  def mediaTextPairsSql: String =
    s"""WITH ids AS (
       |  SELECT DISTINCT doc_id % 40 AS wid FROM documents
       |), resp AS (
       |  SELECT wid, unnest(range(0, 3 + wid % 4)) AS r FROM ids
       |), pg AS (
       |  SELECT wid, r FROM resp
       |  WHERE (wid + r) % 3 != 0 AND (wid + r) % 5 != 0
       |), refs AS (
       |  SELECT wid, r, unnest(range(0, 1 + (wid + r) % 2)) AS j FROM pg
       |), tgt AS (
       |  SELECT wid, r, j,
       |    (wid * 3 + r * 5 + j * 7) % 40 AS tid,
       |    (wid + r + 2 * j) % 4 AS tr
       |  FROM refs
       |), valid AS (
       |  SELECT v.wid, v.r, v.j, v.tid, v.tr FROM tgt v
       |  JOIN ids t ON t.wid = v.tid
       |  WHERE v.tr < 3 + v.tid % 4
       |    AND (v.tid + v.tr) % 3 = 0
       |    AND (v.tid + v.tr) % 5 != 0
       |), d AS (
       |  SELECT DISTINCT (tid * 8 + tr) % 40 AS media_id,
       |    8 + ((tid * 8 + tr) % 40) % 9 AS w,
       |    8 + ((tid * 8 + tr) % 40) % 7 AS h
       |  FROM valid
       |), $ahashCtesFromD
       |SELECT 'http://example.test/' || v.wid || '/' || v.r AS page_uri,
       |  'http://example.test/' || v.tid || '/' || v.tr AS img_uri,
       |  'alt' || v.wid || '_' || v.r || '_' || v.j
       |    || ' scene' || (v.wid + v.r + v.j) % 6 AS alt_text,
       |  h.ahash_a, h.ahash_b
       |FROM valid v
       |JOIN hashes h ON h.media_id = (v.tid * 8 + v.tr) % 40""".stripMargin

  /** Image dedup end to end: every doc re-encodes the image of
    * doc_id % 50, so each distinct image recurs ~n/50 times under
    * different doc ids; grouping the decoded corpus by perceptual hash
    * must recover exactly those duplicate classes (count + min-id
    * representative per class) — the image analogue of
    * `exactDupGroups`, through the REAL encode→decode→hash pipeline. */
  def mediaDupGroups(spark: SparkSession, sfDir: String): DataFrame = {
    val keys = Tables.read(spark, sfDir, "documents")
      .select(col("doc_id"), (col("doc_id") % 50).as("img_key"))
    // hash each DISTINCT image once (the content is a pure function of
    // the key), then re-attach the per-key doc counts and min-id
    // representatives — the duplicate classes of the full corpus
    // without decoding every copy (the batch economy a real image-dedup
    // pass wants: exact-payload dedup first, perceptual hash per
    // distinct payload)
    val hashed = MultimodalOps.imageAHash(
      MultimodalOps.encodeSyntheticPng(
        keys.select(col("img_key")).distinct(), "img_key"),
      "content", "media_id")
    val perKey = keys.groupBy(col("img_key"))
      .agg(count(lit(1)).as("n_imgs"), min(col("doc_id")).as("keep_id"))
    hashed.join(perKey, hashed("media_id") === perKey("img_key"))
      .groupBy(col("ahash_a"), col("ahash_b"))
      .agg(sum(col("n_imgs")).as("n_imgs"), min(col("keep_id")).as("keep_id"))
  }

  def mediaDupGroupsSql: String =
    """WITH d AS (
      |  SELECT DISTINCT doc_id % 50 AS media_id,
      |    8 + (doc_id % 50) % 9 AS w, 8 + (doc_id % 50) % 7 AS h
      |  FROM documents
      |), xs AS (
      |  SELECT media_id, w, h, unnest(range(0, w)) AS x FROM d
      |), px AS (
      |  SELECT media_id, w, h, x, unnest(range(0, h)) AS y FROM xs
      |), cells AS (
      |  SELECT media_id, (y * 8) // h * 8 + (x * 8) // w AS idx,
      |    CAST(sum((media_id * 31 + x * 7 + y * 13) % 256
      |            + (media_id * 17 + x * 11 + y * 3) % 256
      |            + (media_id * 23 + x * 5 + y * 19) % 256) AS BIGINT) AS v,
      |    count(*) AS n
      |  FROM px GROUP BY media_id, idx
      |), tot AS (
      |  SELECT media_id, sum(v) AS g, sum(n) AS npx FROM cells GROUP BY media_id
      |), bits AS (
      |  SELECT c.media_id, c.idx,
      |    CASE WHEN c.v * t.npx > t.g * c.n THEN 1::BIGINT ELSE 0::BIGINT END AS bit
      |  FROM cells c JOIN tot t USING (media_id)
      |), hashes AS (
      |  SELECT media_id,
      |    CAST(sum(CASE WHEN idx < 32 THEN bit << idx ELSE 0 END) AS BIGINT) AS ahash_a,
      |    CAST(sum(CASE WHEN idx >= 32 THEN bit << (idx - 32) ELSE 0 END) AS BIGINT) AS ahash_b
      |  FROM bits GROUP BY media_id
      |), per_key AS (
      |  SELECT doc_id % 50 AS media_id, count(*) AS n_imgs,
      |    min(doc_id) AS keep_id
      |  FROM documents GROUP BY doc_id % 50
      |)
      |SELECT h.ahash_a, h.ahash_b,
      |  CAST(sum(p.n_imgs) AS BIGINT) AS n_imgs, min(p.keep_id) AS keep_id
      |FROM hashes h JOIN per_key p USING (media_id)
      |GROUP BY h.ahash_a, h.ahash_b""".stripMargin

  /** REAL perceptual hashing round-trip: formula-pixel PNGs through the
    * JDK encoder, then the real decoder + 8×8 average-hash. The oracle
    * recomputes every cell sum and the exact cross-multiplied
    * bit-threshold from the generator formulas in pure integer SQL —
    * the row matches only if decode AND the pooling/threshold
    * arithmetic are bit-exact. */
  def mediaAHash(spark: SparkSession, sfDir: String): DataFrame = {
    val ids = Tables.read(spark, sfDir, "documents").select(col("doc_id"))
    val png = MultimodalOps.encodeSyntheticPng(ids, "doc_id")
    MultimodalOps.imageAHash(png, "content", "media_id")
  }

  def mediaAHashSql: String =
    """WITH d AS (
      |  SELECT doc_id AS media_id,
      |    8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
      |  FROM documents
      |), xs AS (
      |  SELECT media_id, w, h, unnest(range(0, w)) AS x FROM d
      |), px AS (
      |  SELECT media_id, w, h, x, unnest(range(0, h)) AS y FROM xs
      |), cells AS (
      |  SELECT media_id, (y * 8) // h * 8 + (x * 8) // w AS idx,
      |    CAST(sum((media_id * 31 + x * 7 + y * 13) % 256
      |            + (media_id * 17 + x * 11 + y * 3) % 256
      |            + (media_id * 23 + x * 5 + y * 19) % 256) AS BIGINT) AS v,
      |    count(*) AS n
      |  FROM px GROUP BY media_id, idx
      |), tot AS (
      |  SELECT media_id, sum(v) AS g, sum(n) AS npx FROM cells GROUP BY media_id
      |), bits AS (
      |  SELECT c.media_id, c.idx,
      |    CASE WHEN c.v * t.npx > t.g * c.n THEN 1::BIGINT ELSE 0::BIGINT END AS bit
      |  FROM cells c JOIN tot t USING (media_id)
      |)
      |SELECT media_id, TRUE AS decode_ok,
      |  CAST(sum(CASE WHEN idx < 32 THEN bit << idx ELSE 0 END) AS BIGINT) AS ahash_a,
      |  CAST(sum(CASE WHEN idx >= 32 THEN bit << (idx - 32) ELSE 0 END) AS BIGINT) AS ahash_b
      |FROM bits GROUP BY media_id""".stripMargin

  /** REAL decode round-trip: every doc_id becomes a formula-pixel RGB
    * image pushed through the JDK's real PNG ENCODER, then the real
    * `ImageIO` DECODER extracts per-channel pixel sums. The oracle never
    * sees the bytes — it recomputes the sums from the generator formulas
    * in pure integer SQL, so the row only matches if encode→decode is
    * pixel-exact (PNG is lossless and profile-free). */
  def mediaDecode(spark: SparkSession, sfDir: String): DataFrame = {
    val ids = Tables.read(spark, sfDir, "documents").select(col("doc_id"))
    val png = MultimodalOps.encodeSyntheticPng(ids, "doc_id")
    MultimodalOps.decodeImageFeatures(png, "content", "media_id")
  }

  /** Mirrors MultimodalOps.synthDims/synthRgb: w = 8 + id%9,
    * h = 8 + id%7, r = (id·31 + x·7 + y·13) % 256, g = (id·17 + x·11 +
    * y·3) % 256, b = (id·23 + x·5 + y·19) % 256. */
  def mediaDecodeSql: String =
    """WITH d AS (
      |  SELECT doc_id AS media_id,
      |    8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
      |  FROM documents
      |), xs AS (
      |  SELECT media_id, w, h, unnest(range(0, w)) AS x FROM d
      |), px AS (
      |  SELECT media_id, w, h, x, unnest(range(0, h)) AS y FROM xs
      |), s AS (
      |  SELECT media_id, w, h,
      |    CAST(sum((media_id * 31 + x * 7 + y * 13) % 256) AS BIGINT) AS sum_r,
      |    CAST(sum((media_id * 17 + x * 11 + y * 3) % 256) AS BIGINT) AS sum_g,
      |    CAST(sum((media_id * 23 + x * 5 + y * 19) % 256) AS BIGINT) AS sum_b
      |  FROM px GROUP BY media_id, w, h
      |)
      |SELECT media_id, TRUE AS decode_ok,
      |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |  CAST(w * h AS BIGINT) AS n_px, sum_r, sum_g, sum_b,
      |  (sum_r * 1000) // (w * h) AS mean_r_x1000
      |FROM s""".stripMargin

  /** documents → opaque binary payload table. */
  private def media(spark: SparkSession, sfDir: String): DataFrame =
    Tables.read(spark, sfDir, "documents")
      .select(col("doc_id").as("media_id"), col("text").cast("binary").as("content"))

  /** Real header parse, verified as a round-trip: payloads are synthetic
    * PNGs whose IHDR encodes (doc_id%640+1, doc_id%480+1); extractMeta
    * must recover exactly those from the BYTES (the oracle computes the
    * expected values from the generator formulas, not from the payload).
    * The digest is md5 over the payload's hex (DuckDB's md5 only takes
    * VARCHAR, and hex round-trips the bytes faithfully on both engines). */
  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame = {
    val png = Tables.read(spark, sfDir, "documents")
      .select(col("doc_id").as("media_id"),
        MultimodalOps.pngPayload(col("text"),
          col("doc_id") % 640 + 1, col("doc_id") % 480 + 1).as("content"))
    val m = png.withColumn("meta", MultimodalOps.extractMeta(col("content")))
    val (w, h) = (col("meta.width"), col("meta.height"))
    m.select(col("media_id"),
      col("meta.n_bytes").as("n_bytes"),
      md5(hex(col("content")).cast("binary")).as("digest"),
      w.as("width"), h.as("height"),
      col("meta.channels").as("channels"),
      // resample PLANNING from the header alone — the same integer rule
      // as the real resize kernel, no pixel work (these payloads carry
      // no raster; the pixel path is q_media_features / q_media_frames)
      MultimodalOps.resizedDim(w, w, h, 256L).as("resized_width"),
      MultimodalOps.resizedDim(h, w, h, 256L).as("resized_height"))
  }

  def mediaMetaSql: String =
    """WITH d AS (
      |  SELECT doc_id AS media_id,
      |    doc_id % 640 + 1 AS width, doc_id % 480 + 1 AS height,
      |    CAST(29 + length(text) AS BIGINT) AS n_bytes,
      |    md5('89504E470D0A1A0A' || '0000000D' || '49484452' ||
      |        lpad(to_hex(doc_id % 640 + 1), 8, '0') ||
      |        lpad(to_hex(doc_id % 480 + 1), 8, '0') ||
      |        '0806000000' || hex(text)) AS digest,
      |    CAST(4 AS BIGINT) AS channels
      |  FROM documents
      |)
      |SELECT media_id, n_bytes, digest, width, height, channels,
      |  CASE WHEN greatest(width, height) <= 256 THEN width
      |       ELSE greatest((width * 256) // greatest(width, height), 1)
      |       END AS resized_width,
      |  CASE WHEN greatest(width, height) <= 256 THEN height
      |       ELSE greatest((height * 256) // greatest(width, height), 1)
      |       END AS resized_height
      |FROM d""".stripMargin

  /** JPEG round-trip: payloads are synthetic baseline JPEGs (SOI → APP0 →
    * COM → SOF0) whose SOF0 encodes (doc_id%1024+16, doc_id%768+16);
    * withJpegMeta must recover exactly those by WALKING the marker chain
    * through the two non-SOF segments. The oracle computes the expected
    * values from the generator formulas, and the digest over the
    * assembled hex pins the payload bytes themselves. */
  def mediaMetaJpeg(spark: SparkSession, sfDir: String): DataFrame = {
    val jpg = Tables.read(spark, sfDir, "documents")
      .select(col("doc_id").as("media_id"),
        MultimodalOps.jpegPayload(col("text"),
          col("doc_id") % 1024 + 16, col("doc_id") % 768 + 16).as("content"))
    MultimodalOps.withJpegMeta(jpg, "content")
      .select(col("media_id"),
        octet_length(col("content")).cast("long").as("n_bytes"),
        md5(hex(col("content")).cast("binary")).as("digest"),
        col("jpeg_width").as("width"), col("jpeg_height").as("height"),
        col("jpeg_channels").as("channels"))
  }

  def mediaMetaJpegSql: String =
    """SELECT doc_id AS media_id,
      |  CAST(48 + length(text) AS BIGINT) AS n_bytes,
      |  md5('FFD8' || 'FFE000104A46494600010100000100010000' ||
      |      'FFFE00076772616674' || 'FFC0001108' ||
      |      lpad(to_hex(doc_id % 768 + 16), 4, '0') ||
      |      lpad(to_hex(doc_id % 1024 + 16), 4, '0') ||
      |      '03012200021101031101' || hex(text)) AS digest,
      |  CAST(doc_id % 1024 + 16 AS BIGINT) AS width,
      |  CAST(doc_id % 768 + 16 AS BIGINT) AS height,
      |  CAST(3 AS BIGINT) AS channels
      |FROM documents""".stripMargin

  /** Thumbnail cap for the resize-bearing rows — below the synthetic
    * dims (8..16 × 8..14), so nearly every image/frame really resamples. */
  private val THUMB_DIM = 8L

  /** REAL keyframe THUMBNAILS: the frame-pack clip demuxed, every
    * [[VF_STRIDE]]-th frame decoded and nearest-downscaled to fit
    * [[THUMB_DIM]], per-channel sums over the THUMBNAIL — the
    * frame-extraction shape a VLM pipeline feeds its vision encoder.
    * Nearest-neighbor is exact integer arithmetic, so the oracle
    * recomputes every thumbnail pixel from the frame formulas: source
    * pixel of thumb (x, y) is ((x·w)//dw, (y·h)//dh). */
  def mediaFrames(spark: SparkSession, sfDir: String): DataFrame = {
    val ids = Tables.read(spark, sfDir, "documents").select(col("doc_id"))
    val packs = MultimodalOps.encodeSyntheticFramePack(ids, "doc_id")
    MultimodalOps.sampleFrameThumbs(packs, "content", "media_id",
      VF_STRIDE, THUMB_DIM)
  }

  def mediaFramesSql: String =
    s"""WITH d AS (
       |  SELECT doc_id AS media_id, 3 + doc_id % 4 AS k FROM documents
       |), fj AS (
       |  SELECT media_id, unnest(range(0, k)) AS j FROM d
       |), sampled AS (
       |  SELECT media_id, j, media_id * 8 + j AS fid FROM fj
       |  WHERE j % $VF_STRIDE = 0
       |), dims AS (
       |  SELECT media_id, j, fid, 8 + fid % 9 AS w, 8 + fid % 7 AS h
       |  FROM sampled
       |), r AS (
       |  SELECT media_id, j, fid, w, h,
       |    CASE WHEN greatest(w, h) <= $THUMB_DIM THEN w
       |         ELSE greatest((w * $THUMB_DIM) // greatest(w, h), 1)
       |    END AS dw,
       |    CASE WHEN greatest(w, h) <= $THUMB_DIM THEN h
       |         ELSE greatest((h * $THUMB_DIM) // greatest(w, h), 1)
       |    END AS dh
       |  FROM dims
       |), xs AS (
       |  SELECT media_id, j, fid, w, h, dw, dh,
       |    unnest(range(0, dw)) AS x FROM r
       |), px AS (
       |  SELECT media_id, j, fid, w, h, dw, dh, x,
       |    unnest(range(0, dh)) AS y FROM xs
       |), sp AS (
       |  SELECT media_id, j, fid, dw, dh,
       |    (x * w) // dw AS sx, (y * h) // dh AS sy FROM px
       |)
       |SELECT media_id, CAST(j AS BIGINT) AS frame_idx,
       |  CAST(any_value(dw) AS BIGINT) AS thumb_width,
       |  CAST(any_value(dh) AS BIGINT) AS thumb_height,
       |  CAST(sum((fid * 31 + sx * 7 + sy * 13) % 256) AS BIGINT) AS sum_r,
       |  CAST(sum((fid * 17 + sx * 11 + sy * 3) % 256) AS BIGINT) AS sum_g,
       |  CAST(sum((fid * 23 + sx * 5 + sy * 19) % 256) AS BIGINT) AS sum_b
       |FROM sp GROUP BY media_id, j""".stripMargin

  /** REAL thumbnail features: the synthetic-PNG corpus decoded,
    * nearest-downscaled to fit [[THUMB_DIM]], re-encoded
    * ([[MultimodalOps.resizeImages]]) and the THUMBNAIL decoded again
    * into per-channel sums ([[MultimodalOps.decodeImageFeatures]]) —
    * two real kernels chained through lossless PNG, so the oracle
    * recomputes every thumbnail pixel from the generator formulas with
    * pure integer arithmetic. */
  def mediaFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    val ids = Tables.read(spark, sfDir, "documents").select(col("doc_id"))
    val png = MultimodalOps.encodeSyntheticPng(ids, "doc_id")
    val resized = MultimodalOps.resizeImages(
      png, "content", "media_id", THUMB_DIM)
    MultimodalOps.decodeImageFeatures(resized, "resized_content", "media_id")
  }

  def mediaFeaturesSql: String =
    s"""WITH d AS (
       |  SELECT doc_id AS media_id,
       |    8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
       |  FROM documents
       |), r AS (
       |  SELECT media_id, w, h,
       |    CASE WHEN greatest(w, h) <= $THUMB_DIM THEN w
       |         ELSE greatest((w * $THUMB_DIM) // greatest(w, h), 1)
       |    END AS dw,
       |    CASE WHEN greatest(w, h) <= $THUMB_DIM THEN h
       |         ELSE greatest((h * $THUMB_DIM) // greatest(w, h), 1)
       |    END AS dh
       |  FROM d
       |), xs AS (
       |  SELECT media_id, w, h, dw, dh, unnest(range(0, dw)) AS x FROM r
       |), px AS (
       |  SELECT media_id, w, h, dw, dh, x, unnest(range(0, dh)) AS y FROM xs
       |), sp AS (
       |  SELECT media_id, dw, dh, (x * w) // dw AS sx, (y * h) // dh AS sy
       |  FROM px
       |), s AS (
       |  SELECT media_id, dw, dh,
       |    CAST(sum((media_id * 31 + sx * 7 + sy * 13) % 256) AS BIGINT) AS sum_r,
       |    CAST(sum((media_id * 17 + sx * 11 + sy * 3) % 256) AS BIGINT) AS sum_g,
       |    CAST(sum((media_id * 23 + sx * 5 + sy * 19) % 256) AS BIGINT) AS sum_b
       |  FROM sp GROUP BY media_id, dw, dh
       |)
       |SELECT media_id, TRUE AS decode_ok,
       |  CAST(dw AS BIGINT) AS width, CAST(dh AS BIGINT) AS height,
       |  CAST(dw * dh AS BIGINT) AS n_px, sum_r, sum_g, sum_b,
       |  (sum_r * 1000) // (dw * dh) AS mean_r_x1000
       |FROM s""".stripMargin

  /** Format-agnostic byte triage ([[MultimodalOps.byteStats]]) — the
    * pass a pipeline runs over opaque blobs BEFORE deciding what to
    * decode. Documents are pure ASCII, so DuckDB's ascii() per char
    * reproduces the byte values exactly. */
  def mediaByteStats(spark: SparkSession, sfDir: String): DataFrame =
    MultimodalOps.byteStats(media(spark, sfDir), "content", "media_id")

  def mediaByteStatsSql: String =
    """WITH b AS (
      |  SELECT doc_id AS media_id, CAST(length(text) AS BIGINT) AS n_bytes,
      |    CAST(list_sum(list_transform(range(1, length(text) + 1),
      |      i -> ascii(substr(text, CAST(i AS INTEGER), 1)))) AS BIGINT) AS byte_sum
      |  FROM documents
      |)
      |SELECT media_id, n_bytes, byte_sum,
      |  CASE WHEN n_bytes = 0 THEN 0 ELSE (byte_sum * 1000) // n_bytes END AS byte_mean_x1000
      |FROM b""".stripMargin
}
