package graft.queries

import graft.pipeline.MultimodalOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column queries: the `documents` text payloads stand in as
  * opaque binary media blobs (this container has no codecs — decode is a
  * deterministic stub; the Spark-side plumbing is real and oracle-checked
  * where the stub arithmetic is SQL-expressible). */
object MultimodalQueries {

  def all: Seq[GraftQuery] = Seq(
    GraftQuery("q_media_meta", mediaMeta, Some(mediaMetaSql)),
    GraftQuery("q_media_frames", mediaFrames, Some(mediaFramesSql)),
    GraftQuery("q_media_features", mediaFeatures, Some(mediaFeaturesSql)),
  )

  /** documents → opaque binary payload table. */
  private def media(spark: SparkSession, sfDir: String): DataFrame =
    Tables.read(spark, sfDir, "documents")
      .select(col("doc_id").as("media_id"), col("text").cast("binary").as("content"))

  def mediaMeta(spark: SparkSession, sfDir: String): DataFrame = {
    val m = MultimodalOps.resizeStub(
      media(spark, sfDir).withColumn("meta", MultimodalOps.extractMeta(col("content"))),
      "content", maxDim = 256L)
    m.select(col("media_id"),
      col("meta.n_bytes").as("n_bytes"), col("meta.digest").as("digest"),
      col("meta.width").as("width"), col("meta.height").as("height"),
      col("meta.channels").as("channels"),
      col("resized_width"), col("resized_height"))
  }

  def mediaMetaSql: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id, CAST(length(text) AS BIGINT) AS n_bytes,
      |    md5(text) AS digest,
      |    ('0x'||substr(md5(text),1,8))::BIGINT AS h
      |  FROM documents
      |), d AS (
      |  SELECT media_id, n_bytes, digest,
      |    h % 1024 + 1 AS width, (h >> 10) % 1024 + 1 AS height,
      |    h % 3 + 1 AS channels
      |  FROM m
      |)
      |SELECT media_id, n_bytes, digest, width, height, channels,
      |  CASE WHEN CAST(greatest(width, height) AS DOUBLE) / 256.0 > 1
      |       THEN CAST(floor(CAST(width AS DOUBLE) / (CAST(greatest(width, height) AS DOUBLE) / 256.0)) AS BIGINT)
      |       ELSE width END AS resized_width,
      |  CASE WHEN CAST(greatest(width, height) AS DOUBLE) / 256.0 > 1
      |       THEN CAST(floor(CAST(height AS DOUBLE) / (CAST(greatest(width, height) AS DOUBLE) / 256.0)) AS BIGINT)
      |       ELSE height END AS resized_height
      |FROM d""".stripMargin

  def mediaFrames(spark: SparkSession, sfDir: String): DataFrame =
    MultimodalOps.frameSampleStub(media(spark, sfDir), "content", "media_id", 3)
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("frame_digest"))

  def mediaFramesSql: String =
    """SELECT doc_id AS media_id, i AS frame_idx,
      |  md5(md5(text) || CAST(i AS VARCHAR)) AS frame_digest
      |FROM documents, (SELECT unnest(range(0, 3)) AS i) f""".stripMargin

  def mediaFeatures(spark: SparkSession, sfDir: String): DataFrame =
    MultimodalOps.decodeFeaturesStub(media(spark, sfDir), "content", "media_id")

  /** The stub features are byte statistics; documents are pure ASCII so
    * ascii() per char reproduces the byte values exactly. */
  def mediaFeaturesSql: String =
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
