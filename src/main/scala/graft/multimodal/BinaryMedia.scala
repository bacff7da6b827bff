package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Multimodal binary-column handling: opaque `binary` payloads + typed
  * metadata + deterministic frame sampling.
  *
  * The container has no image/audio codecs, so DECODE IS STUBBED — the
  * "header parse" is arithmetic over payload bytes (clearly fake, but
  * fully deterministic and cross-engine checkable) and the batched
  * [[decodeBatch]] path mirrors how a real decoder plugs in. Everything
  * Spark-side is real: the binary column type, the typed metadata schema,
  * the codegen'd per-row metadata expressions, and the explode-based
  * frame sampler whose output is one row per sampled frame with its byte
  * offset — the shape a video training-data pipeline shuffles and joins.
  *
  * Scale shape: metadata extraction and frame explosion are map-side
  * expressions (no shuffle, no UDF); the explode multiplies rows by
  * sampled-frame count only (bounded by `every`), and payloads are NOT
  * duplicated per frame — sampled frames carry (id, index, offset), the
  * downstream fetch rejoins the payload by id only for frames it keeps.
  */
object BinaryMedia {

  /** Deterministic media table derived from documents: payload = UTF-8
    * bytes of text, type cycles image/audio/video by id. */
  def mediaFromDocs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (col(idCol) % 3 + 1).cast("int")).as("media_type"),
      col(textCol).cast("binary").as("payload"))

  /** STUB header decode, as expressions: real decoders replace these with
    * a batched parse (see [[decodeBatch]]); the *schema* is the contract. */
  def withMeta(media: DataFrame): DataFrame = {
    val n = length(col("payload"))
    media
      .withColumn("n_bytes", n)
      .withColumn("width",
        when(col("media_type") === "image", n % 512 + 64).otherwise(lit(null).cast("int")))
      .withColumn("height",
        when(col("media_type") === "image", n % 384 + 64).otherwise(lit(null).cast("int")))
      .withColumn("duration_ms",
        when(col("media_type") =!= "image", n * 8).otherwise(lit(null).cast("long")))
      .withColumn("frame_count",
        when(col("media_type") === "video", (floor(n / 100) + 1).cast("int"))
          .otherwise(lit(null).cast("int")))
  }

  /** Every `every`-th frame of each video row: (media_id, frame_idx,
    * byte_offset). Payloads stay behind — only ids and offsets explode. */
  def frameSample(meta: DataFrame, every: Int): DataFrame =
    meta.filter(col("media_type") === "video")
      .select(col("media_id"), col("frame_count"),
        explode(sequence(lit(0), col("frame_count") - 1, lit(every))).as("frame_idx"))
      .withColumn("byte_offset", col("frame_idx").cast("long") * 100L)
      .select("media_id", "frame_idx", "byte_offset")

  /** Batched stub decode — the mapPartitions seam where a real codec
    * (per-partition init, batch decode call) plugs in; returns a fake
    * per-item "luma" = mean payload byte. */
  def decodeBatch(media: DataFrame, batchSize: Int = 32): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("avg_luma", DoubleType)))
    val rows = media.select("media_id", "payload").rdd.mapPartitions { it =>
      // per-partition decoder init goes here (stub has none)
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]]("payload")
          val luma = if (bytes.isEmpty) 0.0
            else bytes.map(b => (b & 0xFF).toDouble).sum / bytes.length
          Row(r.getLong(0), luma)
        }
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  // ---- query-map entries (#38, #39) ----

  def mmMeta(spark: SparkSession, dir: String): DataFrame =
    withMeta(mediaFromDocs(Tables.documents(spark, dir), "doc_id", "text"))
      .select("media_id", "media_type", "n_bytes", "width", "height",
        "duration_ms", "frame_count")

  def mmMetaOracleSql: String =
    """SELECT doc_id AS media_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
      |  CASE WHEN doc_id % 3 = 0 THEN CAST(octet_length(encode(text)) % 512 + 64 AS INT) END AS width,
      |  CASE WHEN doc_id % 3 = 0 THEN CAST(octet_length(encode(text)) % 384 + 64 AS INT) END AS height,
      |  CASE WHEN doc_id % 3 <> 0 THEN CAST(octet_length(encode(text)) * 8 AS BIGINT) END AS duration_ms,
      |  CASE WHEN doc_id % 3 = 2 THEN CAST(octet_length(encode(text)) // 100 + 1 AS INT) END AS frame_count
      |FROM documents""".stripMargin

  def mmFramesample(spark: SparkSession, dir: String): DataFrame =
    frameSample(
      withMeta(mediaFromDocs(Tables.documents(spark, dir), "doc_id", "text")),
      every = 10)

  def mmFramesampleOracleSql: String =
    """SELECT doc_id AS media_id,
      |  CAST(unnest(generate_series(0, octet_length(encode(text)) // 100, 10)) AS INT) AS frame_idx,
      |  CAST(unnest(generate_series(0, octet_length(encode(text)) // 100, 10)) AS BIGINT) * 100 AS byte_offset
      |FROM documents WHERE doc_id % 3 = 2""".stripMargin
}
