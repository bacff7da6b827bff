package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** RAG-style document chunking: split each document into fixed-size
  * overlapping character windows, each chunk carrying (doc_id, index,
  * start offset, text, length) — the retrieval-prep step between the
  * corpus and the embedding generator
  * (/root/reference/MachineLearning/NLP/ray_batch_embedding_generator.py
  * embeds whole rows; public RAG pipelines chunk first so embeddings
  * stay within encoder context).
  *
  * Shape: pure map-side — per row, `explode(sequence(0, n_chunks-1))`
  * then one `substring`; no shuffle at all, so it scales as a straight
  * scan at any corpus size and composes with downstream embed/dedup
  * operators without touching their partitioning.
  *
  * Chunk-count rule: `1 + ceil(max(len - size, 0) / stride)` — one chunk
  * for anything that fits, and no trailing chunk that would be fully
  * contained in its predecessor (a doc of exactly `size` chars yields
  * ONE chunk, not a redundant tail). The final chunk may be shorter
  * than `size`.
  */
object Chunker {

  /** (doc_id, chunk_idx, chunk_start, chunk_text, chunk_chars); offsets
    * 0-based, `chunk_start = chunk_idx * stride`. */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    docs
      .select(col(idCol).as("doc_id"), col(textCol).as("__t"),
        length(col(textCol)).as("__len"))
      .filter(col("__len") > 0)
      .withColumn("__n",
        expr(s"1L + (greatest(__len - $size, 0) + ${stride - 1}) DIV $stride"))
      .withColumn("chunk_idx", explode(expr("sequence(0, __n - 1)")))
      .withColumn("chunk_start", (col("chunk_idx") * stride).cast("long"))
      .withColumn("chunk_text",
        expr(s"substring(__t, CAST(chunk_start + 1 AS INT), $size)"))
      .withColumn("chunk_chars", length(col("chunk_text")).cast("long"))
      .select("doc_id", "chunk_idx", "chunk_start", "chunk_text", "chunk_chars")
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: 200-char chunks, 150-char stride (50-char overlap)
    * over the documents table. */
  def chunkDocuments(spark: SparkSession, dir: String): DataFrame =
    chunk(Tables.documents(spark, dir), "doc_id", "text",
      size = 200, stride = 150)

  def oracleSql: String =
    """WITH d AS (
      |  SELECT doc_id, text,
      |    1 + (greatest(length(text) - 200, 0) + 149) // 150 AS n
      |  FROM documents WHERE length(text) > 0
      |), x AS (
      |  SELECT doc_id, text,
      |    CAST(unnest(generate_series(0, n - 1)) AS BIGINT) AS chunk_idx
      |  FROM d
      |)
      |SELECT doc_id, chunk_idx,
      |  CAST(chunk_idx * 150 AS BIGINT) AS chunk_start,
      |  substr(text, CAST(chunk_idx * 150 + 1 AS INT), 200) AS chunk_text,
      |  CAST(length(substr(text, CAST(chunk_idx * 150 + 1 AS INT), 200)) AS BIGINT)
      |    AS chunk_chars
      |FROM x""".stripMargin
}
