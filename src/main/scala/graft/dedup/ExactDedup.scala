package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Exact (byte-identical) deduplication by content hash.
  *
  * The canonical first pass of any LLM-training-data pipeline: group on
  * sha256(text), keep the lowest id per group. One shuffle on the hash —
  * uniformly distributed by construction, so no skew at any scale; the
  * 32-byte hash (not the document body) is the shuffle key, keeping
  * shuffle bytes tiny relative to the corpus.
  */
object ExactDedup {

  /** Per content group: hash, the kept (minimum) id, and group size. */
  def groups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(sha2(col(textCol), 256).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** The deduplicated corpus: one row per distinct content. */
  def dedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.join(
      groups(docs, idCol, textCol).select(col("keep_id").as(idCol)),
      Seq(idCol))

  // ---- query-map entry (#27) ----

  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    groups(Tables.documents(spark, dir), "doc_id", "text")

  def oracleSql: String =
    """SELECT sha256(text) AS content_hash,
      |  min(doc_id) AS keep_id,
      |  CAST(count(*) AS BIGINT) AS n_dups
      |FROM documents
      |GROUP BY sha256(text)""".stripMargin
}
