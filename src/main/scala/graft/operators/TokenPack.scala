package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions

/** Sequence packing for LLM training: lay documents end to end in a
  * deterministic order and cut the token stream every `budget` tokens —
  * each document gets the pack (training sequence) its first token lands
  * in, plus its offset inside that pack. This is the distributed twin of
  * the concat-and-chunk step every LLM data pipeline runs between
  * curation and tokenized shards (the reference's FLAN submix feeds
  * exactly such a packer downstream of
  * /root/reference/MachineLearning/Data/flan2022_submix/spark_data_generating.py).
  *
  * The global token cumsum is the [[SaltedCumSum]] two-phase shape — no
  * single task ever windows the whole corpus; the per-bucket rollup table
  * is the only unpartitioned window and is |buckets| rows (corpus/1000),
  * the bounded-aggregate stance used across the engine. Long token
  * counts now stay long through the cumsum (SaltedCumSum's offset zero
  * is typed to the sum), so the cast back to long is a no-op.
  */
object TokenPack {

  /** Append pack_id and pack_offset from a deterministic `orderCol`
    * layout of `tokensCol` counts into `budget`-token packs. */
  def pack(df: DataFrame, orderCol: String, tokensCol: String,
           budget: Long): DataFrame = {
    val cum = SaltedCumSum(
      df, partCols = Seq.empty,
      orderCols = Seq(col(orderCol)),
      valueCol = tokensCol,
      saltCol = expr(s"CAST($orderCol AS BIGINT) DIV 1000"),
      out = "__cum")
    cum
      .withColumn("__start", (col("__cum") - col(tokensCol)).cast("long"))
      .withColumn("pack_id", expr(s"__start DIV $budget"))
      .withColumn("pack_offset", col("__start") % budget)
      .drop("__cum", "__start")
  }

  // ---- query-map entry (hash-gated) ----

  /** Documents packed into 512-token sequences in doc_id order. */
  def tokenPackDocuments(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir).select(
      col("doc_id"),
      size(TextFunctions.words(col("text"))).cast("long").as("n_tokens"))
    pack(toks, "doc_id", "n_tokens", budget = 512L)
      .select("doc_id", "n_tokens", "pack_id", "pack_offset")
  }

  def oracleSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, n_tokens,
      |    sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
      |      - n_tokens AS s
      |  FROM t)
      |SELECT doc_id, n_tokens,
      |  CAST(s // 512 AS BIGINT) AS pack_id,
      |  CAST(s % 512 AS BIGINT) AS pack_offset
      |FROM c""".stripMargin
}
