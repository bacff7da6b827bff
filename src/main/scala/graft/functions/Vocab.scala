package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Tokenizer-vocabulary coverage screen for LLM training corpora: build
  * the top-V corpus vocabulary, then score every document's
  * out-of-vocabulary rate — the pre-training diagnostic that decides
  * whether a tokenizer (or a candidate vocab size) fits a corpus before
  * any GPU time is spent. The reference prepares tokenized corpora for
  * fine-tuning (/root/reference/MachineLearning/Data/flan2022_submix/
  * spark_data_generating.py feeds a fixed tokenizer); this operator is
  * the distributed coverage audit of that step, and the OOV-rate
  * complement of [[BpeMerges]] (which BUILDS the vocab this screens).
  *
  * Determinism discipline: the vocabulary is the top V tokens under the
  * TOTAL order (count DESC, token ASC) — the tie-break makes the V-th
  * boundary unambiguous, so both engines select the identical set. OOV
  * rates are exact integer per-mille (BIGINT division), never floats.
  *
  * Scale: token counting is one map-side-combined shuffle on the token
  * key; top-V is Spark's distributed TakeOrdered (per-partition top-V,
  * then a V-sized merge — never a global sort); the V-row vocabulary
  * then BROADCASTS back onto the exploded token stream, so the corpus
  * is scanned twice and shuffled once, and nothing driver-side ever
  * exceeds V rows.
  */
object Vocab {

  /** Per-document OOV stats against the corpus top-`v` vocabulary:
    * (id, n_tokens, n_oov, oov_permille). Documents with zero tokens
    * have no coverage to measure and are absent. */
  def oovCoverage(docs: DataFrame, idCol: String, textCol: String,
                  v: Int): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(TextScoring.tokens(col(textCol))).as("t"))
    val vocab = tok.groupBy("t").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("t").asc)
      .limit(v)
      .select(col("t"), lit(1).as("__in_vocab"))
    tok.join(broadcast(vocab), Seq("t"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_permille", expr("(1000 * n_oov) div n_tokens"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: documents scored against the corpus top-500. */
  def vocabCoverageDocs(spark: SparkSession, dir: String): DataFrame =
    oovCoverage(Tables.documents(spark, dir), "doc_id", "text", v = 500)

  def oracleSql: String =
    """WITH tok AS (
      |  SELECT doc_id,
      |    unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |      x -> x <> '')) AS t
      |  FROM documents
      |), vocab AS (
      |  SELECT t FROM tok GROUP BY t
      |  ORDER BY count(*) DESC, t ASC LIMIT 500
      |)
      |SELECT tok.doc_id, count(*) AS n_tokens,
      |  CAST(sum(CASE WHEN vocab.t IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
      |  CAST((1000 * sum(CASE WHEN vocab.t IS NULL THEN 1 ELSE 0 END))
      |    // count(*) AS BIGINT) AS oov_permille
      |FROM tok LEFT JOIN vocab ON tok.t = vocab.t
      |GROUP BY tok.doc_id""".stripMargin
}
