package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Empirical vocabulary-growth (Heaps) curve: cumulative distinct
  * vocabulary vs cumulative token volume at ten corpus checkpoints —
  * the curation dashboard that tells an LLM-data pipeline whether a
  * new data tranche still contributes novel vocabulary or only
  * repetition (the saturation companion to
  * [[graft.functions.Vocab
  * vocab_coverage]] and `gopher_repetition`; the reference's corpus
  * prep tracks token budgets per source in
  * /root/reference/NLP/llama2/src/prep_sft_data.py).
  *
  * The curve is computed WITHOUT any cumulative distinct pass:
  * a token's contribution point is its FIRST document (min doc_id —
  * one groupBy over the exploded tokens), so the per-checkpoint
  * vocabulary is a ≤-join of the tiny first-occurrence histogram
  * (≤ |docs| rows) against ten checkpoint thresholds. No window over
  * the corpus, no re-scan per checkpoint: one explode + two
  * dimension-sized joins regardless of corpus size. Exact integers
  * throughout; the type-token ratio rides the truncating permicro div.
  */
object VocabGrowth {

  /** Ten-decile growth curve over (`docIdCol`, `textCol`):
    * (decile, thr_doc_id, cum_docs, cum_tokens, cum_vocab,
    * ttr_permicro). Checkpoint i covers doc ids ≤ (max_id·i) div 10. */
  def curve(docs: DataFrame, docIdCol: String, textCol: String): DataFrame = {
    val ws = TextFunctions.words(col(textCol))
    val toks = docs.select(col(docIdCol).as("__id"),
      explode(ws).as("__tok"))
    // first-occurrence histogram: when does each token enter the corpus
    val hist = toks.groupBy("__tok").agg(min("__id").as("__fd"))
      .groupBy("__fd").agg(count(lit(1)).as("__nv"))
    val perDoc = docs.select(col(docIdCol).as("__id"),
      size(ws).cast("long").as("__n"))
    val cps = docs.agg(max(col(docIdCol)).as("__m"))
      .select(explode(sequence(lit(1), lit(10))).as("decile"), col("__m"))
      .select(col("decile").cast("int").as("decile"),
        expr("(__m * decile) div 10").as("thr_doc_id"))
    val vocab = cps.join(hist, col("__fd") <= col("thr_doc_id"))
      .groupBy("decile", "thr_doc_id")
      .agg(sum("__nv").as("cum_vocab"))
    val volume = cps.join(perDoc, col("__id") <= col("thr_doc_id"))
      .groupBy("decile", "thr_doc_id")
      .agg(count(lit(1)).as("cum_docs"), sum("__n").as("cum_tokens"))
    volume.join(vocab, Seq("decile", "thr_doc_id"))
      .select(col("decile"), col("thr_doc_id"), col("cum_docs"),
        col("cum_tokens"), col("cum_vocab"),
        expr("(cum_vocab * 1000000) div cum_tokens").as("ttr_permicro"))
  }

  // ---- query-map entry (hash-gated) ----

  def vocabGrowthDocs(spark: SparkSession, dir: String): DataFrame =
    curve(Tables.documents(spark, dir), "doc_id", "text")

  def oracleSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok
      |  FROM documents
      |), first_occ AS (
      |  SELECT tok, min(doc_id) AS fd FROM toks GROUP BY tok
      |), hist AS (
      |  SELECT fd, CAST(count(*) AS BIGINT) AS nv FROM first_occ GROUP BY fd
      |), per_doc AS (
      |  SELECT doc_id,
      |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n
      |  FROM documents
      |), cp AS (
      |  SELECT CAST(t.i AS INT) AS decile,
      |    (m.m * t.i) // 10 AS thr_doc_id
      |  FROM range(1, 11) t(i)
      |  CROSS JOIN (SELECT max(doc_id) AS m FROM documents) m
      |), vocab AS (
      |  SELECT decile, thr_doc_id, CAST(sum(nv) AS BIGINT) AS cum_vocab
      |  FROM cp JOIN hist ON hist.fd <= cp.thr_doc_id
      |  GROUP BY 1, 2
      |), vol AS (
      |  SELECT decile, thr_doc_id, CAST(count(*) AS BIGINT) AS cum_docs,
      |    CAST(sum(n) AS BIGINT) AS cum_tokens
      |  FROM cp JOIN per_doc ON per_doc.doc_id <= cp.thr_doc_id
      |  GROUP BY 1, 2
      |)
      |SELECT vol.decile, vol.thr_doc_id, cum_docs, cum_tokens, cum_vocab,
      |  (cum_vocab * 1000000) // cum_tokens AS ttr_permicro
      |FROM vol JOIN vocab
      |  ON vocab.decile = vol.decile AND vocab.thr_doc_id = vol.thr_doc_id"""
      .stripMargin
}
