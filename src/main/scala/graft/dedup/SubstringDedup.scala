package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Exact-substring duplication signal — the token-window form of Lee,
  * Ippolito, Nystrom et al. 2021 ("Deduplicating Training Data Makes
  * Language Models Better", arXiv:2107.06499): MinHash-style document
  * dedup ([[MinHashLsh]]) misses the pervasive PARTIAL overlaps (quoted
  * passages, boilerplate runs, templated spans) that the paper shows
  * dominate web-corpus duplication; the remedy is flagging every
  * length-L token window whose exact content recurs in ANOTHER
  * document. A doc's repeated-window ratio is the cut signal the
  * paper's ExactSubstr dedup acts on.
  *
  * Relational form (no suffix array needed for the signal): explode
  * each doc into its T−L+1 sliding L-token windows, count DISTINCT
  * docs per window content, flag windows seen in ≥ 2 docs, and
  * aggregate per doc. Window equality is by CONTENT (exact-substring
  * semantics, engine-portable); at 100 TB the shuffle key would be the
  * 8-byte rolling hash of the window ([[graft.functions.TextFunctions]]
  * winnowing machinery) with content verification within buckets — the
  * key choice changes bytes shuffled, not semantics. Self-repetition
  * within a single doc does NOT count (n_docs ≥ 2 is cross-doc).
  *
  * Scale shape: the explode is linear in corpus tokens (×1 — each
  * token starts one window); the frequency pass is one shuffle on the
  * window key; the rejoin is the same shuffle reused. Docs shorter
  * than L tokens carry no windows and are excluded on both engines.
  */
object SubstringDedup {

  /** Window length in tokens — the paper uses 50 BPE tokens at
    * web-corpus scale; 8 fits the synthetic docs' 30–90 token range
    * while exercising identical machinery. */
  val WindowTokens = 8

  /** Per-doc repeated-window stats: (doc_id, n_windows, n_repeated,
    * repeated_ppm). */
  def repeatedWindowStats(docs: DataFrame, idCol: String,
                          textCol: String, L: Int): DataFrame = {
    val toks = docs
      .select(col(idCol), split(col(textCol), "\\s+").as("__t"))
      .filter(size(col("__t")) >= L)
    val wins = toks.select(col(idCol), expr(
      s"explode(transform(sequence(1, size(__t) - ${L - 1}), " +
        s"i -> array_join(slice(__t, i, $L), ' ')))").as("__w"))
    val freq = wins.groupBy(col("__w"))
      .agg(countDistinct(col(idCol)).as("__nd"))
    wins.join(freq, "__w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("__nd") >= 2, 1L).otherwise(0L)).as("n_repeated"))
      .withColumn("repeated_ppm",
        expr("(1000000 * n_repeated) div n_windows"))
  }

  // ---- query-map entry (hash-gated) ----

  def dedupSubstring(spark: SparkSession, dir: String): DataFrame =
    repeatedWindowStats(Tables.documents(spark, dir), "doc_id", "text",
      WindowTokens)

  def oracleSql: String = {
    val l = WindowTokens
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(text, '\\s+') AS t
       |  FROM documents
       |), el AS (
       |  SELECT doc_id, t FROM toks WHERE len(t) >= $l
       |), wins AS (
       |  SELECT doc_id, array_to_string(list_slice(t, i, i + ${l - 1}), ' ') AS w
       |  FROM el, unnest(generate_series(1, len(t) - ${l - 1})) u(i)
       |), freq AS (
       |  SELECT w, count(DISTINCT doc_id) AS nd FROM wins GROUP BY w
       |)
       |SELECT wins.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_windows,
       |  CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_repeated,
       |  CAST((1000000 * sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END))
       |    // count(*) AS BIGINT) AS repeated_ppm
       |FROM wins JOIN freq ON freq.w = wins.w
       |GROUP BY wins.doc_id""".stripMargin
  }
}
