package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Ranks

/** Prefix-duplicate detection by sorted adjacency — the truncation class
  * of near-duplicates ([[ExactDedup]] catches byte-equal copies;
  * [[NGramJaccard]]/[[MinHashLsh]] catch edits; this catches the crawl
  * artifact where one document is a clean PREFIX of another: truncated
  * fetches, pagination cuts, re-crawls of growing pages). LLM corpus
  * pipelines run this pass because prefix pairs beat MinHash thresholds
  * only when the truncation is mild — a 10% fragment of a long page
  * shares almost no shingles with it, yet is pure contained redundancy.
  *
  * Algorithm — the suffix-array insight, one sort instead of O(n²)
  * containment tests: a string is a strict prefix of SOME other distinct
  * string iff it is a strict prefix of its IMMEDIATE LEXICOGRAPHIC
  * SUCCESSOR in the distinct-text order (any extension of p sorts after
  * p and before the first non-extension above p). So: distinct texts →
  * global rank by text ([[Ranks.globalRowNumber]], two-phase range
  * partition — no corpus-wide single-reducer window) → equi-join rank k
  * with rank k+1 → one substring equality per adjacent pair. The
  * prefix test is `substr(next, 1, len(text)) = text` on BOTH engines —
  * no collation-sensitive function, pure byte compare on this corpus.
  *
  * Scale: dedup groupBy + range-partitioned rank + a join on unique
  * dense ranks — every stage linear with uniform keys. Adjacent-pair
  * comparison is O(n) total substring work.
  */
object PrefixDedup {

  /** Distinct texts (keeper = min id per text) that are strict prefixes
    * of another distinct text. Output: (doc_id, prefix_len, ext_doc_id,
    * ext_len) — the witness extension is the keeper of the successor
    * text, which is the SHORTEST extension. */
  def prefixDuplicates(docs: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val uniq = docs.groupBy(col(textCol).as("__text"))
      .agg(min(col(idCol)).as("doc_id"))
    val ranked = Ranks.globalRowNumber(uniq, Seq(col("__text")), "__prn")
      .localCheckpoint() // consumed twice (self-join on adjacent ranks)
    val nxt = ranked.select((col("__prn") - 1).as("__prn"),
      col("__text").as("__next"), col("doc_id").as("ext_doc_id"))
    ranked.join(nxt, "__prn")
      .filter(length(col("__next")) > length(col("__text")) &&
        expr("substr(__next, 1, length(__text)) = __text"))
      .select(col("doc_id"), length(col("__text")).as("prefix_len"),
        col("ext_doc_id"), length(col("__next")).as("ext_len"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: the documents corpus plus a deterministic planted
    * truncation for every 10th doc (id+10⁹, first half of the text) —
    * both engines derive the same injection, so the oracle is exact and
    * the output is non-degenerate on ANY corpus. */
  def prefixDupDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val planted = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000000L).as("doc_id"),
        expr("substr(text, 1, length(text) div 2)").as("text"))
      .filter(length(col("text")) >= 1)
    prefixDuplicates(docs.unionByName(planted), "doc_id", "text")
  }

  def oracleSql: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000000, substr(text, 1, length(text) // 2)
      |  FROM documents
      |  WHERE doc_id % 10 = 0 AND length(text) // 2 >= 1
      |), uniq AS (
      |  SELECT text, min(doc_id) AS doc_id FROM corpus GROUP BY text
      |), ranked AS (
      |  SELECT text, doc_id, row_number() OVER (ORDER BY text) AS rn
      |  FROM uniq
      |)
      |SELECT a.doc_id, length(a.text) AS prefix_len,
      |  b.doc_id AS ext_doc_id, length(b.text) AS ext_len
      |FROM ranked a JOIN ranked b ON b.rn = a.rn + 1
      |WHERE length(b.text) > length(a.text)
      |  AND substr(b.text, 1, length(a.text)) = a.text""".stripMargin
}
