package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{KGramHashes, Native}

/** Cross-document duplicated-n-gram share — the corpus-level
  * repetition audit beside [[graft.functions.NgramStats]]'s WITHIN-doc
  * `gopher_repetition`: for each document, what fraction of its k-gram
  * occurrences also appears in at least one OTHER document? This is
  * the RefinedWeb/Gopher-style measurement that decides whether a
  * corpus needs sub-document dedup before training (boilerplate
  * headers, license blocks, syndicated passages — none of which
  * doc-level [[ExactDedup]] or [[MinHashLsh]] catch), feeding the same
  * curation loop as the reference's dataset preparation
  * (/root/reference/NLP/llama2/src/prep.py corpus assembly).
  *
  * Determinism: grams hash through the [[graft.functions.WinnowSelect]]
  * token fold (char poly 131 mod 1e9+7, k-gram chain ·31 mod 1e9+7) —
  * the SAME literals run in the DuckDB oracle, so the per-doc shares
  * hash-gate exactly. Hash collisions (two distinct grams with equal
  * hash) count as shared — declared, identical in both engines.
  *
  * Scale: one compiled map-side explode to (doc, hash) occurrences;
  * distinct-doc counts per hash are a two-level aggregate on uniform
  * hash keys (map-side partial on (hash, doc) first, so a boilerplate
  * gram repeated 10⁶× inside one doc contributes ONE row to the
  * distinct layer); the occurrence join back is on the same uniform
  * key. Nothing is all-pairs; the 100 TB cost is the gram explode —
  * k·|tokens| longs through a shuffle, the price of an exact answer.
  */
object CrossDocNgrams {

  /** Per document: (doc_id, n_grams, dup_grams, dup_permicro) over
    * token k-grams of `textCol`, where a gram occurrence is DUP if its
    * hash occurs in ≥ 2 distinct documents. Documents with fewer than
    * k tokens emit no row (they have no grams to judge). */
  def duplicatedShare(df: DataFrame, idCol: String, textCol: String,
                      k: Int): DataFrame = {
    val grams = df.select(col(idCol).as("doc"),
        explode(Native.call(s"graft_kgram_hashes_$k",
          exprs => KGramHashes(exprs.head, k), col(textCol))).as("h"))
      .localCheckpoint() // reused: per-hash doc counts + per-doc share
    val docsPerHash = grams.distinct()
      .groupBy("h").agg(count(lit(1)).as("nd"))
    grams.join(docsPerHash, "h")
      .groupBy(col("doc").as(idCol))
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("nd") >= 2, lit(1))).as("dup_grams"))
      .withColumn("dup_permicro", expr("(1000000 * dup_grams) div n_grams"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gram length for the gated instance: 5 tokens — long enough that
    * natural re-use is rare, short enough to catch clause-level
    * boilerplate. */
  val K = 5

  def crossdocDocuments(spark: SparkSession, dir: String): DataFrame =
    duplicatedShare(Tables.documents(spark, dir), "doc_id", "text", K)

  def oracleSql: String =
    s"""WITH th AS (
      |  SELECT doc_id, list_transform(string_split_regex(text, '\\s+'),
      |    w -> CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |           list_transform(generate_series(1, len(w)),
      |             i -> CAST(ascii(substr(w, i, 1)) AS BIGINT))),
      |         (a, c) -> (a*131 + c) % 1000000007) AS BIGINT)) AS th
      |  FROM documents
      |), kg AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(th) - ${K - 1}),
      |    i -> CAST((((((((th[i]*31 + th[i+1]) % 1000000007) * 31 + th[i+2])
      |      % 1000000007) * 31 + th[i+3]) % 1000000007) * 31 + th[i+4])
      |      % 1000000007 AS BIGINT))) AS h
      |  FROM th WHERE len(th) >= $K
      |), nd AS (
      |  SELECT h, count(DISTINCT doc_id) AS nd FROM kg GROUP BY h
      |)
      |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
      |  CAST(count(CASE WHEN n.nd >= 2 THEN 1 END) AS BIGINT) AS dup_grams,
      |  CAST((1000000 * count(CASE WHEN n.nd >= 2 THEN 1 END)) // count(*)
      |    AS BIGINT) AS dup_permicro
      |FROM kg g JOIN nd n ON g.h = n.h
      |GROUP BY g.doc_id""".stripMargin
}
