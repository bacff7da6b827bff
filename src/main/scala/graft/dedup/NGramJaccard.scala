package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Exact n-gram (word-shingle) Jaccard similarity join with prefix-filter
  * candidate generation — near-duplicate pair detection with a
  * guaranteed-recall, linear-scale candidate step (the PPJoin/AllPairs
  * family of set-similarity joins, not probabilistic LSH).
  *
  * Why it scales: for Jaccard ≥ t, two shingle sets must share at least
  * one element among the first `|S| - ceil(t·|S|) + 1` elements of each
  * set under ANY fixed total order; and their sizes must satisfy
  * t·|a| ≤ |b| ≤ |a|/t. We hash every shingle to a long ONCE and order
  * prefixes by ASCENDING GLOBAL DOCUMENT FREQUENCY (the AllPairs/PPJoin
  * discipline): candidate pairs form only on each document's RAREST
  * shingles, so the candidate count per shingle is O(df²) on rare tokens
  * instead of on stop-phrase shingles — the difference between linear
  * and quadratic when a corpus shares boilerplate. The frequency table
  * is one count aggregation over (shingle, doc) postings — a shuffle of
  * 8-byte keys, linear in corpus size. Exact Jaccard verification
  * intersects the hashed-shingle arrays only for candidates, so output =
  * ground truth at any scale (a cross-doc 64-bit hash collision would
  * take ~10¹⁹ comparisons to matter).
  *
  * Everything after the one text→hashes pass operates on long arrays:
  * natural-order sort (codegen'd), 8-byte shuffle keys, long-array
  * intersects — no interpreted string lambdas in the hot path.
  */
object NGramJaccard {

  /** Distinct word-trigram shingles of a text column (string form —
    * shared with MinHashLsh, which signs the same shingle sets).
    *
    * Built with `zip_with` over three shifted slices rather than
    * `element_at(ws, i)` inside a `transform` lambda: higher-order
    * lambdas evaluate interpreted, and a non-bound child like the regex
    * split would re-run PER ELEMENT (three full-text splits per shingle);
    * zip_with's array arguments evaluate once per row. */
  def shingles(text: Column): Column = {
    def trigrams(t: Column): Column = {
      val ws = split(t, "\\s+")
      val n = size(ws) - 2
      zip_with(
        zip_with(slice(ws, lit(1), n), slice(ws, lit(2), n), (x, y) => concat_ws(" ", x, y)),
        slice(ws, lit(3), n),
        (xy, z) => concat_ws(" ", xy, z))
    }
    array_distinct(
      when(size(split(text, "\\s+")) >= 3, trigrams(text))
        .otherwise(array().cast("array<string>")))
  }

  /** Distinct shingles hashed to longs, sorted ascending — the compact
    * form every downstream step (prefix, join, verify) runs on. */
  def hashedShingles(text: Column): Column =
    array_sort(transform(shingles(text), s => xxhash64(s)))

  /** Verified similarity pairs (a_id < b_id) with Jaccard ≥ threshold. */
  def similarPairs(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double): DataFrame = {
    // one pass computes the hashed shingle sets, materialized once since
    // the candidate step and the verify step both read it. localCheckpoint
    // (not cache/persist): checkpoint blocks are released by the
    // ContextCleaner when the plan is GC'd, so a library caller looping
    // over corpora doesn't accumulate pinned shingle tables — the same
    // lifecycle fix MinHashLsh.nearDupPairs got in round 7.
    val sh = docs.select(col(idCol).as("__id"), hashedShingles(col(textCol)).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .withColumn("__n", size(col("__sh")))
      .localCheckpoint()

    // global shingle document frequencies; re-sort each doc's shingles
    // rarest-first and take the prefix from that order
    val ex = sh.select(col("__id"), col("__n"), explode(col("__sh")).as("__tok"))
    val tokDf = ex.groupBy("__tok").agg(count(lit(1)).as("__df"))
    val prefixLen = (col("__n") - ceil(lit(threshold) * col("__n")) + 1).cast("int")
    val prefixes = ex.join(tokDf, "__tok")
      .groupBy("__id")
      .agg(max("__n").as("__n"),
        sort_array(collect_list(struct(col("__df"), col("__tok")))).as("__ord"))
      .select(col("__id"), col("__n"),
        explode(slice(transform(col("__ord"), s => s.getField("__tok")),
          lit(1), prefixLen)).as("__tok"))

    // size-compatibility prunes pairs the verify step would reject anyway
    val cand = prefixes.as("a").join(prefixes.as("b"),
        col("a.__tok") === col("b.__tok") && col("a.__id") < col("b.__id") &&
          col("b.__n") * lit(threshold) <= col("a.__n") &&
          col("a.__n") * lit(threshold) <= col("b.__n"))
      .select(col("a.__id").as("a_id"), col("b.__id").as("b_id"))
      .distinct()

    val withSets = cand
      .join(sh.select(col("__id").as("a_id"), col("__sh").as("__sha")), "a_id")
      .join(sh.select(col("__id").as("b_id"), col("__sh").as("__shb")), "b_id")
    val nCommon = size(array_intersect(col("__sha"), col("__shb")))
    withSets
      .withColumn("n_common", nCommon.cast("int"))
      .withColumn("jaccard",
        col("n_common").cast("double")
          / (size(col("__sha")) + size(col("__shb")) - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "n_common", "jaccard")
  }

  // ---- query-map entry (#30) ----

  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    similarPairs(Tables.documents(spark, dir), "doc_id", "text", threshold = 0.5)

  /** Oracle is the all-pairs ground truth — valid at sf scale; the Spark
    * side must agree exactly because prefix filtering has perfect recall. */
  def oracleSql: String =
    """WITH sh AS (
      |  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(ws)-2),
      |         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) sg
      |  FROM (SELECT doc_id, string_split_regex(text, '\s+') ws FROM documents)
      |  WHERE len(ws) >= 3
      |)
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |  CAST(len(list_intersect(a.sg, b.sg)) AS INT) AS n_common,
      |  CAST(len(list_intersect(a.sg, b.sg)) AS DOUBLE)
      |    / (len(a.sg) + len(b.sg) - len(list_intersect(a.sg, b.sg))) AS jaccard
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.sg, b.sg)) AS DOUBLE)
      |    / (len(a.sg) + len(b.sg) - len(list_intersect(a.sg, b.sg))) >= 0.5""".stripMargin
}
