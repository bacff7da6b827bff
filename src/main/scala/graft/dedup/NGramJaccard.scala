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
  * set under ANY fixed total order. We order shingles by xxhash64 — no
  * global frequency pass needed — take that prefix, explode it, and join
  * docs on shared prefix shingles. Candidate volume is |docs|·prefix_len
  * rows of (shingle, id) — linear, never the O(n²) all-pairs cross join —
  * and the exploded rows carry only ids; shingle arrays re-join by id
  * afterwards so shuffle bytes stay small. Exact Jaccard verification
  * runs only on candidates, so output = ground truth at any scale.
  */
object NGramJaccard {

  /** Distinct word-trigram shingles of a text column. */
  def shingles(text: Column): Column = {
    val ws = split(text, "\\s+")
    array_distinct(
      when(size(ws) >= 3,
        transform(sequence(lit(1), size(ws) - 2),
          i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2))))
        .otherwise(array()))
  }

  /** Verified similarity pairs (a_id < b_id) with Jaccard ≥ threshold. */
  def similarPairs(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double): DataFrame = {
    val sh = docs.select(col(idCol).as("__id"), shingles(col(textCol)).as("__sh"))
      .filter(size(col("__sh")) > 0)
    // any fixed total order works for prefix filtering; hash order avoids
    // the global frequency-ranking pass entirely
    val sorted = array_sort(col("__sh"),
      (l, r) => when(xxhash64(l) < xxhash64(r), -1)
        .when(xxhash64(l) > xxhash64(r), 1).otherwise(0))
    val prefixLen = (size(col("__sh")) - ceil(lit(threshold) * size(col("__sh"))) + 1).cast("int")
    val prefixes = sh
      .select(col("__id"), explode(slice(sorted, lit(1), prefixLen)).as("__tok"))

    val cand = prefixes.as("a").join(prefixes.as("b"),
        col("a.__tok") === col("b.__tok") && col("a.__id") < col("b.__id"))
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
