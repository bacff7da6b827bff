package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Edit-distance similarity join with FALSE-NEGATIVE-FREE pigeonhole
  * blocking: document pairs whose fixed-length key prefixes are within
  * Levenshtein distance 1 — fuzzy record linkage over titles/keys, the
  * string-metric sibling of [[SimHashDedup]]'s hamming-band scheme.
  *
  * Blocking argument: two EQUAL-LENGTH strings at distance ≤ 1 differ by
  * at most one SUBSTITUTION (an insert/delete would change length), and
  * one substitution touches exactly one half — so the pair agrees exactly
  * on the first half OR the last half of the prefix. Two equi-joins (one
  * per half) therefore reach every true pair; `levenshtein()` verifies
  * candidates exactly. This is the q-gram/pigeonhole discipline from the
  * set-similarity-join literature restated for edit distance, and it
  * scales like any equi-join: 8-char bucket keys shuffle, candidates are
  * verified in place, nothing quadratic ever crosses the wire. A
  * pathological bucket (massive shared boilerplate prefix) degrades to
  * within-bucket verification, the same bounded hot spot the hamming
  * bands have.
  */
object EditDistance {

  /** (a_id, b_id, lev) for pairs with levenshtein(prefix_a, prefix_b) ≤ 1
    * over `prefixLen`-char prefixes; rows shorter than `prefixLen` are
    * excluded (a length mismatch > 1 can never be within distance 1 of a
    * full-length prefix anyway, and equal lengths make the pigeonhole
    * argument airtight). */
  def nearPairs(docs: DataFrame, idCol: String, textCol: String,
                prefixLen: Int = 16): DataFrame = {
    require(prefixLen >= 2, "prefix must split into two non-empty halves")
    val half = prefixLen / 2
    val p = docs
      .select(col(idCol).as("__id"), substring(col(textCol), 1, prefixLen).as("__p"))
      .filter(length(col("__p")) === prefixLen)
    val first = p.withColumn("__b", substring(col("__p"), 1, half))
    val second = p.withColumn("__b", substring(col("__p"), half + 1, prefixLen - half))
    def candidates(side: DataFrame): DataFrame =
      side.as("a").join(side.as("b"),
          col("a.__b") === col("b.__b") && col("a.__id") < col("b.__id"))
        .select(col("a.__id").as("a_id"), col("b.__id").as("b_id"),
          col("a.__p").as("__pa"), col("b.__p").as("__pb"))
    candidates(first).unionByName(candidates(second))
      .distinct()
      .withColumn("lev", levenshtein(col("__pa"), col("__pb")))
      .filter(col("lev") <= 1)
      .select("a_id", "b_id", "lev")
  }

  // ---- query-map entry (hash-gated vs DuckDB's levenshtein) ----

  def editdistPairs(spark: SparkSession, dir: String): DataFrame =
    nearPairs(Tables.documents(spark, dir), "doc_id", "text")

  /** All-pairs ground truth — the blocking above must agree exactly
    * because the pigeonhole cover has perfect recall at distance 1. */
  def oracleSql: String =
    """WITH p AS (
      |  SELECT doc_id, substr(text, 1, 16) AS pfx FROM documents
      |  WHERE length(text) >= 16
      |)
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |  CAST(levenshtein(a.pfx, b.pfx) AS INT) AS lev
      |FROM p a JOIN p b ON a.doc_id < b.doc_id
      |WHERE levenshtein(a.pfx, b.pfx) <= 1""".stripMargin
}
