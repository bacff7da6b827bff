package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Graph

/** Entity resolution: fuzzy-match edges → transitive clusters. Two
  * records are the "same entity" if their keys are within edit
  * distance 1 ([[EditDistance.nearPairs]]' pigeonhole-blocked join),
  * and entities are the CONNECTED COMPONENTS of that match graph
  * ([[graft.operators.Graph.connectedComponents]]' pointer-jumping
  * propagation) — so a↔b and b↔c resolve a, b, c into one entity even
  * when a↔c itself misses the distance cutoff. This is the classic
  * record-linkage composition (blocking → pairwise match → transitive
  * closure), the reference's changeset-reconciliation problem
  * (/root/reference/DataEngineering/Python/merge_generator.py matches
  * records by key equality; this is the fuzzy generalization).
  *
  * Scale: both stages are already 100 TB-shaped — the match join never
  * goes quadratic (equi-join on half-prefix blocks with the declared
  * `blockCap` on boilerplate-hot blocks, verify in place) and the
  * closure runs O(log D) label-propagation rounds on the narrow
  * (id, label) table, never touching the documents again.
  */
object EntityResolution {

  /** (id, entity) for every document: `entity` is the minimum doc id in
    * the record's transitive fuzzy-match cluster; unmatched docs are
    * their own entity. */
  def resolve(docs: DataFrame, idCol: String, textCol: String,
              prefixLen: Int = 16, blockCap: Int = 1000): DataFrame = {
    val edges = EditDistance.nearPairs(docs, idCol, textCol, prefixLen, blockCap)
    val nodes = docs.select(col(idCol).as("__id"))
    Graph.connectedComponents(nodes, "__id", edges, "a_id", "b_id")
      .select(col("__id").as(idCol), col("component").as("entity"))
  }

  // ---- query-map entry (hash-gated via recursive-CTE closure) ----

  def entityComponents(spark: SparkSession, dir: String): DataFrame =
    resolve(Tables.documents(spark, dir), "doc_id", "text")

  def oracleSql: String =
    """WITH p AS (
      |  SELECT doc_id, substr(text, 1, 16) AS pfx FROM documents
      |  WHERE length(text) >= 16
      |), b1 AS (
      |  SELECT doc_id, pfx, substr(pfx, 1, 8) AS b FROM p
      |), b2 AS (
      |  SELECT doc_id, pfx, substr(pfx, 9, 8) AS b FROM p
      |), k1 AS (
      |  SELECT * FROM b1 WHERE b IN (
      |    SELECT b FROM b1 GROUP BY b HAVING count(*) <= 1000)
      |), k2 AS (
      |  SELECT * FROM b2 WHERE b IN (
      |    SELECT b FROM b2 GROUP BY b HAVING count(*) <= 1000)
      |), cand AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.pfx AS pa, b.pfx AS pb
      |  FROM k1 a JOIN k1 b ON a.b = b.b AND a.doc_id < b.doc_id
      |  UNION
      |  SELECT a.doc_id, b.doc_id, a.pfx, b.pfx
      |  FROM k2 a JOIN k2 b ON a.b = b.b AND a.doc_id < b.doc_id
      |), e AS (
      |  SELECT a_id AS src, b_id AS dst FROM cand
      |  WHERE levenshtein(pa, pb) <= 1
      |), und AS (
      |  SELECT src, dst FROM e UNION SELECT dst, src FROM e
      |), reach AS (
      |  WITH RECURSIVE r(node, lbl) AS (
      |    SELECT doc_id, doc_id FROM documents
      |    UNION
      |    SELECT u.dst, r.lbl FROM r JOIN und u ON u.src = r.node
      |  ) SELECT * FROM r
      |)
      |SELECT node AS doc_id, CAST(min(lbl) AS BIGINT) AS entity
      |FROM reach GROUP BY node""".stripMargin
}
