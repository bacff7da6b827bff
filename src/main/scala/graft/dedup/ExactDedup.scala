package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Exact (byte-identical) deduplication by content hash.
  *
  * The canonical first pass of any LLM-training-data pipeline: group on
  * sha256(text), keep the lowest id per group. One shuffle on the hash —
  * uniformly distributed by construction, so no skew at any scale; the
  * 32-byte hash (not the document body) is the shuffle key, keeping
  * shuffle bytes tiny relative to the corpus.
  */
object ExactDedup {

  /** Per content group: hash, the kept (minimum) id, and group size. */
  def groups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(sha2(col(textCol), 256).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** The deduplicated corpus: one row per distinct content. */
  def dedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.join(
      groups(docs, idCol, textCol).select(col("keep_id").as(idCol)),
      Seq(idCol))

  /** Duplication profile: one row per cluster SIZE — how many content
    * clusters have that many copies, the docs they cover, and their
    * corpus share in micros. The headline dedup report ("n% of the
    * corpus is duplicate text") read straight off [[groups]]; runs at
    * cluster-size cardinality after the one hash shuffle. */
  def clusterStats(docs: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    val g = groups(docs, idCol, textCol)
      .groupBy(col("n_dups").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .withColumn("n_docs", col("cluster_size") * col("n_clusters"))
    val tot = g.agg(sum("n_docs").as("__tot"))
    g.crossJoin(broadcast(tot))
      .withColumn("share_micros",
        round(col("n_docs").cast("double") / col("__tot") * lit(1e6)).cast("long"))
      .select("cluster_size", "n_clusters", "n_docs", "share_micros")
  }

  // ---- query-map entry (#27) ----

  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    groups(Tables.documents(spark, dir), "doc_id", "text")

  /** Gated duplication profile. The test corpus is all-unique, so the
    * gate PLANTS dups (the injection is part of the query on both
    * sides): every 10th doc re-keyed once, every 20th twice — sizes
    * {1, 2, 3} all populated. */
  def dedupClusterStats(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select("doc_id", "text")
    val once = d.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000)
    val twice = d.filter(col("doc_id") % 20 === 0)
      .withColumn("doc_id", col("doc_id") + 2000000)
    clusterStats(d.unionByName(once).unionByName(twice), "doc_id", "text")
  }

  def clusterStatsOracleSql: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 20 = 0
      |), g AS (
      |  SELECT sha256(text) AS h, count(*) AS n FROM corpus GROUP BY 1
      |), s AS (
      |  SELECT n AS cluster_size, count(*) AS n_clusters,
      |    CAST(n * count(*) AS BIGINT) AS n_docs
      |  FROM g GROUP BY 1
      |), t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS tot FROM s)
      |SELECT cluster_size, n_clusters, n_docs,
      |  CAST(round(CAST(n_docs AS DOUBLE) / tot * 1e6) AS BIGINT)
      |    AS share_micros
      |FROM s CROSS JOIN t""".stripMargin
  // (the sha256 group is computed on the PLANTED corpus above)

  def oracleSql: String =
    """SELECT sha256(text) AS content_hash,
      |  min(doc_id) AS keep_id,
      |  CAST(count(*) AS BIGINT) AS n_dups
      |FROM documents
      |GROUP BY sha256(text)""".stripMargin
}
