package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Join-key skew profile — the pre-flight diagnosis for the salting /
  * AQE-skew decisions this library makes elsewhere ([[SkewJoin]],
  * [[SaltedCumSum]]): per key column, how concentrated is the row mass?
  * The reference hits exactly this on its fact⋈dim merges
  * (/root/reference/DataEngineering/DataBricks/merge_generator.py — a
  * hot SKU key is what motivates salting; this measures it first).
  *
  * Output (one row per profiled column): distinct keys, rows, the top
  * key's share, the top-10 coverage, and the Gini coefficient of the
  * key-frequency distribution — 0 = uniform, →1 = one key owns the
  * table. Gini from the Lorenz form over ASCENDING-sorted counts:
  * `G = (2·Σ i·cᵢ) / (n·N) − (n+1)/n`, with Σ i·cᵢ an exact BIGINT
  * (rank from the scalable global row number over the COUNT table, not
  * the fact) and one double expression per output row. Headroom:
  * Σ i·cᵢ ≤ n_keys·N — BIGINT-safe to ~1e6 keys on ~1e12 rows or 1e9
  * keys on ~1e9 rows; beyond that, profile a keyspace sample.
  *
  * Scale: one aggregate on the key (the only fact-sized shuffle), then
  * everything runs at key cardinality.
  */
object KeySkew {

  /** One-row profile of `keyCol`'s frequency distribution. */
  def profile(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("__k"))
      .agg(count(lit(1)).as("__c"))
    val ranked = Ranks.globalRowNumber(counts,
      Seq(col("__c").asc, col("__k")), "__i")
    // key cardinality rides in as a broadcast scalar (top-10 needs it
    // per-row; a window over the count table would single-partition it)
    val nk = ranked.agg(count(lit(1)).as("__nk"))
    ranked.crossJoin(broadcast(nk)).agg(
        count(lit(1)).as("n_keys"),
        sum("__c").as("n_rows"),
        max("__c").as("__maxc"),
        sum(col("__i") * col("__c")).as("__ic"),
        sum(when(col("__i") > col("__nk") - 10, col("__c"))
          .otherwise(0L)).as("__top10"))
      .withColumn("key_col", lit(keyCol))
      .withColumn("max_share_micros",
        round(col("__maxc").cast("double") / col("n_rows") * lit(1e6)).cast("long"))
      .withColumn("top10_share_micros",
        round(col("__top10").cast("double") / col("n_rows") * lit(1e6)).cast("long"))
      .withColumn("gini_micros",
        round((lit(2.0) * col("__ic")
          / (col("n_keys").cast("double") * col("n_rows"))
          - (col("n_keys") + 1).cast("double") / col("n_keys")) * lit(1e6))
          .cast("long"))
      .select("key_col", "n_keys", "n_rows", "max_share_micros",
        "top10_share_micros", "gini_micros")
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: supplier and part key skew on the fact table (the
    * two sides a star merge would shuffle on). */
  def keySkewLineitem(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    profile(li, "l_suppkey").unionByName(profile(li, "l_partkey"))
  }

  def oracleSql: String = {
    def one(k: String) =
      s"""SELECT '$k' AS key_col, * FROM (
         |  WITH c AS (
         |    SELECT $k AS kk, count(*) AS c FROM lineitem GROUP BY 1
         |  ), r AS (
         |    SELECT c, row_number() OVER (ORDER BY c, kk) AS i,
         |      count(*) OVER () AS nk FROM c
         |  )
         |  SELECT count(*) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows,
         |    CAST(round(CAST(max(c) AS DOUBLE) / sum(c) * 1e6) AS BIGINT)
         |      AS max_share_micros,
         |    CAST(round(CAST(sum(CASE WHEN i > nk - 10 THEN c ELSE 0 END)
         |      AS DOUBLE) / sum(c) * 1e6) AS BIGINT) AS top10_share_micros,
         |    CAST(round((2.0 * sum(i * c)
         |        / (CAST(count(*) AS DOUBLE) * sum(c))
         |      - CAST(count(*) + 1 AS DOUBLE) / count(*)) * 1e6) AS BIGINT)
         |      AS gini_micros
         |  FROM r
         |)""".stripMargin
    s"${one("l_suppkey")}\nUNION ALL\n${one("l_partkey")}"
  }
}
