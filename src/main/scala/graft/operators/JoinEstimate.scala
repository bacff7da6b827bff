package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Exact equi-join size estimation — the optimizer primitive made a
  * first-class audit: \|A ⋈ₖ B\| = Σₖ c_A(k)·c_B(k), computed from the
  * two per-key count tables WITHOUT materializing the join. The
  * pre-flight "will this join explode" check beside [[KeySkew]]'s
  * single-table profile (skew says a key is hot; this says what the
  * hot keys MULTIPLY into) — the planning step a 100 TB pipeline runs
  * before committing to a shuffle the cluster cannot absorb
  * (the reference's notebook orchestration fans out joins,
  * DataEngineering/Python/parallelize_db_notebooks.py).
  *
  * Cost: one aggregate per side + an equi-join at KEY cardinality
  * (never row cardinality); products in DECIMAL(38,0) (Σ c² outgrows
  * BIGINT once a key pair passes ~3·10⁹ each). Output: the top
  * contributing keys (count DESC, key ASC TakeOrdered) each carrying
  * the global estimate — evidence and verdict in one frame.
  */
object JoinEstimate {

  /** Top-`show` contributing keys (key, c_a, c_b, pairs) + global
    * (est_rows, n_matching_keys) repeated per row. */
  def joinSize(a: DataFrame, aKey: String, b: DataFrame, bKey: String,
               show: Int): DataFrame = {
    val ca = a.groupBy(col(aKey).cast("long").as("key"))
      .agg(count(lit(1)).as("c_a"))
    val cb = b.groupBy(col(bKey).cast("long").as("key"))
      .agg(count(lit(1)).as("c_b"))
    val keys = ca.join(cb, "key")
      .withColumn("pairs", col("c_a").cast("decimal(38,0)") * col("c_b"))
      .localCheckpoint() // consumed by the summary AND the top-k pass
    val summary = keys.agg(
      sum(col("pairs")).as("est_rows"),
      count(lit(1)).as("n_matching_keys"))
    // pairs/est_rows report as VARCHAR (ordering happens on the
    // DECIMAL first): the gate's value-hash canonicalizes decimals
    // engine-specifically, so the digit string is the bit-exact
    // cross-engine contract.
    keys.orderBy(col("pairs").desc, col("key").asc).limit(show)
      .crossJoin(broadcast(summary))
      .select(col("key"), col("c_a"), col("c_b"),
        col("pairs").cast("string").as("pairs"),
        col("est_rows").cast("string").as("est_rows"),
        col("n_matching_keys"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: how many rows would events ⋈ orders on
    * user = customer produce? Top-5 multiplying keys shown. */
  def joinSizeEventsOrders(spark: SparkSession, dir: String): DataFrame =
    joinSize(Tables.events(spark, dir), "user_id",
      Tables.orders(spark, dir), "o_custkey", show = 5)

  def oracleSql: String =
    """WITH ca AS (
      |  SELECT CAST(user_id AS BIGINT) AS key, CAST(count(*) AS BIGINT) AS c_a
      |  FROM events GROUP BY 1
      |), cb AS (
      |  SELECT CAST(o_custkey AS BIGINT) AS key, CAST(count(*) AS BIGINT) AS c_b
      |  FROM orders GROUP BY 1
      |), keys AS (
      |  SELECT ca.key, ca.c_a, cb.c_b,
      |    CAST(ca.c_a AS HUGEINT) * cb.c_b AS pairs
      |  FROM ca JOIN cb ON ca.key = cb.key
      |), summary AS (
      |  SELECT CAST(sum(pairs) AS DECIMAL(38,0)) AS est_rows,
      |    CAST(count(*) AS BIGINT) AS n_matching_keys
      |  FROM keys
      |)
      |SELECT k.key, k.c_a, k.c_b, CAST(k.pairs AS VARCHAR) AS pairs,
      |  CAST(s.est_rows AS VARCHAR) AS est_rows, s.n_matching_keys
      |FROM (SELECT * FROM keys ORDER BY pairs DESC, key ASC LIMIT 5) k
      |CROSS JOIN summary s""".stripMargin
}
