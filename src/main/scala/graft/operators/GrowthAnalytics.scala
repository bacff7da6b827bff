package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Growth/ops analytics over the event and order facts:
  *
  * `cohort_ltv` — weekly-cohort cumulative lifetime value: users
  * cohorted by first-event week, purchase revenue accumulated by
  * cohort age, LTV = cumulative cents per cohort user in truncating
  * micros. The MONEY curve over [[Cohort]]'s retention counts (the
  * growth question retention alone can't answer); everything after
  * two fact aggregates runs at (cohorts × ages) cardinality.
  *
  * `abc_classification` — Pareto/ABC inventory classes: parts ranked
  * by revenue under the TOTAL order (revenue DESC, partkey ASC), class
  * decided by exact integer cumulative-share comparisons (10·cum ≤
  * 8·total → A, 20·cum ≤ 19·total → B, else C — no percentage ever
  * floats). The global cumulative sum is the [[SaltedCumSum]]
  * two-phase shape with REVENUE-RANGE buckets as the salt (bucket
  * order is consistent with the global revenue order, so per-bucket
  * cumsums + a bucket-offset rollup compose exactly): no task ever
  * windows the whole part dimension. The per-part concentration twin
  * of [[Gini]]'s summary coefficient.
  */
object GrowthAnalytics {

  // ---- cohort_ltv ----

  /** (cohort_week, age_weeks, cohort_users, rev_cents, cum_rev_cents,
    * ltv_micros_per_user). */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    // the raw fact is re-scanned per pass (deterministic parquet,
    // pushdown-friendly) — only the SMALL per-user frame materializes
    val ev = Tables.events(spark, dir)
    val base = ev.agg(min(col("ts").cast("date")).as("d0"))
    val users = ev.groupBy(col("user_id"))
      .agg(min(col("ts").cast("date")).as("first_d"))
      .crossJoin(broadcast(base))
      .select(col("user_id"), expr("datediff(first_d, d0) div 7").as("cohort_week"))
      .localCheckpoint() // reused by sizes AND the purchase join
    val sizes = users.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_users"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .crossJoin(broadcast(base))
      .select(col("user_id"),
        expr("datediff(CAST(ts AS DATE), d0) div 7").as("w"),
        round(col("value") * 100).cast("long").as("cents"))
      .join(users, "user_id")
      .groupBy(col("cohort_week"), (col("w") - col("cohort_week")).as("age_weeks"))
      .agg(sum(col("cents")).as("rev_cents"))
    val wAge = Window.partitionBy(col("cohort_week")).orderBy(col("age_weeks"))
    purchases
      .withColumn("cum_rev_cents", sum(col("rev_cents")).over(wAge))
      .join(sizes, "cohort_week")
      .withColumn("ltv_micros_per_user",
        expr("(1000000 * cum_rev_cents) div cohort_users"))
  }

  def cohortLtvOracleSql: String =
    """WITH base AS (
      |  SELECT min(CAST(ts AS DATE)) AS d0 FROM events
      |), users AS (
      |  SELECT user_id,
      |    date_diff('day', b.d0, min(CAST(e.ts AS DATE))) // 7 AS cohort_week
      |  FROM events e CROSS JOIN base b GROUP BY user_id, b.d0
      |), sizes AS (
      |  SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_users
      |  FROM users GROUP BY 1
      |), purchases AS (
      |  SELECT u.cohort_week,
      |    (date_diff('day', b.d0, CAST(e.ts AS DATE)) // 7) - u.cohort_week
      |      AS age_weeks,
      |    CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      |  FROM events e
      |  JOIN users u ON e.user_id = u.user_id
      |  CROSS JOIN base b
      |  WHERE e.event_type = 'purchase'
      |  GROUP BY 1, 2
      |), cum AS (
      |  SELECT cohort_week, age_weeks, rev_cents,
      |    CAST(sum(rev_cents) OVER (PARTITION BY cohort_week
      |      ORDER BY age_weeks) AS BIGINT) AS cum_rev_cents
      |  FROM purchases
      |)
      |SELECT c.cohort_week, CAST(c.age_weeks AS BIGINT) AS age_weeks,
      |  s.cohort_users, c.rev_cents, c.cum_rev_cents,
      |  CAST((1000000 * c.cum_rev_cents) // s.cohort_users AS BIGINT)
      |    AS ltv_micros_per_user
      |FROM cum c JOIN sizes s ON c.cohort_week = s.cohort_week""".stripMargin

  // ---- abc_classification ----

  /** (partkey, rev_cents, cum_rev_cents, cls) + global
    * (total_cents, n_a, n_b, n_c) repeated. */
  def abcParts(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey").as("partkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("rev"))
      // revenue-range salt: bucket order ≡ global (rev DESC) order, so
      // the two-phase cumsum composes exactly (the SaltedCumSum shape
      // without a key — no task windows the whole dimension)
      .withColumn("__salt", expr("-(rev div 1000000)"))
      .localCheckpoint() // reused by slices, offsets, AND the total
    val wSlice = Window.partitionBy(col("__salt"))
      .orderBy(col("rev").desc, col("partkey").asc)
    val sliced = rev.withColumn("__sliceCum", sum(col("rev")).over(wSlice))
    val wRoll = Window.orderBy(col("__salt"))
    val offsets = rev.groupBy(col("__salt"))
      .agg(sum(col("rev")).as("__sliceTotal"))
      .withColumn("__offset",
        coalesce(sum(lag(col("__sliceTotal"), 1).over(wRoll)).over(wRoll), lit(0L)))
      .select(col("__salt"), col("__offset"))
    val total = rev.agg(sum(col("rev")).as("total_cents"))
    val classed = sliced.join(offsets, "__salt")
      .withColumn("cum_rev_cents", col("__sliceCum") + col("__offset"))
      .crossJoin(broadcast(total))
      .withColumn("cls",
        when(expr("10 * cum_rev_cents <= 8 * total_cents"), "A")
          .when(expr("20 * cum_rev_cents <= 19 * total_cents"), "B")
          .otherwise("C"))
      .select(col("partkey"), col("rev").as("rev_cents"),
        col("cum_rev_cents"), col("cls"), col("total_cents"))
      .localCheckpoint() // summary pass
    val summary = classed.groupBy()
      .agg(
        sum(when(col("cls") === "A", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("cls") === "B", 1L).otherwise(0L)).as("n_b"),
        sum(when(col("cls") === "C", 1L).otherwise(0L)).as("n_c"))
    classed.crossJoin(broadcast(summary))
  }

  def abcOracleSql: String =
    """WITH rev AS (
      |  SELECT l_partkey AS partkey,
      |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_cents
      |  FROM lineitem GROUP BY 1
      |), cum AS (
      |  SELECT partkey, rev_cents,
      |    CAST(sum(rev_cents) OVER (ORDER BY rev_cents DESC, partkey ASC)
      |      AS BIGINT) AS cum_rev_cents,
      |    CAST(sum(rev_cents) OVER () AS BIGINT) AS total_cents
      |  FROM rev
      |), classed AS (
      |  SELECT partkey, rev_cents, cum_rev_cents, total_cents,
      |    CASE WHEN 10 * cum_rev_cents <= 8 * total_cents THEN 'A'
      |         WHEN 20 * cum_rev_cents <= 19 * total_cents THEN 'B'
      |         ELSE 'C' END AS cls
      |  FROM cum
      |), summary AS (
      |  SELECT CAST(sum(CASE WHEN cls = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(sum(CASE WHEN cls = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    CAST(sum(CASE WHEN cls = 'C' THEN 1 ELSE 0 END) AS BIGINT) AS n_c
      |  FROM classed
      |)
      |SELECT c.partkey, c.rev_cents, c.cum_rev_cents, c.cls, c.total_cents,
      |  s.n_a, s.n_b, s.n_c
      |FROM classed c CROSS JOIN summary s""".stripMargin
}
