package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Empirical-Bayes beta-binomial shrinkage of per-group rates — the
  * principled version of [[FeatureEncoders]]' fixed-strength target
  * encoding: instead of a hand-picked prior weight, the prior strength
  * K comes from the DATA via the method of moments
  * (K = p̄(1−p̄)/s² − 1 over the observed group rates), so small groups
  * shrink hard toward the pooled rate and large groups barely move —
  * the ranking-stabilizer behind "which nation REALLY has the worst
  * return rate" dashboards and the leakage-safe encoder the
  * reference's model prep wants
  * (/root/reference/MachineLearning/DataBricks-ML/automl_generator.py
  * categorical handling).
  *
  * Exactness: group rates quantize ONCE to micros (truncating); p̄ and
  * s² are integer moments of those micro rates (s² population-style,
  * g²-scaled then divided back — every step truncating division);
  * K_micro = (p̄_micro·(10⁶−p̄_micro)·10⁶) div s²_micro² − 10⁶ floored
  * at 0 (the ·10⁶ keeps the dimensionless ratio at micro resolution —
  * without it truncation rounds K to whole multiples of 10⁶ and real
  * priors in (0,1) vanish), and the shrunk rate is ONE truncating
  * division with numerator AND denominator both carried at the same
  * 10⁶-inflated scale so fractional K survives:
  *   (10¹²·x_g + K_micro·p̄_micro) div (10⁶·n_g + K_micro)
  * of DECIMAL-carried integers. Degenerate guards: s² = 0 (all groups
  * identical → emit the pooled rate exactly) and a single group
  * (no between-variance → pooled rate). Declared contract: micro
  * resolution on rates, prior moments unweighted over groups (the
  * Morris 1983 simple estimator).
  *
  * Scale: one aggregate of the fact to the group spine, moments over
  * the bounded spine, broadcast join back. The 100 TB cost is the
  * scan.
  */
object EbShrinkage {

  /** Per-group shrinkage table over per-unit rows (grpCol, hitCol):
    * (grp, n, x, rate_micro, pbar_micro, k_micro, shrunk_micro). */
  def betaBinomial(df: DataFrame, grpCol: String, hitCol: String): DataFrame = {
    val grps = df.groupBy(col(grpCol).as("grp"))
      .agg(count(lit(1)).as("n"),
        count(when(col(hitCol), lit(1))).as("x"))
      .withColumn("rate_micro", expr("(1000000 * x) div n"))
      .localCheckpoint() // reused: moments + the shrink join
    val moments = grps.agg(
        count(lit(1)).as("g"),
        sum(col("rate_micro")).cast("decimal(38,0)").as("sr"),
        sum(col("rate_micro").cast("decimal(38,0)") * col("rate_micro"))
          .as("srr"))
      .select(col("g"),
        expr("sr div g").as("pbar_micro"),
        // population variance of the micro rates, micros²
        expr("CASE WHEN g > 1 THEN (g * srr - sr * sr) div (g * g) END")
          .as("s2_micro2"))
      .select(col("pbar_micro"),
        // ratio carried ·10⁶: quotient ≤ 2.5·10¹⁷ (s² ≥ 1), LONG-safe
        expr("""CASE WHEN s2_micro2 > 0 THEN
            greatest((CAST(pbar_micro AS DECIMAL(38,0))
                * (1000000 - pbar_micro) * 1000000) div s2_micro2
              - 1000000L, 0L)
            END""").as("k_micro"))
    grps.crossJoin(broadcast(moments))
      .select(col("grp"), col("n"), col("x"), col("rate_micro"),
        col("pbar_micro"),
        coalesce(col("k_micro"), lit(0L)).as("k_micro"),
        expr("""CASE WHEN k_micro IS NULL THEN pbar_micro ELSE
            (CAST(1000000000000 AS DECIMAL(38,0)) * x
              + CAST(k_micro AS DECIMAL(38,0)) * pbar_micro)
            div (CAST(1000000 AS DECIMAL(38,0)) * n + k_micro)
            END""").as("shrunk_micro"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: per-nation customer-order return rates (an order
    * "hits" if any line returns), shrunk across the 25-nation spine. */
  def ebNationReturns(spark: SparkSession, dir: String): DataFrame = {
    val returned = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg((count(when(col("l_returnflag") === "R", lit(1))) > 0).as("hit"))
    val units = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
      .join(returned, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.customer(spark, dir)
          .select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)
          .select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), col("hit"))
    betaBinomial(units, "nation", "hit")
  }

  def oracleSql: String =
    """WITH returned AS (
      |  SELECT l_orderkey,
      |    count(CASE WHEN l_returnflag = 'R' THEN 1 END) > 0 AS hit
      |  FROM lineitem GROUP BY 1
      |), units AS (
      |  SELECT n.n_name AS grp, r.hit
      |  FROM orders o
      |  JOIN returned r ON o.o_orderkey = r.l_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |), grps AS (
      |  SELECT grp, CAST(count(*) AS BIGINT) AS n,
      |    CAST(count(CASE WHEN hit THEN 1 END) AS BIGINT) AS x,
      |    (1000000 * CAST(count(CASE WHEN hit THEN 1 END) AS BIGINT))
      |      // count(*) AS rate_micro
      |  FROM units GROUP BY 1
      |), moments AS (
      |  SELECT CAST(count(*) AS BIGINT) AS g,
      |    CAST(sum(rate_micro) AS HUGEINT) AS sr,
      |    CAST(sum(CAST(rate_micro AS HUGEINT) * rate_micro) AS HUGEINT)
      |      AS srr
      |  FROM grps
      |), prior AS (
      |  SELECT CAST(sr // g AS BIGINT) AS pbar_micro,
      |    CASE WHEN g > 1 THEN (g * srr - sr * sr) // (g * g) END
      |      AS s2_micro2
      |  FROM moments
      |), kest AS (
      |  SELECT pbar_micro,
      |    CASE WHEN s2_micro2 > 0 THEN
      |      greatest((CAST(pbar_micro AS HUGEINT) * (1000000 - pbar_micro)
      |          * 1000000)
      |        // s2_micro2 - 1000000, 0)
      |    END AS k_micro
      |  FROM prior
      |)
      |SELECT g.grp, g.n, g.x, g.rate_micro, k.pbar_micro,
      |  CAST(coalesce(k.k_micro, 0) AS BIGINT) AS k_micro,
      |  CAST(CASE WHEN k.k_micro IS NULL THEN k.pbar_micro ELSE
      |    (1000000000000 * CAST(g.x AS HUGEINT)
      |      + k.k_micro * CAST(k.pbar_micro AS HUGEINT))
      |    // (1000000 * CAST(g.n AS HUGEINT) + k.k_micro)
      |    END AS BIGINT) AS shrunk_micro
      |FROM grps g CROSS JOIN kest k""".stripMargin
}
