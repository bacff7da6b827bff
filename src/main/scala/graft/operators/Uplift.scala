package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Hll, MixMod61, Native}

/** Qini / uplift-curve evaluation — the incremental-impact scoreboard
  * of a targeting model: rank units by a model score, split each
  * decile's treated vs control response, and report per-decile uplift
  * plus the cumulative Qini coefficient (incremental responders over
  * random targeting). This is the decision layer the reference's
  * trained rankers feed (/root/reference/MachineLearning/Ray/recsys/
  * ray_train_pointwise.py scores; an uplift readout is how a campaign
  * decides WHO to contact). [[Calibration]]/[[ExactAuc]] grade
  * prediction quality; this grades INTERVENTION value.
  *
  * Determinism discipline: treatment assignment is the hash bit of the
  * unit id through the validated two-round mod-(2⁶¹−1) mixer
  * ([[MixMod61]], same literals in both engines — the
  * [[PermutationTest]] arm rule); deciles come from the VALUE-CELL
  * quantile map ([[RfmSegment]]'s no-global-ntile discipline: decile =
  * (10·strictly-above) div n + 1 over bounded score cells, ties share
  * a decile); uplift and Qini are truncating integer divisions of
  * exact counts.
  *
  * Scale: one groupBy to units, one cell-table quantile map (window
  * over ≤|score domain| cells), one broadcast join back, one 10-row
  * aggregate. The 100 TB cost is the scan.
  */
object Uplift {

  private def mix(c: Column): Column =
    Native.call("graft_mix_mod61", exprs => MixMod61(exprs.head), c)

  /** Per-decile uplift table over per-unit rows (idCol, scoreCol
    * integer, hitCol boolean): (decile, n_t, n_c, r_t, r_c,
    * uplift_permicro, qini_cum). Decile 1 = highest scores. Treatment
    * = mixer hash bit of the unit id. qini_cum = cumulative
    * incremental responders r_tc − r_cc·n_tc/n_cc, truncating. */
  def qiniDeciles(units: DataFrame, idCol: String, scoreCol: String,
                  hitCol: String): DataFrame = {
    val per = units.select(col(idCol).cast("long").as("u"),
        col(scoreCol).cast("long").as("s"), col(hitCol).as("hit"))
      .withColumn("t", mix(col("u")) % 2 === 0)
      .localCheckpoint() // reused: decile cell map + scored join
    // value-cell decile map, ordered DESC so decile 1 = best scores
    val cells = per.groupBy(col("s")).agg(count(lit(1)).as("__c"))
    val wAbove = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val dmap = cells
      .withColumn("__above", coalesce(sum(col("__c")).over(wAbove), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(wAll))
      .select(col("s"),
        expr("CAST((10 * __above) div __n + 1 AS BIGINT)").as("decile"))
    val byDecile = per.join(broadcast(dmap), "s")
      .groupBy("decile")
      .agg(count(when(col("t"), lit(1))).as("n_t"),
        count(when(!col("t"), lit(1))).as("n_c"),
        count(when(col("t") && col("hit"), lit(1))).as("r_t"),
        count(when(!col("t") && col("hit"), lit(1))).as("r_c"))
    val wCum = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDecile
      .withColumn("n_tc", sum(col("n_t")).over(wCum))
      .withColumn("n_cc", sum(col("n_c")).over(wCum))
      .withColumn("r_tc", sum(col("r_t")).over(wCum))
      .withColumn("r_cc", sum(col("r_c")).over(wCum))
      .select(col("decile"), col("n_t"), col("n_c"), col("r_t"), col("r_c"),
        expr("""CASE WHEN n_t > 0 AND n_c > 0 THEN
            (1000000 * r_t) div n_t - (1000000 * r_c) div n_c END""")
          .as("uplift_permicro"),
        expr("""CASE WHEN n_cc > 0 THEN
            r_tc - (r_cc * n_tc) div n_cc END""").as("qini_cum"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: customers scored by pre-1999 spend (whole
    * dollars), outcome = placed an order on/after 1999-01-01, hash-bit
    * pseudo-treatment (an A/A frame: true uplift ≈ 0, so the gate also
    * pins the null behavior of the estimator). */
  def qiniOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_custkey").as("u"),
      col("o_orderdate").as("d"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val units = o.groupBy("u").agg(
        sum(when(col("d") < lit("1999-01-01").cast("date"),
          expr("cents div 100"))).as("score"),
        (count(when(col("d") >= lit("1999-01-01").cast("date"), lit(1)))
          > 0).as("hit"))
      .filter(col("score").isNotNull) // units scored in the pre-period
    qiniDeciles(units, "u", "score", "hit")
  }

  def oracleSql: String =
    s"""WITH o AS (
      |  SELECT o_custkey AS u, o_orderdate AS d,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders
      |), units AS (
      |  SELECT u,
      |    sum(CASE WHEN d < DATE '1999-01-01' THEN cents // 100 END) AS s,
      |    count(CASE WHEN d >= DATE '1999-01-01' THEN 1 END) > 0 AS hit
      |  FROM o GROUP BY u
      |  HAVING sum(CASE WHEN d < DATE '1999-01-01' THEN cents // 100 END)
      |    IS NOT NULL
      |), armed AS (
      |  SELECT u, s, hit,
      |    xor(h2, h2 >> 27) % 2 = 0 AS t
      |  FROM (
      |    SELECT u, s, hit,
      |      CAST((CAST(${Hll.A2} AS HUGEINT) * xor(h1, h1 >> 30)) % ${Hll.P}
      |        AS BIGINT) AS h2
      |    FROM (
      |      SELECT u, s, hit,
      |        CAST((CAST(${Hll.A} AS HUGEINT) * u + ${Hll.B}) % ${Hll.P}
      |          AS BIGINT) AS h1
      |      FROM units))
      |), dmap AS (
      |  SELECT s, CAST((10 * coalesce(sum(c) OVER (ORDER BY s DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
      |      // (sum(c) OVER ()) + 1 AS BIGINT) AS decile
      |  FROM (SELECT s, count(*) AS c FROM armed GROUP BY 1)
      |), byd AS (
      |  SELECT d.decile,
      |    CAST(count(CASE WHEN a.t THEN 1 END) AS BIGINT) AS n_t,
      |    CAST(count(CASE WHEN NOT a.t THEN 1 END) AS BIGINT) AS n_c,
      |    CAST(count(CASE WHEN a.t AND a.hit THEN 1 END) AS BIGINT) AS r_t,
      |    CAST(count(CASE WHEN NOT a.t AND a.hit THEN 1 END) AS BIGINT) AS r_c
      |  FROM armed a JOIN dmap d ON a.s = d.s
      |  GROUP BY d.decile
      |), cum AS (
      |  SELECT *, sum(n_t) OVER (ORDER BY decile) AS n_tc,
      |    sum(n_c) OVER (ORDER BY decile) AS n_cc,
      |    sum(r_t) OVER (ORDER BY decile) AS r_tc,
      |    sum(r_c) OVER (ORDER BY decile) AS r_cc
      |  FROM byd
      |)
      |SELECT decile, n_t, n_c, r_t, r_c,
      |  CASE WHEN n_t > 0 AND n_c > 0 THEN CAST(
      |    (1000000 * r_t) // n_t - (1000000 * r_c) // n_c AS BIGINT)
      |  END AS uplift_permicro,
      |  CASE WHEN n_cc > 0 THEN CAST(
      |    r_tc - (r_cc * n_tc) // n_cc AS BIGINT) END AS qini_cum
      |FROM cum""".stripMargin
}
