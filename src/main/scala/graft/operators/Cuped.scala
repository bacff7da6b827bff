package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** CUPED variance reduction in exact integer arithmetic — the
  * experiment-sensitivity transform beside [[MannWhitney]]'s rank test:
  * subtract the pre-period covariate's explained component,
  * yᵃᵈʲ = y − θ(x − x̄), θ = cov(x,y)/var(x), and report how much
  * metric variance the adjustment removed. The pre/post design is the
  * reference's monitored-ingestion experiment readout
  * (/root/reference/DataEngineering/DataBricks/spark_stream.py feed →
  * scoreboard).
  *
  * Discipline mirrors [[graft.operators.LinReg]]: θ comes from BIGINT
  * sufficient statistics (n·Σxy − Σx·Σy, n·Σx² − (Σx)²) quantized ONCE
  * to truncating-division micros, so both engines hold the identical θ;
  * per-unit adjustment is one more sign-split truncating division and
  * the variance comparison is the n²-scaled integer sum of squares
  * (never a float mean). Accumulation in DECIMAL(38,0): Σx² outgrows
  * BIGINT once units×value² passes ~9·10¹⁸.
  */
object Cuped {

  /** One row: (n, theta_micro, ss_y, ss_adj, reduction_permicro) for
    * per-unit integer columns (xCol = pre metric, yCol = post metric).
    * ss_* are n²-scaled sums of squares about the mean; reduction is
    * 1 − ss_adj/ss_y in truncating permicro. */
  def varianceReduction(unitsIn: DataFrame, xCol: String, yCol: String): DataFrame = {
    // consumed twice (θ fit + adjusted pass): materialize the per-unit
    // frame once — the audience_overlap double-plan discipline
    val units = unitsIn.localCheckpoint()
    val stats = units.agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(col(xCol)).cast("decimal(38,0)").as("sx"),
      sum(col(yCol)).cast("decimal(38,0)").as("sy"),
      sum(col(xCol).cast("decimal(38,0)") * col(xCol)).as("sxx"),
      sum(col(xCol).cast("decimal(38,0)") * col(yCol)).as("sxy"),
      sum(col(yCol).cast("decimal(38,0)") * col(yCol)).as("syy"))
      .select(col("n"), col("sx"), col("sy"), col("syy"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("covn"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("varn"))
      .withColumn("theta_micro", expr(
        """CASE WHEN varn > 0 THEN
             (CASE WHEN covn < 0 THEN -1L ELSE 1L END)
               * ((1000000 * abs(covn)) div varn)
           ELSE 0L END"""))
    // θ rides as a one-row broadcast; the adjusted metric is map-side
    val adj = units.crossJoin(broadcast(
        stats.select(col("n"), col("sx"), col("theta_micro"))))
      .select(col("theta_micro"),
        // y_adj = y − θ·(x − x̄) with x̄ = sx/n: ONE truncating division
        // of the fully-scaled numerator keeps both engines identical
        (col(yCol).cast("decimal(38,0)") - expr(
          s"""(CASE WHEN theta_micro * (n * $xCol - sx) < 0 THEN -1L ELSE 1L END)
              * (abs(theta_micro * (n * $xCol - sx)) div (1000000 * n))"""))
          .as("v"))
    val adjStats = adj.agg(
      count(lit(1)).cast("decimal(38,0)").as("an"),
      sum(col("v")).as("sv"),
      sum(col("v") * col("v")).as("svv"))
    stats.crossJoin(broadcast(adjStats))
      .select(
        col("n").cast("long").as("n"),
        col("theta_micro"),
        (col("n") * col("syy") - col("sy") * col("sy")).as("ss_y"),
        (col("an") * col("svv") - col("sv") * col("sv")).as("ss_adj"))
      .withColumn("reduction_permicro", expr(
        """CASE WHEN ss_y > 0 THEN
             (1000000 * (ss_y - ss_adj)) div ss_y END"""))
      // ss_* report as VARCHAR: DECIMAL(38,0) is internal-only — the
      // gate's value-hash canonicalizes decimals engine-specifically,
      // so the digit string is the bit-exact cross-engine contract.
      .select(col("n"), col("theta_micro"),
        col("ss_y").cast("string").as("ss_y"),
        col("ss_adj").cast("string").as("ss_adj"),
        col("reduction_permicro"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: per-customer order spend (whole cents) split at
    * 1998-01-01 — pre-period spend as the covariate for post-period
    * spend. Customers active in only one side keep an exact 0 on the
    * other (the join-free conditional-sum pivot). */
  def cupedOrders(spark: SparkSession, dir: String): DataFrame = {
    val units = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(
        coalesce(sum(when(col("o_orderdate") < lit("1998-01-01").cast("date"),
          round(col("o_totalprice") * 100).cast("long"))), lit(0L)).as("x"),
        coalesce(sum(when(col("o_orderdate") >= lit("1998-01-01").cast("date"),
          round(col("o_totalprice") * 100).cast("long"))), lit(0L)).as("y"))
    varianceReduction(units, "x", "y")
  }

  def oracleSql: String =
    """WITH units AS (
      |  SELECT o_custkey,
      |    CAST(coalesce(sum(CASE WHEN o_orderdate < DATE '1998-01-01'
      |      THEN CAST(round(o_totalprice * 100) AS BIGINT) END), 0) AS HUGEINT) AS x,
      |    CAST(coalesce(sum(CASE WHEN o_orderdate >= DATE '1998-01-01'
      |      THEN CAST(round(o_totalprice * 100) AS BIGINT) END), 0) AS HUGEINT) AS y
      |  FROM orders GROUP BY 1
      |), stats AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n,
      |    sum(x) AS sx, sum(y) AS sy,
      |    sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
      |  FROM units
      |), theta AS (
      |  SELECT n, sx, sy, syy,
      |    n * sxy - sx * sy AS covn, n * sxx - sx * sx AS varn,
      |    CASE WHEN n * sxx - sx * sx > 0 THEN
      |      (CASE WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 1 END)
      |        * ((1000000 * abs(n * sxy - sx * sy)) // (n * sxx - sx * sx))
      |    ELSE 0 END AS theta_micro
      |  FROM stats
      |), adj AS (
      |  SELECT u.y - (CASE WHEN t.theta_micro * (t.n * u.x - t.sx) < 0
      |      THEN -1 ELSE 1 END)
      |      * (abs(t.theta_micro * (t.n * u.x - t.sx)) // (1000000 * t.n)) AS v
      |  FROM units u CROSS JOIN theta t
      |), adjstats AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS an, sum(v) AS sv,
      |    sum(v * v) AS svv
      |  FROM adj
      |)
      |SELECT CAST(t.n AS BIGINT) AS n,
      |  CAST(t.theta_micro AS BIGINT) AS theta_micro,
      |  CAST(t.n * t.syy - t.sy * t.sy AS VARCHAR) AS ss_y,
      |  CAST(a.an * a.svv - a.sv * a.sv AS VARCHAR) AS ss_adj,
      |  CASE WHEN t.n * t.syy - t.sy * t.sy > 0 THEN CAST(
      |    (1000000 * ((t.n * t.syy - t.sy * t.sy)
      |                 - (a.an * a.svv - a.sv * a.sv)))
      |      // (t.n * t.syy - t.sy * t.sy) AS BIGINT) END AS reduction_permicro
      |FROM theta t CROSS JOIN adjstats a""".stripMargin
}
