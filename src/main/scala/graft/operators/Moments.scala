package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Exact higher-moment profile (skewness, kurtosis) per group —
  * completing the distribution-shape family beside
  * [[SchemaTools.numericProfile]] (location/spread) and
  * [[DigitProfile]] (digit law): is a metric's distribution
  * asymmetric, and how heavy are its tails? The monitoring readout
  * behind "this feed's value distribution changed shape even though
  * mean and variance held" — a drift mode [[graft.operators
  * .DriftEffect]]'s PSI sees late and variance never sees.
  *
  * Exactness contract — integer all the way, declared truncation
  * points only:
  * 1. pivot m0 = Σx div n (the INTEGER floor mean). All power sums
  *    center on m0, so per-row terms are domain-bounded: Σ(y²,y³,y⁴)
  *    with y = x − m0 stay within DECIMAL(38,0) at 10¹² rows for any
  *    metric up to ~10⁶ units of spread. Reported moments are "about
  *    the floor mean" — within δ<1 metric unit of the exact-mean
  *    moments, and bit-identical cross-engine, with none of the
  *    n³-scaled correction terms that overflow 38 digits.
  * 2. per-n normalization v_k = S_k div n, then
  *    skew = (10⁶·|v3|) div (v2·isqrt(v2)) sign-split and
  *    kurt = (10⁶·v4) div (v2·v2) — [[Allocation]]'s exact isqrt,
  *    every quotient inside BIGINT, every operand inside DECIMAL(38,0).
  * Two fact passes (pivot, then centered sums — both map-side partial
  * aggregates); everything after is group-table sized.
  */
object Moments {

  /** Per-group (grp, n, m0, v2, skew_permicro, kurt_permicro) for
    * integer metric `valueCol`. Kurtosis is RAW (normal ≈ 3·10⁶), not
    * excess. */
  def skewKurtosis(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val d = df.select(col(groupCol).as("g"), col(valueCol).cast("long").as("x"))
    val pivot = d.groupBy("g")
      .agg(expr("sum(CAST(x AS DECIMAL(38,0)))").as("__sx"),
        count(lit(1)).cast("decimal(38,0)").as("n"))
      .select(col("g"), col("n"),
        // sign-split: div truncates toward zero in Spark but // floors
        // in DuckDB — the |·| form is identical on both engines for
        // negative-sum groups
        expr("""(CASE WHEN __sx < 0 THEN -1 ELSE 1 END)
          * CAST(abs(__sx) div n AS DECIMAL(38,0))""").as("m0"))
    val sums = d.join(broadcast(pivot), "g")
      .select(col("g"), col("n"), col("m0"),
        (col("x") - col("m0")).cast("decimal(38,0)").as("y"))
      .groupBy(col("g"), col("n"), col("m0"))
      .agg(sum(expr("y * y")).as("s2"),
        sum(expr("y * y * y")).as("s3"),
        sum(expr("y * y * y * y")).as("s4"))
    val sq = Allocation.isqrtSql("v2")
    sums
      .withColumn("v2", expr("CAST(s2 div n AS DECIMAL(38,0))"))
      .withColumn("v3", expr(
        """(CASE WHEN s3 < 0 THEN -1 ELSE 1 END)
          | * CAST(abs(s3) div n AS DECIMAL(38,0))""".stripMargin))
      .withColumn("v4", expr("CAST(s4 div n AS DECIMAL(38,0))"))
      .select(col("g").as("grp"), col("n").cast("long").as("n"),
        col("m0").cast("long").as("m0"),
        col("v2").cast("string").as("v2"),
        expr(s"""CASE WHEN v2 > 0 THEN CAST(
            (CASE WHEN v3 < 0 THEN -1 ELSE 1 END)
              * ((1000000 * abs(v3)) div (v2 * $sq))
          AS BIGINT) END""").as("skew_permicro"),
        expr("""CASE WHEN v2 > 0 THEN
            CAST((1000000 * v4) div (v2 * v2) AS BIGINT) END""")
          .as("kurt_permicro"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: shape of lineitem extendedprice (whole dollars)
    * per return flag. */
  def momentsLineitem(spark: SparkSession, dir: String): DataFrame =
    skewKurtosis(
      Tables.lineitem(spark, dir).select(
        col("l_returnflag").as("flag"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT) div 100")
          .as("dollars")),
      "flag", "dollars")
      .select(col("grp").as("flag"), col("n"), col("m0"), col("v2"),
        col("skew_permicro"), col("kurt_permicro"))

  def oracleSql: String = {
    val sq = Allocation.isqrtDuckSql("v2")
    s"""WITH d AS (
       |  SELECT l_returnflag AS g,
       |    CAST(round(l_extendedprice * 100) AS BIGINT) // 100 AS x
       |  FROM lineitem
       |), pv AS (
       |  SELECT g, CAST(count(*) AS HUGEINT) AS n,
       |    (CASE WHEN sum(x) < 0 THEN -1 ELSE 1 END)
       |      * (CAST(abs(sum(x)) AS HUGEINT)
       |          // CAST(count(*) AS HUGEINT)) AS m0
       |  FROM d GROUP BY g
       |), sums AS (
       |  SELECT d.g, p.n, p.m0,
       |    sum(CAST(d.x - p.m0 AS HUGEINT) * (d.x - p.m0)) AS s2,
       |    sum(CAST(d.x - p.m0 AS HUGEINT) * (d.x - p.m0) * (d.x - p.m0))
       |      AS s3,
       |    sum(CAST(d.x - p.m0 AS HUGEINT) * (d.x - p.m0) * (d.x - p.m0)
       |      * (d.x - p.m0)) AS s4
       |  FROM d JOIN pv p ON p.g = d.g
       |  GROUP BY d.g, p.n, p.m0
       |), vs AS (
       |  SELECT g, n, m0, s2 // n AS v2,
       |    (CASE WHEN s3 < 0 THEN -1 ELSE 1 END) * (abs(s3) // n) AS v3,
       |    s4 // n AS v4
       |  FROM sums
       |)
       |SELECT g AS flag, CAST(n AS BIGINT) AS n, CAST(m0 AS BIGINT) AS m0,
       |  CAST(v2 AS VARCHAR) AS v2,
       |  CASE WHEN v2 > 0 THEN CAST(
       |    (CASE WHEN v3 < 0 THEN -1 ELSE 1 END)
       |      * ((1000000 * abs(v3)) // (v2 * $sq)) AS BIGINT) END
       |    AS skew_permicro,
       |  CASE WHEN v2 > 0 THEN
       |    CAST((1000000 * v4) // (v2 * v2) AS BIGINT) END AS kurt_permicro
       |FROM vs""".stripMargin
  }
}
