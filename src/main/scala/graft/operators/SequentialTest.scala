package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{MixMod61, Native}

/** Group-sequential experiment monitoring with O'Brien–Fleming
  * boundaries — "peek at the experiment every period without blowing
  * the α budget". The fixed-horizon tests ([[SrmCheck]],
  * [[PermutationTest]], [[graft.operators.Contingency]]) assume ONE
  * look; production experiment platforms look every day, and the OF
  * correction is the standard guard (boundary z²ₖ = z²_α·K/k for look
  * k of K — spending almost nothing early, converging to the fixed
  * test at the horizon).
  *
  * Exactness: the only transcendental is z²_α itself, precomputed ONCE
  * in Scala as a micros literal (the ndcg discount-table discipline);
  * the boundary at every look is then the exact rational
  * (z²_α_micros·K) div k, and the monitored statistic is the SRM-style
  * two-arm count z² = (10⁶·(n₁−n₂)²) div (n₁+n₂) on cumulative counts
  * — pure truncating-integer arithmetic, bit-identical cross-engine.
  * (n₁−n₂)² rides DECIMAL(38,0) for the 100 TB envelope.
  *
  * Scale: one aggregate of the fact to (look, n1, n2) cells bounded by
  * the calendar, a partition-less cumulative window over those cells
  * only, and literal arithmetic. The 100 TB cost is the scan.
  */
object SequentialTest {

  /** χ²₁ critical value at two-sided α = 5% (= 1.96²), micros. */
  val Z2AlphaMicros = 3841459L

  private def mix(c: Column): Column =
    Native.call("graft_mix_mod61", exprs => MixMod61(exprs.head), c)

  /** Per-look monitoring table over per-unit rows (idCol, lookCol
    * integer 1..K): (look, n1, n2, n1_cum, n2_cum, z2_ppm,
    * boundary_ppm, crossed). Arms are the mixer hash bit of the unit
    * id; looks with no prior data still compare cumulative counts.
    * `k` = total planned looks (boundary scale). */
  def obrienFleming(df: DataFrame, idCol: String, lookCol: String,
                    k: Int): DataFrame = {
    val cells = df
      .select(col(lookCol).cast("long").as("look"),
        (mix(col(idCol).cast("long")) % 2 === 0).as("t"))
      .groupBy("look")
      .agg(count(when(col("t"), lit(1))).as("n1"),
        count(when(!col("t"), lit(1))).as("n2"))
    val wCum = Window.orderBy("look")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("n1_cum", sum(col("n1")).over(wCum))
      .withColumn("n2_cum", sum(col("n2")).over(wCum))
      .withColumn("z2_ppm", expr(
        """CASE WHEN n1_cum + n2_cum > 0 THEN
             (1000000 * CAST(n1_cum - n2_cum AS DECIMAL(38,0))
               * (n1_cum - n2_cum)) div (n1_cum + n2_cum) END"""))
      .withColumn("boundary_ppm",
        expr(s"($Z2AlphaMicros * ${k}L) div look"))
      .withColumn("crossed",
        coalesce(col("z2_ppm") > col("boundary_ppm"), lit(false)))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: 1997 orders as an A/A stream monitored monthly
    * (12 looks) — unit = order key, so the null is true by
    * construction and the gate pins the no-false-alarm path at the
    * exact boundary values. */
  def sequentialOrders(spark: SparkSession, dir: String): DataFrame =
    obrienFleming(
      Tables.orders(spark, dir)
        .filter(year(col("o_orderdate")) === 1997)
        .select(col("o_orderkey"), month(col("o_orderdate")).as("m")),
      "o_orderkey", "m", k = 12)

  def oracleSql: String =
    s"""WITH armed AS (
      |  SELECT CAST(month(o_orderdate) AS BIGINT) AS look,
      |    xor(h2, h2 >> 27) % 2 = 0 AS t
      |  FROM (
      |    SELECT o_orderdate,
      |      CAST((CAST(${graft.functions.Hll.A2} AS HUGEINT)
      |        * xor(h1, h1 >> 30)) % ${graft.functions.Hll.P} AS BIGINT) AS h2
      |    FROM (
      |      SELECT o_orderdate,
      |        CAST((CAST(${graft.functions.Hll.A} AS HUGEINT) * o_orderkey
      |          + ${graft.functions.Hll.B}) % ${graft.functions.Hll.P}
      |          AS BIGINT) AS h1
      |      FROM orders WHERE year(o_orderdate) = 1997))
      |), cells AS (
      |  SELECT look,
      |    CAST(count(CASE WHEN t THEN 1 END) AS BIGINT) AS n1,
      |    CAST(count(CASE WHEN NOT t THEN 1 END) AS BIGINT) AS n2
      |  FROM armed GROUP BY 1
      |), cum AS (
      |  SELECT look, n1, n2,
      |    sum(n1) OVER (ORDER BY look) AS n1_cum,
      |    sum(n2) OVER (ORDER BY look) AS n2_cum
      |  FROM cells
      |)
      |SELECT look, n1, n2,
      |  CAST(n1_cum AS BIGINT) AS n1_cum, CAST(n2_cum AS BIGINT) AS n2_cum,
      |  CASE WHEN n1_cum + n2_cum > 0 THEN CAST(
      |    (1000000 * CAST(n1_cum - n2_cum AS HUGEINT) * (n1_cum - n2_cum))
      |      // (n1_cum + n2_cum) AS BIGINT) END AS z2_ppm,
      |  CAST(($Z2AlphaMicros * 12) // look AS BIGINT) AS boundary_ppm,
      |  coalesce(CAST(
      |    (1000000 * CAST(n1_cum - n2_cum AS HUGEINT) * (n1_cum - n2_cum))
      |      // (n1_cum + n2_cum) AS BIGINT)
      |    > ($Z2AlphaMicros * 12) // look, false) AS crossed
      |FROM cum""".stripMargin
}
