package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Gini concentration coefficient + Lorenz curve points — revenue/usage
  * concentration analysis ("what share of revenue do the top x% of
  * customers carry"), the inequality view of the same ranked mass the
  * [[Calibration.liftDeciles]] table slices. A lakehouse KPI over the
  * reference's star facts (AIO_delta_table_generator's measure columns).
  *
  * Exact Gini from the sorted-rank identity
  *   G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx)
  * with i the ASCENDING global rank ((value, key) total order): both
  * sums accumulate in DECIMAL(38,0) and the numerator is ≥ 0 by the
  * rearrangement inequality, so truncating division needs no sign
  * handling. Lorenz points come from the SAME ranked pass bucketed into
  * k population quantile cells: per cell, cumulative population and
  * mass permicro — exact.
  *
  * Scale: entity aggregation (dimension-sized) → two-phase global rank
  * ([[Ranks.globalRowNumber]]) → one aggregate (Gini) and a k-cell
  * rollup (Lorenz). The fact is touched once.
  */
object Gini {

  /** One row per Lorenz cell 1..k plus the scalar Gini repeated per row
    * (keeps a single flat gated output): (cell, n_entities, cum_entities,
    * cum_mass, pop_permicro, mass_permicro, gini_permicro). `values`
    * must be non-negative. */
  def lorenzGini(values: DataFrame, keyCol: String, valueCol: String,
                 k: Int): DataFrame = {
    val base = values.select(col(keyCol).as("__k"),
      col(valueCol).cast("long").as("__x"))
    val ranked = Ranks.globalRowNumber(base,
        Seq(col("__x").asc, col("__k").asc), "__gr")
      .localCheckpoint() // two consumers: gini aggregate, lorenz rollup
    val gini = ranked.agg(
        count(lit(1)).cast("decimal(38,0)").as("__n"),
        sum(col("__x")).cast("decimal(38,0)").as("__s"),
        sum(col("__gr").cast("decimal(38,0)") * col("__x")).as("__w"))
      .select(expr("""CASE WHEN __s > 0 AND __n > 1 THEN
          (1000000 * (2 * __w - (__n + 1) * __s)) div (__n * __s)
        END""").as("gini_permicro"), col("__n").cast("long").as("__nl"))
    // __nl rides in via a broadcast scalar join (single row)
    val withN = ranked.crossJoin(broadcast(gini))
      .withColumn("cell", expr(s"((__gr - 1) * $k) div __nl + 1").cast("int"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_entities"), sum("__x").as("__mass"),
        first("gini_permicro").as("gini_permicro"),
        first("__nl").as("__nl"))
    val wCum = Window.orderBy("cell")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy("cell")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    withN
      .withColumn("cum_entities", sum("n_entities").over(wCum))
      .withColumn("cum_mass", sum("__mass").over(wCum))
      .withColumn("__tot", sum("__mass").over(wAll))
      .select(col("cell"), col("n_entities"), col("cum_entities"),
        col("cum_mass"),
        // ratios in DECIMAL(38,0): 10⁶·cum_mass outgrows BIGINT once
        // total mass passes ~9·10¹² (hit at the sf1 sweep)
        expr("""CAST((1000000 * CAST(cum_entities AS DECIMAL(38,0)))
                 div __nl AS BIGINT)""").as("pop_permicro"),
        expr("""CASE WHEN __tot > 0 THEN
                  CAST((1000000 * CAST(cum_mass AS DECIMAL(38,0)))
                    div __tot AS BIGINT) END""").as("mass_permicro"),
        col("gini_permicro"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: customer revenue concentration (total order cents,
    * zero-order customers included at mass 0), 20 Lorenz cells. */
  def giniCustomerRevenue(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val all = Tables.customer(spark, dir).select(col("c_custkey"))
      .join(rev.withColumnRenamed("o_custkey", "c_custkey"), Seq("c_custkey"), "left")
      .select(col("c_custkey"), coalesce(col("cents"), lit(0L)).as("cents"))
    lorenzGini(all, "c_custkey", "cents", k = 20)
  }

  def oracleSql: String =
    """WITH rev AS (
      |  SELECT c.c_custkey AS k,
      |    coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0) AS x
      |  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      |  GROUP BY 1
      |), ranked AS (
      |  SELECT k, CAST(x AS HUGEINT) AS x,
      |    CAST(row_number() OVER (ORDER BY x ASC, k ASC) AS HUGEINT) AS gr
      |  FROM rev
      |), g AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS s,
      |    sum(gr * x) AS w
      |  FROM ranked
      |), gi AS (
      |  SELECT CASE WHEN s > 0 AND n > 1 THEN
      |      CAST((1000000 * (2 * w - (n + 1) * s)) // (n * s) AS BIGINT)
      |    END AS gini_permicro,
      |    CAST(n AS BIGINT) AS nl
      |  FROM g
      |), cells AS (
      |  SELECT CAST(((gr - 1) * 20) // gi.nl + 1 AS INT) AS cell,
      |    x, gi.gini_permicro, gi.nl
      |  FROM ranked CROSS JOIN gi
      |), rolled AS (
      |  SELECT cell, count(*) AS n_entities,
      |    CAST(sum(x) AS BIGINT) AS mass,
      |    any_value(gini_permicro) AS gini_permicro,
      |    any_value(nl) AS nl
      |  FROM cells GROUP BY cell
      |), cum AS (
      |  SELECT cell, n_entities,
      |    CAST(sum(n_entities) OVER (ORDER BY cell) AS BIGINT) AS cum_entities,
      |    CAST(sum(mass) OVER (ORDER BY cell) AS BIGINT) AS cum_mass,
      |    CAST(sum(mass) OVER () AS BIGINT) AS tot,
      |    gini_permicro, nl
      |  FROM rolled
      |)
      |SELECT cell, n_entities, cum_entities, cum_mass,
      |  CAST((1000000 * CAST(cum_entities AS HUGEINT)) // nl AS BIGINT)
      |    AS pop_permicro,
      |  CASE WHEN tot > 0 THEN
      |    CAST((1000000 * CAST(cum_mass AS HUGEINT)) // tot AS BIGINT) END
      |    AS mass_permicro,
      |  gini_permicro
      |FROM cum""".stripMargin
}
