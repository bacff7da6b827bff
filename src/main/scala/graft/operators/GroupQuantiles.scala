package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Exact per-group quantiles as DISCRETE indexed order statistics —
  * the grouped, never-interpolated counterpart of the global
  * `numeric_profile` percentiles and the exact baseline the GK sketch
  * path ([[Sketches]]) is measured against. Same anchor: the reference
  * profiles distributions before modeling
  * (/root/reference/DataEngineering/Python/discover_schema.py).
  *
  * Convention (shared with sft_length_stats and the oracle, stated
  * explicitly rather than trusting any engine's quantile function):
  * quantile num/den is the element at 0-based index
  * `(num · (n−1)) DIV den` of the ascending-sorted values — pure
  * integer index math, so both engines pick the IDENTICAL element.
  *
  * Scale: one aggregate to (group, value) cells, windows cumulate over
  * CELLS (distinct values, not raw rows), one conditional-min aggregate
  * back to groups. Raw rows are touched once.
  */
object GroupQuantiles {

  /** One row per group: n plus the requested quantile columns.
    * `quantiles` are (label, num, den) with 0 ≤ num ≤ den. */
  def quantiles(df: DataFrame, groupCol: String, valueCol: String,
                quantiles: Seq[(String, Int, Int)]): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    quantiles.foreach { case (_, num, den) =>
      require(den > 0 && num >= 0 && num <= den, s"bad quantile $num/$den")
    }
    val cells = df
      .select(col(groupCol).as("grp"),
        round(col(valueCol) * 100).cast("long").as("__c"))
      .groupBy("grp", "__c").agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy("grp").orderBy(col("__c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = cells.groupBy("grp").agg(sum("__cnt").as("__n"))
    val cum = cells.withColumn("__cum", sum("__cnt").over(w)).join(tot, "grp")
    val qCols = quantiles.map { case (label, num, den) =>
      // element at 0-based index (num·(n−1)) DIV den ⇔ first value whose
      // cumulative count exceeds that index
      min(when(col("__cum") > expr(s"($num * (__n - 1)) DIV $den"), col("__c")))
        .as(label)
    }
    cum.groupBy(col("grp"), col("__n").as("n"))
      .agg(qCols.head, qCols.tail: _*)
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: price quantiles per return flag on the fact
    * table. */
  def quantilesLineitem(spark: SparkSession, dir: String): DataFrame =
    quantiles(Tables.lineitem(spark, dir), "l_returnflag", "l_extendedprice",
      Seq(("p25_cents", 1, 4), ("p50_cents", 1, 2), ("p75_cents", 3, 4),
        ("p95_cents", 19, 20), ("p99_cents", 99, 100)))
      .withColumnRenamed("grp", "l_returnflag")

  def oracleSql: String = {
    def q(label: String, num: Int, den: Int) =
      s"min(CASE WHEN cum > ($num * (n - 1)) // $den THEN c END) AS $label"
    s"""WITH cells AS (
       |  SELECT l_returnflag AS g, CAST(round(l_extendedprice * 100) AS BIGINT) AS c,
       |    count(*) AS cnt
       |  FROM lineitem GROUP BY 1, 2
       |), tot AS (
       |  SELECT g, CAST(sum(cnt) AS BIGINT) AS n FROM cells GROUP BY 1
       |), cum AS (
       |  SELECT g, c, sum(cnt) OVER (PARTITION BY g ORDER BY c
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM cells
       |)
       |SELECT g AS l_returnflag, n,
       |  ${q("p25_cents", 1, 4)}, ${q("p50_cents", 1, 2)},
       |  ${q("p75_cents", 3, 4)}, ${q("p95_cents", 19, 20)},
       |  ${q("p99_cents", 99, 100)}
       |FROM cum JOIN tot USING (g)
       |GROUP BY g, n""".stripMargin
  }
}
