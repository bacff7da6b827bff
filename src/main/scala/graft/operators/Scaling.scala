package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Feature scaling from plain aggregates — re-expresses
  * /root/reference/MachineLearning/Spark/scale_features.py
  * (StandardScaler / MinMaxScaler) without assembling MLlib vectors:
  * the stats are a 1-row broadcast aggregate and the scaling itself is a
  * codegen'd projection, so nothing leaves WholeStageCodegen and nothing
  * is collected to the driver.
  *
  * Stats are rounded to 6 decimals before use so the scaled values are
  * bit-identical regardless of partial-aggregation order (double addition
  * isn't associative; rounding the tiny agg output removes the wobble).
  */
object Scaling {

  /** Z-score scaling of `cols`, appended as `<col>_z`. */
  def standard(df: DataFrame, cols: Seq[String]): DataFrame = {
    val stats = df.agg(
      cols.flatMap(c => Seq(
        round(avg(col(c)), 6).as(s"__mean_$c"),
        round(stddev_samp(col(c)), 6).as(s"__std_$c"))).head,
      cols.flatMap(c => Seq(
        round(avg(col(c)), 6).as(s"__mean_$c"),
        round(stddev_samp(col(c)), 6).as(s"__std_$c"))).tail: _*)
    val scaled = df.crossJoin(broadcast(stats))
    val out = cols.foldLeft(scaled) { (d, c) =>
      d.withColumn(s"${c}_z",
        round((col(c) - col(s"__mean_$c")) / col(s"__std_$c"), 4))
    }
    out.drop(cols.flatMap(c => Seq(s"__mean_$c", s"__std_$c")): _*)
  }

  /** Min-max scaling of `cols` to [0,1], appended as `<col>_mm`. */
  def minMax(df: DataFrame, cols: Seq[String]): DataFrame = {
    val stats = df.agg(
      cols.flatMap(c => Seq(
        min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c"))).head,
      cols.flatMap(c => Seq(
        min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c"))).tail: _*)
    val scaled = df.crossJoin(broadcast(stats))
    val out = cols.foldLeft(scaled) { (d, c) =>
      d.withColumn(s"${c}_mm",
        round((col(c) - col(s"__min_$c")) /
              (col(s"__max_$c") - col(s"__min_$c")), 4))
    }
    out.drop(cols.flatMap(c => Seq(s"__min_$c", s"__max_$c")): _*)
  }

  /** Values at the given 1-based global ranks of `valueCol`, as one row
    * with the map's names as columns. Uses [[Ranks.globalRowNumber]] —
    * range repartition + per-slice rank + bounded offset rollup — so the
    * exact order statistic never funnels data through one task. Rank ties
    * between equal values are arbitrary, but the VALUE at rank k is
    * well-defined regardless, so the result is deterministic. */
  def orderStatistics(df: DataFrame, valueCol: String,
                      ks: Seq[(String, Long)]): DataFrame = {
    val ranked = Ranks.globalRowNumber(
      df.select(col(valueCol)), Seq(col(valueCol)), "__grn")
      .filter(col("__grn").isin(ks.map(_._2): _*))
    val aggs = ks.map { case (name, k) =>
      max(when(col("__grn") === k, col(valueCol))).as(name)
    }
    ranked.agg(aggs.head, aggs.tail: _*)
  }

  /** 1-based rank of the q-quantile under the `floor(q*(n-1))+1` discrete
    * convention (no interpolation — the bound is an actual data value,
    * which is what makes the result exactly reproducible cross-engine). */
  private def qRank(q: Double, n: Long): Long =
    math.floor(q * (n - 1)).toLong + 1

  /** Winsorize `cols`: clamp each into its [pLo, pHi] discrete-quantile
    * bounds, appended as `<col>_w`. The tail-robust alternative to
    * dropping outlier rows before scaling/training. One count + one
    * order-statistic pass per column; the 1-row bounds frame is broadcast
    * and the clamp itself is a codegen'd projection. */
  def winsorize(df: DataFrame, cols: Seq[String],
                pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, "0 <= pLo < pHi <= 1")
    val n = df.count() // bounded driver action: one long
    val bounds = cols.map { c =>
      orderStatistics(df, c,
        Seq(s"__lo_$c" -> qRank(pLo, n), s"__hi_$c" -> qRank(pHi, n)))
    }.reduce(_.crossJoin(_))
    val clamped = df.crossJoin(broadcast(bounds))
    val out = cols.foldLeft(clamped) { (d, c) =>
      d.withColumn(s"${c}_w",
        least(greatest(col(c), col(s"__lo_$c")), col(s"__hi_$c")))
    }
    out.drop(cols.flatMap(c => Seq(s"__lo_$c", s"__hi_$c")): _*)
  }

  /** Robust scaling: (x − median) / IQR, appended as `<col>_r`. Center
    * and spread come from discrete order statistics (actual data values,
    * never interpolated), so unlike mean/stddev the fit ignores outliers
    * AND the gate is exact: (v−med)/(q3−q1) is one IEEE division of exact
    * inputs, identical in any engine; rounded to 6 decimals on both sides
    * for belt-and-braces. */
  def robustScale(df: DataFrame, cols: Seq[String]): DataFrame = {
    val n = df.count()
    val stats = cols.map { c =>
      orderStatistics(df, c, Seq(
        s"__q1_$c" -> qRank(0.25, n),
        s"__med_$c" -> qRank(0.5, n),
        s"__q3_$c" -> qRank(0.75, n)))
    }.reduce(_.crossJoin(_))
    val scaled = df.crossJoin(broadcast(stats))
    val out = cols.foldLeft(scaled) { (d, c) =>
      d.withColumn(s"${c}_r",
        round((col(c) - col(s"__med_$c")) /
              (col(s"__q3_$c") - col(s"__q1_$c")), 6))
    }
    out.drop(cols.flatMap(c => Seq(s"__q1_$c", s"__med_$c", s"__q3_$c")): _*)
  }

  // ---- query-map entries ----

  def standardCustomer(spark: SparkSession, dir: String): DataFrame =
    standard(Tables.customer(spark, dir).select("c_custkey", "c_acctbal"),
      Seq("c_acctbal"))

  def standardOracleSql: String =
    """SELECT c_custkey, c_acctbal,
      |  round((c_acctbal - (SELECT round(avg(c_acctbal), 6) FROM customer))
      |        / (SELECT round(stddev_samp(c_acctbal), 6) FROM customer), 4) AS c_acctbal_z
      |FROM customer""".stripMargin

  def minMaxCustomer(spark: SparkSession, dir: String): DataFrame =
    minMax(Tables.customer(spark, dir).select("c_custkey", "c_acctbal"),
      Seq("c_acctbal"))

  def minMaxOracleSql: String =
    """SELECT c_custkey, c_acctbal,
      |  round((c_acctbal - (SELECT min(c_acctbal) FROM customer))
      |        / ((SELECT max(c_acctbal) FROM customer)
      |           - (SELECT min(c_acctbal) FROM customer)), 4) AS c_acctbal_mm
      |FROM customer""".stripMargin

  def winsorizeCustomer(spark: SparkSession, dir: String): DataFrame =
    winsorize(Tables.customer(spark, dir).select("c_custkey", "c_acctbal"),
      Seq("c_acctbal"))

  def winsorizeOracleSql: String =
    """WITH o AS (SELECT c_acctbal v, row_number() OVER (ORDER BY c_acctbal) rn,
      |                  count(*) OVER () n
      |            FROM customer),
      |b AS (SELECT
      |  max(CASE WHEN rn = CAST(floor(0.05*(n-1)) AS BIGINT)+1 THEN v END) lo,
      |  max(CASE WHEN rn = CAST(floor(0.95*(n-1)) AS BIGINT)+1 THEN v END) hi
      |FROM o)
      |SELECT c_custkey, c_acctbal,
      |  least(greatest(c_acctbal, b.lo), b.hi) AS c_acctbal_w
      |FROM customer, b""".stripMargin

  def robustScaleCustomer(spark: SparkSession, dir: String): DataFrame =
    robustScale(Tables.customer(spark, dir).select("c_custkey", "c_acctbal"),
      Seq("c_acctbal"))

  def robustScaleOracleSql: String =
    """WITH o AS (SELECT c_acctbal v, row_number() OVER (ORDER BY c_acctbal) rn,
      |                  count(*) OVER () n
      |            FROM customer),
      |b AS (SELECT
      |  max(CASE WHEN rn = CAST(floor(0.25*(n-1)) AS BIGINT)+1 THEN v END) q1,
      |  max(CASE WHEN rn = CAST(floor(0.5*(n-1)) AS BIGINT)+1 THEN v END) med,
      |  max(CASE WHEN rn = CAST(floor(0.75*(n-1)) AS BIGINT)+1 THEN v END) q3
      |FROM o)
      |SELECT c_custkey, c_acctbal,
      |  round((c_acctbal - b.med) / (b.q3 - b.q1), 6) AS c_acctbal_r
      |FROM customer, b""".stripMargin
}
