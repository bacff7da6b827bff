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
}
