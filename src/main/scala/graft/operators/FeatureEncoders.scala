package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Categorical feature encoders.
  *
  * Re-expresses /root/reference/MachineLearning/Spark/
  * count_target_onehot_encoder_spark.py (CountEncoder / TargetEncoder,
  * themselves derived from Intel OAP's public recipes) without any MLlib
  * vector detour — plain aggregates that stay in WholeStageCodegen and
  * broadcast-join back onto the fact.
  *
  * Scale: encoder tables have categorical cardinality (≪ fact), so the
  * join-back is always a broadcast; the only shuffle is the groupBy on the
  * encoded key, which is the theoretical minimum.
  */
object FeatureEncoders {

  /** Count encoding: frequency of each key combination. */
  def countEncode(df: DataFrame, keys: Seq[String], outCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).cast("int").as(outCol))

  /** Smoothed target-mean encoding (the all-data branch of the reference's
    * TargetEncoder): (sum_y + mean_y·smooth)/(count_y + smooth).
    *
    * The global mean arrives via a broadcast 1-row aggregate, not a
    * `.collect()` — keeps the plan fully distributed and re-optimizable. */
  def targetEncode(df: DataFrame, keys: Seq[String], y: String,
                   outCol: String, smooth: Double): DataFrame = {
    val globalMean = df.agg(avg(col(y)).as("__y_mean"))
    df.groupBy(keys.map(col): _*)
      .agg(count(col(y)).as("__cnt"), sum(col(y)).as("__sum"))
      .crossJoin(broadcast(globalMean))
      .withColumn(outCol,
        round((col("__sum") + col("__y_mean") * lit(smooth)) /
              (col("__cnt") + lit(smooth)), 4))
      .drop("__cnt", "__sum", "__y_mean")
  }

  /** One-hot encoding via conditional projection — no pivot shuffle, no
    * StringIndexer fit: the category list is a tiny distinct() that is
    * collected once (dimension cardinality, not data size). */
  def oneHot(df: DataFrame, key: String, cat: String, prefix: String,
             maxCardinality: Int = 1000): DataFrame = {
    // +1 probe row so a high-cardinality key fails fast instead of
    // collecting an unbounded category list onto the driver
    val rows = df.select(cat).filter(col(cat).isNotNull)
      .distinct().limit(maxCardinality + 1).collect()
    require(rows.length <= maxCardinality,
      s"oneHot($cat): cardinality exceeds $maxCardinality — use count/target encoding instead")
    val cats = rows.map(_.getString(0)).sorted.toSeq
    val cols: Seq[Column] = cats.map(v =>
      when(col(cat) === lit(v), 1).otherwise(0).cast("int")
        .as(s"${prefix}_${v.toLowerCase.replaceAll("[^a-z0-9]+", "_")}"))
    df.select((col(key) +: cols): _*)
  }

  // ---- query-map entries ----

  def countEncodeOrders(spark: SparkSession, dir: String): DataFrame =
    countEncode(Tables.orders(spark, dir), Seq("o_orderpriority"), "o_orderpriority_ce")

  def countEncodeOracleSql: String =
    """SELECT o_orderpriority, CAST(count(*) AS INT) AS o_orderpriority_ce
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  def targetEncodeCustomer(spark: SparkSession, dir: String): DataFrame =
    targetEncode(Tables.customer(spark, dir), Seq("c_mktsegment"), "c_acctbal",
      "c_mktsegment_te", smooth = 20.0)

  def targetEncodeOracleSql: String =
    """SELECT c_mktsegment,
      |  round((sum(c_acctbal) + (SELECT avg(c_acctbal) FROM customer) * 20.0)
      |        / (count(c_acctbal) + 20.0), 4) AS c_mktsegment_te
      |FROM customer GROUP BY c_mktsegment""".stripMargin

  def oneHotCustomer(spark: SparkSession, dir: String): DataFrame =
    oneHot(Tables.customer(spark, dir), "c_custkey", "c_mktsegment", "seg")

  def oneHotOracleSql: String =
    """SELECT c_custkey,
      |  CAST(c_mktsegment = 'AUTOMOBILE' AS INT) AS seg_automobile,
      |  CAST(c_mktsegment = 'BUILDING'   AS INT) AS seg_building,
      |  CAST(c_mktsegment = 'FURNITURE'  AS INT) AS seg_furniture,
      |  CAST(c_mktsegment = 'HOUSEHOLD'  AS INT) AS seg_household,
      |  CAST(c_mktsegment = 'MACHINERY'  AS INT) AS seg_machinery
      |FROM customer""".stripMargin
}
