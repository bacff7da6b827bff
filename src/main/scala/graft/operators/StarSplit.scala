package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Star-schema decomposition: split a denormalized frame into a
  * dimension table (distinct attribute combinations + deterministic
  * surrogate key) and a fact table (attributes replaced by the foreign
  * key) — the dim/fact half of the reference's star ETL
  * (/root/reference/DataEngineering/DataBricks/AIO_delta_table_generator.py:79-87
  * mints IDENTITY surrogate keys per tier table; merge_generator.py
  * maintains the dims the facts point at).
  *
  * The surrogate key is dense_rank over the attribute ordering — unlike
  * IDENTITY/monotonically_increasing_id it is DETERMINISTIC (same data ⇒
  * same keys, any partitioning, any engine), which makes dims rebuildable
  * and cross-system comparable. The unpartitioned rank window scans only
  * the DISTINCT attribute rows — bounded by dimension cardinality, never
  * by fact size (the [[FeatureAssembly]] stance); the fact side is one
  * broadcast join, map-only.
  */
object StarSplit {

  /** (dim, fact): dim = distinct `dimCols` + `keyCol`; fact = `df` with
    * `dimCols` replaced by `keyCol`. */
  def split(df: DataFrame, dimCols: Seq[String],
            keyCol: String): (DataFrame, DataFrame) = {
    // asc_nulls_last pins the surrogate ordering (Spark defaults NULLS
    // FIRST, most SQL engines NULLS LAST); <=> keeps rows whose dim
    // attribute is NULL — distinct() retains the null combo in dim, so a
    // null-unsafe join-back would silently drop those facts and the
    // split would no longer reconstruct the input.
    val w = Window.orderBy(dimCols.map(c => col(c).asc_nulls_last): _*)
    val dim = df.select(dimCols.map(col): _*).distinct()
      .withColumn(keyCol, dense_rank().over(w).cast("long"))
      .select((keyCol +: dimCols).map(col): _*)
    val factCols = df.columns.filterNot(dimCols.contains)
    // dim derives from df, so disambiguate the self-join with aliases
    val f = df.alias("__fact")
    val d = dim.alias("__dim")
    val joinCond = dimCols.map(c => col(s"__fact.$c") <=> col(s"__dim.$c")).reduce(_ && _)
    val fact = f.join(broadcast(d), joinCond)
      .select(factCols.map(c => col(s"__fact.$c")) :+ col(s"__dim.$keyCol"): _*)
    (dim, fact)
  }

  /** Multi-dimension decomposition: peel several dims off one
    * denormalized frame — each gets its own surrogate-keyed table, the
    * fact ends with one FK per dim (the full star of
    * AIO_delta_table_generator.py, which maintains several dims per
    * fact). Dims are peeled left to right; each peel is a bounded rank
    * window + broadcast join, so the fact makes `dims.size` map-side
    * passes and never shuffles. */
  def splitAll(df: DataFrame, dims: Seq[(Seq[String], String)])
      : (Seq[DataFrame], DataFrame) =
    dims.foldLeft((Vector.empty[DataFrame], df)) {
      case ((acc, fact), (cols, key)) =>
        val (d, f) = split(fact, cols, key)
        (acc :+ d, f)
    }

  // ---- query-map entries (hash-gated) ----

  private def ordersSplit(spark: SparkSession, dir: String) =
    split(Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice",
        "o_orderstatus", "o_orderpriority"),
      Seq("o_orderstatus", "o_orderpriority"), "order_profile_sk")

  def starSplitDim(spark: SparkSession, dir: String): DataFrame =
    ordersSplit(spark, dir)._1

  def starSplitFact(spark: SparkSession, dir: String): DataFrame = {
    val (_, fact) = ordersSplit(spark, dir)
    fact.select(col("o_orderkey"), col("o_custkey"),
      round(col("o_totalprice"), 2).as("o_totalprice"), col("order_profile_sk"))
  }

  // multi-dim entries: profile dim + order-month dim peeled off orders

  private def ordersMulti(spark: SparkSession, dir: String)
      : (Seq[DataFrame], DataFrame) =
    splitAll(
      Tables.orders(spark, dir).select(
        col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"),
        col("o_orderstatus"), col("o_orderpriority"),
        date_format(col("o_orderdate"), "yyyy-MM").as("o_month")),
      Seq(Seq("o_orderstatus", "o_orderpriority") -> "order_profile_sk",
        Seq("o_month") -> "order_month_sk"))

  def starMultiDimProfile(spark: SparkSession, dir: String): DataFrame =
    ordersMulti(spark, dir)._1.head

  def starMultiDimMonth(spark: SparkSession, dir: String): DataFrame =
    ordersMulti(spark, dir)._1(1)

  def starMultiFact(spark: SparkSession, dir: String): DataFrame =
    ordersMulti(spark, dir)._2
      .select("o_orderkey", "o_custkey", "o_totalprice",
        "order_profile_sk", "order_month_sk")

  private val multiDimsSql =
    """dimp AS (
      |  SELECT CAST(dense_rank() OVER (ORDER BY o_orderstatus NULLS LAST,
      |                                 o_orderpriority NULLS LAST)
      |         AS BIGINT) AS order_profile_sk,
      |    o_orderstatus, o_orderpriority
      |  FROM (SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders) d),
      |m AS (SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS o_month FROM orders),
      |dimm AS (
      |  SELECT CAST(dense_rank() OVER (ORDER BY o_month NULLS LAST)
      |         AS BIGINT) AS order_month_sk, o_month
      |  FROM m)""".stripMargin

  def multiDimProfileOracleSql: String =
    "WITH " + multiDimsSql +
      "\nSELECT order_profile_sk, o_orderstatus, o_orderpriority FROM dimp"

  def multiDimMonthOracleSql: String =
    "WITH " + multiDimsSql + "\nSELECT order_month_sk, o_month FROM dimm"

  def multiFactOracleSql: String =
    "WITH " + multiDimsSql + "\n" +
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
        |  order_profile_sk, order_month_sk
        |FROM orders
        |JOIN dimp USING (o_orderstatus, o_orderpriority)
        |JOIN dimm ON strftime(o_orderdate, '%Y-%m') = dimm.o_month""".stripMargin

  def dimOracleSql: String =
    """SELECT CAST(dense_rank() OVER (ORDER BY o_orderstatus NULLS LAST,
      |                               o_orderpriority NULLS LAST)
      |       AS BIGINT) AS order_profile_sk,
      |  o_orderstatus, o_orderpriority
      |FROM (SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders) d""".stripMargin

  def factOracleSql: String =
    """WITH dim AS (
      |  SELECT CAST(dense_rank() OVER (ORDER BY o_orderstatus NULLS LAST,
      |                                 o_orderpriority NULLS LAST)
      |         AS BIGINT) AS order_profile_sk,
      |    o_orderstatus, o_orderpriority
      |  FROM (SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders) d)
      |SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
      |  order_profile_sk
      |FROM orders JOIN dim USING (o_orderstatus, o_orderpriority)""".stripMargin
}
