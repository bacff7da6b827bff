package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Completing the TPC-H sweep: the six remaining classic shapes, adapted
  * where the test schema lacks a column (no l_shipmode / l_commitdate /
  * partsupp — substitutes noted per query). With these, every TPC-H
  * query form is exercised: q6 pure scan-agg, q8 conditional market
  * share, q10 deterministic top-n join agg, q12 two-way conditional
  * counts, q16 anti-join + count-distinct, q20 nested semi-join with a
  * per-group threshold.
  *
  * Scale stance unchanged: filters land on scans, doubles that feed a
  * hash gate aggregate as exact integer cents, top-n is window-ranked
  * with a full deterministic tie-break (never a bare limit), true dims
  * broadcast.
  */
object TpchRest {

  /** Q6 shape — the pure scan-side aggregate: one fact scan, every
    * predicate pushed (date range, discount band, quantity cap), no
    * join, no groupBy — the query whose entire cost IS the scan, and the
    * canonical pushdown check. */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01") &&
        col("l_shipdate") < lit("1996-01-01") &&
        col("l_discount").between(0.03, 0.07) &&
        col("l_quantity") < 24)
      .agg((sum(round(col("l_extendedprice") * col("l_discount") * 100.0)
        .cast("long")) / 100.0).as("revenue"))

  def q6OracleSql: String =
    """SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100.0) AS BIGINT))
      |       AS BIGINT) / 100.0 AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.03 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** Q8 shape — market share: one nation's fraction of total volume per
    * year, the conditional-numerator-over-total aggregate computed in a
    * single pass (sum(CASE)/sum, never two scans). Exact cents on both
    * numerator and denominator keep the ratio deterministic. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val nat = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val vol = round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      * 100.0).cast("long")
    Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_shipdate"), vol.as("__vol"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("l_shipdate")).as("l_year"))
      .agg((sum(when(col("supp_nation") === "NATION_1", col("__vol"))
        .otherwise(lit(0L))).cast("double")
        / sum(col("__vol"))).as("mkt_share"))
  }

  def q8OracleSql: String =
    """SELECT CAST(year(l_shipdate) AS INT) AS l_year,
      |  CAST(sum(CASE WHEN n_name = 'NATION_1'
      |      THEN CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)
      |      ELSE 0 END) AS DOUBLE)
      |    / CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0)
      |        AS BIGINT)) AS DOUBLE) AS mkt_share
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY 1""".stripMargin

  /** Q10 shape — top-n by aggregated measure with a DETERMINISTIC cutoff:
    * revenue lost to returned lines per customer, top 20 by (revenue
    * desc, custkey). A bare `.limit(20)` after an orderBy ties
    * non-deterministically on equal revenues; the window rank with the
    * key in the ordering is the reproducible form. The global rank is
    * two-phase (partial top-20 per shuffle partition first — Spark emits
    * no WindowGroupLimit for an UNPARTITIONED window, so without the
    * partial phase every customer aggregate would funnel into one
    * partition before ranking): the final window sees ≤ 20·parts rows. */
  def q10ReturnedCustomers(spark: SparkSession, dir: String): DataFrame = {
    val revenue = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * 100.0).cast("long")).as("__cents"))
    val order = Seq(col("__cents").desc, col("o_custkey"))
    val partial = Window.partitionBy(spark_partition_id()).orderBy(order: _*)
    val w = Window.orderBy(order: _*)
    revenue
      .withColumn("__pr", row_number().over(partial)).filter(col("__pr") <= 20)
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") <= 20)
      .join(Tables.customer(spark, dir)
        .select("c_custkey", "c_name", "c_acctbal"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"),
        round(col("c_acctbal"), 2).as("c_acctbal"),
        (col("__cents") / 100.0).as("lost_revenue"))
  }

  def q10OracleSql: String =
    """WITH revenue AS (
      |  SELECT o_custkey,
      |    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0)
      |             AS BIGINT)) AS BIGINT) AS cents
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_returnflag = 'R'
      |  GROUP BY o_custkey),
      |top AS (
      |  SELECT o_custkey, cents,
      |    row_number() OVER (ORDER BY cents DESC, o_custkey) AS rn
      |  FROM revenue)
      |SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal,
      |  cents / 100.0 AS lost_revenue
      |FROM top JOIN customer ON o_custkey = c_custkey
      |WHERE rn <= 20""".stripMargin

  /** Q12 shape — two-way conditional counts per group (high- vs
    * low-priority order counts), l_returnflag standing in for the
    * missing l_shipmode. One pass, both counts from sum(CASE) — the
    * shape that becomes two scans the moment someone writes it as two
    * filtered joins. */
  def q12PriorityCounts(spark: SparkSession, dir: String): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01") &&
        col("l_shipdate") < lit("1996-01-01"))
      .select("l_orderkey", "l_returnflag")
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
  }

  def q12OracleSql: String =
    """SELECT l_returnflag,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |      THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      |GROUP BY l_returnflag""".stripMargin

  /** Q16 shape — attribute-sliced distinct-supplier counts EXCLUDING a
    * computed bad-supplier list (negative balance standing in for the
    * complaints LIKE): the NOT IN subquery is a LEFT ANTI join running
    * BEFORE the distinct count, so excluded suppliers never inflate the
    * distinct state. */
  def q16SupplierCounts(spark: SparkSession, dir: String): DataFrame = {
    val bad = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey").as("__bad_sk"))
    val pt = Tables.part(spark, dir)
      .filter(col("p_type") =!= "PROMO")
      .select("p_partkey", "p_brand", "p_type", "p_size")
    Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey").distinct()
      .join(bad, col("l_suppkey") === col("__bad_sk"), "left_anti")
      .join(pt, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  def q16OracleSql: String =
    """SELECT p_brand, p_type, p_size,
      |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_type <> 'PROMO'
      |  AND l_suppkey NOT IN (
      |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size""".stripMargin

  /** Q20 shape — nested semi-joins with a per-group threshold: suppliers
    * who shipped MORE THAN HALF of some part's 1995 volume (the availqty
    * comparison adapted to shipped-share). Inner: per-(part, supplier)
    * quantity vs a broadcast per-part total — the q17-style pre-agg
    * join-back; outer: supplier names via LEFT SEMI, so the supplier
    * table is filtered by existence, never multiplied. */
  def q20DominantSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val li95 = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01") &&
        col("l_shipdate") < lit("1996-01-01"))
      .select("l_partkey", "l_suppkey", "l_quantity")
    val perPartSupp = li95.groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity")).as("__ps_qty"))
    val perPart = perPartSupp.groupBy("l_partkey")
      .agg(sum(col("__ps_qty")).as("__p_qty"))
    val dominant = perPartSupp
      .join(perPart, Seq("l_partkey"))
      .filter(col("__ps_qty") > col("__p_qty") * 0.5)
      .select(col("l_suppkey").as("__dom_sk"))
    Tables.supplier(spark, dir).select("s_suppkey", "s_name")
      .join(dominant, col("s_suppkey") === col("__dom_sk"), "left_semi")
  }

  def q20OracleSql: String =
    """SELECT s_suppkey, s_name FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM (
      |    SELECT l_partkey, l_suppkey, sum(l_quantity) AS ps_qty
      |    FROM lineitem
      |    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      |      AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      |    GROUP BY l_partkey, l_suppkey) ps
      |  WHERE ps_qty > (
      |    SELECT sum(l_quantity) * 0.5 FROM lineitem l2
      |    WHERE l2.l_partkey = ps.l_partkey
      |      AND l2.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      |      AND l2.l_shipdate < TIMESTAMP '1996-01-01 00:00:00'))""".stripMargin
}
