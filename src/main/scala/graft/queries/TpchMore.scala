package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Second wave of relational/analytic queries: the join shapes [[TpchLike]]
  * doesn't cover — existence semi-joins, anti-joins, two-sided dimension
  * role-playing, scalar-subquery thresholds, having-filtered aggregates,
  * and ratio aggregation. These are the shapes the reference's ETL hits
  * as soon as a merge needs "keys with no match" (merge_generator.py's
  * insert-detect is an anti-join) or a quality gate needs "orders with at
  * least one late line" (an existence semi-join).
  *
  * The test schema has no partsupp table, so the classic q2/q9/q16/q20
  * forms are adapted: q9's unit cost is synthesized from p_retailprice.
  *
  * Scale stance mirrors TpchLike: true dims (nation, filtered supplier
  * slices) broadcast explicitly; part and customer scale with the data so
  * they get no hint — AQE broadcasts them while they fit; fact-fact joins
  * shuffle on their keys; aggregates are declarative so map-side partials
  * come free; double aggregates are rounded for hash stability.
  */
object TpchMore {

  /** Q4 shape — order-priority count of orders with ≥1 late-shipped line
    * (shipped >60 days after order date). The existence test is a LEFT
    * SEMI join on the order key: no dedup pass, no row explosion, and the
    * probe side streams — the shape a 100 TB "any bad row per key?" gate
    * must take. */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_shipdate")
    ord.join(li,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }

  def q4OracleSql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey
      |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority""".stripMargin

  /** Q7 shape — bilateral shipping volume between two nations by year.
    * nation role-plays twice (supplier side / customer side); both slices
    * broadcast, and the nation filter lands BEFORE the fact joins so
    * supplier and customer shrink to 2/25 of their size on the way in. */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    // four nations, not the classic two: the sf0.001 smoke data holds only
    // ten suppliers, so a two-nation pair can have zero supplier coverage
    val pair = Seq("NATION_1", "NATION_2", "NATION_3", "NATION_4")
    val n1 = Tables.nation(spark, dir).filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, dir).filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .select("s_suppkey", "supp_nation")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .select("c_custkey", "cust_nation")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01") &&
        col("l_shipdate") < lit("1997-01-01"))
      .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      // exact integer-cent sum: rounding the double sum flapped on a .005
      // boundary between partial-agg orderings; per-row cents are exact
      // longs, so the aggregate is associative and order-independent
      .agg((sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * 100.0).cast("long")) / 100.0).as("revenue"))
  }

  def q7OracleSql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS INT) AS l_year,
      |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0)
      |           AS BIGINT)) AS BIGINT) / 100.0 AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE n1.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
      |  AND n2.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
      |  AND n1.n_name <> n2.n_name
      |  AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY 1, 2, 3""".stripMargin

  /** Q9 shape — profit by supplier nation and order year, unit cost
    * synthesized as 0.6·p_retailprice (no partsupp table). part scales
    * with the data so it joins unhinted (AQE's call); supplier/nation
    * broadcast. */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val pt = Tables.part(spark, dir).filter(col("p_type") === "ECONOMY")
      .select("p_partkey", "p_retailprice")
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val nat = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_orderdate")
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
      .join(pt, col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      // integer-cent sum (see q7): the subtraction makes this the most
      // cancellation-prone aggregate here, so exactness matters most
      .agg((sum(round((
        col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
          lit(0.6) * col("p_retailprice") * col("l_quantity")) * 100.0)
        .cast("long")) / 100.0).as("profit"))
  }

  def q9OracleSql: String =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
      |  CAST(sum(CAST(round((l_extendedprice * (1.0 - l_discount)
      |           - 0.6 * p_retailprice * l_quantity) * 100.0)
      |           AS BIGINT)) AS BIGINT) / 100.0 AS profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_type = 'ECONOMY'
      |GROUP BY 1, 2""".stripMargin

  /** Q14 shape — promo revenue share over one month: a conditional-ratio
    * aggregate in a single fact pass. The month filter reaches the
    * lineitem scan; part joins unhinted. */
  def q14PromoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-09-01") &&
        col("l_shipdate") < lit("1996-10-01"))
      .select("l_partkey", "l_extendedprice", "l_discount")
      .join(Tables.part(spark, dir).select("p_partkey", "p_type"),
        col("l_partkey") === col("p_partkey"))
      .agg(round(lit(100.0) *
        sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))) / sum(rev), 2)
        .as("promo_revenue"))
  }

  def q14OracleSql: String =
    """SELECT round(100.0 *
      |  sum(CASE WHEN p_type = 'PROMO'
      |           THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END)
      |  / sum(l_extendedprice * (1.0 - l_discount)), 2) AS promo_revenue
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin

  /** Q17 shape — revenue from small-quantity lines of one brand, the
    * per-key correlated threshold (`l_quantity < 0.2·avg per part`)
    * re-expressed as pre-aggregate + join-back: the per-part aggregate is
    * |parts-of-brand| rows, so AQE broadcasts it and the fact side is
    * touched exactly twice with no window sort. */
  def q17SmallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val pt = Tables.part(spark, dir).filter(col("p_brand") === "Brand#23")
      .select("p_partkey")
    val li = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .join(pt, col("l_partkey") === col("p_partkey"))
    val lim = li.groupBy(col("l_partkey").as("lim_pk"))
      .agg((lit(0.2) * avg("l_quantity")).as("qty_limit"))
    li.join(lim, col("l_partkey") === col("lim_pk"))
      .filter(col("l_quantity") < col("qty_limit"))
      .agg(round(sum("l_extendedprice") / 7.0, 2).as("avg_yearly"))
  }

  def q17OracleSql: String =
    """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
      |FROM lineitem l
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#23'
      |  AND l_quantity < (
      |    SELECT 0.2 * avg(l_quantity) FROM lineitem l2
      |    WHERE l2.l_partkey = l.l_partkey)""".stripMargin

  /** Q18 shape — customers behind large orders (order quantity sum above a
    * threshold). The HAVING prunes at the first (map-combined) aggregate,
    * so only qualifying order keys reach the joins. Integral-valued
    * doubles sum exactly — no rounding needed for hash stability. */
  def q18LargeOrders(spark: SparkSession, dir: String,
                     minQty: Double = 250.0): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").as("total_qty"))
      .filter(col("total_qty") > minQty)
    big.join(Tables.orders(spark, dir)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir).select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
        "o_totalprice", "total_qty")
  }

  def q18OracleSql: String =
    """SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
      |FROM (
      |  SELECT l_orderkey, sum(l_quantity) AS total_qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING sum(l_quantity) > 250.0) big
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey""".stripMargin

  /** Q22 shape — high-balance customers with no recent orders, by nation:
    * a scalar-subquery threshold (global positive-balance average, joined
    * in as a broadcast single row — never a driver collect) and a LEFT
    * ANTI join against the recent-order keys. The anti join is the
    * merge_generator "never matched" path as its own operator. */
  def q22DormantCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select("c_custkey", "c_nationkey", "c_acctbal")
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg(avg("c_acctbal").as("avg_bal"))
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2001-01-01"))
      .select("o_custkey")
    cust.join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_custs"),
        round(sum("c_acctbal"), 2).as("total_bal"))
  }

  def q22OracleSql: String =
    """SELECT c_nationkey, count(*) AS n_custs,
      |  round(sum(c_acctbal), 2) AS total_bal
      |FROM customer
      |WHERE c_acctbal > (
      |    SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey
      |      AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
      |GROUP BY c_nationkey""".stripMargin

  /** Q13 shape — orders-per-customer distribution INCLUDING zero-order
    * customers: the filter (priority, standing in for the classic
    * o_comment NOT LIKE) lives in the LEFT OUTER join's ON clause, so a
    * customer whose every order is filtered away still survives with
    * c_count = 0 — a WHERE would silently drop them, the classic outer-
    * join-distribution bug. count(o_orderkey) (not count(*)) counts only
    * matched rows. Scale: both aggs shuffle on uniform keys (c_custkey,
    * then the tiny c_count domain); the join itself is customer⋈orders on
    * custkey, AQE's call on side/strategy. */
  def q13OrderDistribution(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_orderkey", "o_custkey")
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  def q13OracleSql: String =
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      |FROM (
      |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey) c_orders
      |GROUP BY c_count""".stripMargin

  /** Q21 shape — EXISTS and NOT EXISTS against the same fact: suppliers
    * who were the SOLE returning supplier in a finished multi-supplier
    * order ("returned" = l_returnflag 'R', standing in for the classic
    * receipt-past-commit lateness the test schema lacks). The EXISTS
    * (another supplier shipped in the order) is a LEFT SEMI join, the
    * NOT EXISTS (another supplier also returned) a LEFT ANTI — both on
    * the order key with a supplier-inequality residual, exactly
    * merge_generator.py's matched / never-matched classification run
    * against one fact. Scale: three shuffles on l_orderkey (uniform);
    * supplier broadcast; no dedup or row explosion — semi/anti probes
    * stream. */
  def q21WaitingSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_returnflag")
    val returned = li.filter(col("l_returnflag") === "R")
    val finished = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F").select("o_orderkey")
    // l1: returned lines of finished orders (the candidate "waiters")
    val l1 = returned.join(finished,
      col("l_orderkey") === col("o_orderkey"), "left_semi")
    val l2 = li.select(col("l_orderkey").as("l2_ok"), col("l_suppkey").as("l2_sk"))
    val l3 = returned.select(col("l_orderkey").as("l3_ok"), col("l_suppkey").as("l3_sk"))
    val sole = l1
      .join(l2, col("l2_ok") === col("l_orderkey") &&
        col("l2_sk") =!= col("l_suppkey"), "left_semi")
      .join(l3, col("l3_ok") === col("l_orderkey") &&
        col("l3_sk") =!= col("l_suppkey"), "left_anti")
    sole.join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
  }

  def q21OracleSql: String =
    """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM lineitem l1
      |JOIN supplier ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
      |WHERE l1.l_returnflag = 'R'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_returnflag = 'R')
      |GROUP BY s_name""".stripMargin
}
