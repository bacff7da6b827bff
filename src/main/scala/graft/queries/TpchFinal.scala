package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Third wave of relational shapes — the classic forms still unexercised
  * after [[TpchLike]]/[[TpchMore]]: per-group argmin with deterministic
  * ties (q2), group-share-of-global HAVING (q11), max-over-aggregated-
  * view with tie inclusion (q15), and disjunction-of-conjunctions
  * predicate pushdown (q19). The test schema has no partsupp, so q2/q11
  * run on supplier balances / lineitem revenue instead of supply cost.
  *
  * Scale stance, as the earlier waves: global scalars ride as broadcast
  * single-row frames (never a driver collect), doubles that feed a hash
  * gate aggregate as exact integer cents, windows partition on
  * fine-grained keys only.
  */
object TpchFinal {

  /** Q2 shape — per-group argmin with a deterministic tie-break: each
    * nation's lowest-balance supplier (ties to the lower suppkey), dim
    * attributes joined back. row_number over (acctbal, suppkey) inside
    * the nation partition — fine-grained key, so the window never sees a
    * single giant partition; nation broadcast. */
  def q2MinBalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("s_nationkey")
      .orderBy(col("s_acctbal"), col("s_suppkey"))
    Tables.supplier(spark, dir)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .join(broadcast(Tables.nation(spark, dir).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("s_suppkey"), col("s_name"),
        round(col("s_acctbal"), 2).as("min_bal"))
  }

  def q2OracleSql: String =
    """SELECT n_name, s_suppkey, s_name, round(s_acctbal, 2) AS min_bal
      |FROM (
      |  SELECT s_suppkey, s_name, s_nationkey, s_acctbal,
      |    row_number() OVER (PARTITION BY s_nationkey
      |      ORDER BY s_acctbal, s_suppkey) AS rn
      |  FROM supplier) s
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE rn = 1""".stripMargin

  /** Q11 shape — groups whose share exceeds a GLOBAL-aggregate
    * threshold: per-part revenue HAVING sum > 1.5 · mean part revenue
    * (mean, not a fixed global fraction, so the selectivity survives any
    * scale factor — 0.001·Σ empties out once parts number in the
    * thousands). The global aggregate is the same per-part frame reused
    * as a broadcast single-row frame — one fact scan feeds both sides,
    * no driver collect, no second scan. Exact integer-cent sums keep the
    * hash stable. */
  def q11ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    val cents = sum(round(col("l_extendedprice") * 100.0).cast("long"))
    val perPart = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_extendedprice")
      .groupBy("l_partkey").agg(cents.as("__cents"))
    val threshold = perPart.agg(avg("__cents").as("__avg"))
    perPart.join(broadcast(threshold))
      .filter(col("__cents") > col("__avg") * 1.5)
      .select(col("l_partkey"), (col("__cents") / 100.0).as("part_value"))
  }

  def q11OracleSql: String =
    """WITH per_part AS (
      |  SELECT l_partkey,
      |    CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS cents
      |  FROM lineitem GROUP BY l_partkey)
      |SELECT l_partkey, cents / 100.0 AS part_value
      |FROM per_part
      |WHERE cents > (SELECT avg(cents) FROM per_part) * 1.5""".stripMargin

  /** Q15 shape — rows achieving the max of an aggregated view, ties
    * INCLUDED (the classic q15 requirement that rank/limit would get
    * wrong): quarterly revenue per supplier, keep every supplier whose
    * revenue equals the max. The view is computed once; the max rides
    * back as a broadcast single row. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val revenue = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * 100.0).cast("long")).as("__cents"))
    val top = revenue.agg(max("__cents").as("__max"))
    revenue.join(broadcast(top))
      .filter(col("__cents") === col("__max"))
      .join(Tables.supplier(spark, dir).select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("__cents") / 100.0).as("total_revenue"))
  }

  def q15OracleSql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey,
      |    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0)
      |             AS BIGINT)) AS BIGINT) AS cents
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, cents / 100.0 AS total_revenue
      |FROM revenue JOIN supplier ON l_suppkey = s_suppkey
      |WHERE cents = (SELECT max(cents) FROM revenue)""".stripMargin

  /** Q19 shape — disjunction of conjunctions across the join: revenue
    * over three (brand, quantity-band) OR-groups. The partkey equi-join
    * extracts, so only the residual OR evaluates post-join, and the
    * common `l_quantity <= 30` / brand-set bounds push to the scans —
    * the pushdown shape OR-heavy predicates must compile to. */
  def q19DisjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val pt = Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size")
    val disjunct =
      (col("p_brand") === "Brand#1" &&
        col("l_quantity").between(1, 10) && col("p_size").between(1, 15)) ||
      (col("p_brand") === "Brand#7" &&
        col("l_quantity").between(5, 20) && col("p_size").between(1, 25)) ||
      (col("p_brand") === "Brand#13" &&
        col("l_quantity").between(10, 30) && col("p_size").between(1, 50))
    li.join(pt, col("l_partkey") === col("p_partkey"))
      .filter(disjunct)
      .agg((sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * 100.0).cast("long")) / 100.0).as("revenue"))
  }

  def q19OracleSql: String =
    """SELECT CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0)
      |         AS BIGINT)) AS BIGINT) / 100.0 AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 10
      |       AND p_size BETWEEN 1 AND 15)
      |   OR (p_brand = 'Brand#7' AND l_quantity BETWEEN 5 AND 20
      |       AND p_size BETWEEN 1 AND 25)
      |   OR (p_brand = 'Brand#13' AND l_quantity BETWEEN 10 AND 30
      |       AND p_size BETWEEN 1 AND 50)""".stripMargin
}
