package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Rule-based data-quality expectations: evaluate named checks against a
  * table and emit a tall (check, metric, pass) report — the
  * "expectations" pattern (assert row counts, null fractions, key
  * uniqueness, value ranges, referential integrity) that gates every
  * serious lake pipeline before publishing a tier, applied to the
  * reference's merge/medallion flow (merge_generator.py trusts its
  * changeset keys; this is the operator that would verify that trust).
  *
  * Scale shape: all single-table rules for one report collapse into ONE
  * aggregation pass over the table (each rule is a pair of aggregate
  * expressions), so a 20-rule report costs one scan. Referential checks
  * are per-pair LEFT ANTI join counts — key-only projections, so the
  * shuffle payload is the key column, and broadcastable when the parent
  * is a dim. */
object DataQuality {

  /** One single-pass rule: `metric` and `pass` must be aggregate
    * expressions over the checked frame. */
  final case class Rule(name: String, metric: Column, pass: Column)

  /** Common rule builders. Metrics are rounded to 6dp so report values
    * are stable under partial-agg reordering. */
  def rowCountAtLeast(n: Long): Rule =
    Rule("row_count", count(lit(1)).cast("double"), count(lit(1)) >= n)
  def unique(c: String): Rule =
    Rule(s"unique_$c",
      round(count_distinct(col(c)).cast("double") / count(col(c)), 6),
      count_distinct(col(c)) === count(col(c)))
  def nullFractionAtMost(c: String, f: Double): Rule =
    Rule(s"null_fraction_$c",
      round(sum(when(col(c).isNull, 1L).otherwise(0L)).cast("double")
        / count(lit(1)), 6),
      sum(when(col(c).isNull, 1L).otherwise(0L)).cast("double")
        / count(lit(1)) <= f)
  def minAtLeast(c: String, lo: Double): Rule =
    Rule(s"min_$c", round(min(col(c)).cast("double"), 6), min(col(c)) >= lo)
  def maxAtMost(c: String, hi: Double): Rule =
    Rule(s"max_$c", round(max(col(c)).cast("double"), 6), max(col(c)) <= hi)
  def valuesIn(c: String, allowed: Seq[String]): Rule =
    Rule(s"values_in_$c",
      sum(when(col(c).isin(allowed.map(lit): _*) || col(c).isNull, 0L)
        .otherwise(1L)).cast("double"),
      sum(when(col(c).isin(allowed.map(lit): _*) || col(c).isNull, 0L)
        .otherwise(1L)) === 0L)

  /** Evaluate all `rules` in one aggregation pass → (check, metric, pass). */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val aggs = rules.flatMap(r =>
      Seq(r.metric.as(s"__m_${r.name}"), r.pass.as(s"__p_${r.name}")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val pairs = rules.map(r => struct(
      lit(r.name).as("check"),
      col(s"__m_${r.name}").cast("double").as("metric"),
      col(s"__p_${r.name}").as("pass")))
    one.select(explode(array(pairs: _*)).as("__r")).select("__r.*")
  }

  /** Referential-integrity check as a report row: #child keys with no
    * parent (left anti on key-only projections). */
  def fkOrphans(name: String, child: DataFrame, childKey: String,
                parent: DataFrame, parentKey: String): DataFrame = {
    val orphans = child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
    orphans.agg(count(lit(1)).as("__n"))
      .select(lit(name).as("check"), col("__n").cast("double").as("metric"),
        (col("__n") === 0L).as("pass"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: expectations over the star schema — orders rules in
    * one pass, plus two FK checks and one deliberately failing rule
    * (orders whose price ceiling is breached) so the report's fail path
    * is exercised, not just asserted. */
  def dqReport(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val c = Tables.customer(spark, dir)
    val orderRules = report(o, Seq(
      rowCountAtLeast(1),
      unique("o_orderkey"),
      nullFractionAtMost("o_orderpriority", 1.0),
      minAtLeast("o_totalprice", 0.0),
      maxAtMost("o_totalprice", 1000.0), // deliberately tight: FAILS
      valuesIn("o_orderstatus", Seq("O", "F", "P"))))
    orderRules
      .unionByName(fkOrphans("fk_lineitem_orders", li, "l_orderkey", o, "o_orderkey"))
      .unionByName(fkOrphans("fk_orders_customer", o, "o_custkey", c, "c_custkey"))
  }

  def oracleSql: String =
    """SELECT 'row_count' AS check, CAST(count(*) AS DOUBLE) AS metric,
      |       count(*) >= 1 AS pass FROM orders
      |UNION ALL
      |SELECT 'unique_o_orderkey',
      |       round(CAST(count(DISTINCT o_orderkey) AS DOUBLE) / count(o_orderkey), 6),
      |       count(DISTINCT o_orderkey) = count(o_orderkey) FROM orders
      |UNION ALL
      |SELECT 'null_fraction_o_orderpriority',
      |       round(CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |             / count(*), 6),
      |       CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |             / count(*) <= 1.0 FROM orders
      |UNION ALL
      |SELECT 'min_o_totalprice', round(CAST(min(o_totalprice) AS DOUBLE), 6),
      |       min(o_totalprice) >= 0.0 FROM orders
      |UNION ALL
      |SELECT 'max_o_totalprice', round(CAST(max(o_totalprice) AS DOUBLE), 6),
      |       max(o_totalprice) <= 1000.0 FROM orders
      |UNION ALL
      |SELECT 'values_in_o_orderstatus',
      |       CAST(sum(CASE WHEN o_orderstatus IN ('O','F','P')
      |                      OR o_orderstatus IS NULL THEN 0 ELSE 1 END) AS DOUBLE),
      |       sum(CASE WHEN o_orderstatus IN ('O','F','P')
      |                 OR o_orderstatus IS NULL THEN 0 ELSE 1 END) = 0 FROM orders
      |UNION ALL
      |SELECT 'fk_lineitem_orders', CAST(count(*) AS DOUBLE), count(*) = 0
      |FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
      |UNION ALL
      |SELECT 'fk_orders_customer', CAST(count(*) AS DOUBLE), count(*) = 0
      |FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)""".stripMargin
}
