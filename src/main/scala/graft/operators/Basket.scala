package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Market-basket co-occurrence mining: item pairs that appear together in
  * the same transaction at least `minSupport` times — the support-counting
  * core of frequent-itemset mining, over the same order/lineitem fact the
  * reference's star-schema ETL maintains
  * (/root/reference/DataEngineering/DataBricks/AIO_delta_table_generator.py).
  *
  * Shape: one shuffle groups items per transaction into a SORTED distinct
  * array, pairs are generated MAP-SIDE from each array (explode × filtered
  * explode — per-row work is O(basket²) on baskets that are bounded by
  * schema, ~7 lines per order here), and one aggregate on the (a, b) pair
  * key counts support. The naive alternative — self-joining the fact on
  * the transaction key — shuffles the fact TWICE and materializes every
  * candidate pair through a join; this shape shuffles it once and pairs
  * never cross the wire unaggregated except keyed for their final count.
  * Basket-size skew (one giant transaction) is the operator's real risk
  * at 100 TB: `maxBasket` caps the quadratic blowup explicitly rather
  * than letting one hot key stall a task.
  */
object Basket {

  /** (item_a, item_b, support) with item_a < item_b and support ≥
    * `minSupport`. Transactions larger than `maxBasket` distinct items
    * are dropped (documented cap — a 10k-item basket would emit 50M
    * pairs from one row). */
  def pairSupport(fact: DataFrame, txCol: String, itemCol: String,
                  minSupport: Long, maxBasket: Int = 1000): DataFrame = {
    val baskets = fact
      .groupBy(col(txCol))
      .agg(sort_array(collect_set(col(itemCol))).as("__items"))
      .filter(size(col("__items")).between(2, maxBasket))
    baskets
      .select(explode(col("__items")).as("item_a"), col("__items"))
      .select(col("item_a"),
        explode(expr("filter(__items, x -> x > item_a)")).as("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: parts co-ordered in the same order at least twice. */
  def basketPairsLineitem(spark: SparkSession, dir: String): DataFrame =
    pairSupport(Tables.lineitem(spark, dir), "l_orderkey", "l_partkey",
      minSupport = 2L)

  def oracleSql: String =
    """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |sized AS (
      |  SELECT l_orderkey FROM op GROUP BY l_orderkey
      |  HAVING count(*) BETWEEN 2 AND 1000
      |)
      |SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
      |  count(*) AS support
      |FROM op a
      |JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |JOIN sized s ON s.l_orderkey = a.l_orderkey
      |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin
}
