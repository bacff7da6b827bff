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

  /** Association rules from the pair supports: for each surviving pair,
    * BOTH directed rules A→B and B→A with exact confidence and lift in
    * integer permicro (truncating division — all terms non-negative, so
    * Spark `div` ≡ DuckDB `//`):
    *   confidence(A→B) = 10⁶·supp(AB) div supp(A)
    *   lift(A→B)       = 10⁶·N·supp(AB) div (supp(A)·supp(B))
    * Item supports and N count TRANSACTIONS inside the same sized-basket
    * universe the pairs came from, so the probabilities compose. Products
    * run in DECIMAL(38,0): N·supp(AB) and supp(A)·supp(B) stay exact past
    * BIGINT at fact scale (10⁹ transactions × 10⁶ supports ≈ 10²¹).
    *
    * Scale shape: pair counting is [[pairSupport]]'s map-side explode;
    * item supports are one aggregate over the exploded baskets; the rule
    * join keys on single items — both sides dimension-sized after
    * support pruning. N is a broadcast scalar (cross join of one row).
    */
  def rules(fact: DataFrame, txCol: String, itemCol: String,
            minSupport: Long, maxBasket: Int = 1000): DataFrame = {
    val baskets = fact
      .groupBy(col(txCol))
      .agg(sort_array(collect_set(col(itemCol))).as("__items"))
      .filter(size(col("__items")).between(2, maxBasket))
      .localCheckpoint() // three consumers: N, item supports, pairs
    val nTx = baskets.agg(count(lit(1)).cast("decimal(38,0)").as("__n"))
    val itemSupp = baskets
      .select(explode(col("__items")).as("item"))
      .groupBy("item").agg(count(lit(1)).as("item_supp"))
    val pairs = baskets
      .select(explode(col("__items")).as("item_a"), col("__items"))
      .select(col("item_a"),
        explode(expr("filter(__items, x -> x > item_a)")).as("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    val directed = pairs
      .select(col("item_a").as("antecedent"), col("item_b").as("consequent"),
        col("support"))
      .unionByName(pairs.select(col("item_b").as("antecedent"),
        col("item_a").as("consequent"), col("support")))
    directed
      .join(itemSupp.withColumnRenamed("item", "antecedent")
        .withColumnRenamed("item_supp", "supp_a"), "antecedent")
      .join(itemSupp.withColumnRenamed("item", "consequent")
        .withColumnRenamed("item_supp", "supp_c"), "consequent")
      .crossJoin(broadcast(nTx))
      .select(col("antecedent"), col("consequent"), col("support"),
        col("supp_a"), col("supp_c"),
        expr("(1000000 * support) div supp_a").as("confidence_permicro"),
        expr("""CAST((1000000 * __n * CAST(support AS DECIMAL(38,0)))
                 div (CAST(supp_a AS DECIMAL(38,0)) * supp_c) AS BIGINT)""")
          .as("lift_permicro"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: directed part-association rules at support ≥ 2. */
  def assocRulesLineitem(spark: SparkSession, dir: String): DataFrame =
    rules(Tables.lineitem(spark, dir), "l_orderkey", "l_partkey",
      minSupport = 2L)

  def rulesOracleSql: String =
    """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |sized AS (
      |  SELECT l_orderkey FROM op GROUP BY l_orderkey
      |  HAVING count(*) BETWEEN 2 AND 1000
      |), universe AS (
      |  SELECT op.* FROM op JOIN sized USING (l_orderkey)
      |), n AS (
      |  SELECT CAST(count(DISTINCT l_orderkey) AS HUGEINT) AS n_tx
      |  FROM universe
      |), isupp AS (
      |  SELECT l_partkey AS item, count(*) AS item_supp
      |  FROM universe GROUP BY 1
      |), pairs AS (
      |  SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
      |    count(*) AS support
      |  FROM universe a
      |  JOIN universe b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING count(*) >= 2
      |), directed AS (
      |  SELECT item_a AS antecedent, item_b AS consequent, support FROM pairs
      |  UNION ALL
      |  SELECT item_b, item_a, support FROM pairs
      |)
      |SELECT d.antecedent, d.consequent, d.support,
      |  sa.item_supp AS supp_a, sc.item_supp AS supp_c,
      |  (1000000 * d.support) // sa.item_supp AS confidence_permicro,
      |  CAST((1000000 * n.n_tx * d.support)
      |    // (CAST(sa.item_supp AS HUGEINT) * sc.item_supp) AS BIGINT)
      |    AS lift_permicro
      |FROM directed d
      |JOIN isupp sa ON sa.item = d.antecedent
      |JOIN isupp sc ON sc.item = d.consequent
      |CROSS JOIN n""".stripMargin
}
