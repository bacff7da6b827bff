package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Cosine-normalized item-item similarity — the classic
  * "item2item collaborative filtering" matrix (Amazon-style): raw
  * co-visitation counts ([[Covisitation]]) over-recommend globally
  * popular items because c(i,j) grows with BOTH items' popularity;
  * dividing by √(c(i)·c(j)) turns the count into the cosine of the
  * two items' user-incidence vectors, which ranks niche-but-tight
  * associations above merely-popular ones. Same retrieval stage the
  * reference's pointwise rankers re-rank
  * (/root/reference/MachineLearning/Ray/recsys/ray_train_pointwise.py).
  *
  * Exactness: c(i,j) and the degrees c(i) are exact BIGINT counts
  * over the SAME basket-capped population ([[Covisitation
  * .boundedInteractions]]); cosine_permicro = (10⁶·c_ij) div
  * isqrt(c_i·c_j) is ONE exact integer square root
  * ([[Allocation.isqrtSql]], product ≤ 10²⁴ at 10¹²-user degrees —
  * inside DECIMAL38) and ONE truncating division, identical in both
  * engines. The per-item rank tiebreaks (cosine DESC, n_users DESC,
  * item_b ASC) — fully deterministic.
  *
  * Scale: the pair build is [[Covisitation.symmetricPairs]]' map-side
  * explode (no self-join shuffle, basket-capped); degrees are one
  * reaggregation of the bounded interactions, broadcast to the pair
  * table (item-domain-bounded — a catalog, not a fact). The rank cap
  * is a window partitioned by item_a. Nothing is all-pairs.
  */
object ItemSimilarity {

  /** Top-`m` cosine neighbors per item: (item_a, item_b, n_users,
    * deg_a, deg_b, cosine_permicro, rk). */
  def cosineTopM(interactions: DataFrame, userCol: String, itemCol: String,
                 m: Int, maxBasket: Int = 1000): DataFrame = {
    val pairs = Covisitation.symmetricPairs(
      interactions, userCol, itemCol, maxBasket)
    val degrees = Covisitation.boundedInteractions(
        interactions, userCol, itemCol, maxBasket)
      .groupBy(col("i")).agg(count(lit(1)).as("deg"))
    val isqrt = Allocation.isqrtSql(
      "(CAST(deg_a AS DECIMAL(38,0)) * CAST(deg_b AS DECIMAL(38,0)))")
    pairs
      .join(broadcast(degrees.select(col("i").as("item_a"),
        col("deg").as("deg_a"))), Seq("item_a"))
      .join(broadcast(degrees.select(col("i").as("item_b"),
        col("deg").as("deg_b"))), Seq("item_b"))
      .withColumn("cosine_permicro", expr(
        s"CAST((CAST(1000000 AS DECIMAL(38,0)) * n_users) div $isqrt AS BIGINT)"))
      .withColumn("rk", row_number().over(Window.partitionBy(col("item_a"))
        .orderBy(col("cosine_permicro").desc, col("n_users").desc,
          col("item_b").asc)))
      .filter(col("rk") <= m)
      .select(col("item_a"), col("item_b"), col("n_users"),
        col("deg_a"), col("deg_b"), col("cosine_permicro"),
        col("rk").cast("long").as("rk"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: top-10 cosine co-purchase neighbors per part
    * over pre-split customer baskets — the normalized twin of
    * `covisit_topk` (same interactions, same cap). */
  def itemCosineParts(spark: SparkSession, dir: String): DataFrame = {
    val purchases = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey")
      .join(broadcast(Tables.orders(spark, dir)
        .select("o_orderkey", "o_custkey", "o_orderdate")),
        col("o_orderkey") === col("l_orderkey"))
      .filter(col("o_orderdate") <
        lit(Covisitation.SplitDate).cast("date"))
      .select(col("o_custkey").as("cust"), col("l_partkey").as("item"))
    cosineTopM(purchases, "cust", "item", Covisitation.M)
  }

  def oracleSql: String = {
    val isqrt = Allocation.isqrtDuckSql(
      "(CAST(deg_a AS HUGEINT) * CAST(deg_b AS HUGEINT))")
    s"""WITH ui AS (
       |  SELECT DISTINCT o_custkey AS u, l_partkey AS i
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |  WHERE o_orderdate < DATE '${Covisitation.SplitDate}'
       |), bounded AS (
       |  SELECT u, i FROM (
       |    SELECT u, i, count(*) OVER (PARTITION BY u) AS n FROM ui)
       |  WHERE n <= 1000
       |), pairs AS (
       |  SELECT a.i AS item_a, b.i AS item_b,
       |    CAST(count(*) AS BIGINT) AS n_users
       |  FROM bounded a JOIN bounded b ON a.u = b.u AND a.i <> b.i
       |  GROUP BY 1, 2
       |), degrees AS (
       |  SELECT i, CAST(count(*) AS BIGINT) AS deg FROM bounded GROUP BY i
       |), scored AS (
       |  SELECT p.item_a, p.item_b, p.n_users,
       |    da.deg AS deg_a, db.deg AS deg_b,
       |    CAST((CAST(1000000 AS HUGEINT) * p.n_users) // $isqrt AS BIGINT)
       |      AS cosine_permicro
       |  FROM pairs p
       |  JOIN degrees da ON da.i = p.item_a
       |  JOIN degrees db ON db.i = p.item_b
       |), ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY item_a
       |    ORDER BY cosine_permicro DESC, n_users DESC, item_b ASC)
       |    AS BIGINT) AS rk
       |  FROM scored
       |)
       |SELECT item_a, item_b, n_users, deg_a, deg_b, cosine_permicro, rk
       |FROM ranked WHERE rk <= ${Covisitation.M}""".stripMargin
  }
}
