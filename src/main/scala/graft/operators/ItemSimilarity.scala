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
  * over the SAME basket-capped population
  * ([[Covisitation.cappedBaskets]]); cosine_permicro =
  * floor(10⁶·c_ij / √(c_i·c_j)) EXACTLY via the identity
  * floor(n/√p) = isqrt(⌊n²/p⌋): one DECIMAL(38,0) division
  * ((10⁶c)² ≤ 10³⁶ at 10¹²-user degrees), then — because
  * Cauchy-Schwarz gives c_ij ≤ √(c_i·c_j), so the quotient is
  * ≤ 10¹² — an integer square root in plain BIGINT (double seed
  * exact below 2⁵³, ±1 clamp certifies), identical in both engines.
  * The per-item rank tiebreaks (cosine DESC, n_users DESC, item_b
  * ASC) — fully deterministic.
  *
  * Scale: the pair build is [[Covisitation.symmetricPairs]]' map-side
  * explode (no self-join shuffle, basket-capped); degrees are one
  * reaggregation of the bounded interactions, broadcast to the pair
  * table (item-domain-bounded — a catalog, not a fact). The rank cap
  * is a window partitioned by item_a. Nothing is all-pairs.
  */
object ItemSimilarity {

  /** Pair min-support: a pair seen by a single user carries ~zero
    * collaborative signal (cosine ≈ 1/√(deg_a·deg_b), noise at any
    * catalog size) yet singleton pairs DOMINATE the pair volume —
    * standard item2item practice drops them before scoring. Applied
    * BEFORE the degree joins so the broadcast joins, the exact isqrt,
    * and the rank window all run on the supported core only. */
  val MinSupport = 2

  /** Top-`m` cosine neighbors per item among pairs with ≥ [[MinSupport]]
    * co-users: (item_a, item_b, n_users, deg_a, deg_b,
    * cosine_permicro, rk). */
  def cosineTopM(interactions: DataFrame, userCol: String, itemCol: String,
                 m: Int, maxBasket: Int = 1000, parts: Int = 0): DataFrame = {
    // ONE fact pass: pairs and degrees both derive from the same
    // checkpointed basket frame (a second distinct+window pass for
    // degrees measured ~2x the whole covisit build at sf0.1)
    val baskets = Covisitation.cappedBaskets(
      interactions, userCol, itemCol, maxBasket, parts).localCheckpoint()
    val pairs = Covisitation.symmetricPairsFromBaskets(baskets)
      .filter(col("n_users") >= MinSupport)
    val degrees = baskets.select(explode(col("items")).as("i"))
      .groupBy(col("i")).agg(count(lit(1)).as("deg"))
    pairs
      .join(broadcast(degrees.select(col("i").as("item_a"),
        col("deg").as("deg_a"))), Seq("item_a"))
      .join(broadcast(degrees.select(col("i").as("item_b"),
        col("deg").as("deg_b"))), Seq("item_b"))
      // floor(10⁶c/√p) = isqrt(⌊(10⁶c)²/p⌋) (floor∘√ passes through an
      // inner floor), and Cauchy-Schwarz bounds that quotient by 10¹²
      // — so after ONE DECIMAL division the exact square root runs in
      // plain BIGINT (double seed is exact to an ulp below 2⁵³, ±1
      // clamp certifies). Hot-path form: a DECIMAL(38,0)-clamped
      // variant measured ~2× slower on the pair frame (every
      // DECIMAL(38,0) multiply is a boxed BigDecimal op).
      .withColumn("__t", expr(
        """(CAST(1000000000000 AS DECIMAL(38,0)) * n_users * n_users)
           div (CAST(deg_a AS DECIMAL(38,0)) * deg_b)"""))
      .withColumn("__s", expr("CAST(floor(sqrt(CAST(__t AS DOUBLE))) AS BIGINT)"))
      .withColumn("cosine_permicro", expr(
        """CASE WHEN (__s + 1) * (__s + 1) <= __t THEN __s + 1
                WHEN __s * __s > __t THEN __s - 1
                ELSE __s END"""))
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
    cosineTopM(purchases, "cust", "item", Covisitation.M,
      parts = Covisitation.pairParts(spark, dir))
  }

  def oracleSql: String =
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
       |  HAVING count(*) >= $MinSupport
       |), degrees AS (
       |  SELECT i, CAST(count(*) AS BIGINT) AS deg FROM bounded GROUP BY i
       |), scored AS (
       |  SELECT item_a, item_b, n_users, deg_a, deg_b,
       |    CASE WHEN (s + 1) * (s + 1) <= t THEN s + 1
       |         WHEN s * s > t THEN s - 1
       |         ELSE s END AS cosine_permicro
       |  FROM (
       |    SELECT *, CAST(floor(sqrt(CAST(t AS DOUBLE))) AS BIGINT) AS s
       |    FROM (
       |      SELECT p.item_a, p.item_b, p.n_users,
       |        da.deg AS deg_a, db.deg AS deg_b,
       |        CAST((CAST(1000000000000 AS HUGEINT) * p.n_users * p.n_users)
       |          // (CAST(da.deg AS HUGEINT) * db.deg) AS BIGINT) AS t
       |      FROM pairs p
       |      JOIN degrees da ON da.i = p.item_a
       |      JOIN degrees db ON db.i = p.item_b))
       |), ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY item_a
       |    ORDER BY cosine_permicro DESC, n_users DESC, item_b ASC)
       |    AS BIGINT) AS rk
       |  FROM scored
       |)
       |SELECT item_a, item_b, n_users, deg_a, deg_b, cosine_permicro, rk
       |FROM ranked WHERE rk <= ${Covisitation.M}""".stripMargin
}
