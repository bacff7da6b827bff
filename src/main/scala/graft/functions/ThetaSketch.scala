package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** KMV/Theta sketch set algebra — distinct-count estimates for two
  * sets AND their union/intersection from k-minimum-value sketches
  * (Beyer et al. 2007; the Apache DataSketches Theta family). The
  * capability gap this closes: [[Hll]] registers merge for UNION only —
  * audience INTERSECTION ("how many users did both campaigns touch?",
  * the reference's audience overlap question answered exactly by
  * [[DistinctSketch]] under a cap) needs retained hash VALUES, which is
  * exactly what KMV keeps: the k smallest mixer hashes of each set.
  *
  * Everything is deterministic integer arithmetic on mixer outputs —
  * the same two-round mod-(2⁶¹−1) constants in both engines — so the
  * sketches, thetas, and every estimate hash-gate exactly:
  *   θ_S = k-th smallest hash (or P when |S| < k: the sketch is EXACT
  *   below saturation), est|S| = (k−1)·P div θ_S,
  *   est|A∩B| = |{retained matches < θ}|·P div θ, θ = min(θ_A, θ_B).
  * Hash collisions merge distinct keys (standard KMV bias, declared;
  * probability ~n²/2P ≈ 0 at P = 2⁶¹−1). The (k−1)·P product rides
  * DECIMAL(38,0); the quotient is a cardinality, far under 2⁶³ for any
  * input the mixer's uniformity admits (h_k ≥ k·P/2n w.h.p.).
  *
  * Scale: each sketch is distinct → hash → global k-smallest via
  * sort+limit (TakeOrdered: per-partition heads, driver merge of
  * k·partitions rows — never a full sort). Set algebra then runs on
  * ≤ 2k retained hashes. The 100 TB cost is the distinct.
  */
object ThetaSketch {
  /** Retained minimum hash values per sketch. ±1/√k ≈ 12.5% relative
    * error at k = 64 — matched to the [[Hll]] register count. */
  val K = 64

  private def mix(c: Column): Column =
    Native.call("graft_mix_mod61", exprs => MixMod61(exprs.head), c)

  /** The k smallest distinct mixer hashes of `keyCol` (the KMV
    * sketch), one `h` column. */
  def kmv(df: DataFrame, keyCol: String, k: Int = K): DataFrame =
    df.select(mix(col(keyCol).cast("long")).as("h")).distinct()
      .orderBy("h").limit(k)

  /** One row of set-algebra estimates from two keyed sets:
    * (n_a, n_b, theta_a, theta_b, est_a, est_b, est_union,
    * n_common_retained, est_intersect). n_a/n_b are the exact distinct
    * counts (cheap at gate scale; at 100 TB drop them and keep the
    * sketch columns — the estimates never read them). */
  def setEstimates(a: DataFrame, aKey: String,
                   b: DataFrame, bKey: String, k: Int = K): DataFrame = {
    val ska = kmv(a, aKey, k).localCheckpoint() // reused: est + union + ∩
    val skb = kmv(b, bKey, k).localCheckpoint()
    val statsA = ska.agg(count(lit(1)).as("ra"), max(col("h")).as("hka"))
    val statsB = skb.agg(count(lit(1)).as("rb"), max(col("h")).as("hkb"))
    val exactA = a.agg(countDistinct(col(aKey)).as("n_a"))
    val exactB = b.agg(countDistinct(col(bKey)).as("n_b"))
    val unionStats = ska.unionByName(skb).distinct()
      .orderBy("h").limit(k)
      .agg(count(lit(1)).as("ru"), max(col("h")).as("hku"))
    val common = ska.join(skb, "h")
    val est = (r: String, hk: String, theta: String) =>
      s"""CASE WHEN $r < $k THEN $r
          ELSE (CAST(${k - 1} AS DECIMAL(38,0)) * ${Hll.P}) div $hk
          END AS $theta"""
    exactA.crossJoin(broadcast(exactB))
      .crossJoin(broadcast(statsA)).crossJoin(broadcast(statsB))
      .crossJoin(broadcast(unionStats))
      .crossJoin(broadcast(
        statsA.crossJoin(statsB).crossJoin(common.agg(
            count(lit(1)).as("__rc"), collect_list(col("h")).as("__hs")))
          .select(expr(s"""CASE WHEN ra < $k AND rb < $k THEN __rc ELSE
              size(filter(__hs, x -> x < least(
                CASE WHEN ra < $k THEN ${Hll.P} ELSE hka END,
                CASE WHEN rb < $k THEN ${Hll.P} ELSE hkb END))) END""")
            .as("n_common_retained"))))
      .select(col("n_a"), col("n_b"),
        expr(s"CASE WHEN ra < $k THEN ${Hll.P} ELSE hka END").as("theta_a"),
        expr(s"CASE WHEN rb < $k THEN ${Hll.P} ELSE hkb END").as("theta_b"),
        expr(est("ra", "hka", "est_a")),
        expr(est("rb", "hkb", "est_b")),
        expr(est("ru", "hku", "est_union")),
        col("n_common_retained").cast("long").as("n_common_retained"),
        expr(s"""CASE WHEN ra < $k AND rb < $k THEN n_common_retained
            ELSE (CAST(n_common_retained AS DECIMAL(38,0)) * ${Hll.P})
              div least(CASE WHEN ra < $k THEN ${Hll.P} ELSE hka END,
                        CASE WHEN rb < $k THEN ${Hll.P} ELSE hkb END)
            END""").as("est_intersect"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: customers who received a returned line vs
    * customers who placed an urgent order — size, union, and overlap
    * from 64-value sketches, exact counts alongside. */
  def thetaCustomers(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
          .select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"))
    val b = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    setEstimates(a, "o_custkey", b, "o_custkey")
  }

  private def mixSql(src: String): String =
    s"""SELECT DISTINCT CAST(xor(h2, h2 >> 27) AS BIGINT) AS h FROM (
      |  SELECT CAST((CAST(${Hll.A2} AS HUGEINT) * xor(h1, h1 >> 30))
      |    % ${Hll.P} AS BIGINT) AS h2
      |  FROM (SELECT CAST((CAST(${Hll.A} AS HUGEINT) * k + ${Hll.B})
      |    % ${Hll.P} AS BIGINT) AS h1 FROM (SELECT DISTINCT k FROM $src)))""".stripMargin

  def oracleSql: String =
    s"""WITH seta AS (
      |  SELECT o_custkey AS k FROM orders o
      |  JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |  WHERE l.l_returnflag = 'R'
      |), setb AS (
      |  SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
      |), ska AS (SELECT h FROM (${mixSql("seta")}) ORDER BY h LIMIT $K),
      |skb AS (SELECT h FROM (${mixSql("setb")}) ORDER BY h LIMIT $K),
      |sa AS (SELECT count(*) AS ra, max(h) AS hka FROM ska),
      |sb AS (SELECT count(*) AS rb, max(h) AS hkb FROM skb),
      |sku AS (SELECT h FROM (SELECT DISTINCT h FROM
      |  (SELECT h FROM ska UNION ALL SELECT h FROM skb)) ORDER BY h LIMIT $K),
      |su AS (SELECT count(*) AS ru, max(h) AS hku FROM sku),
      |ths AS (
      |  SELECT sa.ra, sa.hka, sb.rb, sb.hkb,
      |    CASE WHEN sa.ra < $K THEN ${Hll.P} ELSE sa.hka END AS theta_a,
      |    CASE WHEN sb.rb < $K THEN ${Hll.P} ELSE sb.hkb END AS theta_b
      |  FROM sa CROSS JOIN sb
      |), com AS (
      |  SELECT count(*) AS rc,
      |    count(CASE WHEN a.h < least(t.theta_a, t.theta_b) THEN 1 END) AS rc_th
      |  FROM ska a JOIN skb b ON a.h = b.h CROSS JOIN ths t
      |), nc AS (
      |  SELECT CASE WHEN t.ra < $K AND t.rb < $K THEN c.rc
      |    ELSE c.rc_th END AS n_common_retained
      |  FROM ths t CROSS JOIN com c
      |)
      |SELECT
      |  (SELECT CAST(count(DISTINCT k) AS BIGINT) FROM seta) AS n_a,
      |  (SELECT CAST(count(DISTINCT k) AS BIGINT) FROM setb) AS n_b,
      |  CAST(t.theta_a AS BIGINT) AS theta_a,
      |  CAST(t.theta_b AS BIGINT) AS theta_b,
      |  CAST(CASE WHEN t.ra < $K THEN t.ra
      |    ELSE (CAST(${K - 1} AS HUGEINT) * ${Hll.P}) // t.hka END
      |    AS BIGINT) AS est_a,
      |  CAST(CASE WHEN t.rb < $K THEN t.rb
      |    ELSE (CAST(${K - 1} AS HUGEINT) * ${Hll.P}) // t.hkb END
      |    AS BIGINT) AS est_b,
      |  CAST(CASE WHEN u.ru < $K THEN u.ru
      |    ELSE (CAST(${K - 1} AS HUGEINT) * ${Hll.P}) // u.hku END
      |    AS BIGINT) AS est_union,
      |  CAST(n.n_common_retained AS BIGINT) AS n_common_retained,
      |  CAST(CASE WHEN t.ra < $K AND t.rb < $K THEN n.n_common_retained
      |    ELSE (CAST(n.n_common_retained AS HUGEINT) * ${Hll.P})
      |      // least(t.theta_a, t.theta_b) END AS BIGINT) AS est_intersect
      |FROM ths t CROSS JOIN su u CROSS JOIN nc n""".stripMargin
}
