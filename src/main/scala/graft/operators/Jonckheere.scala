package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Jonckheere–Terpstra test for an ORDERED alternative — "does the
  * metric increase along the dose levels?" — the trend upgrade of
  * Kruskal–Wallis (which only asks "are the groups different?") and
  * the rank cousin of [[PairedTests]]' Cochran–Armitage (which needs a
  * binary outcome). J sums the Mann–Whitney U of every ordered group
  * pair, so it concentrates power on monotone trends.
  *
  * Pair-free on the (group, value) CELL histogram (groups × value
  * domain — priority×quantity is ≤ 5·51 cells forever): J counts
  * x<y pairs across ordered groups, so with cell counts it is a sum of
  * n_a·n_b over ordered CELL pairs — O(cells²) independent of row
  * count, the [[Kendall]] discipline. Ties carry ½ each, kept exact by
  * reporting 2J. The null mean E[2J] equals the total cross-group pair
  * count P = Σ_{i<j} nᵢ·nⱼ, accumulated DIRECTLY in the same bounded
  * cell join (never via the (N²−Σnᵢ²)/2 identity, whose BIGINT div
  * quotient overflows past N ≈ 4·10⁹ — the round-14 overflow class).
  * Pair counts report as VARCHAR decimal digit strings; the trend
  * effect (2J − P)/P reports in sign-split truncating permicro.
  *
  * Scale: one groupBy to cells, one bounded cell self-join, scalar
  * aggregates. The 100 TB cost is the scan.
  */
object Jonckheere {

  /** One row: (n, k_groups, j2, e_j2, trend_permicro) for an integer
    * `valueCol` across groups ordered by integer `orderCol`. */
  def jtStats(df: DataFrame, orderCol: String, valueCol: String): DataFrame = {
    val cells = df
      .groupBy(col(orderCol).as("g"), col(valueCol).as("v"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"))
      .localCheckpoint() // self-joined + totals: one shuffle, reused
    val pairs = cells.as("a").join(cells.as("b"), col("a.g") < col("b.g"))
      .agg(
        coalesce(sum(
          when(col("a.v") < col("b.v"),
            lit(2).cast("decimal(38,0)") * col("a.n") * col("b.n"))
          .when(col("a.v") === col("b.v"), col("a.n") * col("b.n"))
          .otherwise(lit(0).cast("decimal(38,0)"))),
          lit(0).cast("decimal(38,0)")).as("j2"),
        coalesce(sum(col("a.n") * col("b.n")),
          lit(0).cast("decimal(38,0)")).as("p"))
    val tots = cells.agg(
      sum(col("n")).cast("decimal(38,0)").as("nn"),
      countDistinct(col("g")).as("k_groups"))
    pairs.crossJoin(broadcast(tots))
      .select(
        col("nn").cast("long").as("n"),
        col("k_groups"),
        col("j2").cast("string").as("j2"),
        col("p").cast("string").as("e_j2"),
        expr("""CASE WHEN p > 0 THEN
            (CASE WHEN j2 < p THEN -1L ELSE 1L END)
              * ((CAST(1000000 AS DECIMAL(38,0)) * abs(j2 - p)) div p)
          END""").as("trend_permicro"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: does lineitem quantity trend across order
    * priority levels 1-URGENT → 5-LOW? Groups ordered by the leading
    * priority digit; values are the 1..50 integer quantities. */
  def jtPriorityQuantity(spark: SparkSession, dir: String): DataFrame =
    jtStats(
      Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir)
            .select(col("o_orderkey"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .select(
          substring(col("o_orderpriority"), 1, 1).cast("long").as("prio"),
          round(col("l_quantity")).cast("long").as("q")),
      "prio", "q")

  def oracleSql: String =
    """WITH cells AS (
      |  SELECT CAST(substr(o.o_orderpriority, 1, 1) AS BIGINT) AS g,
      |    CAST(round(l.l_quantity) AS BIGINT) AS v,
      |    CAST(count(*) AS HUGEINT) AS n
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  GROUP BY 1, 2
      |), pairs AS (
      |  SELECT
      |    CAST(coalesce(sum(
      |      CASE WHEN a.v < b.v THEN 2 * a.n * b.n
      |           WHEN a.v = b.v THEN a.n * b.n
      |           ELSE 0 END), 0) AS HUGEINT) AS j2,
      |    CAST(coalesce(sum(a.n * b.n), 0) AS HUGEINT) AS p
      |  FROM cells a JOIN cells b ON a.g < b.g
      |), tots AS (
      |  SELECT CAST(sum(n) AS HUGEINT) AS nn,
      |    CAST(count(DISTINCT g) AS BIGINT) AS k_groups
      |  FROM cells
      |)
      |SELECT CAST(t.nn AS BIGINT) AS n, t.k_groups,
      |  CAST(p.j2 AS VARCHAR) AS j2,
      |  CAST(p.p AS VARCHAR) AS e_j2,
      |  CASE WHEN p.p > 0 THEN CAST(
      |    (CASE WHEN p.j2 < p.p THEN -1 ELSE 1 END)
      |      * ((1000000 * abs(p.j2 - p.p)) // p.p) AS BIGINT)
      |  END AS trend_permicro
      |FROM pairs p CROSS JOIN tots t""".stripMargin
}
