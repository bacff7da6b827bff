package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** t-closeness audit — the third rung of the export privacy ladder
  * after [[KAnonymity]] (k / l) and [[MondrianAnon]] (repair): a QI
  * cell can satisfy k-anonymity AND l-diversity yet still leak — if
  * its sensitive-value DISTRIBUTION sits far from the table's, an
  * observer learns the attribute probabilistically (Li, Li &
  * Venkatasubramanian, ICDE 2007). For an ORDERED sensitive attribute
  * the distance is the Earth Mover's Distance with unit ground
  * distance between adjacent ranks:
  *   EMD(P, Q) = (1/(m−1)) · Σ_{i<m} |cum_i(P) − cum_i(Q)|.
  *
  * Exactness: with cell counts c_i (size n) and global counts g_i
  * (size N), each |cum_i(P) − cum_i(Q)| = |Ci·N − Gi·n| / (n·N) with
  * integer numerators (Ci, Gi the cumulative counts), so
  * emd_micros = ⌊10⁶ · Σ|Ci·N − Gi·n| / (n·N·(m−1))⌋ is one exact
  * DECIMAL(38,0) expression both engines evaluate identically.
  *
  * Scale: ONE conditional aggregate over the corpus to the (cell ×
  * m)-wide count table (m is the sensitive domain, a constant), a
  * broadcast 1-row global, then O(1) math per cell — the audit costs
  * one COUNT(*)-shaped scan at any table size, same as [[KAnonymity]].
  * The reference's export surfaces (merge_generator.py-shaped
  * medallion exits) are where this audit runs.
  */
object TCloseness {

  /** Per-QI-cell t-closeness over an ordered sensitive rank column
    * (values 1..m): (qi…, n, emd_micros, violates_t) + the global
    * summary (n_cells, n_t_violations, pop_at_risk) on every row.
    * `tMicros` is the threshold t in millionths. */
  def audit(df: DataFrame, qi: Seq[String], sensitiveRank: Column,
            m: Int, tMicros: Long): DataFrame = {
    require(m >= 2, "ordered domain needs at least two ranks")
    val ranked = df.select(qi.map(col) :+ sensitiveRank.as("__r"): _*)
    def cnts(d: DataFrame, byQi: Boolean): DataFrame = {
      val base = if (byQi) d.groupBy(qi.map(col): _*) else d.groupBy()
      base.agg(count(lit(1)).as(if (byQi) "n" else "gn"),
        (1 to m).map(i =>
          sum(when(col("__r") === i, 1L).otherwise(0L))
            .as(s"${if (byQi) "c" else "g"}$i")): _*)
    }
    val cells = cnts(ranked, byQi = true)
    val global = cnts(ranked, byQi = false)
    // Σ over cumulative prefixes of |Ci·N − Gi·n|, all DECIMAL(38,0)
    val terms = (1 until m).map { i =>
      val ci = (1 to i).map(j => s"c$j").mkString(" + ")
      val gi = (1 to i).map(j => s"g$j").mkString(" + ")
      s"abs(CAST($ci AS DECIMAL(38,0)) * CAST(gn AS DECIMAL(38,0)) - CAST($gi AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)))"
    }.mkString(" + ")
    val emd = s"CAST((($terms) * 1000000 - pmod(($terms) * 1000000, " +
      s"CAST(n AS DECIMAL(38,0)) * gn * ${m - 1})) div " +
      s"(CAST(n AS DECIMAL(38,0)) * gn * ${m - 1}) AS BIGINT)"
    val flagged = cells.crossJoin(broadcast(global))
      .withColumn("emd_micros", expr(emd))
      .withColumn("violates_t", col("emd_micros") > tMicros)
      .select((qi.map(col) :+ col("n") :+ col("emd_micros")
        :+ col("violates_t")): _*)
      .localCheckpoint() // consumed by output AND the summary aggregate
    val summary = flagged.agg(
      count(lit(1)).as("n_cells"),
      sum(when(col("violates_t"), 1L).otherwise(0L)).as("n_t_violations"),
      coalesce(sum(when(col("violates_t"), col("n"))), lit(0L))
        .as("pop_at_risk"))
    flagged.crossJoin(broadcast(summary))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: the [[KAnonymity]] QI cells (nation × market
    * segment) against the ordered balance tier (1 = negative, 2 = low,
    * 3 = high), t = 0.15. */
  def tClosenessCustomer(spark: SparkSession, dir: String): DataFrame =
    audit(
      Tables.customer(spark, dir).select(col("c_nationkey"),
        col("c_mktsegment"),
        when(col("c_acctbal") < 0, 1)
          .when(col("c_acctbal") < 5000, 2)
          .otherwise(3).as("bal_rank")),
      qi = Seq("c_nationkey", "c_mktsegment"),
      sensitiveRank = col("bal_rank"), m = 3, tMicros = 150000L)

  def oracleSql: String =
    """WITH r AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    CASE WHEN c_acctbal < 0 THEN 1
      |         WHEN c_acctbal < 5000 THEN 2 ELSE 3 END AS rk
      |  FROM customer
      |), cells AS (
      |  SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
      |    CAST(sum(CASE WHEN rk = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
      |  FROM r GROUP BY 1, 2
      |), gtot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS nn,
      |    CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS g1,
      |    CAST(sum(CASE WHEN rk = 2 THEN 1 ELSE 0 END) AS BIGINT) AS g2
      |  FROM r
      |), emds AS (
      |  SELECT c.c_nationkey, c.c_mktsegment, c.n,
      |    CAST((abs(CAST(c.c1 AS HUGEINT) * g.nn - CAST(g.g1 AS HUGEINT) * c.n)
      |        + abs(CAST(c.c1 + c.c2 AS HUGEINT) * g.nn - CAST(g.g1 + g.g2 AS HUGEINT) * c.n))
      |      * 1000000 // (CAST(c.n AS HUGEINT) * g.nn * 2) AS BIGINT) AS emd_micros
      |  FROM cells c CROSS JOIN gtot g
      |), flagged AS (
      |  SELECT *, emd_micros > 150000 AS violates_t FROM emds
      |), summary AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_cells,
      |    CAST(sum(CASE WHEN violates_t THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_t_violations,
      |    CAST(coalesce(sum(CASE WHEN violates_t THEN n END), 0) AS BIGINT)
      |      AS pop_at_risk
      |  FROM flagged
      |)
      |SELECT f.c_nationkey, f.c_mktsegment, f.n, f.emd_micros, f.violates_t,
      |  s.n_cells, s.n_t_violations, s.pop_at_risk
      |FROM flagged f CROSS JOIN summary s""".stripMargin
}
