package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Two-sample Cramér–von Mises test over DOMAIN-BOUNDED integer values
  * — the whole-distribution companion to [[MannWhitney]]'s location
  * test and [[ExactAuc]]'s KS supremum: T integrates the SQUARED ECDF
  * gap over the data, so it sees spread/shape changes a location test
  * misses and is more powerful than KS against diffuse alternatives.
  *
  * Pair-free on the cell histogram: aggregate once to value cells with
  * per-group counts (quantity ≤ 51 cells, forever), cumulate A_c, B_c
  * over the bounded cell table, then Anderson's computing form
  * T = nm/N² · Σ_c k_c·Δ_c² with Δ_c = A_c/n − B_c/m evaluated at
  * every observation via its cell.
  *
  * Quantization contract (two declared points, the staged-division
  * house style): (1) each cell's ECDF gap rounds ONCE to permicro
  * d_c = (10⁶·(m·A_c − n·B_c)) div (n·m); (2) the global factor
  * nm/N² rounds once to permicro. From there S = Σ k_c·d_c² and the
  * final T are exact integer arithmetic in DECIMAL(38,0) — no float,
  * no accumulation-order sensitivity; every quotient ≤ 10¹² so BIGINT
  * div is safe at any corpus size. S reports as VARCHAR (the decimal
  * digit string is the cross-engine contract); T in permicro alongside
  * its large-sample null mean E[T] = (1 + 1/N)/6 for calibration.
  */
object CramerVonMises {

  /** One row: (n1, n2, s, cvm_t_permicro, null_mean_permicro) comparing
    * `valueCol` between groupCol==g1 and groupCol==g2 rows. */
  def tStats(df: DataFrame, valueCol: String, groupCol: String,
             g1: String, g2: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df
      .filter(col(groupCol) === g1 || col(groupCol) === g2)
      .groupBy(col(valueCol).as("v"))
      .agg(
        sum(when(col(groupCol) === g1, 1L).otherwise(0L))
          .cast("decimal(38,0)").as("a"),
        sum(when(col(groupCol) === g2, 1L).otherwise(0L))
          .cast("decimal(38,0)").as("b"))
    // running inclusive cumulatives over the bounded cell table (the
    // rank_transform / mann_whitney partition-less-window precedent)
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cells
      .withColumn("ca", sum(col("a")).over(w))
      .withColumn("cb", sum(col("b")).over(w))
    val tot = cum.agg(
      sum(col("a")).cast("decimal(38,0)").as("n1"),
      sum(col("b")).cast("decimal(38,0)").as("n2")).localCheckpoint()
    val s = cum.crossJoin(broadcast(tot))
      .select(((col("a") + col("b")) *
        // |d_c|: permicro ECDF gap, quantized once per cell. abs BEFORE
        // the division: it is squared anyway, and Spark's div truncates
        // toward zero while DuckDB's // floors — they only agree on
        // nonnegative numerators
        expr("""((CAST(1000000 AS DECIMAL(38,0)) * abs(n2 * ca - n1 * cb))
                div (n1 * n2))""").cast("decimal(38,0)") *
        expr("""((CAST(1000000 AS DECIMAL(38,0)) * abs(n2 * ca - n1 * cb))
                div (n1 * n2))""").cast("decimal(38,0)")).as("kd2"))
      .agg(sum(col("kd2")).cast("decimal(38,0)").as("s"))
    s.crossJoin(broadcast(tot))
      .select(
        col("n1").cast("long").as("n1"),
        col("n2").cast("long").as("n2"),
        col("s").cast("string").as("s"),
        // T_permicro = ((nm·10⁶ div N²) · S) div 10¹²: factor ≤ 250000,
        // S ≤ N·10¹² → product within DECIMAL(38,0) to N ≈ 10²⁰
        expr("""(((CAST(1000000 AS DECIMAL(38,0)) * n1 * n2)
              div ((n1 + n2) * (n1 + n2))) * s)
            div CAST(1000000000000 AS DECIMAL(38,0))""")
          .as("cvm_t_permicro"),
        expr("""(CAST(1000000 AS DECIMAL(38,0)) * (n1 + n2 + 1))
            div (6 * (n1 + n2))""").as("null_mean_permicro"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: returned ('R') vs never-returned ('N') lineitem
    * quantity — the [[MannWhitney]] pair, tested for SHAPE. */
  def cvmLineitem(spark: SparkSession, dir: String): DataFrame =
    tStats(
      Tables.lineitem(spark, dir).select(
        round(col("l_quantity")).cast("long").as("q"),
        col("l_returnflag").as("flag")),
      "q", "flag", "R", "N")

  def oracleSql: String =
    """WITH cells AS (
      |  SELECT CAST(round(l_quantity) AS BIGINT) AS v,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
      |      AS HUGEINT) AS a,
      |    CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
      |      AS HUGEINT) AS b
      |  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1
      |), cum AS (
      |  SELECT a, b,
      |    sum(a) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND CURRENT ROW) AS ca,
      |    sum(b) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND CURRENT ROW) AS cb
      |  FROM cells
      |), tot AS (
      |  SELECT CAST(sum(a) AS HUGEINT) AS n1, CAST(sum(b) AS HUGEINT) AS n2
      |  FROM cells
      |), sacc AS (
      |  SELECT CAST(sum((c.a + c.b)
      |      * ((1000000 * abs(t.n2 * c.ca - t.n1 * c.cb)) // (t.n1 * t.n2))
      |      * ((1000000 * abs(t.n2 * c.ca - t.n1 * c.cb)) // (t.n1 * t.n2)))
      |    AS HUGEINT) AS s
      |  FROM cum c CROSS JOIN tot t
      |)
      |SELECT CAST(t.n1 AS BIGINT) AS n1, CAST(t.n2 AS BIGINT) AS n2,
      |  CAST(s.s AS VARCHAR) AS s,
      |  CAST((((1000000 * t.n1 * t.n2) // ((t.n1 + t.n2) * (t.n1 + t.n2)))
      |      * s.s) // 1000000000000 AS BIGINT) AS cvm_t_permicro,
      |  CAST((1000000 * (t.n1 + t.n2 + 1)) // (6 * (t.n1 + t.n2))
      |    AS BIGINT) AS null_mean_permicro
      |FROM sacc s CROSS JOIN tot t""".stripMargin
}
