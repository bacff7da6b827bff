package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Exact Kendall rank correlation over DOMAIN-BOUNDED integer pairs —
  * the rank-based dependence test beside [[GroupStats]]' Pearson r and
  * [[MutualInfo]]: distribution-free monotone association for ordinal
  * features (the feature-screening pass before a fit like
  * /root/reference/DataEngineering/DataBricks/spark_randomforest.py).
  *
  * The pair-counting identity runs on the CELL HISTOGRAM, not on row
  * pairs: aggregate the fact once to (x, y, n) cells (bounded by the
  * value domains — quantity×discount is ≤ 51·11 cells here, forever),
  * then every concordant/discordant/tie count is a sum of n_a·n_b over
  * ordered CELL pairs — O(cells²) work that is INDEPENDENT of row
  * count. Reports exact tau-a permicro (sign-split truncating div) plus
  * the full tie decomposition (C, D, ties_x, ties_y, ties_xy, n) so
  * tau-b is derivable downstream; all accumulation in DECIMAL(38,0)
  * (C ≈ n²/2 outgrows BIGINT at ~4·10⁹ rows).
  */
object Kendall {

  /** One row: (n, concordant, discordant, ties_x, ties_y, ties_xy,
    * tau_a_permicro) for integer columns (xCol, yCol). */
  def tauCounts(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df
      .groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"))
      .localCheckpoint() // self-joined: one shuffle, reused both sides
    val pairs = cells.as("a").join(cells.as("b"),
      // each unordered cell pair once: (x,y) lexicographic
      col("a.x") < col("b.x") ||
        (col("a.x") === col("b.x") && col("a.y") < col("b.y")))
    val cross = pairs.select(
      (col("a.n") * col("b.n")).as("__nn"),
      col("a.x").as("ax"), col("a.y").as("ay"),
      col("b.x").as("bx"), col("b.y").as("by"))
    val counted = cross.agg(
      sum(when((col("ax") < col("bx") && col("ay") < col("by")) ||
               (col("ax") > col("bx") && col("ay") > col("by")), col("__nn"))
        .otherwise(lit(0).cast("decimal(38,0)"))).as("concordant"),
      sum(when((col("ax") < col("bx") && col("ay") > col("by")) ||
               (col("ax") > col("bx") && col("ay") < col("by")), col("__nn"))
        .otherwise(lit(0).cast("decimal(38,0)"))).as("discordant"),
      sum(when(col("ax") === col("bx"), col("__nn"))
        .otherwise(lit(0).cast("decimal(38,0)"))).as("ties_x"),
      sum(when(col("ay") === col("by"), col("__nn"))
        .otherwise(lit(0).cast("decimal(38,0)"))).as("ties_y"))
    val within = cells.agg(
      sum(col("n")).cast("decimal(38,0)").as("__nr"),
      // exact n(n-1)/2 WITHOUT a div whose quotient outgrows BIGINT
      // (Spark's div returns long; n²/2 passes 2⁶³ at ~4·10⁹-row
      // cells): halve the even factor first, then multiply in decimal
      sum(expr("""CASE WHEN n % 2 = 0
          THEN CAST(n div 2 AS DECIMAL(38,0)) * (n - 1)
          ELSE n * CAST((n - 1) div 2 AS DECIMAL(38,0)) END""")
        .cast("decimal(38,0)")).as("ties_xy"))
    // Final pair counts report as VARCHAR: DECIMAL(38,0) stays the
    // internal accumulator (C ≈ n²/2), but the gate's value-hash
    // canonicalizes decimals engine-specifically — the digit string is
    // the bit-exact cross-engine contract (scale-0 decimals render as
    // plain integers in both Spark and DuckDB).
    counted.crossJoin(broadcast(within))
      .select(col("__nr").cast("long").as("n"),
        col("concordant").cast("string").as("concordant"),
        col("discordant").cast("string").as("discordant"),
        col("ties_x").cast("string").as("ties_x"),
        col("ties_y").cast("string").as("ties_y"),
        col("ties_xy").cast("string").as("ties_xy"),
        // same even-factor halving for the pair-count denominator
        expr("""CASE WHEN __nr > 1 THEN
            (CASE WHEN concordant < discordant THEN -1L ELSE 1L END)
              * ((1000000 * abs(concordant - discordant))
                  div (CASE WHEN __nr % 2 = 0
                    THEN CAST(__nr div 2 AS DECIMAL(38,0)) * (__nr - 1)
                    ELSE __nr * CAST((__nr - 1) div 2 AS DECIMAL(38,0))
                    END))
          END""").as("tau_a_permicro"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: quantity vs discount points over lineitem — the
    * canonical bounded-ordinal pair. */
  def kendallLineitem(spark: SparkSession, dir: String): DataFrame =
    tauCounts(
      Tables.lineitem(spark, dir).select(
        round(col("l_quantity")).cast("long").as("q"),
        round(col("l_discount") * 100).cast("long").as("d")),
      "q", "d")

  def oracleSql: String =
    """WITH cells AS (
      |  SELECT CAST(round(l_quantity) AS BIGINT) AS x,
      |    CAST(round(l_discount * 100) AS BIGINT) AS y,
      |    CAST(count(*) AS HUGEINT) AS n
      |  FROM lineitem GROUP BY 1, 2
      |), pairs AS (
      |  SELECT a.n * b.n AS nn, a.x AS ax, a.y AS ay, b.x AS bx, b.y AS by_
      |  FROM cells a JOIN cells b
      |    ON a.x < b.x OR (a.x = b.x AND a.y < b.y)
      |), counted AS (
      |  SELECT
      |    sum(CASE WHEN (ax < bx AND ay < by_) OR (ax > bx AND ay > by_)
      |      THEN nn ELSE 0 END) AS concordant,
      |    sum(CASE WHEN (ax < bx AND ay > by_) OR (ax > bx AND ay < by_)
      |      THEN nn ELSE 0 END) AS discordant,
      |    sum(CASE WHEN ax = bx THEN nn ELSE 0 END) AS ties_x,
      |    sum(CASE WHEN ay = by_ THEN nn ELSE 0 END) AS ties_y
      |  FROM pairs
      |), within AS (
      |  SELECT CAST(sum(n) AS HUGEINT) AS nr,
      |    sum((n * (n - 1)) // 2) AS ties_xy
      |  FROM cells
      |)
      |SELECT CAST(nr AS BIGINT) AS n,
      |  CAST(concordant AS VARCHAR) AS concordant,
      |  CAST(discordant AS VARCHAR) AS discordant,
      |  CAST(ties_x AS VARCHAR) AS ties_x,
      |  CAST(ties_y AS VARCHAR) AS ties_y,
      |  CAST(ties_xy AS VARCHAR) AS ties_xy,
      |  CASE WHEN nr > 1 THEN CAST(
      |    (CASE WHEN concordant < discordant THEN -1 ELSE 1 END)
      |      * ((1000000 * abs(concordant - discordant))
      |          // ((nr * (nr - 1)) // 2)) AS BIGINT) END AS tau_a_permicro
      |FROM counted CROSS JOIN within""".stripMargin
}
