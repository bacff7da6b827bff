package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Chi-square contingency analysis between two categorical columns —
  * the statistical independence screen behind feature selection and
  * drift detection, extending the reference's column-profiling EDA
  * (/root/reference/DataEngineering/Python/discover_schema.py profiles
  * single columns; this crosses two) toward the DQ-anomaly family of
  * [[DataQuality]] and [[DigitProfile]].
  *
  * Exactness: every input to the per-cell math is an exact BIGINT
  * (cell count, row total, column total, grand total). The expected
  * count and chi-square contribution are then a FIXED scalar expression
  * tree over those integers — `e = rt·ct/N`, `(n−e)²/e` — evaluated
  * once per output row with the same IEEE operation order in both
  * engines, then rounded to integer micros. No float ever enters an
  * aggregate, so partial-agg ordering cannot flap the hash. (This also
  * avoids the BIGINT overflow of the cross-multiplied form
  * `(n·N − rt·ct)²`: all products here stay in double space.)
  *
  * Scale: one shuffle to the (a, b) cell grid; everything after runs on
  * the CELL table, whose size is the product of the two column
  * cardinalities — for legitimate categorical columns that is tiny no
  * matter how many input rows, so the row/column-margin joins are
  * broadcasts and the whole test is scan-bound.
  */
object Contingency {

  /** Per-cell contingency stats for `aCol` × `bCol`:
    * (a, b, n, exp_micros, chi2_micros). `chi2_micros` is the cell's
    * additive contribution to the chi-square statistic in integer
    * micros — sum them for the test statistic (BIGINT sum of
    * already-rounded terms, associative). */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("n"))
    val rowTot = cells.groupBy("a").agg(sum("n").as("__rt"))
    val colTot = cells.groupBy("b").agg(sum("n").as("__ct"))
    val total = cells.agg(sum("n").as("__N"))
    val e = col("__rt").cast("double") * col("__ct").cast("double") /
      col("__N").cast("double")
    val d = col("n").cast("double") - e
    cells
      .join(broadcast(rowTot), "a")
      .join(broadcast(colTot), "b")
      .crossJoin(broadcast(total))
      .withColumn("exp_micros", round(e * lit(1e6)).cast("long"))
      .withColumn("chi2_micros", round(d * d / e * lit(1e6)).cast("long"))
      .select("a", "b", "n", "exp_micros", "chi2_micros")
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: order priority × order status — a 5×3 grid whose
    * cell math the DuckDB oracle replays operation-for-operation. */
  def chisqPriorityStatus(spark: SparkSession, dir: String): DataFrame =
    chiSquare(Tables.orders(spark, dir), "o_orderpriority", "o_orderstatus")
      .withColumnRenamed("a", "priority").withColumnRenamed("b", "status")

  def oracleSql: String =
    """WITH cells AS (
      |  SELECT o_orderpriority AS priority, o_orderstatus AS status,
      |    count(*) AS n
      |  FROM orders GROUP BY 1, 2
      |), rt AS (SELECT priority, CAST(sum(n) AS BIGINT) AS rt FROM cells GROUP BY 1),
      |ct AS (SELECT status, CAST(sum(n) AS BIGINT) AS ct FROM cells GROUP BY 1),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS gt FROM cells)
      |SELECT priority, status, n,
      |  CAST(round(CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(gt AS DOUBLE)
      |    * 1e6) AS BIGINT) AS exp_micros,
      |  CAST(round(
      |    (CAST(n AS DOUBLE)
      |       - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(gt AS DOUBLE))
      |    * (CAST(n AS DOUBLE)
      |       - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(gt AS DOUBLE))
      |    / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(gt AS DOUBLE))
      |    * 1e6) AS BIGINT) AS chi2_micros
      |FROM cells JOIN rt USING (priority) JOIN ct USING (status)
      |CROSS JOIN tot""".stripMargin

  /** Cramér's V² — the [0,1]-normalized effect size over the χ² test
    * (V itself needs a sqrt; V² is the exact-integer form): V² =
    * χ²/(N·min(r−1, c−1)), computed as one integer division over the
    * ALREADY-QUANTIZED per-cell micros contributions (identical in
    * both engines), so association strength is comparable across
    * differently-sized tables — the normalization the raw χ² lacks. */
  def cramersV2(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = chiSquare(df, aCol, bCol).localCheckpoint()
    cells.agg(
        sum(col("n")).as("grand_n"),
        countDistinct(col("a")).as("n_rows"),
        countDistinct(col("b")).as("n_cols"),
        // observed cells alone UNDERSTATE chi-square: every zero cell
        // contributes its expected count e, and Σ_all e = N, so the
        // missing mass is exactly N − Σ_observed e (in micros)
        (sum(col("chi2_micros"))
          + (sum(col("n")) * lit(1000000L) - sum(col("exp_micros"))))
          .as("chi2_micros_total"))
      .withColumn("cramers_v2_micro", expr(
        """CASE WHEN least(n_rows - 1, n_cols - 1) > 0 THEN
             chi2_micros_total div (grand_n * least(n_rows - 1, n_cols - 1))
           END"""))
  }

  /** Gated instance: effect size of priority × status. */
  def cramersV2Orders(spark: SparkSession, dir: String): DataFrame =
    cramersV2(Tables.orders(spark, dir), "o_orderpriority", "o_orderstatus")

  def cramersOracleSql: String =
    s"""WITH base AS (
      |${oracleSql.linesIterator.map("  " + _).mkString("\n")}
      |), agg AS (
      |  SELECT CAST(sum(n) AS BIGINT) AS grand_n,
      |    CAST(count(DISTINCT priority) AS BIGINT) AS n_rows,
      |    CAST(count(DISTINCT status) AS BIGINT) AS n_cols,
      |    CAST(sum(chi2_micros)
      |      + (sum(n) * 1000000 - sum(exp_micros)) AS BIGINT)
      |      AS chi2_micros_total
      |  FROM base
      |)
      |SELECT grand_n, n_rows, n_cols, chi2_micros_total,
      |  CASE WHEN least(n_rows - 1, n_cols - 1) > 0 THEN
      |    CAST(chi2_micros_total // (grand_n * least(n_rows - 1, n_cols - 1))
      |      AS BIGINT) END AS cramers_v2_micro
      |FROM agg""".stripMargin
}
