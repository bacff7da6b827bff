package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Iterative proportional fitting (raking) — reweight a SAMPLE's
  * two-way cell table so its margins match known POPULATION totals,
  * the survey-statistics workhorse behind every "adjust the
  * experiment panel to the customer base" readout (the reference's
  * imbalanced-cohort handling in its SHAP/experiment notebooks
  * hand-weights the same way; raking derives those weights). Sits
  * beside [[StratifiedAte]] (one margin) as the two-margin extension
  * and beside [[MixturePlan]] (prescribing a target mix) as the
  * estimating twin.
  *
  * Exactness: weights live in MILLI units starting at 1000 and every
  * scaling step is ONE truncating division per cell,
  *   w' = (w · 1000 · T_margin) div Σ_cells(n·w),
  * DECIMAL(38,0)/HUGEINT-carried (at the 100 TB envelope T ≈ 10¹⁰ and
  * w ≤ 10⁶ milli keep the numerator ≤ 10¹⁹ — decimal headroom to
  * spare). Cells absent from the sample are structural zeros and stay
  * absent (classic IPF). A fixed iteration count is the contract —
  * IPF's geometric convergence makes 3 sweeps plenty for reporting
  * weights, and a fixed count is what makes the result hash-gateable.
  *
  * Scale shape: two fact-sized margin counts + one fact-sized cell
  * count (all map-side combined), then every sweep runs on the
  * domain-bounded cell table (|A|×|B| rows) — broadcast joins against
  * margin tables that are smaller still. The 100 TB cost is the three
  * initial scans; the iterations are free.
  */
object IpfRake {

  /** Rake `cells` (a, b, n) to row targets (a, ta) and column targets
    * (b, tb) with `iters` full row+column sweeps. Returns
    * (a, b, n_sample, w_milli, est) with est = (n·w) div 1000. */
  def rake(cells: DataFrame, rowT: DataFrame, colT: DataFrame,
           iters: Int): DataFrame = {
    val d38 = "decimal(38,0)"
    var w = cells.select(col("a"), col("b"),
      col("n").cast(d38).as("n"),
      lit(1000).cast(d38).as("w")).localCheckpoint()
    val rt = broadcast(rowT.select(col("a"), col("ta").cast(d38).as("ta")))
    val ct = broadcast(colT.select(col("b"), col("tb").cast(d38).as("tb")))
    for (_ <- 1 to iters) {
      val rs = w.groupBy("a")
        .agg(sum(col("n") * col("w")).cast(d38).as("rs"))
      w = w.join(broadcast(rs), Seq("a")).join(rt, Seq("a"))
        .withColumn("w", expr("CAST((w * 1000 * ta) div rs AS DECIMAL(38,0))"))
        .select(col("a"), col("b"), col("n"), col("w"))
      val cs = w.groupBy("b")
        .agg(sum(col("n") * col("w")).cast(d38).as("cs"))
      w = w.join(broadcast(cs), Seq("b")).join(ct, Seq("b"))
        .withColumn("w", expr("CAST((w * 1000 * tb) div cs AS DECIMAL(38,0))"))
        .select(col("a"), col("b"), col("n"), col("w"))
        .localCheckpoint() // keep the plan sweep-count-independent
    }
    w.select(col("a"), col("b"),
      col("n").cast("long").as("n_sample"),
      col("w").cast("long").as("w_milli"),
      expr("(n * w) div 1000").as("est"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: rake the pre-1997 order sample's
    * (priority × custkey%5) cell table to the FULL order book's
    * margins — 3 sweeps. */
  def rakeOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_orderpriority").as("a"),
      (col("o_custkey") % 5).as("b"),
      col("o_orderdate").as("d"))
    val d97 = lit("1997-01-01").cast("date")
    val cells = o.filter(col("d") < d97)
      .groupBy("a", "b").agg(count(lit(1)).as("n"))
    val rowT = o.groupBy("a").agg(count(lit(1)).as("ta"))
    val colT = o.groupBy("b").agg(count(lit(1)).as("tb"))
    rake(cells, rowT, colT, iters = 3)
  }

  def oracleSql: String = {
    def rowStep(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT c.a, c.b, c.n, (c.w * 1000 * rt.ta) // rs.s AS w
         |  FROM $prev c
         |  JOIN (SELECT a, sum(n * w) AS s FROM $prev GROUP BY 1) rs
         |    USING (a)
         |  JOIN rt USING (a)
         |)""".stripMargin
    def colStep(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT c.a, c.b, c.n, (c.w * 1000 * ct.tb) // cs.s AS w
         |  FROM $prev c
         |  JOIN (SELECT b, sum(n * w) AS s FROM $prev GROUP BY 1) cs
         |    USING (b)
         |  JOIN ct USING (b)
         |)""".stripMargin
    val sweeps = (1 to 3).flatMap(i => Seq(
      rowStep(if (i == 1) "w0" else s"c${i - 1}", s"r$i"),
      colStep(s"r$i", s"c$i"))).mkString(",\n")
    s"""WITH o AS (
       |  SELECT o_orderpriority AS a, o_custkey % 5 AS b,
       |    o_orderdate AS d
       |  FROM orders
       |), cells AS (
       |  SELECT a, b, CAST(count(*) AS HUGEINT) AS n
       |  FROM o WHERE d < DATE '1997-01-01' GROUP BY 1, 2
       |), rt AS (
       |  SELECT a, CAST(count(*) AS HUGEINT) AS ta FROM o GROUP BY 1
       |), ct AS (
       |  SELECT b, CAST(count(*) AS HUGEINT) AS tb FROM o GROUP BY 1
       |), w0 AS (
       |  SELECT a, b, n, CAST(1000 AS HUGEINT) AS w FROM cells
       |),
       |$sweeps
       |SELECT a, CAST(b AS BIGINT) AS b, CAST(n AS BIGINT) AS n_sample,
       |  CAST(w AS BIGINT) AS w_milli,
       |  CAST((n * w) // 1000 AS BIGINT) AS est
       |FROM c3""".stripMargin
  }
}
