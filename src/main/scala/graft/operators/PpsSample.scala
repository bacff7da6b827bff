package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Systematic probability-proportional-to-size (PPS) sampling — draw
  * ~k units per stratum with inclusion probability proportional to an
  * integer size measure, the survey-design workhorse that pairs with
  * [[Allocation]] (how many per stratum) and [[IpfRake]] (reweight
  * afterwards): lay the units on a line scaled by cumulative size and
  * take every stride-th point. Fully deterministic and exact — the
  * systematic start is pinned at stride boundaries (start offset 0),
  * so the sample is a pure function of the data and hash-gates; a
  * production draw would thread a random start through the same
  * arithmetic.
  *
  * Exactness: stride = W div k (integer); unit u with cumulative
  * window (lo, hi] is hit floor(hi/stride) − floor(lo/stride) times —
  * all integer divisions, no float. Units larger than the stride get
  * multiplicity > 1 (the standard certainty-unit behavior, reported
  * not hidden).
  *
  * Scale shape: the cumulative sum reuses [[SaltedCumSum]] — the
  * skew-proof salted cumsum, NOT a single-task per-stratum window —
  * then hit counting is a per-row expression. The 100 TB cost is one
  * scan + the salted cumsum's two bounded shuffles.
  */
object PpsSample {

  /** PPS-systematic hits per unit: input (strata, order, weight) →
    * rows with hits ≥ 1: (.., cum_hi, hits). `k` target draws per
    * stratum; strata whose total weight < k draw every unit once per
    * stride-0 guard (stride clamps to ≥ 1). */
  def draw(units: DataFrame, strataCols: Seq[String], orderCol: String,
           weightCol: String, k: Int, saltWidth: Long = 1024L): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // the salt must be MONOTONE in the order column — SaltedCumSum's
    // effective cumulative order is (salt, order), so range buckets
    // (key div width) preserve the line layout; a modulo salt would
    // silently permute it
    val withCum = SaltedCumSum(
      units, strataCols, Seq(col(orderCol)), weightCol,
      saltCol = expr(s"$orderCol div $saltWidth"),
      out = "cum_hi")
      // SaltedCumSum keeps long weights long (typed offset zero); the
      // cast is a no-op that pins the integer contract the stride
      // arithmetic needs
      .withColumn("cum_hi", col("cum_hi").cast("long"))
    val wTot = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
    withCum
      .withColumn("__w_total", sum(col(weightCol)).over(wTot))
      .withColumn("__stride",
        greatest(expr(s"__w_total div $k"), lit(1L)))
      .withColumn("hits", expr(
        s"""cum_hi div __stride
           |  - (cum_hi - $weightCol) div __stride""".stripMargin))
      .filter(col("hits") >= 1)
      .drop("__w_total", "__stride")
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: ~50 customers per market segment, probability
    * proportional to account balance cents (shifted positive). */
  def ppsCustomers(spark: SparkSession, dir: String): DataFrame = {
    val units = Tables.customer(spark, dir).select(
      col("c_mktsegment").as("seg"),
      col("c_custkey").as("custkey"),
      // balances can be negative: shift to a positive size measure
      (round(col("c_acctbal") * 100).cast("long") + lit(100000L)).as("w"))
    draw(units, Seq("seg"), "custkey", "w", k = 50)
      .select(col("seg"), col("custkey"), col("w"),
        col("cum_hi").cast("long").as("cum_hi"),
        col("hits").cast("long").as("hits"))
  }

  def oracleSql: String =
    """WITH units AS (
      |  SELECT c_mktsegment AS seg, c_custkey AS custkey,
      |    CAST(round(c_acctbal * 100) AS BIGINT) + 100000 AS w
      |  FROM customer
      |), cum AS (
      |  SELECT seg, custkey, w,
      |    sum(w) OVER (PARTITION BY seg ORDER BY custkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_hi,
      |    sum(w) OVER (PARTITION BY seg) AS wt
      |  FROM units
      |), hit AS (
      |  SELECT seg, custkey, w, cum_hi,
      |    greatest(wt // 50, 1) AS stride
      |  FROM cum
      |)
      |SELECT seg, custkey, w, CAST(cum_hi AS BIGINT) AS cum_hi,
      |  CAST(cum_hi // stride - (cum_hi - w) // stride AS BIGINT) AS hits
      |FROM hit
      |WHERE cum_hi // stride - (cum_hi - w) // stride >= 1""".stripMargin
}
