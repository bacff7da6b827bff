package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Sketch-based approximate statistics — the operators a 100 TB curation
  * pass reaches for when exact distinct counts or quantiles would force a
  * full shuffle of the key universe:
  *
  *   - approx distinct: HyperLogLog++ (`approx_count_distinct`) keeps a
  *     fixed ~kilobyte sketch per group and merges map-side, so the
  *     shuffle carries sketches, not keys. Relative standard deviation is
  *     the accuracy knob.
  *   - approx quantiles: Greenwald-Khanna (`percentile_approx`) with a
  *     bounded buffer per group, mergeable the same way. `accuracy`
  *     trades memory for rank error (err ≤ 1/accuracy · n).
  *
  * Both sketches are deterministic for a given dataset + parameters, so
  * results are stable across runs. Driver-gated rows-only (the DuckDB
  * twin computes different sketch internals, so there is no hash oracle);
  * the tolerance against exact answers — HLL within a multiple of rsd,
  * GK within the guaranteed rank error — is asserted in SketchSpec.
  */
object Sketches {

  /** Per-event-type approximate distinct users next to the exact row
    * count (the exact count is free — same shuffle). rsd=0.02 ⇒ the HLL
    * estimate is within ~2% of truth at one sigma. */
  def approxDistinct(df: DataFrame, keyCol: String, distinctCol: String,
                     rsd: Double = 0.02): DataFrame =
    df.groupBy(keyCol)
      .agg(
        approx_count_distinct(col(distinctCol), rsd).as("approx_distinct"),
        count(lit(1)).as("n_rows"))

  /** Per-group approximate quantiles of a value column. */
  def approxQuantiles(df: DataFrame, keyCol: String, valCol: String,
                      qs: Seq[Double] = Seq(0.5, 0.9, 0.99),
                      accuracy: Int = 10000): DataFrame =
    df.groupBy(keyCol)
      .agg(percentile_approx(col(valCol),
        array(qs.map(lit): _*), lit(accuracy)).as("quantiles"))

  /** [[approxQuantiles]] exploded to one scalar row per (group, q) — the
    * driver-gated shape (its result compare handles scalar columns, not
    * arrays), and the friendlier downstream shape anyway. */
  def approxQuantilesLong(df: DataFrame, keyCol: String, valCol: String,
                          qs: Seq[Double] = Seq(0.5, 0.9, 0.99),
                          accuracy: Int = 10000): DataFrame =
    approxQuantiles(df, keyCol, valCol, qs, accuracy)
      .select(col(keyCol), posexplode(col("quantiles")).as(Seq("__pos", "quantile_value")))
      .withColumn("q", element_at(array(qs.map(lit): _*), col("__pos") + 1))
      .select(col(keyCol), col("q"), col("quantile_value"))

  // ---- portable grouped quantile summary (engine-identical) ----

  /** Rank-error denominator: the summary keeps ~EpsDen grid ranks per
    * group, so a quantile answer's rank is within n/EpsDen of target —
    * the ε-guarantee a GK summary of the same size gives. */
  val GkEpsDen = 200L

  /** Value-side quantization (cents → whole dollars): bounds the cell
    * table at DOMAIN cardinality so the sketch build never sorts the
    * corpus — the same value-cell discipline as rank_transform. */
  val GkValueScale = 100L

  /** The explicit mergeable quantile summary, grouped: per group, the
    * (rank, value) pairs at every grid rank G = max(1, ⌊n/EpsDen⌋)
    * plus the final rank n — exactly the summary a Greenwald-Khanna
    * sketch compresses to (ε·n rank error), but ORDER-FREE and
    * integer-exact, so both engines build it bit-identically.
    *
    * Mergeable state: the (group, dollar-cell) partial counts — counts
    * add across partitions/batches (map-side combine does the merge),
    * and the summary is a deterministic function of the merged cells.
    * At 100 TB the shuffle carries ≤ |domain| cells per group, the
    * per-group window runs at cell cardinality, and the summary is
    * ~EpsDen rows per group. Error contract: rank within n/EpsDen AND
    * value within one GkValueScale cell. */
  def gkSummary(df: DataFrame, grpCol: String, valCentsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = col(grpCol)
    val cells = df
      .select(g, expr(s"CAST($valCentsCol AS BIGINT) div $GkValueScale").as("__v"))
      .groupBy(g, col("__v")).agg(count(lit(1)).as("__c"))
    val wOrd = Window.partitionBy(g).orderBy(col("__v"))
    val wAll = Window.partitionBy(g)
    val cum = cells
      .withColumn("__hi", sum("__c").over(wOrd))
      .withColumn("__n", sum("__c").over(wAll))
      .withColumn("__lo", col("__hi") - col("__c") + 1)
      .withColumn("__G", greatest(lit(1L), expr(s"__n div $GkEpsDen")))
    val grid = cum
      // Spark's sequence(a, b) DESCENDS when a > b (DuckDB's
      // generate_series is empty) — cells covering no grid rank must
      // emit nothing, so guard the bounds explicitly
      .withColumn("r", explode(expr(
        """CASE WHEN (__lo + __G - 1) div __G <= __hi div __G
          |THEN sequence((__lo + __G - 1) div __G, __hi div __G)
          |ELSE array() END""".stripMargin)))
      .select(g, (col("r") * col("__G")).as("r"), col("__v").as("v"),
        col("__n").as("n"), col("__G").as("grid_step"))
    val tail = cum.filter(col("__hi") === col("__n") && col("__n") % col("__G") =!= 0)
      .select(g, col("__n").as("r"), col("__v").as("v"),
        col("__n").as("n"), col("__G").as("grid_step"))
    grid.unionByName(tail)
  }

  /** Quantile answers off the summary: for each q (permille), the
    * summary value at the smallest grid rank ≥ ⌈q·n/1000⌉. */
  def gkQuantiles(df: DataFrame, grpCol: String, valCentsCol: String,
                  qPermilles: Seq[Long]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val s = gkSummary(df, grpCol, valCentsCol)
    val qs = qPermilles.toDF("q_permille")
    s.crossJoin(broadcast(qs))
      .filter(col("r") * 1000 >= col("q_permille") * col("n"))
      .groupBy(col(grpCol), col("q_permille"))
      .agg(
        min(col("n")).as("n"), min(col("grid_step")).as("grid_step"),
        min(struct(col("r"), col("v"))).getField("v").as("quantile_dollars"))
      .select(col(grpCol), col("q_permille"), col("n"), col("grid_step"),
        col("quantile_dollars"))
  }

  // ---- query-map entries ----

  def sketchDistinctEvents(spark: SparkSession, dir: String): DataFrame =
    approxDistinct(Tables.events(spark, dir), "event_type", "user_id")

  /** HASH-gated (re-pointed r18, the sketch_distinct_events move):
    * per-returnflag price quantiles from the portable grouped summary.
    * The Spark-native percentile_approx variant stays available as
    * [[sketchQuantilesNative]] (spec-gated in SketchSpec — its GK buffer
    * internals are engine-specific and can never hash-match an oracle). */
  def sketchQuantilesLineitem(spark: SparkSession, dir: String): DataFrame =
    gkQuantiles(
      Tables.lineitem(spark, dir)
        .select(col("l_returnflag"),
          round(col("l_extendedprice") * 100).cast("long").as("cents")),
      "l_returnflag", "cents", qPermilles = Seq(250L, 500L, 750L, 990L))

  /** The API-parity variant over Spark's own percentile_approx (GK
    * internals — engine-specific, so never oracle-hashable). Spec-gated
    * by SketchSpec's "sketchQuantilesNative" test: default qs/accuracy
    * must honor the GK rank-error bound against exact sorted data. */
  def sketchQuantilesNative(spark: SparkSession, dir: String): DataFrame =
    approxQuantilesLong(Tables.lineitem(spark, dir), "l_returnflag", "l_extendedprice")

  def gkOracleSql: String =
    s"""WITH cells AS (
       |  SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT)
       |    // $GkValueScale AS v, count(*) AS c
       |  FROM lineitem GROUP BY 1, 2
       |), cum AS (
       |  SELECT l_returnflag, v, c,
       |    sum(c) OVER (PARTITION BY l_returnflag ORDER BY v) AS hi,
       |    sum(c) OVER (PARTITION BY l_returnflag) AS n
       |  FROM cells
       |), geared AS (
       |  SELECT l_returnflag, v, hi - c + 1 AS lo, hi, n,
       |    greatest(1, n // $GkEpsDen) AS g
       |  FROM cum
       |), grid AS (
       |  SELECT l_returnflag, k * g AS r, v, n, g
       |  FROM geared,
       |    unnest(generate_series(CAST((lo + g - 1) // g AS BIGINT),
       |      CAST(hi // g AS BIGINT))) AS u(k)
       |  UNION ALL
       |  SELECT l_returnflag, n AS r, v, n, g
       |  FROM geared WHERE hi = n AND n % g <> 0
       |), qs(q_permille) AS (VALUES (250), (500), (750), (990))
       |SELECT l_returnflag, CAST(q_permille AS BIGINT) AS q_permille,
       |  CAST(min(n) AS BIGINT) AS n,
       |  CAST(min(g) AS BIGINT) AS grid_step,
       |  CAST(min_by(v, r) AS BIGINT) AS quantile_dollars
       |FROM grid JOIN qs ON r * 1000 >= q_permille * n
       |GROUP BY 1, 2""".stripMargin

  /** Degeneracy gate (the ann_*_exhaustive trick): GK with accuracy ≥ n
    * retains every observation, so the "approximate" path returns the
    * EXACT discrete quantile element — and can share an exact DuckDB
    * oracle, hash-gating the whole sketch machinery (buffer, merge,
    * rank query) rather than rows-only. */
  def sketchQuantilesExact(spark: SparkSession, dir: String): DataFrame =
    approxQuantilesLong(Tables.lineitem(spark, dir), "l_returnflag",
      "l_quantity", qs = Seq(0.25, 0.5, 0.75, 0.99), accuracy = 10000000)

  def quantilesExactOracleSql: String =
    Seq(0.25, 0.5, 0.75, 0.99).map { q =>
      s"""SELECT l_returnflag, CAST($q AS DOUBLE) AS q,
         |  quantile_disc(l_quantity, $q) AS quantile_value
         |FROM lineitem GROUP BY l_returnflag""".stripMargin
    }.mkString("\nUNION ALL\n")
}
