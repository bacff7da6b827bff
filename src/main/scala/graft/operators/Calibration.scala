package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Reliability-diagram statistics: equal-frequency score bins with per-bin
  * observed label rates — the calibration companion of [[ExactAuc]] (AUC
  * ranks; calibration asks whether the score's LEVEL is honest), feeding
  * the same model-eval loop as the reference's evaluator
  * (/root/reference/DataEngineering/DataBricks/spark_randomforest.py:66-72).
  *
  * Exactness: bins are [[Ranks.ntileExact]] — bit-identical to SQL
  * `ntile(k)` under a total order (score cents, id tie-break) at any
  * data size — so bin membership is deterministic cross-engine. Per-bin
  * sums are exact BIGINTs; the two micros means are one fixed expression
  * per OUTPUT bin.
  *
  * Scale: the global rank inside ntileExact is the two-phase
  * range-partition form; the bin aggregate has fixed cardinality k.
  */
object Calibration {

  /** (bin, n, pos, mean_label_micros, mean_score_cents_micros) over
    * `bins` equal-frequency score bins. Overflow headroom: the binding
    * sum is Σ score-cents per bin (≤ binRows · maxCents); at 1e12-row
    * bins keep scores under ~1e7 cents or pre-scale — ANSI mode throws
    * rather than wraps, so the failure is loud. */
  def bins(df: DataFrame, idCol: String, scoreCol: String,
           labelCol: String, bins: Int): DataFrame = {
    val cells = df.select(col(idCol).as("__id"),
      round(col(scoreCol) * 100).cast("long").as("__s"),
      col(labelCol).cast("long").as("__y"))
    Ranks.ntileExact(cells, Seq(col("__s"), col("__id")), bins, "bin")
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("__y").as("pos"),
        sum("__s").as("__ssum"))
      .withColumn("mean_label_micros",
        round(col("pos").cast("double") / col("n") * lit(1e6)).cast("long"))
      .withColumn("mean_score_cents_micros",
        round(col("__ssum").cast("double") / col("n") * lit(1e6)).cast("long"))
      .select("bin", "n", "pos", "mean_label_micros", "mean_score_cents_micros")
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: event value deciles against the user-parity label
    * (A/A-style — flat reliability expected; the binning + exact means
    * are what hash-gate). */
  def calibrationEvents(spark: SparkSession, dir: String): DataFrame =
    bins(Tables.events(spark, dir).withColumn("__lbl", expr("user_id % 2")),
      "event_id", "value", "__lbl", bins = 10)

  def oracleSql: String =
    """WITH c AS (
      |  SELECT event_id AS id, CAST(round(value * 100) AS BIGINT) AS s,
      |    user_id % 2 AS y
      |  FROM events
      |), t AS (
      |  SELECT ntile(10) OVER (ORDER BY s, id) AS bin, s, y FROM c
      |)
      |SELECT CAST(bin AS INT) AS bin, count(*) AS n,
      |  CAST(sum(y) AS BIGINT) AS pos,
      |  CAST(round(CAST(sum(y) AS DOUBLE) / count(*) * 1e6) AS BIGINT)
      |    AS mean_label_micros,
      |  CAST(round(CAST(sum(s) AS DOUBLE) / count(*) * 1e6) AS BIGINT)
      |    AS mean_score_cents_micros
      |FROM t GROUP BY bin""".stripMargin

  /** Cumulative gains / lift table — the campaign-targeting view of the
    * same ranked scores: bin 1 is the TOP score decile, and each row
    * answers "mailing the top d deciles captures what share of all
    * positives, at what lift over random". The decision-support twin of
    * [[bins]] (calibration asks if the level is honest; lift asks how
    * much better than random the ORDER is — both consume one ranked
    * pass). Exact integers: cumulative sums run over the k-row bin
    * table, lift = 10⁶·cum_pos·N div (cum_n·P) with every term a
    * non-negative BIGINT (N·cum_pos ≤ n·P; at 10⁹ rows × 10⁹ positives
    * the product needs DECIMAL — kept BIGINT here with documented
    * headroom n·P < 9.2e18, the same dial as [[ExactAuc]]).
    *
    * Scale: [[Ranks.ntileExact]]'s two-phase global rank over the fact,
    * one k-row aggregate, one window over k rows. Degenerate inputs
    * (zero positives) emit NULL lift. */
  def liftDeciles(df: DataFrame, idCol: String, scoreCol: String,
                  labelCol: String, k: Int): DataFrame = {
    val cells = df.select(col(idCol).as("__id"),
      round(col(scoreCol) * 100).cast("long").as("__s"),
      col(labelCol).cast("long").as("__y"))
    val binned = Ranks.ntileExact(cells,
        Seq(col("__s").desc, col("__id").asc), k, "bin")
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("__y").as("pos"))
    val wCum = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    binned
      .withColumn("cum_n", sum("n").over(wCum))
      .withColumn("cum_pos", sum("pos").over(wCum))
      .withColumn("__tot_n", sum("n").over(wAll))
      .withColumn("__tot_pos", sum("pos").over(wAll))
      .select(col("bin"), col("n"), col("pos"), col("cum_n"), col("cum_pos"),
        expr("""CASE WHEN __tot_pos > 0
                THEN (1000000 * cum_pos) div __tot_pos END""")
          .as("capture_permicro"),
        expr("""CASE WHEN __tot_pos > 0
                THEN (1000000 * cum_pos * __tot_n) div (cum_n * __tot_pos) END""")
          .as("cum_lift_permicro"))
  }

  /** Gated instance: purchase-capture lift of the value-cents ranking —
    * "do high-value events concentrate purchases" as a 10-row table. */
  def liftEvents(spark: SparkSession, dir: String): DataFrame =
    liftDeciles(
      Tables.events(spark, dir)
        .withColumn("__lbl", (col("event_type") === "purchase").cast("long")),
      "event_id", "value", "__lbl", k = 10)

  def liftOracleSql: String =
    """WITH c AS (
      |  SELECT event_id AS id, CAST(round(value * 100) AS BIGINT) AS s,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      |  FROM events
      |), t AS (
      |  SELECT ntile(10) OVER (ORDER BY s DESC, id ASC) AS bin, y FROM c
      |), b AS (
      |  SELECT CAST(bin AS INT) AS bin, count(*) AS n,
      |    CAST(sum(y) AS BIGINT) AS pos
      |  FROM t GROUP BY bin
      |), cum AS (
      |  SELECT bin, n, pos,
      |    CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cum_n,
      |    CAST(sum(pos) OVER (ORDER BY bin) AS BIGINT) AS cum_pos,
      |    CAST(sum(n) OVER () AS BIGINT) AS tot_n,
      |    CAST(sum(pos) OVER () AS BIGINT) AS tot_pos
      |  FROM b
      |)
      |SELECT bin, n, pos, cum_n, cum_pos,
      |  CASE WHEN tot_pos > 0
      |    THEN (1000000 * cum_pos) // tot_pos END AS capture_permicro,
      |  CASE WHEN tot_pos > 0
      |    THEN (1000000 * cum_pos * tot_n) // (cum_n * tot_pos) END
      |    AS cum_lift_permicro
      |FROM cum""".stripMargin
}
