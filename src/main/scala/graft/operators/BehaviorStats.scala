package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-stream behavioral statistics: Markov transition matrices and
  * recency-decayed user value — the per-user sequence summaries a
  * feature store derives from the reference's event feed
  * (/root/reference/DataEngineering/DataBricks/spark_stream.py supplies
  * the stream; generate_data.py's most-common-action and expanding
  * features are the same family).
  *
  * Both stay exact cross-engine: transition probabilities divide two
  * exact BIGINTs (one double op per OUTPUT row), and the decay uses
  * POWER-OF-TWO half-lives — `cents DIV 2^k` is integer arithmetic, so
  * unlike an `exp(-λ·age)` weighting there is no libm ulp disagreement
  * for a hash gate to trip over.
  */
object BehaviorStats {

  /** (from_type, to_type, n, prob_micros): adjacent event-type
    * transitions per actor (ordered by time, id tie-break), with
    * row-normalized probabilities. One window pass keyed on the actor,
    * one aggregate on the (from, to) pair — the same envelope as
    * sessionization. */
  def markovTransitions(events: DataFrame, userCol: String, tsCol: String,
                        typeCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val pairs = events
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .select(col(typeCol).as("from_type"), col("__next").as("to_type"))
    val counts = pairs.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    val fromTotals = counts.groupBy("from_type").agg(sum("n").as("__tot"))
    counts.join(fromTotals, "from_type")
      .withColumn("prob_micros",
        round(col("n").cast("double") / col("__tot") * lit(1e6)).cast("long"))
      .select("from_type", "to_type", "n", "prob_micros")
  }

  /** (user, n_events, decayed_cents): per-actor value sum where each
    * event's cents are halved per `halfLifeDays` of age relative to the
    * corpus' newest event (a broadcast single row, never a collect).
    * Halvings cap at 62 (beyond that the BIGINT is zero anyway).
    * Defined for non-negative values: on negatives, Spark's DIV
    * truncates toward zero while SQL `//` floors, so cross-engine
    * equality would not hold (and "decayed debt" has no meaning here) —
    * a negative value therefore FAILS the job at runtime (raise_error
    * inside the cents branch, which the optimizer cannot prune) instead
    * of silently poisoning the result. */
  def decayedValue(events: DataFrame, userCol: String, tsCol: String,
                   valueCol: String, halfLifeDays: Int): DataFrame = {
    require(halfLifeDays > 0, "half-life must be positive")
    val us = unix_micros(col(tsCol))
    val anchor = events.agg(max(unix_micros(col(tsCol))).as("__anchor"))
    val cents = round(col(valueCol) * 100).cast("long")
    val guarded = when(cents >= 0, cents).otherwise(raise_error(concat(
      lit(s"decayedValue: negative $valueCol — decay is undefined "),
      lit("for negative amounts (DIV truncation diverges cross-engine)"))))
    events
      .select(col(userCol).as("user_id"), us.as("__us"),
        guarded.as("__cents"))
      .crossJoin(broadcast(anchor))
      .withColumn("__halvings",
        expr(s"least((__anchor - __us) DIV ${86400000000L * halfLifeDays}, 62L)"))
      .withColumn("__decayed",
        expr("__cents DIV shiftleft(1L, CAST(__halvings AS INT))"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("__decayed").as("decayed_cents"))
  }

  // ---- query-map entries (hash-gated) ----

  def markovEvents(spark: SparkSession, dir: String): DataFrame =
    markovTransitions(Tables.events(spark, dir), "user_id", "ts",
      "event_type", "event_id")

  def decayedValueEvents(spark: SparkSession, dir: String): DataFrame =
    decayedValue(Tables.events(spark, dir), "user_id", "ts", "value",
      halfLifeDays = 7)

  def markovOracleSql: String =
    """WITH pairs AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS to_type
      |  FROM events
      |), c AS (
      |  SELECT from_type, to_type, count(*) AS n FROM pairs
      |  WHERE to_type IS NOT NULL GROUP BY 1, 2
      |), t AS (
      |  SELECT from_type, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1
      |)
      |SELECT c.from_type, c.to_type, c.n,
      |  CAST(round(CAST(c.n AS DOUBLE) / t.tot * 1e6) AS BIGINT) AS prob_micros
      |FROM c JOIN t USING (from_type)""".stripMargin

  def decayOracleSql: String =
    """WITH a AS (SELECT max(epoch_us(ts)) AS anchor FROM events)
      |SELECT user_id, count(*) AS n_events,
      |  CAST(sum(
      |    CAST(round(value * 100) AS BIGINT)
      |      // (CAST(1 AS BIGINT) << CAST(least(
      |          (a.anchor - epoch_us(ts)) // 604800000000, 62) AS INT))
      |  ) AS BIGINT) AS decayed_cents
      |FROM events CROSS JOIN a
      |GROUP BY user_id""".stripMargin
}
