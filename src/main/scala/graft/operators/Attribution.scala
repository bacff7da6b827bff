package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Marketing-style touch attribution over an event stream: credit each
  * conversion's revenue to the touch channel that preceded it (last-touch)
  * or that opened the user's journey (first-touch). The batch form of the
  * per-user ordered-event analysis the reference's stream feed supplies
  * (/root/reference/DataEngineering/DataBricks/spark_stream.py) — and a
  * different algorithmic shape from [[AsOfJoin]]: no second table, just a
  * carry-forward window over ONE pass of the stream.
  *
  * Scale: a single shuffle on the user key, one ordered window scan per
  * user (`last/first(_, ignoreNulls)` over an unbounded-preceding frame),
  * then a tiny per-channel aggregate that AQE coalesces. Revenue sums in
  * integer cents so partial-aggregation order can never flap a float sum
  * — the same exact-sum discipline as q9/q18.
  */
object Attribution {

  private def touchExpr(typeCol: Column, touches: Seq[String]): Column =
    when(typeCol.isin(touches: _*), typeCol)

  /** Per-channel attributed conversions and revenue cents.
    * `mode` = "last" (most recent touch at-or-before the conversion) or
    * "first" (earliest touch AT-OR-BEFORE the conversion — NOT the whole
    * user history: the frame ends at the conversion row, so a user whose
    * only touches come after a conversion credits that conversion to
    * "direct"). Conversions with no preceding touch land in "direct".
    *
    * Same-timestamp semantics: rows sharing a timestamp are ordered by
    * (event_type asc, id asc), so at the conversion's own timestamp a
    * touch type sorting BEFORE the conversion type (e.g. 'click' <
    * 'purchase') is visible to the frame while one sorting after (e.g.
    * 'view') is not. This asymmetry is deliberate: the tie-break must be
    * total and engine-portable (the oracle orders identically), and any
    * choice at exactly-equal timestamps is arbitrary — what matters is
    * that both engines make the SAME one. */
  def attribute(events: DataFrame, userCol: String, tsCol: String,
                typeCol: String, valueCol: String, idCol: String,
                touches: Seq[String], conversion: String,
                mode: String): DataFrame = {
    // idCol makes the per-user order TOTAL: without it, a view and a
    // click sharing one timestamp would leave "last touch" engine-defined
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(typeCol).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val touch = touchExpr(col(typeCol), touches)
    val channel = mode match {
      case "last"  => last(touch, ignoreNulls = true).over(w)
      case "first" => first(touch, ignoreNulls = true).over(w)
      case other   => throw new IllegalArgumentException(s"mode: $other")
    }
    events
      .withColumn("__channel", channel)
      .filter(col(typeCol) === conversion)
      .groupBy(coalesce(col("__channel"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(round(col(valueCol) * 100).cast("long")).as("revenue_cents"))
  }

  // ---- query-map entries (hash-gated) ----

  def attributionLastTouch(spark: SparkSession, dir: String): DataFrame =
    attribute(Tables.events(spark, dir), "user_id", "ts", "event_type",
      "value", "event_id", Seq("view", "click"), "purchase", mode = "last")

  def attributionFirstTouch(spark: SparkSession, dir: String): DataFrame =
    attribute(Tables.events(spark, dir), "user_id", "ts", "event_type",
      "value", "event_id", Seq("view", "click"), "purchase", mode = "first")

  private def oracle(fn: String): String =
    s"""WITH tagged AS (
       |  SELECT event_type, value,
       |    $fn(CASE WHEN event_type IN ('view','click') THEN event_type END
       |        IGNORE NULLS)
       |      OVER (PARTITION BY user_id ORDER BY ts, event_type, event_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ch
       |  FROM events
       |)
       |SELECT coalesce(ch, 'direct') AS channel,
       |  count(*) AS n_conversions,
       |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
       |FROM tagged WHERE event_type = 'purchase'
       |GROUP BY 1""".stripMargin

  def lastTouchOracleSql: String = oracle("last_value")
  def firstTouchOracleSql: String = oracle("first_value")
}
