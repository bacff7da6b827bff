package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Conversion-lag histogram: for every trigger event, the time to the
  * user's NEXT target event, bucketed — the "how long from view to
  * purchase" distribution behind funnel SLAs and attribution windows
  * ([[Funnel]] counts who converts; this measures HOW FAST). Built on
  * [[AsOfJoin.asOf]]'s forward direction, so the cost envelope is one
  * tagged-union shuffle per key plus the fixed-cardinality lag
  * aggregate.
  *
  * Exactness: lags are exact epoch-micros differences, buckets integer
  * division (non-negative by construction — the forward as-of only
  * matches at-or-after), counts exact. Unconverted triggers land in
  * bucket −1 so the histogram accounts for every trigger row.
  */
object ConversionLag {

  /** (lag_bucket, n): bucket = lagMicros DIV `bucketMicros`; −1 =
    * trigger never converted. */
  def lagHistogram(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, idCol: String,
                   triggerType: String, targetType: String,
                   bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, "bucket must be positive")
    val dedupW = Window.partitionBy(userCol, tsCol).orderBy(col(idCol).desc)
    val targets = events.filter(col(typeCol) === targetType)
      .select(col(userCol), col(tsCol), col(idCol))
      .withColumn("__rn", row_number().over(dedupW))
      .filter(col("__rn") === 1)
      .select(col(userCol), col(tsCol),
        unix_micros(col(tsCol)).as("target_us"))
    val triggers = events.filter(col(typeCol) === triggerType)
      .select(col(userCol), col(idCol), col(tsCol))
    AsOfJoin.asOf(triggers, targets, Seq(userCol), tsCol, forward = true)
      .withColumn("lag_bucket",
        when(col("target_us").isNull, lit(-1L))
          .otherwise(expr(s"(target_us - unix_micros($tsCol)) DIV $bucketMicros")))
      .groupBy("lag_bucket").agg(count(lit(1)).as("n"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: view→purchase lag in hour buckets. */
  def viewPurchaseLag(spark: SparkSession, dir: String): DataFrame =
    lagHistogram(Tables.events(spark, dir), "user_id", "ts", "event_type",
      "event_id", triggerType = "view", targetType = "purchase",
      bucketMicros = 3600000000L)

  def oracleSql: String =
    """WITH targets AS (
      |  SELECT user_id, ts, epoch_us(ts) AS target_us FROM events
      |  WHERE event_type = 'purchase'
      |  QUALIFY row_number() OVER (PARTITION BY user_id, ts
      |                             ORDER BY event_id DESC) = 1
      |), triggers AS (
      |  SELECT user_id, event_id, ts FROM events WHERE event_type = 'view'
      |), matched AS (
      |  SELECT t.event_id, t.ts, g.target_us
      |  FROM triggers t LEFT JOIN targets g
      |    ON g.user_id = t.user_id AND g.ts >= t.ts
      |  QUALIFY row_number() OVER (PARTITION BY t.event_id ORDER BY g.ts) = 1
      |)
      |SELECT CASE WHEN target_us IS NULL THEN -1
      |            ELSE (target_us - epoch_us(ts)) // 3600000000 END AS lag_bucket,
      |  count(*) AS n
      |FROM matched GROUP BY 1""".stripMargin
}
