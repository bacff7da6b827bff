package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** EWMA control chart over the daily event spine — the
  * small-persistent-shift monitor beside [[Changepoint]]'s CUSUM (CUSUM
  * localizes a single break; the EWMA line tracks the current process
  * level and flags days that break away from it), the batch twin of a
  * streaming rate monitor over the reference's ingestion
  * (/root/reference/DataEngineering/DataBricks/spark_stream.py).
  *
  * Exact by finite geometry: the infinite EWMA recursion
  * S_t = λx_t + (1−λ)S_{t−1} with λ = 1/4 is truncated to an H = 16
  * day horizon — S_t = Σ_{k<16} 3ᵏ·4¹⁵⁻ᵏ·x_{t−k} / 4¹⁶, a DECLARED
  * ~1% tail truncation ((3/4)¹⁶) that buys integer-exact coefficients:
  * the numerator is a DECIMAL(38,0) dot product of BIGINT lag columns
  * with constant powers, the denominator 4¹⁶ = 2³² a single truncating
  * division to permicro. Days with an incomplete horizon report NULL
  * (lag propagation), and the alert flag is pure integer arithmetic:
  * |10⁶·x_t − S_{t−1}|·4 > S_{t−1}, i.e. a >25% break from yesterday's
  * line. The spine densifies missing (type, day) cells to 0 first —
  * lag distances are calendar days, not row offsets.
  *
  * Scale: spine is calendar × type bounded; ONE WindowExec partitioned
  * by event_type serves all 16 lags and the alert lag. The 100 TB cost
  * is the scan to daily counts.
  */
object EwmaChart {

  private val Lam = 3L   // (1-λ) numerator with λ = 1/4
  private val Base = 4L
  private val H = 16

  /** (event_type, day, x, ewma_permicro, alert) over a dense daily
    * count spine. */
  def chart(events: DataFrame, typeCol: String, tsCol: String): DataFrame = {
    val daily = events.select(col(typeCol).as("event_type"),
        col(tsCol).cast("date").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
    val bounds = daily.agg(min(col("day")).as("__lo"), max(col("day")).as("__hi"))
    val spine = daily.select("event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("__lo"), col("__hi"), expr("interval 1 day")))
          .as("day"))
    val dense = spine.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n"), lit(0L)).as("x"))
    val w = Window.partitionBy("event_type").orderBy("day")
    // numerator: Σ 3^k·4^(15-k)·x_{t-k} — constant DECIMAL coefficients
    val num = (0 until H).map { k =>
      val c = BigInt(Lam).pow(k) * BigInt(Base).pow(H - 1 - k)
      lit(c.toString).cast("decimal(38,0)") * lag(col("x"), k).over(w)
    }.reduce(_ + _)
    val denom = BigInt(Base).pow(H)
    dense
      .withColumn("__num", num)
      .withColumn("ewma_permicro",
        expr(s"(CAST(1000000 AS DECIMAL(38,0)) * __num) div ${denom}L"))
      .withColumn("__prev", lag(col("ewma_permicro"), 1).over(w))
      .select(col("event_type"), col("day"), col("x"),
        col("ewma_permicro"),
        (abs(lit(1000000L) * col("x") - col("__prev")) * lit(4L) >
          col("__prev")).as("alert"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: daily event counts per event type. */
  def ewmaEvents(spark: SparkSession, dir: String): DataFrame =
    chart(Tables.events(spark, dir), "event_type", "ts")

  def oracleSql: String = {
    val terms = (0 until H).map { k =>
      val c = BigInt(Lam).pow(k) * BigInt(Base).pow(H - 1 - k)
      s"$c * lag(x, $k) OVER (PARTITION BY event_type ORDER BY day)"
    }.mkString("\n      |      + ")
    val denom = BigInt(Base).pow(H)
    s"""WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2
      |), bounds AS (
      |  SELECT min(day) AS lo, max(day) AS hi FROM daily
      |), spine AS (
      |  SELECT t.event_type, CAST(unnest(generate_series(b.lo, b.hi,
      |    INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM (SELECT DISTINCT event_type FROM daily) t CROSS JOIN bounds b
      |), dense AS (
      |  SELECT s.event_type, s.day, coalesce(d.n, 0) AS x
      |  FROM spine s LEFT JOIN daily d
      |    ON d.event_type = s.event_type AND d.day = s.day
      |), acc AS (
      |  SELECT event_type, day, x,
      |    CAST($terms AS HUGEINT) AS num
      |  FROM dense
      |), line AS (
      |  SELECT event_type, day, x,
      |    CAST((1000000 * num) // $denom AS BIGINT) AS ewma_permicro
      |  FROM acc
      |)
      |SELECT event_type, day, x, ewma_permicro,
      |  abs(1000000 * x - lag(ewma_permicro, 1)
      |      OVER (PARTITION BY event_type ORDER BY day)) * 4
      |    > lag(ewma_permicro, 1)
      |      OVER (PARTITION BY event_type ORDER BY day) AS alert
      |FROM line""".stripMargin
  }
}
