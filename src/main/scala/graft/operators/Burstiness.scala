package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Inter-arrival burstiness statistics per event type — the temporal
  * texture of a stream: exponential/Poisson arrivals give Fano ≈ mean
  * and burstiness B ≈ 0, human/bursty traffic gives heavy gap tails
  * with B → 1, metronome bots give B → −1. These are the arrival-side
  * companions of [[Sessionize]] (which thresholds the SAME gaps) and
  * the drift monitors ([[Drift]]): a burstiness shift flags a traffic-
  * mix change before any volume metric moves. Feed is the reference's
  * streaming ingestion
  * (/root/reference/DataEngineering/DataBricks/spark_stream.py).
  *
  * Exactness: gaps are integer SECONDS between consecutive same-type
  * events of one user ((ts, event_id) total order); per-type moments
  * are BIGINT/DECIMAL sufficient statistics; σ comes from the exact
  * Newton-clamped integer sqrt of the n²-scaled variance
  * ([[Allocation.isqrtSql]] — isqrt(n·Σg² − (Σg)²) = n·σ exactly, so
  * σ and μ share the n scale and the B ratio needs no float):
  *   fano_ppm = 10⁶·(nΣg²−(Σg)²) div (n·Σg),
  *   burstiness_ppm = ±10⁶·|nσ − Σg| div (nσ + Σg).
  * DECIMAL(38,0) headroom: Σg² ≤ n·(3·10⁷s)² keeps 10⁶·ssn inside 38
  * digits to n ≈ 10¹¹ gaps per type with year-long worst-case gaps —
  * the 100 TB envelope for any realistic gap distribution.
  *
  * Scale: one shuffle keyed (user, type) for the lag windows (healthy
  * per-user partitions), then one map-side-combined aggregate to the
  * |event types| spine. The 100 TB cost is the scan.
  */
object Burstiness {

  /** Per-group inter-arrival stats over (actorCol, grpCol, tsCol,
    * idCol): (grp, n_gaps, mean_gap_s, ssn, fano_ppm,
    * burstiness_ppm). ssn = n·Σg²−(Σg)² reports as a VARCHAR digit
    * string (DECIMAL internal); groups with < 2 events per every
    * actor emit no row (no gaps). */
  def interArrival(df: DataFrame, actorCol: String, grpCol: String,
                   tsCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(actorCol), col(grpCol))
      .orderBy(col(tsCol), col(idCol))
    val gaps = df
      .withColumn("__prev", lag(unix_micros(col(tsCol)), 1).over(w))
      .filter(col("__prev").isNotNull)
      .select(col(grpCol).as("grp"),
        expr(s"(unix_micros($tsCol) - __prev) div 1000000").as("g"))
    gaps.groupBy("grp")
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("g")).cast("decimal(38,0)").as("sg"),
        sum(col("g").cast("decimal(38,0)") * col("g")).as("sgg"))
      .withColumn("ssn", expr("n_gaps * sgg - sg * sg"))
      .withColumn("__nsigma", expr(Allocation.isqrtSql("ssn")))
      .select(col("grp"), col("n_gaps"),
        expr("sg div n_gaps").as("mean_gap_s"),
        col("ssn").cast("string").as("ssn"),
        expr("""CASE WHEN sg > 0 THEN
            (1000000 * ssn) div (n_gaps * sg) END""").as("fano_ppm"),
        expr("""CASE WHEN __nsigma + sg > 0 THEN
            (CASE WHEN __nsigma < sg THEN -1L ELSE 1L END)
              * ((1000000 * abs(__nsigma - sg)) div (__nsigma + sg))
            END""").as("burstiness_ppm"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: per-user same-type event gaps, aggregated per
    * event type. */
  def burstinessEvents(spark: SparkSession, dir: String): DataFrame =
    interArrival(Tables.events(spark, dir), "user_id", "event_type",
      "ts", "event_id")

  def oracleSql: String = {
    val isqrt = Allocation.isqrtDuckSql("ssn")
    s"""WITH gaps AS (
      |  SELECT event_type AS grp,
      |    (epoch_us(ts) - lag(epoch_us(ts)) OVER (
      |      PARTITION BY user_id, event_type ORDER BY ts, event_id))
      |      // 1000000 AS g
      |  FROM events
      |  QUALIFY g IS NOT NULL
      |), s AS (
      |  SELECT grp, CAST(count(*) AS BIGINT) AS n_gaps,
      |    CAST(sum(g) AS HUGEINT) AS sg,
      |    CAST(sum(CAST(g AS HUGEINT) * g) AS HUGEINT) AS sgg
      |  FROM gaps GROUP BY grp
      |), v AS (
      |  SELECT grp, n_gaps, sg, n_gaps * sgg - sg * sg AS ssn
      |  FROM s
      |), r AS (
      |  SELECT grp, n_gaps, sg, ssn, $isqrt AS nsigma
      |  FROM v
      |)
      |SELECT grp, n_gaps,
      |  CAST(sg // n_gaps AS BIGINT) AS mean_gap_s,
      |  CAST(ssn AS VARCHAR) AS ssn,
      |  CASE WHEN sg > 0 THEN CAST(
      |    (1000000 * ssn) // (n_gaps * sg) AS BIGINT) END AS fano_ppm,
      |  CASE WHEN nsigma + sg > 0 THEN CAST(
      |    (CASE WHEN nsigma < sg THEN -1 ELSE 1 END)
      |      * ((1000000 * abs(nsigma - sg)) // (nsigma + sg)) AS BIGINT)
      |  END AS burstiness_ppm
      |FROM r""".stripMargin
  }
}
