package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Slowly-changing-dimension type 2 assembly from a change log.
  *
  * Re-expresses /root/reference/DataEngineering/DataBricks/apply_scd2.py:1-47:
  * for each natural key, every change row becomes a version with
  * `effective_date` (yyyyMMdd int), `expiration_date` = day before the next
  * version's effective date (20991231 for the open version), and
  * `current_version` = 1 on the row(s) carrying the key's max change date.
  *
  * Scale: two window scans over the same (key, ordered-by-change-date)
  * shuffle — Catalyst reuses one Exchange for both windows, so this is a
  * single shuffle on the natural key regardless of input size. Hot keys are
  * bounded by version-chain length, not table size, so no salting is needed.
  */
object Scd2 {

  /** @param tieBreak deterministic ordering tail for equal change dates */
  def apply(df: DataFrame, naturalKey: String, changeTs: String,
            tieBreak: Seq[String]): DataFrame = {
    val wAll = Window.partitionBy(naturalKey)
    val orderCols: Seq[Column] = col(changeTs) +: tieBreak.map(col)
    val wOrd = Window.partitionBy(naturalKey).orderBy(orderCols: _*)
    val fmt  = (c: Column) => date_format(c, "yyyyMMdd").cast("int")

    df.withColumn("__effDate", col(changeTs).cast("date"))
      .withColumn("__isCurrent", max(col(changeTs)).over(wAll) === col(changeTs))
      .withColumn("effective_date", fmt(col("__effDate")))
      .withColumn("expiration_date",
        when(col("__isCurrent"), lit(20991231))
          .otherwise(fmt(date_sub(lead(col("__effDate"), 1).over(wOrd), 1))))
      .withColumn("current_version", col("__isCurrent").cast("int"))
      .drop("__effDate", "__isCurrent")
  }

  /** Collapse a raw change log to the last change per (key, day) — the
    * reference's stated precondition ("one record is current for any given
    * day", apply_scd2.py:2-3). One window shuffle, reused by apply(). */
  def latestPerDay(df: DataFrame, naturalKey: String, changeTs: String,
                   tieBreak: Seq[String]): DataFrame = {
    val ord = (col(changeTs) +: tieBreak.map(col)).map(_.desc)
    val w = Window
      .partitionBy(col(naturalKey), col(changeTs).cast("date"))
      .orderBy(ord: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Query-map entry: SCD2 over the events change log keyed by user,
    * one version per (user, day). */
  def eventsScd2(spark: SparkSession, dir: String): DataFrame = {
    val changes = latestPerDay(
      Tables.events(spark, dir).select("user_id", "event_id", "ts"),
      "user_id", "ts", Seq("event_id"))
    apply(changes, naturalKey = "user_id", changeTs = "ts", tieBreak = Seq("event_id"))
      .select("user_id", "event_id", "effective_date", "expiration_date", "current_version")
  }

  /** Temporal (as-of) lookup against an SCD2 dimension: each fact row
    * joins the version whose [effective_date, expiration_date] validity
    * window contains the fact's date key. Composed from an equi-join on
    * the natural key plus a range predicate — Spark shuffles both sides
    * on the key once, and since version chains are short the per-key
    * range scan is O(chain), so the operator behaves like a plain
    * shuffle join at any scale (no custom physical operator needed). */
  def asOfLookup(facts: DataFrame, dim: DataFrame, key: String,
                 factDateKey: String): DataFrame =
    facts.join(dim,
      facts(key) === dim(key) &&
        facts(factDateKey) >= dim("effective_date") &&
        facts(factDateKey) <= dim("expiration_date"))
      .drop(dim(key))

  /** Query-map entry (extra beyond SURVEY §2): every event joined to the
    * user's SCD2 version active on the event's day; proves each event
    * resolves to exactly one version (the SCD2 invariant). */
  def eventsAsOfLookup(spark: SparkSession, dir: String): DataFrame = {
    val dim = eventsScd2(spark, dir)
      .select(col("user_id"), col("event_id").as("version_event_id"),
        col("effective_date"), col("expiration_date"), col("current_version"))
    val facts = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        date_format(col("ts").cast("date"), "yyyyMMdd").cast("int").as("event_date"))
    asOfLookup(facts, dim, "user_id", "event_date")
      .select("user_id", "event_id", "event_date", "version_event_id",
        "effective_date", "expiration_date", "current_version")
  }

  def asOfOracleSql: String =
    """WITH changes AS (
      |  SELECT user_id, event_id, ts FROM events
      |  QUALIFY row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
      |                             ORDER BY ts DESC, event_id DESC) = 1
      |), dim AS (
      |  SELECT user_id, event_id AS version_event_id,
      |    CAST(strftime(CAST(ts AS DATE), '%Y%m%d') AS INT) AS effective_date,
      |    CASE WHEN ts = max(ts) OVER (PARTITION BY user_id) THEN 20991231
      |         ELSE CAST(strftime(
      |                lead(CAST(ts AS DATE)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |                  - INTERVAL 1 DAY, '%Y%m%d') AS INT) END AS expiration_date,
      |    CAST(ts = max(ts) OVER (PARTITION BY user_id) AS INT) AS current_version
      |  FROM changes
      |)
      |SELECT f.user_id, f.event_id,
      |  CAST(strftime(CAST(f.ts AS DATE), '%Y%m%d') AS INT) AS event_date,
      |  d.version_event_id, d.effective_date, d.expiration_date, d.current_version
      |FROM events f JOIN dim d
      |  ON f.user_id = d.user_id
      | AND CAST(strftime(CAST(f.ts AS DATE), '%Y%m%d') AS INT) BETWEEN d.effective_date AND d.expiration_date""".stripMargin

  def oracleSql: String =
    """WITH changes AS (
      |  SELECT user_id, event_id, ts FROM events
      |  QUALIFY row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
      |                             ORDER BY ts DESC, event_id DESC) = 1
      |)
      |SELECT user_id, event_id,
      |  CAST(strftime(CAST(ts AS DATE), '%Y%m%d') AS INT) AS effective_date,
      |  CASE WHEN ts = max(ts) OVER (PARTITION BY user_id) THEN 20991231
      |       ELSE CAST(strftime(
      |              lead(CAST(ts AS DATE)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |                - INTERVAL 1 DAY, '%Y%m%d') AS INT) END AS expiration_date,
      |  CAST(ts = max(ts) OVER (PARTITION BY user_id) AS INT) AS current_version
      |FROM changes""".stripMargin
}
