package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Generic as-of (temporal) join: for each left row, attach the most
  * recent right row with `right.ts <= left.ts` within the same key — the
  * point-in-time lookup behind feature stores, quote/trade alignment and
  * the reference's SCD2 fact enrichment
  * (/root/reference/DataEngineering/DataBricks/apply_scd2.py builds the
  * validity intervals this operator probes, and
  * merge_generator.py:1-405 replays changesets that need exactly this
  * "latest version at event time" semantics).
  *
  * Algorithm: tag and UNION the two inputs, then one window pass per key
  * ordered by (ts, side) carrying the latest right payload forward
  * (`last(_, ignoreNulls)` over rows UNBOUNDED PRECEDING..CURRENT ROW),
  * keeping only left rows. At equal timestamps the right row sorts first
  * (side 0 < 1), matching ASOF JOIN's `left.ts >= right.ts` inclusivity.
  *
  * Why this shape at 100 TB: the naive formulations are a range join
  * (O(n·m) nested loop — Spark has no interval index) or a per-left-row
  * MAX subquery (a join + extra aggregation). The union form is ONE
  * shuffle of both sides keyed on the join key and one ordered window
  * scan per key — the same cost envelope as SCD2 itself, no broadcast
  * requirement on either side, and AQE-coalescible. The right payload is
  * carried as a single struct so a NULL inside one payload column cannot
  * splice fields from different right rows.
  *
  * Determinism: callers must make the right side unique per (key, ts)
  * (e.g. keep the max-id row) — the same precondition DuckDB's ASOF JOIN
  * needs to be deterministic. The gated instance dedups explicitly.
  */
object AsOfJoin {

  /** Left rows + the payload of the latest right row with
    * `right(tsCol) <= left(tsCol)` per `keys` — or, with
    * `forward = true`, the EARLIEST right row with
    * `right(tsCol) >= left(tsCol)` (the "next observation" lookup:
    * label-at-horizon joins, next-quote alignment). Right payload
    * columns (everything but keys + tsCol) must not collide with left
    * column names; unmatched left rows keep NULL payloads (LEFT
    * semantics). Both directions are inclusive at equal timestamps. */
  def asOf(left: DataFrame, right: DataFrame,
           keys: Seq[String], tsCol: String,
           forward: Boolean = false): DataFrame = {
    val payloadCols = right.columns.filterNot((keys :+ tsCol).contains).toSeq
    require(payloadCols.nonEmpty, "right side needs at least one payload column")
    val leftCols = left.columns.toSeq
    require(leftCols.intersect(payloadCols).isEmpty,
      s"right payload ${payloadCols.mkString(",")} collides with left columns")
    val internal = Set("__side", "__p", "__match")
    val clash = (leftCols ++ right.columns).filter(internal)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(",")} collide with asOf's internal working columns")

    val taggedLeft = left
      .withColumn("__side", lit(1))
      .withColumn("__p",
        lit(null).cast(right.select(payloadCols.map(c => col(c)): _*).schema))
    val taggedRight = right
      .select((keys :+ tsCol).map(c => col(c)) :+
        struct(payloadCols.map(c => col(c)): _*).as("__p"): _*)
      .withColumn("__side", lit(0))
    // align schemas: right rows carry NULL for left payload columns
    val leftOnly = leftCols.filterNot((keys :+ tsCol).contains)
    val rightAligned = leftOnly.foldLeft(taggedRight)(
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select(taggedLeft.columns.map(c => col(c)): _*)

    // backward: carry the latest earlier right row forward (ts asc);
    // forward: the same scan over ts DESC carries the earliest LATER
    // right row — one code path, direction picks the sort
    val ord = if (forward) col(tsCol).desc else col(tsCol).asc
    val w = Window.partitionBy(keys.map(c => col(c)): _*)
      .orderBy(ord, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedLeft.unionByName(rightAligned)
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    payloadCols.foldLeft(carried)(
        (df, c) => df.withColumn(c, col("__match").getField(c)))
      .drop("__side", "__p", "__match")
  }

  // ---- query-map entry (hash-gated via DuckDB ASOF LEFT JOIN) ----

  /** Gated instance: each purchase event joined to the user's most
    * recent click at-or-before purchase time. Clicks are deduped to one
    * row per (user, ts) keeping the max event_id, making both engines
    * deterministic. */
  def asofPurchaseClick(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val dedupW = Window.partitionBy("user_id", "ts").orderBy(col("event_id").desc)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("__rn", row_number().over(dedupW))
      .filter(col("__rn") === 1)
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"), col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    asOf(purchases, clicks, Seq("user_id"), "ts")
      .select("user_id", "event_id", "ts", "click_id", "click_ts")
  }

  def oracleSql: String =
    """WITH clicks AS (
      |  SELECT user_id, ts AS click_ts, event_id AS click_id FROM events
      |  WHERE event_type = 'click'
      |  QUALIFY row_number() OVER (PARTITION BY user_id, ts
      |                             ORDER BY event_id DESC) = 1
      |), purchases AS (
      |  SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
      |)
      |SELECT p.user_id, p.event_id, p.ts, c.click_id, c.click_ts
      |FROM purchases p ASOF LEFT JOIN clicks c
      |  ON p.user_id = c.user_id AND p.ts >= c.click_ts""".stripMargin

  /** Gated FORWARD instance: each purchase joined to the user's next
    * click at-or-after purchase time (the label-at-horizon shape). */
  def asofNextClick(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val dedupW = Window.partitionBy("user_id", "ts").orderBy(col("event_id").desc)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("__rn", row_number().over(dedupW))
      .filter(col("__rn") === 1)
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"), col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    asOf(purchases, clicks, Seq("user_id"), "ts", forward = true)
      .select("user_id", "event_id", "ts", "click_id", "click_ts")
  }

  /** Forward oracle written as an explicit earliest-candidate pick (no
    * dependence on the engine's ASOF comparator support). */
  def forwardOracleSql: String =
    """WITH clicks AS (
      |  SELECT user_id, ts AS click_ts, event_id AS click_id FROM events
      |  WHERE event_type = 'click'
      |  QUALIFY row_number() OVER (PARTITION BY user_id, ts
      |                             ORDER BY event_id DESC) = 1
      |), purchases AS (
      |  SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
      |)
      |SELECT p.user_id, p.event_id, p.ts, c.click_id, c.click_ts
      |FROM purchases p LEFT JOIN clicks c
      |  ON c.user_id = p.user_id AND c.click_ts >= p.ts
      |QUALIFY row_number() OVER (PARTITION BY p.event_id
      |                           ORDER BY c.click_ts) = 1""".stripMargin
}
