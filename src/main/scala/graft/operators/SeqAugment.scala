package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Sequence-model data augmentation over grouped event histories — the
  * distributed counterpart of the reference's repair-RL training-set
  * builders (/root/reference/MachineLearning/Ray/recsys/generate_data.py:
  * 25-43 `generate_inversions`, 53-81 `generate_window_slices`, 121-176
  * `find_chained_repairs` + chain combine).
  *
  * The reference materializes every group in pandas and loops over group
  * indices on one machine. Here each augmentation is a window + map-side
  * transform:
  *
  *  - inversions re-rank rows inside a per-key window (no data movement
  *    beyond the one hash partition per key);
  *  - window slices EXPLODE each row into the slice ids that cover it
  *    (`sequence(lo, hi)`), so the n·w output is generated map-side with
  *    ZERO self-join — at 100 TB the alternative rn-BETWEEN self-join
  *    would re-shuffle the corpus and skew on hot keys;
  *  - chain detection is lag/lead gaps + a running sum, the same
  *    session-id recurrence as [[Sessionize]] but with the reference's
  *    either-neighbour flag semantics, and the chain combine keeps the
  *    LAST row per chain while concatenating the member payloads in
  *    event order (the combined-JSON step of generate_data.py:151-176).
  *
  * Exactness: positions/counts are integers, values are integer cents,
  * concatenations are explicitly ordered by (ts, event_id) — every
  * output column hash-gates against the DuckDB oracle.
  */
object SeqAugment {

  private def cents(c: String) =
    round(col(c) * 100, 0).cast("long")

  /** Per-group inverted copies: groups with ≥2 rows and a positive value
    * sum re-emitted in reverse order, tagged `seq_type='inverted'` with
    * the new position — generate_inversions' eligibility rules
    * (generate_data.py:35-38: size ≥ 2, non-zero label sum). */
  def invert(df: DataFrame, groupCol: String, orderCols: Seq[String],
             valueCol: String): DataFrame = {
    val ord = orderCols.map(col)
    val wOrd = Window.partitionBy(col(groupCol)).orderBy(ord: _*)
    val wAll = Window.partitionBy(col(groupCol))
    df.withColumn("__rn", row_number().over(wOrd))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__sum", sum(cents(valueCol)).over(wAll))
      .filter(col("__n") >= 2 && col("__sum") > 0)
      .withColumn("seq_pos", (col("__n") - col("__rn") + 1).cast("int"))
      .withColumn("seq_type", lit("inverted"))
      .drop("__rn", "__n", "__sum")
  }

  /** All contiguous slices of `w` rows per group (groups larger than w
    * only), exploded map-side: row rn belongs to slice ids
    * [max(1, rn-w+1), min(rn, n-w+1)] — generate_window_slices'
    * stride-tricks sliding view (generate_data.py:53-81) without a
    * corpus-sized self-join. */
  def windowSlices(df: DataFrame, groupCol: String, orderCols: Seq[String],
                   w: Int): DataFrame = {
    require(w >= 2, "slice width must be >= 2")
    val ord = orderCols.map(col)
    val wOrd = Window.partitionBy(col(groupCol)).orderBy(ord: _*)
    val wAll = Window.partitionBy(col(groupCol))
    df.withColumn("__rn", row_number().over(wOrd))
      .withColumn("__n", count(lit(1)).over(wAll))
      .filter(col("__n") > w) // strictly-greater, per the reference
      .withColumn("slice_id",
        explode(sequence(
          greatest(col("__rn") - (w - 1), lit(1)),
          least(col("__rn"), col("__n") - (w - 1)))))
      .withColumn("slice_pos", (col("__rn") - col("slice_id") + 1).cast("int"))
      .drop("__rn", "__n")
  }

  /** Chain detection + combine: rows of a group whose neighbour (either
    * direction) is within `gapHours` carry chain_flag=1; a new chain_id
    * starts where the backward gap exceeds the threshold; each chain is
    * reduced to its LAST row with the member types concatenated in event
    * order and the member cents summed. */
  def chains(df: DataFrame, groupCol: String, tsCol: String,
             orderCols: Seq[String], typeCol: String, valueCol: String,
             gapHours: Int): DataFrame = {
    val ord = orderCols.map(col)
    val w = Window.partitionBy(col(groupCol)).orderBy(ord: _*)
    // microsecond-exact gap arithmetic: cast-to-long would floor to whole
    // seconds while the oracle compares exact epochs — unix_micros here,
    // epoch_us there, both exact integers
    val gapSecs = gapHours * 3600L * 1000000L
    val backGap = unix_micros(col(tsCol)) - unix_micros(lag(col(tsCol), 1).over(w))
    val fwdGap = unix_micros(lead(col(tsCol), 1).over(w)) - unix_micros(col(tsCol))
    val flagged = df
      .withColumn("chain_flag",
        (coalesce(backGap <= gapSecs, lit(false)) ||
         coalesce(fwdGap <= gapSecs, lit(false))).cast("int"))
      .withColumn("__new", when(backGap.isNull || (backGap > gapSecs), 1)
        .otherwise(0))
      .withColumn("chain_id", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // combine: sort_array over collected structs pins member order without
    // an ordered-aggregate dependency; heads stay bounded (chain length)
    flagged
      .groupBy(col(groupCol), col("chain_id"))
      .agg(
        count(lit(1)).cast("int").as("chain_len"),
        sum(cents(valueCol)).as("chain_cents"),
        sort_array(collect_list(struct(ord :+ col(typeCol): _*))).as("__m"))
      .withColumn("last_event_id",
        element_at(col("__m"), -1).getField(orderCols.last))
      .withColumn("chain_types",
        array_join(expr(s"transform(__m, x -> x.$typeCol)"), "|"))
      .drop("__m")
  }

  // ---- query-map entries (hash-gated) ----

  def seqInvertEvents(spark: SparkSession, dir: String): DataFrame =
    invert(Tables.events(spark, dir), "user_id", Seq("ts", "event_id"), "value")
      .select(col("user_id"), col("seq_type"), col("seq_pos"),
        col("event_id"), col("event_type"),
        cents("value").as("value_cents"))

  def seqInvertOracleSql: String =
    """WITH x AS (
      |  SELECT user_id, event_id, event_type,
      |    CAST(round(value*100, 0) AS BIGINT) AS value_cents,
      |    ROW_NUMBER() OVER w AS rn,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n,
      |    SUM(CAST(round(value*100, 0) AS BIGINT))
      |      OVER (PARTITION BY user_id) AS s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT user_id, 'inverted' AS seq_type,
      |  CAST(n - rn + 1 AS INT) AS seq_pos, event_id, event_type, value_cents
      |FROM x WHERE n >= 2 AND s > 0""".stripMargin

  def seqWindowSlicesEvents(spark: SparkSession, dir: String): DataFrame =
    windowSlices(Tables.events(spark, dir), "user_id",
      Seq("ts", "event_id"), w = 3)
      .select("user_id", "slice_id", "slice_pos", "event_id", "event_type")

  /** The oracle takes the self-join formulation — fine at sf0.01, and its
    * equality with the exploded form is exactly what the gate proves. */
  def seqWindowSlicesOracleSql: String =
    """WITH x AS (
      |  SELECT user_id, event_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n
      |  FROM events)
      |SELECT a.user_id, b.rn AS slice_id,
      |  CAST(a.rn - b.rn + 1 AS INT) AS slice_pos, a.event_id, a.event_type
      |FROM x a JOIN x b
      |  ON a.user_id = b.user_id AND a.rn BETWEEN b.rn AND b.rn + 2
      |WHERE a.n > 3 AND b.rn <= a.n - 2""".stripMargin

  def chainSessionsEvents(spark: SparkSession, dir: String): DataFrame =
    chains(Tables.events(spark, dir), "user_id", "ts",
      Seq("ts", "event_id"), "event_type", "value", gapHours = 24)
      .select("user_id", "chain_id", "chain_len", "chain_cents",
        "last_event_id", "chain_types")

  def chainSessionsOracleSql: String =
    """WITH g AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CAST(round(value*100, 0) AS BIGINT) AS value_cents,
      |    epoch_us(ts) - epoch_us(lag(ts) OVER w) AS back_gap
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |c AS (
      |  SELECT *, CAST(SUM(CASE WHEN back_gap IS NULL
      |                          OR back_gap > 86400000000
      |                     THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS chain_id
      |  FROM g)
      |SELECT user_id, chain_id, CAST(count(*) AS INT) AS chain_len,
      |  CAST(SUM(value_cents) AS BIGINT) AS chain_cents,
      |  max({'ts': ts, 'id': event_id}).id AS last_event_id,
      |  string_agg(event_type, '|' ORDER BY ts, event_id) AS chain_types
      |FROM c GROUP BY user_id, chain_id""".stripMargin
}
