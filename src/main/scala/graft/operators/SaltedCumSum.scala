package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Skew-proof cumulative sum.
  *
  * Re-expresses /root/reference/DataEngineering/DataBricks/salt_cumsum.py:
  * a plain `sum().over(partitionBy(key).orderBy(ts))` funnels each key's
  * whole history through one task — at 100 TB a hot key OOMs that task.
  * Instead: (1) salt rows by a time bucket, (2) cumsum inside each
  * (key, salt) slice, (3) roll up per-slice totals — a dataframe whose size
  * is #slices, tiny — window-scan THAT for per-slice offsets, (4) join the
  * offsets back and add. No task ever sees more than one slice of a key.
  *
  * The slice-offset join back is left to AQE: at small scale AQE picks a
  * broadcast join; at 100 TB the offsets table is |keys|×|buckets| rows
  * (billions for user×day) and an unconditional broadcast hint would OOM
  * the driver — so no hint, the fact side is already shuffled on
  * (key,salt) and a shuffle join reuses that partitioning.
  */
object SaltedCumSum {

  /** @param saltCol integer time-bucket expression, e.g. day number —
    *                rows of one key within a bucket stay together */
  def apply(df: DataFrame, partCols: Seq[String], orderCols: Seq[Column],
            valueCol: String, saltCol: Column, out: String): DataFrame = {
    val withSalt = df.withColumn("__salt", saltCol)
    val saltKeys = partCols :+ "__salt"

    val wSlice = Window.partitionBy(saltKeys.map(col): _*).orderBy(orderCols: _*)
    val sliced = withSalt.withColumn("__sliceCum", sum(valueCol).over(wSlice))

    // per-slice totals: |keys|×|buckets| rows — tiny relative to the fact
    val wRoll = Window.partitionBy(partCols.map(col): _*).orderBy(col("__salt"))
    val totals = withSalt
      .groupBy(saltKeys.map(col): _*)
      .agg(sum(valueCol).as("__sliceTotal"))
    // zero of the SUM's own type: a double-literal coalesce here used to
    // widen integer/decimal carries to double (exact only to 2^53); the
    // typed zero keeps long counts long and decimal weights decimal
    val zero = lit(0).cast(totals.schema("__sliceTotal").dataType)
    val offsets = totals
      .withColumn("__offset",
        coalesce(sum(lag("__sliceTotal", 1).over(wRoll)).over(wRoll), zero))
      .drop("__sliceTotal")

    sliced
      .join(offsets, saltKeys)
      .withColumn(out, col("__sliceCum") + col("__offset"))
      .drop("__salt", "__sliceCum", "__offset")
  }

  /** Query-map entry: running total of `value` per user over event time,
    * salted by event-day. Rounded so float association order can't flap
    * the hash vs the oracle's sequential cumsum. */
  def eventsCumSum(spark: SparkSession, dir: String): DataFrame =
    apply(
      Tables.events(spark, dir).select("event_id", "user_id", "ts", "value"),
      partCols = Seq("user_id"),
      orderCols = Seq(col("ts"), col("event_id")),
      valueCol = "value",
      saltCol = floor(unix_timestamp(col("ts")) / lit(86400L)),
      out = "running_value")
      .select(col("event_id"), col("user_id"),
              round(col("running_value"), 2).as("running_value"))

  def oracleSql: String =
    """SELECT event_id, user_id,
      |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                         ROWS UNBOUNDED PRECEDING), 2) AS running_value
      |FROM events""".stripMargin
}
