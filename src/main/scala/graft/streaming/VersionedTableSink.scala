package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.sources.VersionedTable

/** Structured Streaming sink into the [[VersionedTable]] commit log —
  * the stream-to-lakehouse path the reference runs as
  * `writeStream.format("delta")` (/root/reference/DataEngineering/
  * DataBricks/spark_stream.py), re-expressed over the portable
  * parquet + JSON-log layer: every micro-batch lands as ONE atomic
  * append commit carrying the batchId as its transaction id.
  *
  * Exactly-once: checkpoint recovery re-runs the last epoch, so the
  * sink must dedupe replays — [[VersionedTable.appendOnce]] compares
  * the incoming batchId against the newest txn in the log under the
  * table lock and skips at-or-below it (Delta's `txn` action,
  * [[UpsertSink]]'s pointer recipe promoted into the commit log
  * itself). Readers meanwhile get the full table surface: time
  * travel over batch boundaries, change feed between any two
  * versions, compaction/vacuum on cadence, checkpointed O(tail)
  * resolution — none of which the plain parquet `FileStreamSink`
  * offers.
  *
  * Downstream, [[VersionedTable.changesBetween]] over the committed
  * versions IS the incremental-consumption contract: a reader that
  * remembers its last-seen version gets exactly the new batches
  * (append commits diff at file-group granularity with zero scan of
  * history).
  */
object VersionedTableSink {

  /** The foreachBatch hook: append each micro-batch exactly once. */
  def appendBatch(table: String)(batch: DataFrame, batchId: Long): Unit =
    VersionedTable.appendOnce(batch.sparkSession, table, batch, batchId)
      .foreach(_ => ())

  /** Start a query draining `source` into the versioned table. */
  def start(spark: SparkSession, source: DataFrame, table: String,
            checkpointDir: String): StreamingQuery =
    source.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(appendBatch(table) _)
      .start()
}

/** Incremental CONSUMER of a versioned table — the read half of the
  * loop [[VersionedTableSink]] writes: a downstream job that remembers
  * its last-seen version and, on each poll, processes exactly the
  * change feed since then (file-group granular, so a pure-append range
  * costs one scan of the new groups and zero history). Offset
  * persistence is the consumer's own durable cursor file (tmp+rename,
  * the commit log's discipline) so a crashed consumer resumes without
  * reprocessing — the Delta `startingVersion` streaming-read contract
  * in polling form. */
object VersionedTableConsumer {

  /** Last version this consumer processed, or -1 before first poll. */
  def position(spark: SparkSession, cursorPath: String): Long = {
    val p = new org.apache.hadoop.fs.Path(cursorPath)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) -1L
    else {
      val in = f.open(p)
      try scala.io.Source.fromInputStream(in).mkString.trim.toLong
      finally in.close()
    }
  }

  private def commitPosition(spark: SparkSession, cursorPath: String,
                             v: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(cursorPath)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(
      p.getParent, s"_tmp-cursor-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    if (f.exists(p)) f.delete(p, false)
    require(f.rename(tmp, p), s"cursor rename failed at $cursorPath")
  }

  /** One poll: if the table head moved past the cursor, hand the
    * change feed (cursor → head] to `process`, then advance the
    * cursor. At-least-once: a crash AFTER process but BEFORE the
    * cursor write replays that feed — process idempotently (or key
    * the downstream effect by the returned version, the
    * [[VersionedTable.appendOnce]] recipe). Returns the new head if
    * anything was processed. */
  def poll(spark: SparkSession, table: String, cursorPath: String)
          (process: (org.apache.spark.sql.DataFrame, Long) => Unit): Option[Long] = {
    val last = position(spark, cursorPath)
    val head = VersionedTable.latestVersion(spark, table).getOrElse(-1L)
    if (head <= last) None
    else {
      val feed =
        if (last < 0) VersionedTable.readVersion(spark, table, head)
          .withColumn("_change_type",
            org.apache.spark.sql.functions.lit("insert"))
        else VersionedTable.changesBetween(spark, table, last, head)
      process(feed, head)
      commitPosition(spark, cursorPath, head)
      Some(head)
    }
  }
}
