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
