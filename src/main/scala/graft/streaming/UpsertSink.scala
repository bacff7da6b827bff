package graft.streaming

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{IntegerType, StructType}
import graft.operators.MergeUpsert

/** Streaming merge-upsert sink: every micro-batch is a changeset applied
  * to a parquet-backed, current-versioned dimension — the reference's
  * stream-to-dim path (/root/reference/DataEngineering/DataBricks/
  * spark_stream.py feeding merge_generator.py's MERGE) without Delta:
  * each batch writes a NEW versioned directory and then atomically swaps
  * a `_CURRENT` pointer file, so readers always see a complete snapshot
  * and a crashed batch leaves the previous version intact.
  *
  * Idempotency: the pointer records the last applied batchId; a replayed
  * batch (checkpoint recovery re-runs the last epoch) compares ids and
  * skips — the same recipe as [[JdbcSink]], with the pointer playing the
  * transaction log's role.
  *
  * Scale stance: the merge itself is [[MergeUpsert]] — key-range data
  * skipping pushes the changeset's min/max into the target scan, so a
  * small incremental batch touches only overlapping target files; the
  * rewrite cost is the merge output, amortized by compaction cadence in
  * a real deployment (at 100 TB you point this at a table format with
  * file-level replace, keeping the SAME merge plan).
  */
object UpsertSink {

  private def pointerFile(stateDir: String) = new File(stateDir, "_CURRENT")

  /** (version dir name, batchId) currently pointed at, if any. */
  def currentPointer(stateDir: String): Option[(String, Long)] = {
    val f = pointerFile(stateDir)
    if (!f.exists()) None
    else {
      val v = new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8).trim
      Some((v, v.stripPrefix("v_").toLong))
    }
  }

  /** The live dimension snapshot (business cols + current_version). */
  def currentState(spark: SparkSession, stateDir: String): Option[DataFrame] =
    currentPointer(stateDir).map { case (v, _) =>
      spark.read.parquet(s"$stateDir/$v")
    }

  /** Apply one micro-batch changeset; public so recovery replays are
    * testable directly. Skips (no-op) if `batchId` was already applied. */
  def writeBatch(batch: DataFrame, batchId: Long, stateDir: String,
                 naturalKey: Seq[String], orderCol: String,
                 compareCols: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val applied = currentPointer(stateDir)
    if (applied.exists(_._2 >= batchId)) return // replay of an applied batch
    val target = currentState(spark, stateDir).getOrElse {
      // empty initial target: changeset business schema + current_version
      val business = StructType(batch.schema.filterNot(_.name == orderCol))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        business.add("current_version", IntegerType))
    }
    val merged = MergeUpsert(target, batch, naturalKey, orderCol, compareCols)
      .drop("change_type")
    val vdir = s"v_$batchId"
    merged.write.mode("overwrite").parquet(s"$stateDir/$vdir")
    // write-then-rename: the pointer flip is the commit point
    val tmp = Paths.get(stateDir, "_CURRENT.tmp")
    Files.write(tmp, vdir.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointerFile(stateDir).toPath,
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Start the checkpointed stream maintaining the dimension at
    * `stateDir`. */
  def start(stream: DataFrame, stateDir: String, checkpoint: String,
            naturalKey: Seq[String], orderCol: String,
            compareCols: Seq[String]): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, batchId, stateDir, naturalKey, orderCol, compareCols)
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
