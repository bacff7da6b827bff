package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Adaptive storage level for corpus-scaled `localCheckpoint` pins.
  *
  * Spark's default localCheckpoint level keeps deserialized rows on
  * the executor heap — right for the domain-sized frames most graft
  * operators pin (top-K matrices, per-user scoreboards), but a
  * fact-scaled pin GROWS WITH THE DATA and eventually IS the heap:
  * r19 measured two keys failing exactly this way (tpe_pointwise's
  * draws frame at the 10x replica, recsys_eval's purchases frame at
  * the 100x replica — the storage pool fills until HashAggregate
  * cannot acquire its initial map). Every memory-backed level also
  * re-promotes disk-spilled blocks on read (maybeCacheDiskBytesInMemory
  * allocates whole blocks while evicting others faster than GC
  * reclaims them), so simply switching to a serialized memory level
  * thrashes once storage saturates.
  *
  * Rule (the harmonicCloseness adaptive-sizing discipline applied to
  * a storage level): estimate the frame's serialized size from a
  * metadata-only row count ([[ParquetMeta.rowCount]] — no scan job)
  * and a bytes/row figure, then
  *   - fits well inside the heap (≤ 1/4 of `Runtime.maxMemory`):
  *     MEMORY_AND_DISK_SER — compact tracked bytes, no disk roundtrip
  *     at bench SFs;
  *   - otherwise: DISK_ONLY — the only level that never re-promotes,
  *     bounded at any scale.
  * On a cluster the same estimate runs against each executor's heap,
  * which is exactly the quantity that decides.
  */
object Checkpoints {

  def adaptiveLevel(estBytes: Long): StorageLevel =
    if (estBytes <= Runtime.getRuntime.maxMemory / 4)
      StorageLevel.MEMORY_AND_DISK_SER
    else StorageLevel.DISK_ONLY

  /** Eager localCheckpoint at [[adaptiveLevel]] of the estimate. */
  def pin(df: DataFrame, estBytes: Long): DataFrame =
    df.localCheckpoint(true, adaptiveLevel(estBytes))
}
