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
    // r19 optimization round: a third, DESERIALIZED tier for genuinely
    // tiny frames — the serialized levels pay a Java-serializer pass
    // on the pin write AND on every scan, which for a sub-100MB frame
    // is pure overhead (no memory risk even at ~4x deserialized
    // inflation). Thresholds stay fractions of the executor heap, so
    // the same estimate decides correctly on any cluster.
    if (estBytes <= Runtime.getRuntime.maxMemory / 64)
      StorageLevel.MEMORY_AND_DISK
    else if (estBytes <= Runtime.getRuntime.maxMemory / 4)
      StorageLevel.MEMORY_AND_DISK_SER
    else StorageLevel.DISK_ONLY

  /** Eager localCheckpoint at [[adaptiveLevel]] of the estimate. */
  def pin(df: DataFrame, estBytes: Long): DataFrame =
    df.localCheckpoint(true, adaptiveLevel(estBytes))

  /** [[pin]] + widen-to-parallelism re-pin (r19 optimization round,
    * guide §2.5): AQE rightly coalesces a small frame's final shuffle,
    * so the pin can materialize as a handful of blocks — and then
    * EVERY consumer stage of the pin runs on that handful of cores,
    * which is exactly wrong when a consumer fans out (a ×16 candidate
    * explode, a basket pair explode, a per-row shingle explode). When
    * the materialized block count is below the session parallelism,
    * re-pin a round-robin widened copy at the same level and drop the
    * narrow one; at replica scale (blocks ≥ parallelism) this is the
    * identity. */
  def pinWide(df: DataFrame, estBytes: Long): DataFrame = {
    val pinned = pin(df, estBytes)
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (pinned.rdd.getNumPartitions < par) {
      val wide = pinned.repartition(par)
        .localCheckpoint(true, adaptiveLevel(estBytes))
      pinned.unpersist(false)
      wide
    } else pinned
  }
}
