package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed table loaders for the driver-generated test tables.
  *
  * Reads are plain `spark.read.parquet` so Catalyst keeps full control of
  * column pruning and filter pushdown — callers `.select`/`.filter` and the
  * scan narrows (verify with `.explain`: `ReadSchema`/`PushedFilters`).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects. Read nanos as long and truncate to microseconds — exactly what
    * DuckDB does when it narrows ns→us, so oracles stay value-identical
    * (the generator writes µs-aligned nanos, so truncation is lossless).
    *
    * The legacy flag is session-wide by necessity: there is no reader
    * option for it (ParquetOptions doesn't carry it) and the task-side
    * footer converter resolves it from the propagated SQLConf, so a
    * set-and-restore around this call would break the later action.
    * Sessions built by [[Verify]]/[[Bench]] enable it up front; this
    * defensive set covers ad-hoc sessions and only affects
    * TIMESTAMP(NANOS) columns, which no other test table has. */
  def events(s: SparkSession, d: String): DataFrame = {
    if (s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  /** documents/embeddings feed CPU-heavy map stages (shingling, hashing,
    * vector math). A single small parquet file scans as ONE partition
    * (unsplittable single row group), which would serialize that compute
    * onto one core — so spread the scan to the session's parallelism when
    * (and only when) it arrives narrower. At real scale the scan is
    * already ≥ parallelism partitions and this is a no-op: no shuffle. */
  private def spread(s: SparkSession, d: String, name: String): DataFrame = {
    val df = table(s, d, name)
    // static file-size heuristic, not df.rdd.getNumPartitions: the rdd
    // call instantiates the physical plan a second time per query; one
    // filesystem metadata listing answers the same question. The estimate
    // mirrors FilePartition.maxSplitBytes — min(maxPartitionBytes,
    // max(openCostInBytes, (bytes + openCost·files)/minPartitionNum)) —
    // with splits rounded up per file, so it tracks the scan's real
    // partition count instead of the old bytes/maxPartitionBytes guess
    // (which could skip a needed repartition on multi-file tables).
    val path = new org.apache.hadoop.fs.Path(s"$d/$name.parquet")
    val fs = path.getFileSystem(s.sessionState.newHadoopConf())
    val root = fs.getFileStatus(path)
    val fileSizes: Seq[Long] =
      if (root.isDirectory)
        fs.listStatus(path).toSeq
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith("."))
          .map(_.getLen)
      else Seq(root.getLen)
    val conf = s.sessionState.conf
    val openCost = conf.filesOpenCostInBytes
    val minParts = conf.filesMinPartitionNum
      .getOrElse(s.sparkContext.defaultParallelism).max(1)
    val totalBytes = fileSizes.map(_ + openCost).sum
    val maxSplit = math.min(conf.filesMaxPartitionBytes,
      math.max(openCost, totalBytes / minParts))
    val estParts = fileSizes.map(sz => math.max(1L, (sz + maxSplit - 1) / maxSplit)).sum
    val target = s.sparkContext.defaultParallelism
    if (estParts < target) df.repartition(target) else df
  }
  def documents(s: SparkSession, d: String): DataFrame = spread(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = spread(s, d, "embeddings")
}
