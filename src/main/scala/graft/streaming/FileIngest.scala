package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** File-source streaming ingestion with source-file lineage — the
  * Structured Streaming counterpart of the reference's autoloader bronze
  * ingest (/root/reference/DataEngineering/DataBricks/spark_stream.py:11-32:
  * cloudFiles readStream → input_file_name lineage + partitionName →
  * checkpointed append sink).
  *
  * Scale shape: the file source discovers new files incrementally
  * (maxFilesPerTrigger bounds each micro-batch, the analogue of the
  * reference's maxBytesPerTrigger); lineage comes from scan metadata, not
  * a UDF; the sink is exactly-once via the checkpoint + file-sink log.
  * Ingestion is embarrassingly parallel — no shuffle anywhere.
  */
object FileIngest {

  /** sourceFile = file basename; partitionName = basename up to the first
    * '_' (the reference's date-prefix convention, spark_stream.py:24). */
  def withLineage(df: DataFrame): DataFrame = {
    val base = element_at(split(col("_metadata.file_path"), "/"), -1)
    df.withColumn("sourceFile", base)
      .withColumn("partitionName", element_at(split(base, "_"), 1))
  }

  /** Incremental CSV→parquet bronze ingest stream (not started). */
  def ingest(spark: SparkSession, srcDir: String, schema: StructType,
             maxFilesPerTrigger: Int = 100): DataFrame =
    withLineage(
      spark.readStream
        .format("csv")
        .schema(schema)
        .option("header", "true")
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .load(srcDir))

  /** Start the checkpointed append sink; AvailableNow drains the backlog
    * then stops (the batch-friendly trigger for tests and backfills). */
  def start(df: DataFrame, outPath: String, checkpointPath: String): StreamingQuery =
    df.writeStream
      .format("parquet")
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .trigger(Trigger.AvailableNow())
      .start(outPath)

  // ---- schema evolution (the reference's addNewColumns story) ----

  /** Per-file CSV header columns, files in name order (deterministic).
    * One header line is read per file: the same driver-side work the
    * stream source's own file listing does each trigger, done once per
    * restart, not per batch. */
  private def headersByFile(spark: SparkSession,
                            srcDir: String): Seq[(String, Seq[String])] = {
    val dir = new org.apache.hadoop.fs.Path(srcDir)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val files = fs.listStatus(dir)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".csv"))
      .sortBy(_.getPath.getName)
    files.toSeq.map { f =>
      val in = fs.open(f.getPath)
      try {
        val first = new java.io.BufferedReader(
          new java.io.InputStreamReader(in, "UTF-8")).readLine()
        (f.getPath.getName,
          Option(first).toSeq.flatMap(_.split(",").map(_.trim)))
      } finally in.close()
    }
  }

  /** The tracked schema, evolved `addNewColumns`-style
    * (spark_stream.py:13-17: `cloudFiles.schemaEvolutionMode=addNewColumns`
    * + `cloudFiles.schemaLocation`): the stored schema's fields keep
    * their order and types; columns newly present in the source are
    * APPENDED as strings (autoloader's default — no type inference for
    * evolved columns) and the merged schema is committed back to
    * `schemaLocation` for the next restart. CSV parsing is positional,
    * so evolution is append-only — exactly the contract autoloader
    * enforces by failing the stream until a restart picks up the new
    * schema. */
  def evolvedSchema(spark: SparkSession, srcDir: String,
                    schemaLocation: String): StructType = {
    val loc = new org.apache.hadoop.fs.Path(schemaLocation, "schema.json")
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    val stored: Option[StructType] =
      if (fs.exists(loc)) {
        val in = fs.open(loc)
        try Some(org.apache.spark.sql.types.DataType
          .fromJson(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
          .asInstanceOf[StructType])
        finally in.close()
      } else None
    val known = stored.map(_.fieldNames.toSet).getOrElse(Set.empty)
    val headers = headersByFile(spark, srcDir)
    val fresh = headers.flatMap(_._2).distinct.filterNot(known)
      .map(org.apache.spark.sql.types.StructField(_,
        org.apache.spark.sql.types.StringType, nullable = true))
    val merged = StructType(stored.map(_.fields.toSeq).getOrElse(Nil) ++ fresh)
    // CSV parsing is positional, so append-only evolution is only sound
    // when every file's header is a PREFIX of the merged schema. A file
    // that reorders or inserts a column mid-row would silently mis-assign
    // values to existing fields — fail the stream instead (autoloader's
    // addNewColumns behavior on non-additive change), before committing
    // the merged schema.
    val mergedNames = merged.fieldNames.toSeq
    headers.foreach { case (fname, h) =>
      h.zip(mergedNames).zipWithIndex.foreach { case ((got, want), i) =>
        if (got != want) throw new IllegalStateException(
          s"FileIngest schema evolution: $fname column $i is '$got' but the " +
            s"evolved schema has '$want' there; only appended new trailing " +
            "columns are supported (positional CSV parse)")
      }
    }
    val out = fs.create(loc, true)
    try out.write(merged.json.getBytes("UTF-8")) finally out.close()
    merged
  }

  /** Restartable evolving ingest: call again after new-column files
    * arrive — the checkpoint resumes at the unprocessed files, now read
    * under the evolved schema; rows from pre-evolution files carry null
    * in the appended columns (positional CSV, missing trailing fields).
    * Read the mixed-schema sink back with `mergeSchema=true`. */
  def ingestEvolving(spark: SparkSession, srcDir: String, schemaLocation: String,
                     maxFilesPerTrigger: Int = 100): DataFrame =
    ingest(spark, srcDir, evolvedSchema(spark, srcDir, schemaLocation),
      maxFilesPerTrigger)
}
