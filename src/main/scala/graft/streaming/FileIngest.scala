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
}
