package graft.streaming

import java.sql.DriverManager
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.sources.Jdbc

/** Streaming → warehouse sink: each micro-batch lands in a JDBC table via
  * foreachBatch — the composition of the reference's stream ingest
  * (/root/reference/DataEngineering/DataBricks/spark_stream.py) with its
  * warehouse writer (databricks_synapse_sql_writer.py), which is exactly
  * how its bronze feed reaches Synapse.
  *
  * Exactly-once: a JDBC append alone is at-least-once (a failed batch
  * retries and duplicates). Each batch therefore writes with its batchId
  * in a `batch_id` column, and a retry first DELETEs the batch's rows —
  * delete-then-insert makes the write idempotent per batch, the standard
  * foreachBatch recipe for sinks without native transactions spanning
  * the checkpoint.
  *
  * Scale stance: the DELETE touches one batch's key range via an indexed
  * predicate; the insert itself is [[Jdbc.write]]'s partition-parallel
  * batched append, so warehouse fan-in = the micro-batch's partition
  * count.
  */
object JdbcSink {

  /** Idempotent write of one micro-batch (public: retried by the stream
    * runner, exercised directly in the spec). The DELETE connection
    * carries the same `props` (user/password/driver/...) as the insert
    * path — an authenticated warehouse must see credentials on BOTH
    * statements or the idempotency half silently can't run. */
  def writeBatch(batch: DataFrame, batchId: Long, url: String, table: String,
                 props: Map[String, String] = Map.empty): Unit = {
    props.get("driver").foreach(Class.forName)
    val cp = new java.util.Properties()
    props.foreach { case (k, v) => cp.setProperty(k, v) }
    val conn = DriverManager.getConnection(url, cp)
    try {
      val st = conn.prepareStatement(s"DELETE FROM $table WHERE batch_id = ?")
      st.setLong(1, batchId)
      st.executeUpdate()
      st.close()
    } finally conn.close()
    Jdbc.write(batch.withColumn("batch_id", lit(batchId)),
      url, table, mode = "append", props = props)
  }

  /** Start the checkpointed stream into the JDBC table (table must exist
    * with a trailing `batch_id BIGINT` column — [[Jdbc.createTableDdl]]
    * on `schema.add("batch_id", LongType)` generates it). */
  def start(stream: DataFrame, url: String, table: String,
            checkpoint: String, props: Map[String, String] = Map.empty): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, batchId, url, table, props)
      }
      .option("checkpointLocation", checkpoint)
      .start()
}
