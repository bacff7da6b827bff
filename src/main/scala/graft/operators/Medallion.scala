package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Medallion bronze-tier normalization — the ingestion counterpart of the
  * reference's all-in-one table generator
  * (/root/reference/DataEngineering/DataBricks/AIO_delta_table_generator.py:1-180):
  * load raw (parquet or JSON-shaped), normalize column names to camelCase,
  * drop source-supplied housekeeping collisions, dedup exact rows, and
  * inject the standard housekeeping columns — sourceFile lineage,
  * currentVersion / effectiveDate / expirationDate (the SCD2 envelope the
  * silver tier's merge consumes).
  *
  * Scale shape: name cleanup is metadata-only; the dedup `distinct` is the
  * one shuffle (hash on all columns — uniform); sourceFile comes from the
  * scan's file metadata, not a UDF, so lineage costs nothing. Housekeeping
  * dates are parameters, not current_timestamp(), keeping the operator
  * deterministic and replayable (idempotent re-runs produce identical
  * bronze — the property the reference gets from Delta overwrite).
  */
object Medallion {

  val FarFuture = 99991231 // expirationDate sentinel, as in apply_scd2

  /** Normalize a raw frame into bronze shape.
    *
    * @param raw        raw rows (already read; JSON or tabular)
    * @param dropCols   source housekeeping to drop (removeCreatedUpdatedDate)
    * @param asOfDateKey yyyymmdd int stamped as effectiveDate
    */
  def bronzeNormalize(raw: DataFrame, dropCols: Seq[String],
                      asOfDateKey: Int): DataFrame = {
    val dropped = raw.drop(dropCols: _*)
    val renamed = ColumnNames.camelCase(dropped)
    renamed
      .withColumn("sourceFile",
        element_at(split(col("_metadata.file_path"), "/"), -1))
      .distinct()
      .withColumn("currentVersion", lit(1))
      .withColumn("effectiveDate", lit(asOfDateKey))
      .withColumn("expirationDate", lit(FarFuture))
  }

  // ---- query-map entry (#10) ----

  def medallionBronzeOrders(spark: SparkSession, dir: String): DataFrame =
    bronzeNormalize(Tables.orders(spark, dir), dropCols = Nil,
      asOfDateKey = 20240101)

  /** The oracle runs over per-table views, so the filename is asserted as
    * the known literal (each test table is a single `<name>.parquet`) —
    * the Spark side still derives it from real scan metadata. */
  def oracleSql: String =
    """SELECT DISTINCT o_orderkey AS oOrderkey, o_custkey AS oCustkey,
      |  o_orderstatus AS oOrderstatus, o_totalprice AS oTotalprice,
      |  o_orderdate AS oOrderdate, o_orderpriority AS oOrderpriority,
      |  'orders.parquet' AS sourceFile,
      |  1 AS currentVersion,
      |  20240101 AS effectiveDate,
      |  99991231 AS expirationDate
      |FROM orders""".stripMargin
}
