package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Wide↔long reshape: unpivot (melt) measure columns into (measure,
  * value) rows and pivot them back — the tidy-data counterpart of the
  * reference's star ETL measure handling
  * (/root/reference/DataEngineering/DataBricks/AIO_delta_table_generator.py
  * builds wide measure tables; its consumers repeatedly need the long
  * form for per-measure processing).
  *
  * Scale stance: unpivot is Spark's native `Dataset.unpivot` — a map-side
  * Expand, no shuffle, output = rows × #measures. The pivot back is one
  * hash aggregation on the id columns; the measure-name list is passed
  * EXPLICITLY so no distinct-values pre-job runs and the output schema is
  * plan-time static (the form that scales — a discovery pivot on a
  * high-cardinality key would need a driver-side distinct first).
  */
object Reshape {

  /** Wide → long: one row per (id, measure). Measures are cast to double
    * (unpivot requires a common value type). */
  def unpivot(df: DataFrame, idCols: Seq[String], measureCols: Seq[String],
              varName: String = "measure", valName: String = "value"): DataFrame =
    df.unpivot(
      idCols.map(col).toArray,
      measureCols.map(c => col(c).cast("double").as(c)).toArray,
      varName, valName)

  /** Long → wide: inverse of [[unpivot]] for a KNOWN measure list.
    * `agg` folds duplicate (id, measure) rows — default sum, which is
    * well-defined when ids don't uniquely key the long rows (first()
    * would be partitioning-dependent there). */
  def pivot(df: DataFrame, idCols: Seq[String], measures: Seq[String],
            varName: String = "measure", valName: String = "value",
            agg: Column => Column = sum): DataFrame =
    df.groupBy(idCols.map(col): _*)
      .pivot(varName, measures)
      .agg(agg(col(valName)))

  // ---- query-map entries (hash-gated) ----

  private val measures = Seq("l_quantity", "l_extendedprice", "l_discount")

  private def sampleLineitem(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") % 20 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_quantity"), 2).as("l_quantity"),
        round(col("l_extendedprice"), 2).as("l_extendedprice"),
        round(col("l_discount"), 2).as("l_discount"))

  def unpivotMeasures(spark: SparkSession, dir: String): DataFrame =
    unpivot(sampleLineitem(spark, dir),
      Seq("l_orderkey", "l_linenumber"), measures)

  /** Round-trips [[unpivotMeasures]] back to wide. (l_orderkey,
    * l_linenumber) does NOT uniquely key lineitem in the test data, so
    * the pivot aggregates duplicates with sum — well-defined on both
    * engines; the oracle is the equivalent wide GROUP BY. */
  def pivotMeasures(spark: SparkSession, dir: String): DataFrame =
    pivot(unpivotMeasures(spark, dir),
      Seq("l_orderkey", "l_linenumber"), measures)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_quantity"), 2).as("l_quantity"),
        round(col("l_extendedprice"), 2).as("l_extendedprice"),
        round(col("l_discount"), 2).as("l_discount"))

  def unpivotOracleSql: String =
    """WITH s AS (SELECT l_orderkey, l_linenumber,
      |    round(l_quantity, 2) AS l_quantity,
      |    round(l_extendedprice, 2) AS l_extendedprice,
      |    round(l_discount, 2) AS l_discount
      |  FROM lineitem WHERE l_orderkey % 20 = 0)
      |SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
      |  l_quantity AS value FROM s
      |UNION ALL
      |SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM s
      |UNION ALL
      |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM s""".stripMargin

  def pivotOracleSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  round(sum(round(l_quantity, 2)), 2) AS l_quantity,
      |  round(sum(round(l_extendedprice, 2)), 2) AS l_extendedprice,
      |  round(sum(round(l_discount, 2)), 2) AS l_discount
      |FROM lineitem WHERE l_orderkey % 20 = 0
      |GROUP BY l_orderkey, l_linenumber""".stripMargin
}
