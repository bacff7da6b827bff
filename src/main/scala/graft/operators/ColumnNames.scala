package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Column-name camelCase normalization — the counterpart of the
  * reference's camelCasing package
  * (/root/reference/DataEngineering/Python/camel_case_generator.py) used
  * throughout its medallion DDL to normalize raw source column names.
  *
  * Pure metadata operation: renames live in the logical plan only
  * (zero data movement, no job), so it composes freely ahead of any scan.
  */
object ColumnNames {

  /** snake/kebab/space/dotted name → camelCase: split on non-alphanumeric
    * boundaries, first token lowercased, rest capitalized. A single token
    * that already mixes case (i.e. is already camelCase) only lowers its
    * first character — so the renamer is idempotent and re-running bronze
    * normalization on bronze output never mangles names; all-uppercase
    * tokens (acronym style) still lowercase fully. */
  def toCamel(name: String): String = {
    val parts = name.split("[^A-Za-z0-9]+").filter(_.nonEmpty)
    parts match {
      case Array() => name
      case Array(only) if only.exists(_.isLower) =>
        only.head.toLower.toString + only.tail
      case _ =>
        (parts.head.toLowerCase +: parts.tail.map(p =>
          p.head.toUpper.toString + p.tail.toLowerCase)).mkString
    }
  }

  /** Rename every column of `df` to camelCase. */
  def camelCase(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(toCamel): _*)

  // ---- query-map entry (#21) ----

  def colnamesCamelOrders(spark: SparkSession, dir: String): DataFrame =
    camelCase(Tables.orders(spark, dir))

  def oracleSql: String =
    """SELECT o_orderkey AS oOrderkey, o_custkey AS oCustkey,
      |  o_orderstatus AS oOrderstatus, o_totalprice AS oTotalprice,
      |  o_orderdate AS oOrderdate, o_orderpriority AS oOrderpriority
      |FROM orders""".stripMargin
}
