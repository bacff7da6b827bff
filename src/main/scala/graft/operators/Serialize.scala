package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Row→text serialization: render a structured row as a stable
  * "col: value | col: value" string — how tabular features reach a
  * language model (the reference concatenates numeric+categorical
  * features with text for its transformer classifier,
  * /root/reference/NLP/t5_classifier_numerical_categorical_concat.py;
  * LLM-for-tabular pipelines serialize whole rows this way).
  *
  * Formatting is pinned per type so the string is engine-portable:
  * doubles go through DECIMAL(18,2) (fixed scale — Java's Double
  * formatting and other engines' shortest-representation disagree on raw
  * doubles), timestamps through DATE ISO text, everything else through
  * its canonical string cast. NULL fields render as the literal "null"
  * (concat_ws would silently drop them, shifting field positions).
  * Map-side only: one codegen'd projection, no shuffle.
  */
object Serialize {

  private def fieldText(f: StructField): Column = {
    val v = f.dataType match {
      case DoubleType | FloatType =>
        col(f.name).cast("decimal(18,2)").cast("string")
      case TimestampType | TimestampNTZType => to_date(col(f.name)).cast("string")
      case _ => col(f.name).cast("string")
    }
    concat(lit(f.name + ": "), coalesce(v, lit("null")))
  }

  /** Append `out` = serialized text of `cols` (all columns if empty). */
  def rowToText(df: DataFrame, cols: Seq[String] = Seq.empty,
                out: String = "row_text", sep: String = " | "): DataFrame = {
    val fields = df.schema.fields
      .filter(f => cols.isEmpty || cols.contains(f.name))
    val ordered = if (cols.isEmpty) fields.toSeq
                  else cols.map(c => fields.find(_.name == c).get)
    df.withColumn(out,
      concat_ws(sep, ordered.map(fieldText): _*))
  }

  // ---- query-map entry (hash-gated) ----

  def rowSerializeOrders(spark: SparkSession, dir: String): DataFrame =
    rowToText(Tables.orders(spark, dir),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"))
      .select("o_orderkey", "row_text")

  def oracleSql: String =
    """SELECT o_orderkey,
      |  'o_orderkey: ' || CAST(o_orderkey AS VARCHAR)
      |  || ' | o_custkey: ' || CAST(o_custkey AS VARCHAR)
      |  || ' | o_orderstatus: ' || o_orderstatus
      |  || ' | o_totalprice: ' || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)
      |  || ' | o_orderdate: ' || CAST(CAST(o_orderdate AS DATE) AS VARCHAR)
      |  || ' | o_orderpriority: ' || o_orderpriority AS row_text
      |FROM orders""".stripMargin
}
