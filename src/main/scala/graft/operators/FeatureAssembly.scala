package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Label indexing + feature assembly — the model-input prep step of the
  * reference's training pipeline
  * (/root/reference/DataEngineering/DataBricks/spark_randomforest.py:17-33:
  * VectorAssembler over the numeric INPUT columns, StringIndexer on the
  * label, class weights broadcast-joined back onto the train frame).
  *
  * StringIndexer semantics reproduced exactly: index = rank by label
  * frequency DESCENDING, ties broken by label value ascending
  * (`frequencyDesc`, the default). The index/weight table has one row
  * per distinct label — tiny — so its ranking window and the join back
  * onto the fact side are broadcast-cheap at any corpus size; the fact
  * table itself is touched by exactly one map-side join, no shuffle.
  *
  * Class weight per label = total / (numLabels · labelCount) — the
  * sklearn-style "balanced" weighting the reference computes driver-side
  * with numpy (spark_randomforest.py:31-37); here it stays in the plan.
  */
object FeatureAssembly {

  /** (label, label_idx bigint, weight double) — one row per distinct label. */
  def labelIndex(df: DataFrame, labelCol: String): DataFrame = {
    val stats = df.groupBy(labelCol).agg(count(lit(1)).as("__n"))
    val tot = stats.agg(sum("__n").as("__tot"), count(lit(1)).as("__k"))
    // unpartitioned window is safe here: it scans #labels rows, not facts
    val w = Window.orderBy(col("__n").desc, col(labelCol))
    stats.crossJoin(broadcast(tot))
      .withColumn("label_idx", (row_number().over(w) - 1).cast("long"))
      .withColumn("weight",
        round(col("__tot").cast("double") / (col("__k") * col("__n")), 6))
      .select(col(labelCol), col("label_idx"), col("weight"))
  }

  /** VectorAssembler analogue: numeric columns → one `array<double>`. */
  def assemble(df: DataFrame, inputCols: Seq[String], outCol: String): DataFrame =
    df.withColumn(outCol, array(inputCols.map(c => col(c).cast("double")): _*))

  /** Full prep: assembled features + indexed label + class weight. */
  def prep(df: DataFrame, labelCol: String, featureCols: Seq[String]): DataFrame =
    assemble(df, featureCols, "features")
      .join(broadcast(labelIndex(df, labelCol)), labelCol)

  // ---- query-map entry ----

  /** Gated in long format — (row key, label, label_idx, weight,
    * feature_pos, feature_val) — so the result stays ANSI-SQL-expressible
    * and sortable by the driver's pandas compare (a raw array column is
    * neither); the array form is what [[prep]] hands to a trainer. */
  def featureAssemblyCustomer(spark: SparkSession, dir: String): DataFrame = {
    val featureCols = Seq("c_acctbal", "c_nationkey")
    prep(Tables.customer(spark, dir), "c_mktsegment", featureCols)
      .select(col("c_custkey"), col("c_mktsegment").as("label"),
        col("label_idx"), col("weight"),
        posexplode(col("features")).as(Seq("feature_pos", "feature_val")))
      .withColumn("feature_pos", col("feature_pos").cast("long"))
  }

  def oracleSql: String =
    """WITH idx AS (
      |  SELECT c_mktsegment, count(*) AS n,
      |    row_number() OVER (ORDER BY count(*) DESC, c_mktsegment) - 1 AS label_idx
      |  FROM customer GROUP BY c_mktsegment
      |), tot AS (
      |  SELECT CAST(sum(n) AS DOUBLE) AS total, count(*) AS k FROM idx
      |)
      |SELECT c.c_custkey, c.c_mktsegment AS label, i.label_idx,
      |  round(t.total / (t.k * i.n), 6) AS weight,
      |  CAST(p.pos AS BIGINT) AS feature_pos,
      |  CASE p.pos
      |    WHEN 0 THEN CAST(c.c_acctbal AS DOUBLE)
      |    WHEN 1 THEN CAST(c.c_nationkey AS DOUBLE)
      |  END AS feature_val
      |FROM customer c
      |JOIN idx i USING (c_mktsegment)
      |CROSS JOIN tot t
      |CROSS JOIN (SELECT 0 AS pos UNION ALL SELECT 1) p""".stripMargin
}
