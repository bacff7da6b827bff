package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Schema discovery, narrowing, and class weighting.
  *
  * Re-expresses /root/reference/DataEngineering/DataBricks/
  * discover_schema.py (max-value-driven integer down-casting, null→fill +
  * attention-mask columns, distinct-count column classification) and the
  * class-weight computation in spark_randomforest.py:33-40.
  */
object SchemaTools {

  /** Narrowest integer type that holds `maxVal` — the reference's ladder. */
  def narrowType(maxVal: Long): DataType =
    if (maxVal <= 127L) ByteType
    else if (maxVal <= 32767L) ShortType
    else if (maxVal <= 2147483647L) IntegerType
    else LongType

  /** Down-cast every integral column to its narrowest type, fill nulls
    * with 0, and add `<col>_attnmask` (1 where the value was present).
    * The max scan is one tiny aggregate; the cast is pure projection. */
  def shrink(df: DataFrame): DataFrame = {
    val intCols = df.schema.fields
      .filter(f => f.dataType == LongType || f.dataType == IntegerType ||
                   f.dataType == ShortType)
      .map(_.name)
    if (intCols.isEmpty) return df
    val maxRow = df.agg(
      max(col(intCols.head)).cast("long").as(intCols.head),
      intCols.tail.map(c => max(col(c)).cast("long").as(c)): _*).head()
    val projections: Seq[Column] = df.schema.fields.map { f =>
      if (intCols.contains(f.name)) {
        val mx = if (maxRow.isNullAt(maxRow.fieldIndex(f.name))) 0L
                 else maxRow.getLong(maxRow.fieldIndex(f.name))
        coalesce(col(f.name), lit(0)).cast(narrowType(mx)).as(f.name)
      } else col(f.name)
    }.toSeq
    val masks: Seq[Column] = intCols.map(c =>
      when(col(c).isNull, 0).otherwise(1).cast(ByteType).as(s"${c}_attnmask")).toSeq
    df.select(projections ++ masks: _*)
  }

  /** The narrowing *decision table* — (column, max_val, narrowed type) —
    * fully declarative (stack + CASE), so it oracle-checks at any scale
    * factor: both engines derive the decision from the data. */
  def shrinkPlan(df: DataFrame, cols: Seq[String]): DataFrame = {
    val agg = df.agg(
      max(col(cols.head)).cast("long").as(cols.head),
      cols.tail.map(c => max(col(c)).cast("long").as(c)): _*)
    val stackExpr = s"stack(${cols.length}, " +
      cols.map(c => s"'$c', `$c`").mkString(", ") + ") as (column_name, max_val)"
    agg.selectExpr(stackExpr)
      .withColumn("narrowed_type",
        when(col("max_val") <= 127, "byte")
          .when(col("max_val") <= 32767, "short")
          .when(col("max_val") <= 2147483647L, "int")
          .otherwise("long"))
  }

  /** Column classification by distinct counts (binary / categorical /
    * other), the reference's 5%-of-rows rule. Declarative single pass. */
  def classify(df: DataFrame, cols: Seq[String]): DataFrame = {
    val agg = df.agg(
      countDistinct(col(cols.head)).as(cols.head),
      cols.tail.map(c => countDistinct(col(c)).as(c)): _*)
    val total = df.agg(count(lit(1)).as("__total"))
    val stackExpr = s"stack(${cols.length}, " +
      cols.map(c => s"'$c', `$c`").mkString(", ") + ") as (column_name, n_distinct)"
    agg.crossJoin(broadcast(total))
      .selectExpr(stackExpr, "__total")
      .withColumn("col_class",
        when(col("n_distinct") === 2, "binary")
          .when(col("n_distinct") > 2 &&
                col("n_distinct") / col("__total") < 0.05, "categorical")
          .otherwise("other"))
      .drop("__total")
  }

  /** Balanced class weights: total / (k · count_c). */
  def classWeights(df: DataFrame, label: String): DataFrame = {
    val counts = df.groupBy(label).agg(count(lit(1)).as("n"))
    val totals = counts.agg(
      sum("n").as("__total"), count(lit(1)).as("__k"))
    counts.crossJoin(broadcast(totals))
      .withColumn("weight", round(col("__total") / (col("__k") * col("n")), 6))
      .drop("__total", "__k")
  }

  // ---- query-map entries ----

  def shrinkPlanLineitem(spark: SparkSession, dir: String): DataFrame =
    shrinkPlan(Tables.lineitem(spark, dir),
      Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"))

  def shrinkPlanOracleSql: String =
    """WITH m AS (SELECT unnest(['l_orderkey','l_partkey','l_suppkey','l_linenumber']) AS column_name,
      |                  unnest([max(l_orderkey), max(l_partkey), max(l_suppkey),
      |                          CAST(max(l_linenumber) AS BIGINT)]) AS max_val
      |           FROM lineitem)
      |SELECT column_name, max_val,
      |  CASE WHEN max_val <= 127 THEN 'byte'
      |       WHEN max_val <= 32767 THEN 'short'
      |       WHEN max_val <= 2147483647 THEN 'int'
      |       ELSE 'long' END AS narrowed_type
      |FROM m""".stripMargin

  def classifyOrders(spark: SparkSession, dir: String): DataFrame =
    classify(Tables.orders(spark, dir),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))

  def classifyOracleSql: String =
    """WITH d AS (SELECT unnest(['o_orderkey','o_custkey','o_orderstatus','o_orderpriority']) AS column_name,
      |                  unnest([count(DISTINCT o_orderkey), count(DISTINCT o_custkey),
      |                          count(DISTINCT o_orderstatus), count(DISTINCT o_orderpriority)]) AS n_distinct,
      |                  count(*) AS total
      |           FROM orders)
      |SELECT column_name, n_distinct,
      |  CASE WHEN n_distinct = 2 THEN 'binary'
      |       WHEN n_distinct > 2 AND CAST(n_distinct AS DOUBLE) / total < 0.05 THEN 'categorical'
      |       ELSE 'other' END AS col_class
      |FROM d""".stripMargin

  /** Numeric column profiling — the statistics layer of schema discovery
    * (min/max/mean/stddev/median/p95 + null counts per column), one row
    * per profiled column. All statistics come from ONE pass over the
    * table (a single multi-aggregate job, partial-aggregated map-side);
    * the exact interpolated percentiles hold a value→count map per
    * partial aggregate, so they are only appropriate for BOUNDED-DOMAIN
    * columns (quantities, rates, small ints) — profile high-cardinality
    * measures with approx_percentile instead, or the final merge
    * concentrates every distinct value on one reducer. */
  def numericProfile(df: org.apache.spark.sql.DataFrame,
                     cols: Seq[String]): org.apache.spark.sql.DataFrame = {
    val aggs = cols.flatMap { c => Seq(
      count(col(c)).as(s"__n_$c"),
      min(col(c)).cast("double").as(s"__min_$c"),
      max(col(c)).cast("double").as(s"__max_$c"),
      round(avg(col(c)), 4).as(s"__avg_$c"),
      round(stddev(col(c)), 4).as(s"__std_$c"),
      round(percentile(col(c), lit(0.5)), 4).as(s"__p50_$c"),
      round(percentile(col(c), lit(0.95)), 4).as(s"__p95_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column_name"), col(s"__n_$c").as("n"),
        col(s"__min_$c").as("min_val"), col(s"__max_$c").as("max_val"),
        col(s"__avg_$c").as("avg_val"), col(s"__std_$c").as("stddev_val"),
        col(s"__p50_$c").as("p50"), col(s"__p95_$c").as("p95"))
    }
    wide.select(explode(array(rows: _*)).as("__r")).select("__r.*")
  }

  /** Query-map entry (extra beyond SURVEY §2) — bounded-domain columns
    * only, per the exact-percentile caveat above. */
  def numericProfileLineitem(spark: SparkSession, dir: String): DataFrame =
    numericProfile(Tables.lineitem(spark, dir),
      Seq("l_quantity", "l_discount", "l_linenumber"))

  def numericProfileOracleSql: String =
    """SELECT unnest(['l_quantity','l_discount','l_linenumber']) AS column_name,
      |  unnest([count(l_quantity), count(l_discount), count(l_linenumber)]) AS n,
      |  unnest([CAST(min(l_quantity) AS DOUBLE), min(l_discount), CAST(min(l_linenumber) AS DOUBLE)]) AS min_val,
      |  unnest([CAST(max(l_quantity) AS DOUBLE), max(l_discount), CAST(max(l_linenumber) AS DOUBLE)]) AS max_val,
      |  unnest([round(avg(l_quantity), 4), round(avg(l_discount), 4), round(avg(l_linenumber), 4)]) AS avg_val,
      |  unnest([round(stddev(l_quantity), 4), round(stddev(l_discount), 4), round(stddev(l_linenumber), 4)]) AS stddev_val,
      |  unnest([round(quantile_cont(l_quantity, 0.5), 4), round(quantile_cont(l_discount, 0.5), 4), round(quantile_cont(l_linenumber, 0.5), 4)]) AS p50,
      |  unnest([round(quantile_cont(l_quantity, 0.95), 4), round(quantile_cont(l_discount, 0.95), 4), round(quantile_cont(l_linenumber, 0.95), 4)]) AS p95
      |FROM lineitem""".stripMargin

  def classWeightsOrders(spark: SparkSession, dir: String): DataFrame =
    classWeights(Tables.orders(spark, dir), "o_orderstatus")

  def classWeightsOracleSql: String =
    """WITH c AS (SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY 1)
      |SELECT o_orderstatus, n,
      |  round(CAST((SELECT sum(n) FROM c) AS DOUBLE)
      |        / ((SELECT count(*) FROM c) * n), 6) AS weight
      |FROM c""".stripMargin
}
