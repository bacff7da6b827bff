package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Quantile normalization: map every group's value distribution onto
  * the GLOBAL value distribution — each row keeps its within-group rank
  * but takes the value sitting at the same rank position globally. The
  * batch-effect remover of genomics pipelines, and the cross-cohort
  * feature aligner in model prep (the reference's encoder family,
  * /root/reference/MachineLearning/Spark/count_target_onehot_encoder_spark.py,
  * assumes comparable feature scales across slices; this manufactures
  * comparability when slices drift).
  *
  * Determinism discipline: both the within-group rank and the global
  * lookup are INDEXED ORDER STATISTICS over integer value cells — the
  * [[graft.operators.Robust]]/[[GroupQuantiles]] histogram-cumulation
  * family. p = strictly-below count, target global index
  * `i = ((N−1)·p) div (n_g−1)` (singleton groups map to the global
  * median index (N−1) div 2), all truncating BIGINT division, no
  * interpolation — so the mapped value is always an ACTUAL global
  * value and both engines agree bit-for-bit.
  *
  * Scale: three touches of the fact (group-cell agg, rank join back,
  * index join), each an equi-join/aggregate on uniform keys. The two
  * windows run over CELL tables only — the global one domain-bounded,
  * the per-group one at (group × cells) cardinality. The global
  * index→value mapping is built by exploding each global cell to its
  * index run: exactly N rows — the same cardinality as the fact,
  * shuffled once on an integer key. Overflow: (N−1)·p < N², so BIGINT
  * holds to N ≈ 3e9 rows; past that the product moves to DECIMAL. */
object QuantileNormalize {

  /** Append `out` = the global value at this row's within-group rank
    * position. `valueCol` must be integral (the caller picks a
    * domain-bounded binning — whole units, codes). */
  def quantileNormalize(df: DataFrame, groupCol: String, valueCol: Column,
                        out: String): DataFrame = {
    val rows = df.withColumn("__v", valueCol)
    // global cells: value -> (0-based start index, count)
    val wCum = Window.orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gcellsBase = rows.groupBy("__v").agg(count(lit(1)).as("__cnt"))
    val gcells = gcellsBase
      .withColumn("__start", sum("__cnt").over(wCum) - col("__cnt"))
    // dense index -> value mapping: one row per GLOBAL RANK POSITION
    val mapping = gcells.select(
      explode(sequence(col("__start"), col("__start") + col("__cnt") - 1))
        .as("__gidx"),
      col("__v").as(out))
    // N as a grouping-free aggregate over the BOUNDED cell table — a
    // one-row broadcast the plan audit recognizes as scalar attachment
    val total = gcellsBase.agg(sum("__cnt").as("__n_total"))
    // per-group cells: strictly-below count and group size
    val wgCum = Window.partitionBy(col(groupCol)).orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wgAll = Window.partitionBy(col(groupCol))
    val cells = rows.groupBy(col(groupCol), col("__v"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__below", sum("__c").over(wgCum) - col("__c"))
      .withColumn("__ng", sum("__c").over(wgAll))
      .select(col(groupCol), col("__v"), col("__below"), col("__ng"))
    rows.join(cells, Seq(groupCol, "__v"))
      .crossJoin(broadcast(total))
      .withColumn("__gidx",
        when(col("__ng") > 1,
          expr("((__n_total - 1) * __below) div (__ng - 1)"))
          .otherwise(expr("(__n_total - 1) div 2")))
      .join(mapping, "__gidx")
      .drop("__gidx", "__below", "__ng", "__v", "__n_total")
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: each nation's whole-dollar customer balance
    * distribution normalized onto the global balance distribution. */
  def quantileNormalizeCustomer(spark: SparkSession, dir: String): DataFrame =
    quantileNormalize(
      Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_nationkey"),
          floor(col("c_acctbal")).cast("long").as("dollar")),
      "c_nationkey", col("dollar"), "qn_dollar")
      .select("c_custkey", "c_nationkey", "dollar", "qn_dollar")

  def oracleSql: String =
    """WITH v AS (
      |  SELECT c_custkey, c_nationkey,
      |    CAST(floor(c_acctbal) AS BIGINT) AS dollar
      |  FROM customer
      |), gcells AS (
      |  SELECT dollar AS gv, count(*) AS cnt,
      |    SUM(count(*)) OVER (ORDER BY dollar) - count(*) AS strt,
      |    SUM(count(*)) OVER () AS n
      |  FROM v GROUP BY dollar
      |), mapping AS (
      |  SELECT unnest(generate_series(CAST(strt AS BIGINT),
      |    CAST(strt + cnt - 1 AS BIGINT))) AS gidx,
      |    gv, n
      |  FROM gcells
      |), cells AS (
      |  SELECT c_nationkey, dollar, count(*) AS c,
      |    SUM(count(*)) OVER (PARTITION BY c_nationkey ORDER BY dollar)
      |      - count(*) AS below,
      |    SUM(count(*)) OVER (PARTITION BY c_nationkey) AS ng
      |  FROM v GROUP BY c_nationkey, dollar
      |), idx AS (
      |  SELECT v.c_custkey, v.c_nationkey, v.dollar,
      |    CASE WHEN c.ng > 1
      |      THEN ((m.n - 1) * c.below) // (c.ng - 1)
      |      ELSE (m.n - 1) // 2 END AS gidx
      |  FROM v
      |  JOIN cells c ON v.c_nationkey = c.c_nationkey AND v.dollar = c.dollar
      |  CROSS JOIN (SELECT DISTINCT n FROM gcells) m
      |)
      |SELECT i.c_custkey, i.c_nationkey, i.dollar, mp.gv AS qn_dollar
      |FROM idx i JOIN mapping mp ON i.gidx = mp.gidx""".stripMargin
}
