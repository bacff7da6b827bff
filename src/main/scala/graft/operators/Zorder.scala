package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Z-order (Morton curve) multi-dimension clustering for data skipping —
  * the layout primitive behind `OPTIMIZE ... ZORDER BY` in lakehouse
  * engines, re-expressed on open Spark: interleave the bits of k sort
  * keys into one curve value, range-partition and sort by it, and every
  * partition/file then carries a TIGHT min/max box in EVERY key — so a
  * predicate on any clustered column prunes files, not just the first
  * sort key. (A single-key sort gives pruning on that key only; each
  * file spans the full range of the others.)
  *
  * The reference's lake writer sorts delta tables for skipping
  * (/root/reference/DataEngineering/DataBricks/AIO_delta_table_generator
  * .py writes partitioned fact tables); this is the multi-column version
  * of that idea, done with two codegen'd primitives: a bit-interleave
  * projection and Spark's own sampled range exchange. At 100 TB the
  * curve value is one long per row, the sort is the standard shuffle
  * machinery, and skipping effectiveness per file is `1/2^(b/k)` of each
  * dimension's domain per curve segment — the spec measures it.
  */
object Zorder {

  /** Morton interleave of `cols` (non-negative longs, each < 2^bits):
    * bit i of column j lands at curve bit `i*k + j`. Pure bit math —
    * whole-stage-codegen'd, no UDF. Callers pick `bits` to cover the
    * column domain (values ≥ 2^bits would alias; quantize first). */
  def zvalue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && bits >= 1 && bits * cols.size <= 62,
      "need 1+ cols and bits*k <= 62")
    val k = cols.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)),
      i * k + j)
    terms.reduce((a, b) => a.bitwiseOR(b))
  }

  /** The DuckDB-dialect SQL for the same interleave (for oracles/tools;
    * `>>`/`<<`/`&`/`|` are RE-dialect-portable where Spark SQL needs its
    * shiftleft/shiftright function names). */
  def zvalueSql(cols: Seq[String], bits: Int): String = {
    val k = cols.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield s"(((CAST($c AS BIGINT) >> $i) & 1) << ${i * k + j})"
    terms.mkString(" | ")
  }

  /** Cluster `df` for skipping: RANGE-QUANTIZE each column to the same
    * `bits`-wide grid (one bounded min/max agg — without this a
    * wider-domain column's high bits dominate the curve and the narrow
    * columns get no locality at all), interleave, then range repartition
    * + in-partition sort by the curve (the write-side pattern; follow
    * with a parquet write so per-file stats are tight). */
  def cluster(df: DataFrame, cols: Seq[String], bits: Int,
              numPartitions: Int): DataFrame = {
    val statAggs = cols.flatMap(c => Seq(
      min(col(c)).cast("double").as(s"__mn_$c"),
      max(col(c)).cast("double").as(s"__mx_$c")))
    val stats = df.agg(statAggs.head, statAggs.tail: _*).head() // one row
    val m = (1L << bits) - 1
    val qcols = cols.map { c =>
      val mn = stats.getAs[Double](s"__mn_$c")
      val mx = stats.getAs[Double](s"__mx_$c")
      if (mx <= mn) lit(0L)
      else least(lit(m),
        floor((col(c).cast("double") - lit(mn)) * lit(m / (mx - mn)))
          .cast("long"))
    }
    df.withColumn("zvalue", zvalue(qcols, bits))
      .repartitionByRange(numPartitions, col("zvalue"))
      .sortWithinPartitions("zvalue")
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: the curve value itself for every lineitem over
    * (l_orderkey, l_partkey) at 20 bits — pure deterministic bit math,
    * exact hash oracle. (The layout step is partitioning, not values, so
    * it's asserted in the spec, not the gate.) */
  def zorderValues(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        zvalue(Seq(col("l_orderkey"), col("l_partkey")), bits = 20).as("zvalue"))

  def oracleSql: String =
    s"""SELECT l_orderkey, l_linenumber, l_partkey,
       |  ${zvalueSql(Seq("l_orderkey", "l_partkey"), bits = 20)} AS zvalue
       |FROM lineitem""".stripMargin
}
