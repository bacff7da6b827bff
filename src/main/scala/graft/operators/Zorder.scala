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

  // ---- z-order × zone-map: the layout actually pays on BOTH keys ----

  /** Exact RANK buckets (skew-robust, unlike [[cluster]]'s min/max
    * linear grid): bucket(v) = ⌊rank_start(v)·B / n⌋ over the
    * distinct-value histogram — every row of a value lands in one
    * bucket, deterministically, on any engine. The cumulative count
    * runs through [[SaltedCumSum]] (two-phase, no corpus-wide window). */
  def rankBuckets(df: DataFrame, valueCol: String, b: Int): DataFrame = {
    val hist = df.groupBy(col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__cnt"))
    // the cumsum rides in DECIMAL(38,0) end to end — no precision edge
    // at any corpus size a BIGINT row count can represent
    val cum = SaltedCumSum(
      hist.withColumn("__cntd", col("__cnt").cast("decimal(38,0)")),
      partCols = Seq.empty,
      orderCols = Seq(col("__v")), valueCol = "__cntd",
      saltCol = expr("CAST(__v AS BIGINT) DIV 1000"), out = "__cum")
    val total = hist.agg(sum("__cnt").as("__tot"))
    cum.crossJoin(broadcast(total))
      .select(col("__v"),
        expr(s"((CAST(__cum AS BIGINT) - __cnt) * $b) div __tot").as("__bucket"))
  }

  /** The multi-column clustering id the versioned-table OPTIMIZE flow
    * wants (the lakehouse `OPTIMIZE ... ZORDER BY (k1, k2)` semantics,
    * re-expressed portable): interleave the two keys' 4-bit RANK
    * buckets into one 0..255 range id; `repartitionByRange` on it and
    * write, and every file's zone map is tight in BOTH keys. */
  def rangeIds(df: DataFrame, c1: String, c2: String,
               bits: Int = 4): DataFrame = {
    val b = 1 << bits
    val b1 = rankBuckets(df, c1, b)
      .select(col("__v").as(c1), col("__bucket").as("__b1"))
    val b2 = rankBuckets(df, c2, b)
      .select(col("__v").as(c2), col("__bucket").as("__b2"))
    df.join(b1, c1).join(b2, c2)
      .withColumn("range_id", zvalue(Seq(col("__b1"), col("__b2")), bits))
      .drop("__b1", "__b2")
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: lineitem range-ids over (l_orderkey, l_partkey)
    * rank buckets, zone-map audited for a selective range predicate on
    * EACH key — the audit proves both predicates prune zones under the
    * one interleaved layout (a single-key sort prunes only its own
    * key; ZorderZonemapSpec pins the physical files-skipped version). */
  def zorderZonemap(spark: SparkSession, dir: String): DataFrame = {
    val z = rangeIds(
      Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey"),
      "l_orderkey", "l_partkey")
      .localCheckpoint() // audited twice, one zone id computation
    val byOrder = graft.sources.ZoneMap.pruneAudit(z, col("range_id"),
        col("l_orderkey"), lo = 0L, hi = 1000L)
      .withColumn("dim", lit("l_orderkey"))
    val byPart = graft.sources.ZoneMap.pruneAudit(z, col("range_id"),
        col("l_partkey"), lo = 0L, hi = 50L)
      .withColumn("dim", lit("l_partkey"))
    byOrder.unionByName(byPart)
      .select("dim", "zone", "n_rows", "zmin", "zmax", "scanned",
        "n_matched", "zones_total", "zones_scanned", "rows_total",
        "rows_scanned", "rows_matched")
  }

  private def bucketCte(name: String, c: String): String =
    s"""$name AS MATERIALIZED (
       |  SELECT v, ((cum - cnt) * 16) // tot AS b FROM (
       |    SELECT v, cnt,
       |      SUM(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
       |      SUM(cnt) OVER () AS tot
       |    FROM (SELECT $c AS v, CAST(count(*) AS BIGINT) AS cnt
       |          FROM lineitem GROUP BY 1) h) w)""".stripMargin

  private def auditSql(dim: String, lo: Long, hi: Long): String =
    s"""SELECT '$dim' AS dim, zone, n_rows, zmin, zmax,
       |  zmin <= $hi AND zmax >= $lo AS scanned, n_matched,
       |  CAST(count(*) OVER () AS BIGINT) AS zones_total,
       |  CAST(sum(CASE WHEN zmin <= $hi AND zmax >= $lo THEN 1 ELSE 0 END)
       |    OVER () AS BIGINT) AS zones_scanned,
       |  CAST(sum(n_rows) OVER () AS BIGINT) AS rows_total,
       |  CAST(coalesce(sum(CASE WHEN zmin <= $hi AND zmax >= $lo
       |    THEN n_rows END) OVER (), 0) AS BIGINT) AS rows_scanned,
       |  CAST(sum(n_matched) OVER () AS BIGINT) AS rows_matched
       |FROM (
       |  SELECT range_id AS zone, CAST(count(*) AS BIGINT) AS n_rows,
       |    CAST(min($dim) AS BIGINT) AS zmin, CAST(max($dim) AS BIGINT) AS zmax,
       |    CAST(sum(CASE WHEN $dim BETWEEN $lo AND $hi THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_matched
       |  FROM z GROUP BY 1) a""".stripMargin

  def zonemapOracleSql: String =
    "WITH " + bucketCte("ob", "l_orderkey") + ",\n" +
      bucketCte("pb", "l_partkey") + ",\n" +
      s"""z AS MATERIALIZED (
         |  SELECT l.l_orderkey, l.l_partkey,
         |    ${zvalueSql(Seq("ob.b", "pb.b"), bits = 4)} AS range_id
         |  FROM lineitem l
         |  JOIN ob ON ob.v = l.l_orderkey
         |  JOIN pb ON pb.v = l.l_partkey)""".stripMargin + "\n" +
      auditSql("l_orderkey", 0L, 1000L) + "\nUNION ALL\n" +
      auditSql("l_partkey", 0L, 50L)
}
