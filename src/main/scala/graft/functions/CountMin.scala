package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Count-Min sketch with BOTH engines computing identical registers —
  * the frequency-sketch sibling of [[Hll]] (cardinality) and
  * [[DistinctSketch]] (exact-under-cap): D independent hash rows of W
  * counters, point estimate = min over rows, one-sided overestimate
  * bounded by N/W per row. The reference's monitored ingestion keeps
  * running frequency tallies over hot keys
  * (/root/reference/DataEngineering/DataBricks/spark_stream.py
  * scoreboard aggregation); a CMS is what that tally becomes when the
  * key domain outgrows an exact groupBy's memory.
  *
  * Determinism discipline: row j hashes key k through the validated
  * two-round mod-(2⁶¹−1) mixer ([[MixMod61]]) on k·D + j — the
  * stride-separated hash-stream pattern of
  * [[graft.operators.PermutationTest]] — and the same literal constants
  * run in the DuckDB oracle, so the REGISTER TABLE ITSELF hash-gates,
  * not a summary. The estimate readout joins the exact top keys back
  * through the same hash columns and takes min over the D rows: the
  * CMS overestimate (est ≥ exact, gap ≤ collisions) is directly
  * visible in the gated output.
  *
  * Scale: one explode by D (map-side) into a groupBy on D·W bounded
  * cells with partial aggregation — the classic mergeable-sketch
  * envelope: the shuffle carries at most D·W rows per map partition
  * regardless of input size. The estimate pass touches only the
  * (bounded) top-key list against the D·W spine. The 100 TB cost is
  * the scan.
  */
object CountMin {
  /** Hash rows (depth). Error probability per point ≈ e^−D. */
  val D = 4
  /** Counters per row (width). Overestimate ≤ e·N/W per row w.h.p. */
  val W = 256

  private def mix(c: org.apache.spark.sql.Column) =
    Native.call("graft_mix_mod61", exprs => MixMod61(exprs.head), c)

  /** D·W register rows (row_j, col, cnt), zero-filled, from long
    * `keyCol` occurrences in `df`. */
  def registers(df: DataFrame, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val hits = df
      .select(col(keyCol).cast("long").as("k"))
      .withColumn("row_j", explode(expr(s"sequence(0, ${D - 1})")))
      .select(col("row_j").cast("long").as("row_j"),
        (mix(col("k") * lit(D.toLong) + col("row_j")) % W).as("col"))
      .groupBy("row_j", "col").agg(count(lit(1)).as("c"))
    val spine = (for { j <- 0 until D; w <- 0 until W }
      yield (j.toLong, w.toLong)).toDF("row_j", "col")
    spine.join(hits, Seq("row_j", "col"), "left")
      .select(col("row_j"), col("col"), coalesce(col("c"), lit(0L)).as("cnt"))
  }

  /** For the exact top `k` keys by frequency (count DESC, key ASC):
    * (key, exact_n, est_n, over_n) where est_n = min over the D rows
    * of the key's register and over_n = est_n − exact_n ≥ 0. */
  def estimateTopK(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val keyed = df.select(col(keyCol).cast("long").as("k"))
      .localCheckpoint() // consumed by the register build AND the top-k
    val regs = registers(keyed, "k")
    // global top-k via sort+limit → TakeOrderedAndProject (per-partition
    // heads merged on the driver), never a single-partition window
    val top = keyed.groupBy("k").agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("k").asc).limit(k)
    val probes = top
      .withColumn("row_j", explode(expr(s"sequence(0, ${D - 1})")))
      .select(col("k"), col("exact_n"), col("row_j").cast("long").as("row_j"),
        (mix(col("k") * lit(D.toLong) + col("row_j")) % W).as("col"))
    probes.join(regs, Seq("row_j", "col"))
      .groupBy(col("k").as("key"), col("exact_n"))
      .agg(min(col("cnt")).as("est_n"))
      .select(col("key"), col("exact_n"), col("est_n"),
        (col("est_n") - col("exact_n")).as("over_n"))
  }

  // ---- query-map entries (hash-gated) ----

  /** Gated instance: part-key frequency registers over lineitem. */
  def cmsLineitem(spark: SparkSession, dir: String): DataFrame =
    registers(Tables.lineitem(spark, dir).select(col("l_partkey")),
      "l_partkey")

  /** Gated instance: CMS point estimates for the exact top-5 parts. */
  def cmsTopParts(spark: SparkSession, dir: String): DataFrame =
    estimateTopK(Tables.lineitem(spark, dir).select(col("l_partkey")),
      "l_partkey", 5)

  /** key·D + j through the mixer, mod W, as DuckDB CTEs named
    * `${p}hashed/${p}mixed/${p}cols` (prefix keeps two expansions in
    * one query distinct). */
  private def hashCtes(src: String, carry: String, p: String = ""): String =
    s"""${p}hashed AS (
      |  SELECT $carry, row_j,
      |    CAST((CAST(${Hll.A} AS HUGEINT) * (k * $D + row_j) + ${Hll.B})
      |      % ${Hll.P} AS BIGINT) AS h1
      |  FROM $src CROSS JOIN (SELECT unnest(range(0, $D)) AS row_j)
      |), ${p}mixed AS (
      |  SELECT $carry, row_j,
      |    CAST((CAST(${Hll.A2} AS HUGEINT) * xor(h1, h1 >> 30)) % ${Hll.P}
      |      AS BIGINT) AS h2
      |  FROM ${p}hashed
      |), ${p}cols AS (
      |  SELECT $carry, CAST(row_j AS BIGINT) AS row_j,
      |    xor(h2, h2 >> 27) % $W AS col
      |  FROM ${p}mixed
      |)""".stripMargin

  def registersOracleSql: String =
    s"""WITH keys AS (
      |  SELECT CAST(l_partkey AS BIGINT) AS k FROM lineitem
      |), ${hashCtes("keys", "k")},
      |hits AS (
      |  SELECT row_j, col, CAST(count(*) AS BIGINT) AS c
      |  FROM cols GROUP BY 1, 2
      |), spine AS (
      |  SELECT CAST(j AS BIGINT) AS row_j, CAST(w AS BIGINT) AS col
      |  FROM (SELECT unnest(range(0, $D)) AS j)
      |  CROSS JOIN (SELECT unnest(range(0, $W)) AS w)
      |)
      |SELECT s.row_j, s.col, coalesce(h.c, 0) AS cnt
      |FROM spine s LEFT JOIN hits h ON s.row_j = h.row_j AND s.col = h.col""".stripMargin

  def estimateOracleSql: String =
    s"""WITH keys AS (
      |  SELECT CAST(l_partkey AS BIGINT) AS k FROM lineitem
      |), ${hashCtes("keys", "k")},
      |regs AS (
      |  SELECT row_j, col, CAST(count(*) AS BIGINT) AS cnt
      |  FROM cols GROUP BY 1, 2
      |), top AS (
      |  SELECT k, CAST(count(*) AS BIGINT) AS exact_n
      |  FROM keys GROUP BY k
      |  ORDER BY exact_n DESC, k ASC LIMIT 5
      |), ${hashCtes("top", "k, exact_n", "t")}
      |SELECT t.k AS key, t.exact_n,
      |  min(r.cnt) AS est_n, min(r.cnt) - t.exact_n AS over_n
      |FROM tcols t JOIN regs r ON t.row_j = r.row_j AND t.col = r.col
      |GROUP BY 1, 2""".stripMargin
}
