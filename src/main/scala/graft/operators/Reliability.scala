package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Repeated-measures consistency: Cochran's Q (did the k BINARY
  * treatments fire at the same rate across blocks? — the k-treatment
  * generalization of [[Mcnemar]] and the binary sibling of
  * [[TrendTests.friedman]]) and Cronbach's α (do the k item series
  * move together enough to be one scale? — the classic reliability
  * coefficient, here "do the per-type daily revenue series co-vary
  * enough to be summarized by their total?"). Both are the
  * sanity-of-the-panel checks a metrics warehouse runs before trusting
  * a composite KPI built from its components.
  *
  * Exactness: both statistics are pure integer rationals over
  * domain-bounded (block × item) grids. Q = (k−1)·(k·ΣG_j² − S²) /
  * (k·S − ΣL_b²) — every term an exact BIGINT-safe count polynomial
  * (grid cells ≤ days·types forever). α = k/(k−1) · (1 − ΣSS_i/SS_T)
  * over n²-scaled integer sums of squares (SS = n·Σx² − (Σx)²,
  * DECIMAL(38,0)); reported as one sign-split truncating permicro
  * division. Missing grid cells are zero-filled from the explicit
  * days × items cross — "no events" IS a measurement of 0 here, not a
  * missing block (declared; both engines build the same grid).
  *
  * Scale: one fact rollup to (day, item) cells; the grid completion
  * crosses the day spine with the ≤10-row item list (broadcast);
  * everything after is grid-sized.
  */
object Reliability {

  /** Cochran's Q over a complete zero-filled binary grid: one row
    * (n_blocks, k_items, s_total, q_permicro). `df` must carry one row
    * per (blockCol, itemCol) PRESENT pair; absent pairs count 0. */
  def cochranQ(df: DataFrame, blockCol: String, itemCol: String): DataFrame = {
    val pres = df.select(col(blockCol).as("b"), col(itemCol).as("i"))
      .distinct().localCheckpoint() // grid spine + marks from one frame
    // the day-spine × item-list cross is bounded by the item domain
    // (broadcast side ≤ |types|); checkpoint the grid so its two
    // margin consumers read cells, not the replayed cross
    val grid = pres.select("b").distinct()
      .crossJoin(broadcast(pres.select("i").distinct()))
      .join(pres.withColumn("x", lit(1L)), Seq("b", "i"), "left")
      .na.fill(0L, Seq("x"))
      .localCheckpoint()
    val rows = grid.groupBy("b").agg(sum("x").as("l"))
      .agg(count(lit(1)).as("n_blocks"), sum("l").as("s_total"),
        sum(col("l") * col("l")).as("ll"))
    val cols = grid.groupBy("i").agg(sum("x").as("g"))
      .agg(count(lit(1)).as("k_items"), sum(col("g") * col("g")).as("gg"))
    rows.crossJoin(broadcast(cols))
      .select(col("n_blocks"), col("k_items"), col("s_total"),
        expr("""CASE WHEN k_items * s_total - ll > 0 THEN
                  (1000000 * (k_items - 1) * (k_items * gg - s_total * s_total))
                    div (k_items * s_total - ll)
                END""").as("q_permicro"))
  }

  /** Cronbach's α over a zero-filled integer-valued grid: one row
    * (n_blocks, k_items, ss_total, ss_items_sum, alpha_permicro) with
    * the SS magnitudes as digit strings. */
  def cronbachAlpha(cells: DataFrame, blockCol: String, itemCol: String,
                    valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val pres = cells.select(col(blockCol).as("b"), col(itemCol).as("i"),
      col(valueCol).cast(d38).as("x")).localCheckpoint()
    val grid = pres.select("b").distinct()
      .crossJoin(broadcast(pres.select("i").distinct()))
      .join(pres, Seq("b", "i"), "left")
      .withColumn("x", coalesce(col("x"), lit(0).cast(d38)))
      .localCheckpoint() // consumed by the item AND total variance legs
    // per-item n²-scaled SS, summed over items
    val items = grid.groupBy("i")
      .agg(count(lit(1)).cast(d38).as("nb"),
        sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"))
      .agg(count(lit(1)).as("k_items"),
        sum(expr("nb * sxx - sx * sx")).cast(d38).as("ss_items_sum"))
    // block-total SS
    val totals = grid.groupBy("b").agg(sum("x").as("t"))
      .agg(count(lit(1)).cast(d38).as("n_blocks"),
        sum(col("t")).as("st"), sum(col("t") * col("t")).as("stt"))
      .select(col("n_blocks"),
        expr("n_blocks * stt - st * st").cast(d38).as("ss_total"))
    totals.crossJoin(broadcast(items))
      .select(col("n_blocks").cast("long").as("n_blocks"),
        col("k_items"),
        col("ss_total").cast("string").as("ss_total"),
        col("ss_items_sum").cast("string").as("ss_items_sum"),
        expr("""CASE WHEN ss_total > 0 AND k_items > 1 THEN
                  (CASE WHEN ss_total < ss_items_sum THEN -1L ELSE 1L END)
                    * ((CAST(1000000 AS DECIMAL(38,0)) * k_items
                        * abs(ss_total - ss_items_sum))
                        div ((k_items - 1) * ss_total))
                END""").as("alpha_permicro"))
  }

  // ---- query-map entries (hash-gated) ----

  /** Gated: did the event types fire on the same days? (binary grid
    * over observed days × types). */
  def cochranQEvents(spark: SparkSession, dir: String): DataFrame =
    cochranQ(
      Tables.events(spark, dir)
        .select(to_date(col("ts")).as("day"), col("event_type")),
      "day", "event_type")

  /** Gated: do the per-type daily revenue series form one scale? */
  def cronbachEvents(spark: SparkSession, dir: String): DataFrame =
    cronbachAlpha(
      Tables.events(spark, dir)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents")),
      "day", "event_type", "cents")

  def cochranOracleSql: String =
    """WITH pres AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS b, event_type AS i FROM events
      |), grid AS (
      |  SELECT d.b, t.i,
      |    CASE WHEN p.b IS NOT NULL THEN 1 ELSE 0 END AS x
      |  FROM (SELECT DISTINCT b FROM pres) d
      |  CROSS JOIN (SELECT DISTINCT i FROM pres) t
      |  LEFT JOIN pres p ON p.b = d.b AND p.i = t.i
      |), r AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_blocks,
      |    CAST(sum(l) AS BIGINT) AS s_total,
      |    CAST(sum(l * l) AS BIGINT) AS ll
      |  FROM (SELECT b, sum(x) AS l FROM grid GROUP BY b)
      |), c AS (
      |  SELECT CAST(count(*) AS BIGINT) AS k_items,
      |    CAST(sum(g * g) AS BIGINT) AS gg
      |  FROM (SELECT i, sum(x) AS g FROM grid GROUP BY i)
      |)
      |SELECT n_blocks, k_items, s_total,
      |  CASE WHEN k_items * s_total - ll > 0 THEN
      |    (1000000 * (k_items - 1) * (k_items * gg - s_total * s_total))
      |      // (k_items * s_total - ll)
      |  END AS q_permicro
      |FROM r CROSS JOIN c""".stripMargin

  def cronbachOracleSql: String =
    """WITH cells AS (
      |  SELECT CAST(ts AS DATE) AS b, event_type AS i,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS HUGEINT) AS x
      |  FROM events GROUP BY 1, 2
      |), grid AS (
      |  SELECT d.b, t.i, coalesce(c.x, 0) AS x
      |  FROM (SELECT DISTINCT b FROM cells) d
      |  CROSS JOIN (SELECT DISTINCT i FROM cells) t
      |  LEFT JOIN cells c ON c.b = d.b AND c.i = t.i
      |), items AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS k_items,
      |    CAST(sum(nb * sxx - sx * sx) AS HUGEINT) AS ss_items_sum
      |  FROM (
      |    SELECT i, CAST(count(*) AS HUGEINT) AS nb,
      |      CAST(sum(x) AS HUGEINT) AS sx,
      |      CAST(sum(x * x) AS HUGEINT) AS sxx
      |    FROM grid GROUP BY i)
      |), totals AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n_blocks,
      |    CAST(count(*) AS HUGEINT)
      |      * CAST(sum(t * t) AS HUGEINT)
      |      - CAST(sum(t) AS HUGEINT) * CAST(sum(t) AS HUGEINT) AS ss_total
      |  FROM (SELECT b, sum(x) AS t FROM grid GROUP BY b)
      |)
      |SELECT CAST(n_blocks AS BIGINT) AS n_blocks,
      |  CAST(k_items AS BIGINT) AS k_items,
      |  CAST(ss_total AS VARCHAR) AS ss_total,
      |  CAST(ss_items_sum AS VARCHAR) AS ss_items_sum,
      |  CASE WHEN ss_total > 0 AND k_items > 1 THEN
      |    CAST((CASE WHEN ss_total < ss_items_sum THEN -1 ELSE 1 END)
      |      * ((1000000 * k_items * abs(ss_total - ss_items_sum))
      |          // ((k_items - 1) * ss_total)) AS BIGINT)
      |  END AS alpha_permicro
      |FROM totals CROSS JOIN items""".stripMargin
}
