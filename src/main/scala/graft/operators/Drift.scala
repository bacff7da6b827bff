package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Population Stability Index — the distribution-drift screen between a
  * baseline and a current sample of the same numeric column, the
  * monitoring companion of [[DataQuality]]/[[DigitProfile]] (the
  * reference profiles single snapshots,
  * /root/reference/DataEngineering/Python/discover_schema.py; PSI is
  * what a deployed pipeline runs BETWEEN snapshots to catch drift).
  *
  * Exactness discipline: values are exact cents, bin ids are BIGINT
  * arithmetic (`(c - lo) * bins DIV (hi - lo + 1)` — non-negative, so
  * Spark DIV and SQL `//` agree), per-bin counts are exact, and the
  * smoothed shares + log term form one fixed scalar expression per
  * OUTPUT bin, micros-rounded. Laplace smoothing (+1 per bin) keeps
  * empty bins finite — and is itself exact-integer input.
  *
  * Scale: one aggregate each over baseline and current keyed on the bin
  * id (fixed cardinality), a generated bin spine, broadcast joins —
  * scan-bound at any corpus size.
  */
object Drift {

  /** Per-bin PSI decomposition between `base` and `cur` on `valueCol`:
    * (bin, lo_cents, hi_cents, n_base, n_cur, psi_micros). Bin bounds
    * come from the union's global [min, max] so both samples share the
    * grid; `sum(psi_micros)` of the already-rounded terms is the PSI
    * statistic (BIGINT-associative). */
  def psi(base: DataFrame, cur: DataFrame, valueCol: String,
          bins: Int): DataFrame = {
    require(bins >= 2, "need at least two bins")
    val cents = round(col(valueCol) * 100).cast("long").as("__c")
    val a = base.select(cents)
    val b = cur.select(cents)
    val bounds = a.unionByName(b)
      .agg(min("__c").as("__lo"), max("__c").as("__hi"))
    def binned(df: DataFrame, out: String) = df
      .crossJoin(broadcast(bounds))
      .select(expr(s"((__c - __lo) * $bins) DIV (__hi - __lo + 1)").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(out))
    val spine = bounds.select(
      explode(sequence(lit(0L), lit(bins - 1L))).as("bin"),
      col("__lo"), col("__hi"))
    val na = sum(col("n_base")).over()
    val nb = sum(col("n_cur")).over()
    val joined = spine
      .join(broadcast(binned(a, "n_base")), Seq("bin"), "left")
      .join(broadcast(binned(b, "n_cur")), Seq("bin"), "left")
      .select(col("bin"),
        (col("__lo") + expr(s"(bin * (__hi - __lo + 1)) DIV $bins")).as("lo_cents"),
        col("__hi"), col("__lo"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    // window totals run over `bins` rows — a constant-size frame
    val pA = (col("n_base") + 1).cast("double") / (na + bins).cast("double")
    val pB = (col("n_cur") + 1).cast("double") / (nb + bins).cast("double")
    joined
      .withColumn("psi_micros",
        round((pA - pB) * log(pA / pB) * lit(1e6)).cast("long"))
      .select("bin", "lo_cents", "n_base", "n_cur", "psi_micros")
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: event value drift between the deterministic halves
    * of the stream (even vs odd event ids — an A/A split, so PSI must
    * hover near zero; the math, not the verdict, is what hash-gates). */
  def psiValueDrift(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    psi(ev.filter(col("event_id") % 2 === 0),
      ev.filter(col("event_id") % 2 === 1), "value", bins = 10)
  }

  def oracleSql: String =
    """WITH c AS (
      |  SELECT event_id, CAST(round(value * 100) AS BIGINT) AS v FROM events
      |), bounds AS (
      |  SELECT min(v) AS lo, max(v) AS hi FROM c
      |), a AS (
      |  SELECT ((v - lo) * 10) // (hi - lo + 1) AS bin, count(*) AS n_base
      |  FROM c CROSS JOIN bounds WHERE event_id % 2 = 0 GROUP BY 1
      |), b AS (
      |  SELECT ((v - lo) * 10) // (hi - lo + 1) AS bin, count(*) AS n_cur
      |  FROM c CROSS JOIN bounds WHERE event_id % 2 = 1 GROUP BY 1
      |), spine AS (
      |  SELECT unnest(generate_series(0, 9)) AS bin, lo, hi FROM bounds
      |), j AS (
      |  SELECT s.bin, s.lo + (s.bin * (s.hi - s.lo + 1)) // 10 AS lo_cents,
      |    CAST(coalesce(a.n_base, 0) AS BIGINT) AS n_base,
      |    CAST(coalesce(b.n_cur, 0) AS BIGINT) AS n_cur
      |  FROM spine s LEFT JOIN a USING (bin) LEFT JOIN b USING (bin)
      |), t AS (
      |  SELECT CAST(sum(n_base) AS BIGINT) AS na,
      |         CAST(sum(n_cur) AS BIGINT) AS nb FROM j
      |)
      |SELECT bin, lo_cents, n_base, n_cur,
      |  CAST(round(
      |    (CAST(n_base + 1 AS DOUBLE) / (na + 10)
      |       - CAST(n_cur + 1 AS DOUBLE) / (nb + 10))
      |    * ln((CAST(n_base + 1 AS DOUBLE) / (na + 10))
      |       / (CAST(n_cur + 1 AS DOUBLE) / (nb + 10)))
      |    * 1e6) AS BIGINT) AS psi_micros
      |FROM j CROSS JOIN t""".stripMargin

  /** Exact Wasserstein-1 (earth-mover) distance between two arms'
    * integer-valued distributions — the drift metric PSI's binning
    * cannot give (W1 sees HOW FAR mass moved, not just that bins
    * changed): over the domain-bounded value-cell table,
    * W1 = Σ_x |F_A(x) − F_B(x)| · Δx with unit steps, kept exact by
    * cross-scaling the two CDFs to the common denominator n_A·n_B —
    * every term |cumA·nB − cumB·nA| is an integer, one truncating
    * micros division at the end. One fact aggregate, windows at cell
    * cardinality (the mann_whitney cost envelope). */
  def wasserstein1(df: DataFrame, valueCol: String, armCol: String,
                   g1: String, g2: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df.filter(col(armCol) === g1 || col(armCol) === g2)
      .groupBy(col(valueCol).as("v"))
      .agg(sum(when(col(armCol) === g1, 1L).otherwise(0L)).as("na"),
        sum(when(col(armCol) === g2, 1L).otherwise(0L)).as("nb"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLead = Window.orderBy(col("v"))
    val wAll = Window.partitionBy() // cell table is domain-bounded
    cells
      .withColumn("cuma", sum(col("na")).over(w))
      .withColumn("cumb", sum(col("nb")).over(w))
      // each CDF step holds until the NEXT observed value: weight the
      // term by that gap (sparse domains are not unit-spaced; the last
      // cell has no gap and its term is 0 anyway)
      .withColumn("gap", coalesce(lead(col("v"), 1).over(wLead) - col("v"), lit(0L)))
      .withColumn("ta", sum(col("na")).over(wAll))
      .withColumn("tb", sum(col("nb")).over(wAll))
      .agg(max(col("ta")).as("n_a"), max(col("tb")).as("n_b"),
        sum(abs(col("cuma").cast("decimal(38,0)") * col("tb")
          - col("cumb").cast("decimal(38,0)") * col("ta")) * col("gap"))
          .as("__terms"))
      .select(col("n_a"), col("n_b"),
        expr("""CASE WHEN n_a > 0 AND n_b > 0 THEN
            (1000000 * __terms) div (CAST(n_a AS DECIMAL(38,0)) * n_b)
          END""").as("w1_micro"))
  }


  /** Gated W1 instance: quantity distributions, returned vs
    * never-returned lineitems (mann_whitney's arms — U asks about
    * dominance, W1 about transport cost). */
  def wassersteinLineitem(spark: SparkSession, dir: String): DataFrame =
    wasserstein1(
      Tables.lineitem(spark, dir).select(
        round(col("l_quantity")).cast("long").as("q"),
        col("l_returnflag").as("flag")),
      "q", "flag", "R", "N")

  def wassersteinOracleSql: String =
    """WITH cells AS (
      |  SELECT CAST(round(l_quantity) AS BIGINT) AS v,
      |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS na,
      |    CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS nb
      |  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1
      |), cum AS (
      |  SELECT v, na, nb,
      |    sum(na) OVER (ORDER BY v) AS cuma,
      |    sum(nb) OVER (ORDER BY v) AS cumb,
      |    coalesce(lead(v, 1) OVER (ORDER BY v) - v, 0) AS gap,
      |    sum(na) OVER () AS ta, sum(nb) OVER () AS tb
      |  FROM cells
      |), agg AS (
      |  SELECT CAST(max(ta) AS BIGINT) AS n_a, CAST(max(tb) AS BIGINT) AS n_b,
      |    CAST(sum(abs(CAST(cuma AS HUGEINT) * tb
      |      - CAST(cumb AS HUGEINT) * ta) * gap) AS HUGEINT) AS terms
      |  FROM cum
      |)
      |SELECT n_a, n_b,
      |  CASE WHEN n_a > 0 AND n_b > 0 THEN CAST(
      |    (1000000 * terms) // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT)
      |  END AS w1_micro
      |FROM agg""".stripMargin
}
