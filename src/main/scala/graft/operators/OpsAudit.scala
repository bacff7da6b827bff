package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Pipeline-operations audits over the lake layout:
  *
  * `backfill_plan` — given the days a partitioned feed SHOULD cover
  * (the observed min..max spine) and the days actually present, emit
  * the backfill work list as COALESCED contiguous ranges (the
  * gaps-and-islands sweep [[Intervals]] uses, applied to absence):
  * missing days grouped by day_offset − rank (the classic islands
  * key), one row per contiguous gap. The scheduler-facing plan the
  * reference's timed ingestions need when a run is skipped
  * (DataEngineering/DataBricks/spark_stream.py's feed with holes).
  * The gated instance PLANTS deterministic holes (every day ≡ 3
  * mod 7 withheld) so gap coalescing is exercised closed-form.
  *
  * `fk_orphans` — referential-integrity audit: per declared
  * fact→dimension relationship, the fact rows whose key has no match
  * (left-anti count) next to the fact total — the conformance check
  * ahead of every star join this library runs. One aggregate per side
  * per relationship; output is one row per relationship.
  */
object OpsAudit {

  /** Contiguous missing-day ranges (gap_start_off, gap_end_off,
    * n_days) for the planted-holes feed. */
  def backfillPlan(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val base = ev.agg(min(col("ts").cast("date")).as("d0"),
      max(col("ts").cast("date")).as("d1"))
    // present days AFTER withholding the planted holes (off % 7 == 3)
    val present = ev.crossJoin(broadcast(base))
      .select(datediff(col("ts").cast("date"), col("d0")).as("off"))
      .distinct()
      .filter(expr("pmod(off, 7) <> 3"))
    val spine = base.select(col("d0"),
        explode(expr("sequence(0, datediff(d1, d0))")).as("off"))
      .select(col("off").cast("long").as("off"))
    val missing = spine.join(present, Seq("off"), "left_anti")
    val w = Window.orderBy(col("off")) // missing days: bounded by spine
    missing
      .withColumn("grp", col("off") - row_number().over(w))
      .groupBy(col("grp"))
      .agg(min(col("off")).as("gap_start_off"),
        max(col("off")).as("gap_end_off"),
        count(lit(1)).as("n_days"))
      .select(col("gap_start_off"), col("gap_end_off"), col("n_days"))
  }

  def backfillPlanOracleSql: String =
    """WITH base AS (
      |  SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
      |  FROM events
      |), present AS (
      |  SELECT DISTINCT date_diff('day', b.d0, CAST(e.ts AS DATE)) AS off
      |  FROM events e CROSS JOIN base b
      |  WHERE date_diff('day', b.d0, CAST(e.ts AS DATE)) % 7 <> 3
      |), spine AS (
      |  SELECT unnest(generate_series(0, date_diff('day', d0, d1))) AS off
      |  FROM base
      |), missing AS (
      |  SELECT s.off FROM spine s LEFT JOIN present p ON s.off = p.off
      |  WHERE p.off IS NULL
      |), grp AS (
      |  SELECT off, off - row_number() OVER (ORDER BY off) AS g FROM missing
      |)
      |SELECT CAST(min(off) AS BIGINT) AS gap_start_off,
      |  CAST(max(off) AS BIGINT) AS gap_end_off,
      |  CAST(count(*) AS BIGINT) AS n_days
      |FROM grp GROUP BY g""".stripMargin

  /** One row per declared relationship: (fact, dim, n_fact, n_orphans,
    * orphan_permille). The gated instance plants orphans by narrowing
    * the dimension (customers with c_custkey % 10 == 0 withheld). */
  def fkOrphans(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val li = Tables.lineitem(spark, dir)
    val part = Tables.part(spark, dir)
    val orders = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
      .filter(expr("pmod(c_custkey, 10) <> 0")) // planted orphan keys
    def audit(fact: DataFrame, key: String, dim: DataFrame, dimKey: String,
              factName: String, dimName: String): DataFrame = {
      val n = fact.agg(count(lit(1)).as("n_fact"))
      val orphans = fact.join(dim.select(col(dimKey).as(key)), Seq(key), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      n.crossJoin(orphans)
        .select(lit(factName).as("fact"), lit(dimName).as("dim"),
          col("n_fact"), col("n_orphans"),
          expr("(1000 * n_orphans) div n_fact").as("orphan_permille"))
    }
    audit(li.select(col("l_partkey")), "l_partkey", part, "p_partkey",
        "lineitem", "part")
      .unionByName(audit(orders.select(col("o_custkey")), "o_custkey",
        cust, "c_custkey", "orders", "customer"))
  }

  def fkOrphansOracleSql: String =
    """WITH li AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_fact,
      |    CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_orphans
      |  FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
      |), oc AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_fact,
      |    CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_orphans
      |  FROM orders o LEFT JOIN
      |    (SELECT c_custkey FROM customer WHERE c_custkey % 10 <> 0) c
      |    ON o.o_custkey = c.c_custkey
      |)
      |SELECT 'lineitem' AS fact, 'part' AS dim, n_fact, n_orphans,
      |  CAST((1000 * n_orphans) // n_fact AS BIGINT) AS orphan_permille
      |FROM li
      |UNION ALL
      |SELECT 'orders', 'customer', n_fact, n_orphans,
      |  CAST((1000 * n_orphans) // n_fact AS BIGINT)
      |FROM oc""".stripMargin
}
