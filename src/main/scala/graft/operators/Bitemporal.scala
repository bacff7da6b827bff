package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sources.VersionedTable

/** Bitemporal query surface — BOTH time axes at once: VALID time from
  * the [[Scd2]] dimension (which version of a customer was in effect
  * on business date d) and TRANSACTION time from the
  * [[VersionedTable]] commit log (what the warehouse believed as of
  * ingest version v). "As we knew it in 1996, who was active on
  * 1995-06-01" and "as we know it NOW, same date" legitimately
  * differ — late-arriving changes rewrite history on the valid axis
  * while the transaction axis preserves what was reported at the
  * time. That reproducibility question (rerun last quarter's report
  * bit-for-bit) is THE reason lakehouses keep both axes; the
  * reference gets valid time from apply_scd2.py and transaction time
  * from Delta versioning (delta_table_rs.py load_version) — composed
  * here into one gate.
  *
  * Construction: three warehouse "builds" of the customer dimension
  * (orders known before 1996, before 1997, all) committed as
  * overwrite versions 0/1/2; the probe grid evaluates every
  * (transaction version × valid date) cell with a plain filter+agg
  * over the snapshot — O(dim) per cell, grid bounded. */
object Bitemporal {

  /** SCD2 customer dimension from the orders known before `cutoff`
    * (None = all): one version per (custkey, order day), priority
    * attribute, effective/expiration validity window. */
  private def dimOf(orders: DataFrame, cutoff: Option[String]): DataFrame = {
    val known = cutoff.map(c =>
      orders.filter(col("o_orderdate") < lit(c).cast("date")))
      .getOrElse(orders)
      .select(col("o_custkey").as("custkey"),
        col("o_orderkey").as("orderkey"),
        col("o_orderdate").cast("timestamp").as("ts"))
    Scd2.apply(
      Scd2.latestPerDay(known, "custkey", "ts", Seq("orderkey")),
      "custkey", "ts", Seq("orderkey"))
      .select(col("custkey"), col("orderkey"), col("effective_date"),
        col("expiration_date"), col("current_version"))
  }

  // ---- query-map entry (hash-gated) ----

  private val ValidDates = Seq(19950601, 19960601, 19970601)
  private val Cutoffs = Seq(Some("1996-01-01"), Some("1997-01-01"), None)

  /** Gated instance: the 3×3 (transaction version × valid date) grid —
    * (txn_version, valid_date, n_active, n_current). */
  def bitemporalOrders(spark: SparkSession, dir: String): DataFrame = {
    val table = graft.TmpPaths.unique("graft_bitemp")
    val orders = Tables.orders(spark, dir)
    Cutoffs.foreach(c => VersionedTable.overwrite(spark, table,
      dimOf(orders, c)))
    val cells = for {
      v <- 0L to 2L
      d <- ValidDates
    } yield VersionedTable.readVersion(spark, table, v)
      .filter(col("effective_date") <= d && col("expiration_date") >= d)
      .agg(count(lit(1)).as("n_active"),
        sum(col("current_version").cast("long")).as("n_current"))
      .select(lit(v).as("txn_version"), lit(d).as("valid_date"),
        col("n_active"), col("n_current"))
    cells.reduce(_ unionByName _)
  }

  def oracleSql: String = {
    def era(name: String, cutoff: Option[String]): String = {
      val filter = cutoff.map(c => s"WHERE o_orderdate < DATE '$c'")
        .getOrElse("")
      s"""ch_$name AS (
         |  SELECT o_custkey AS custkey, o_orderkey AS orderkey,
         |    CAST(o_orderdate AS DATE) AS d FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY o_custkey, CAST(o_orderdate AS DATE)
         |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
         |    FROM orders $filter) WHERE rn = 1
         |), scd_$name AS (
         |  SELECT custkey, orderkey,
         |    CAST(strftime(d, '%Y%m%d') AS INT) AS eff,
         |    CASE WHEN lead(d) OVER (PARTITION BY custkey
         |        ORDER BY d, orderkey) IS NULL THEN 20991231
         |      ELSE CAST(strftime(lead(d) OVER (PARTITION BY custkey
         |        ORDER BY d, orderkey) - 1, '%Y%m%d') AS INT) END AS exp,
         |    CASE WHEN d = max(d) OVER (PARTITION BY custkey)
         |      THEN 1 ELSE 0 END AS cur
         |  FROM ch_$name
         |)""".stripMargin
    }
    val eras = Seq(("e0", Some("1996-01-01")), ("e1", Some("1997-01-01")),
      ("e2", Option.empty[String]))
    val cells = for {
      (v, (name, _)) <- eras.zipWithIndex.map { case (e, i) => (i, e) }
      d <- ValidDates
    } yield
      s"""SELECT CAST($v AS BIGINT) AS txn_version, $d AS valid_date,
         |  CAST(count(*) AS BIGINT) AS n_active,
         |  CAST(sum(cur) AS BIGINT) AS n_current
         |FROM scd_$name WHERE eff <= $d AND exp >= $d""".stripMargin
    s"WITH ${eras.map { case (n, c) => era(n, c) }.mkString(",\n")}\n" +
      cells.mkString("\nUNION ALL\n")
  }
}
