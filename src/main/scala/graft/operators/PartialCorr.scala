package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Partial correlation r_xy·z — "how much of the x↔y correlation
  * survives once z is held fixed?": the feature-screening question
  * behind every confounded pair in a wide table ([[GroupStats]]'
  * pairwise Pearson says quantity and price co-move; this says
  * whether that is just both riding discount). The multivariate
  * companion of [[Spearman]]/[[Kendall]] for the reference's
  * EDA-profile stage (/root/reference/DataEngineering/Python/
  * discover_schema.py grown to relationships).
  *
  * Determinism discipline is [[Contingency]]'s: all nine sufficient
  * sums are EXACT DECIMAL(38,0) aggregates (BIGINT Σy² overflows past
  * ~10⁹ rows of 10⁵-unit values; decimal sums are exact at 10¹²),
  * then the three Pearson r's and the partial r are ONE fixed scalar
  * double expression over those integers — same IEEE operation order
  * in both engines, rounded once to micros. No float ever enters an
  * aggregate, so partial-agg ordering cannot flap the hash.
  *
  * Scale: one map-side-combined aggregation to a single row;
  * everything after is scalar math on that row.
  */
object PartialCorr {

  /** One row: (n, r_xy_micros, r_xz_micros, r_yz_micros,
    * partial_xy_z_micros). NULL micros where a variance (or the
    * partial denominator) is zero. */
  def partialCorr(df: DataFrame, x: Column, y: Column, z: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    def d(c: String) = col(c).cast(d38)
    val sums = df
      .select(x.cast(d38).as("__x"), y.cast(d38).as("__y"),
        z.cast(d38).as("__z"))
      .agg(count(lit(1)).cast(d38).as("n"),
        sum("__x").as("sx"), sum("__y").as("sy"), sum("__z").as("sz"),
        sum(col("__x") * col("__x")).as("sxx"),
        sum(col("__y") * col("__y")).as("syy"),
        sum(col("__z") * col("__z")).as("szz"),
        sum(col("__x") * col("__y")).as("sxy"),
        sum(col("__x") * col("__z")).as("sxz"),
        sum(col("__y") * col("__z")).as("syz"))
    // n²-scaled covariance sums as DOUBLES via one fixed expression
    def ss(sab: String, sa: String, sb: String) =
      (d("n").cast("double") * d(sab).cast("double")
        - d(sa).cast("double") * d(sb).cast("double"))
    val (vx, vy, vz) = (ss("sxx", "sx", "sx"), ss("syy", "sy", "sy"),
      ss("szz", "sz", "sz"))
    val (cxy, cxz, cyz) = (ss("sxy", "sx", "sy"), ss("sxz", "sx", "sz"),
      ss("syz", "sy", "sz"))
    def r(c: Column, va: Column, vb: Column) =
      when(va > 0 && vb > 0, c / sqrt(va) / sqrt(vb))
    val (rxy, rxz, ryz) = (r(cxy, vx, vy), r(cxz, vx, vz), r(cyz, vy, vz))
    sums.select(
      col("n").cast("long").as("n"),
      round(rxy * lit(1e6)).cast("long").as("r_xy_micros"),
      round(rxz * lit(1e6)).cast("long").as("r_xz_micros"),
      round(ryz * lit(1e6)).cast("long").as("r_yz_micros"),
      round(when(
        (lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz) > 0,
        (rxy - rxz * ryz)
          / sqrt(lit(1.0) - rxz * rxz) / sqrt(lit(1.0) - ryz * ryz))
        * lit(1e6)).cast("long").as("partial_xy_z_micros"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: quantity↔extendedprice controlled for discount
    * over all of lineitem. */
  def partialLineitem(spark: SparkSession, dir: String): DataFrame =
    partialCorr(Tables.lineitem(spark, dir),
      x = round(col("l_quantity") * 100).cast("long"),
      y = round(col("l_extendedprice")).cast("long"),
      z = round(col("l_discount") * 100).cast("long"))

  def oracleSql: String =
    """WITH v AS (
      |  SELECT CAST(round(l_quantity * 100) AS BIGINT) AS x,
      |    CAST(round(l_extendedprice) AS BIGINT) AS y,
      |    CAST(round(l_discount * 100) AS BIGINT) AS z
      |  FROM lineitem
      |), s AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
      |    CAST(sum(z) AS HUGEINT) AS sz,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
      |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
      |    CAST(sum(CAST(z AS HUGEINT) * z) AS HUGEINT) AS szz,
      |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
      |    CAST(sum(CAST(x AS HUGEINT) * z) AS HUGEINT) AS sxz,
      |    CAST(sum(CAST(y AS HUGEINT) * z) AS HUGEINT) AS syz
      |  FROM v
      |), r AS (
      |  SELECT CAST(n AS BIGINT) AS n,
      |    CASE WHEN CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
      |          AND CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
      |      THEN (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |        / sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
      |        / sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
      |    END AS rxy,
      |    CASE WHEN CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
      |          AND CAST(n AS DOUBLE) * szz - CAST(sz AS DOUBLE) * sz > 0
      |      THEN (CAST(n AS DOUBLE) * sxz - CAST(sx AS DOUBLE) * sz)
      |        / sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
      |        / sqrt(CAST(n AS DOUBLE) * szz - CAST(sz AS DOUBLE) * sz)
      |    END AS rxz,
      |    CASE WHEN CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
      |          AND CAST(n AS DOUBLE) * szz - CAST(sz AS DOUBLE) * sz > 0
      |      THEN (CAST(n AS DOUBLE) * syz - CAST(sy AS DOUBLE) * sz)
      |        / sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
      |        / sqrt(CAST(n AS DOUBLE) * szz - CAST(sz AS DOUBLE) * sz)
      |    END AS ryz
      |  FROM s
      |)
      |SELECT n,
      |  CAST(round(rxy * 1e6) AS BIGINT) AS r_xy_micros,
      |  CAST(round(rxz * 1e6) AS BIGINT) AS r_xz_micros,
      |  CAST(round(ryz * 1e6) AS BIGINT) AS r_yz_micros,
      |  CASE WHEN (1.0 - rxz * rxz) * (1.0 - ryz * ryz) > 0
      |    THEN CAST(round((rxy - rxz * ryz)
      |      / sqrt(1.0 - rxz * rxz) / sqrt(1.0 - ryz * ryz) * 1e6) AS BIGINT)
      |  END AS partial_xy_z_micros
      |FROM r""".stripMargin
}
