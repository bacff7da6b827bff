package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Market-concentration indices — Herfindahl–Hirschman (HHI = Σ s_i²
  * over entity shares) and its reciprocal, the EFFECTIVE NUMBER of
  * entities (inverse Simpson): "is this nation's supply one dominant
  * supplier or twenty comparable ones?". The concentration lens the
  * gold-layer revenue rollups
  * (/root/reference/DataEngineering/DataBricks/AIO_delta_table_generator.py
  * star facts) need for supplier-risk and antitrust-style reads —
  * [[Gini]] measures inequality of the whole distribution, HHI weights
  * the TOP of it (squaring makes dominance quadratic).
  *
  * Exactness: quantize-then-combine — each entity's share is first
  * truncated to ppm (s_i = (10⁶·x_i) div T, numerator ≤ 10²² in
  * DECIMAL38), then HHI_permicro = (Σ s_i²) div 10⁶ with
  * Σ s_i² ≤ 10¹² (BIGINT-safe at ANY entity count: Σs_i ≤ 10⁶ and
  * s_i ≤ 10⁶ bound the square sum by their product), and
  * eff_n_permicro = 10¹⁸ div Σ s_i². The ≤1-ppm-per-entity share
  * quantization is the declared contract, identical in both engines.
  *
  * Scale: one fact pass to (group, entity) revenue cells (map-side
  * combine); group totals are a broadcast reaggregation; all index
  * math runs on the entity-bounded cell table.
  */
object Concentration {

  /** Per-group rows (grp, n_entities, total, hhi_permicro,
    * eff_n_permicro). `total` reports as a digit string. */
  def hhi(df: DataFrame, groupCol: String, entityCol: String,
          valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = df
      .groupBy(col(groupCol).as("grp"), col(entityCol).as("e"))
      .agg(sum(col(valueCol).cast(d38)).as("x"))
    val totals = cells.groupBy("grp").agg(sum("x").cast(d38).as("t"))
    cells.join(broadcast(totals), Seq("grp"))
      .withColumn("s_ppm", expr(
        "CAST((CAST(1000000 AS DECIMAL(38,0)) * x) div t AS BIGINT)"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_entities"),
        max(col("t")).as("__t"),
        sum(col("s_ppm") * col("s_ppm")).as("__ss"))
      .select(col("grp"), col("n_entities"),
        col("__t").cast("string").as("total"),
        expr("__ss div 1000000").as("hhi_permicro"),
        expr("""CASE WHEN __ss > 0
                THEN 1000000000000000000 div __ss END""")
          .as("eff_n_permicro"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: supplier revenue concentration within each
    * nation (lineitem revenue cents by supplier, nation from the
    * supplier dimension — broadcast). */
  def hhiSupplierNation(spark: SparkSession, dir: String): DataFrame =
    hhi(
      Tables.lineitem(spark, dir)
        .select(col("l_suppkey"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"))
        .join(broadcast(Tables.supplier(spark, dir)
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey")),
      "s_nationkey", "l_suppkey", "cents")
      .withColumnRenamed("grp", "s_nationkey")

  def oracleSql: String =
    """WITH cells AS (
      |  SELECT s.s_nationkey AS grp, l.l_suppkey AS e,
      |    CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
      |      AS HUGEINT) AS x
      |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  GROUP BY 1, 2
      |), tot AS (
      |  SELECT grp, CAST(sum(x) AS HUGEINT) AS t FROM cells GROUP BY grp
      |), shares AS (
      |  SELECT c.grp, CAST((1000000 * c.x) // t.t AS BIGINT) AS s_ppm
      |  FROM cells c JOIN tot t USING (grp)
      |), agg AS (
      |  SELECT grp, CAST(count(*) AS BIGINT) AS n_entities,
      |    CAST(sum(CAST(s_ppm AS HUGEINT) * s_ppm) AS BIGINT) AS ss
      |  FROM shares GROUP BY grp
      |)
      |SELECT a.grp AS s_nationkey, a.n_entities,
      |  CAST(t.t AS VARCHAR) AS total,
      |  a.ss // 1000000 AS hhi_permicro,
      |  CASE WHEN a.ss > 0 THEN 1000000000000000000 // a.ss END
      |    AS eff_n_permicro
      |FROM agg a JOIN tot t USING (grp)""".stripMargin
}
