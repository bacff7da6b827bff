package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cohen's kappa — chance-corrected agreement between two categorical
  * judgments on the same units: the honest version of "accuracy"
  * when classes are imbalanced, and the standard labeling-quality
  * readout for rater-vs-gold audits (the eval side of the reference's
  * classifier runs, /root/reference/MachineLearning/DataBricks-ML/
  * automl_generator.py metrics cell).
  *
  * κ = (p_o − p_e)/(1 − p_e) computed entirely from the confusion
  * matrix in exact integers: with N units, D = Σ_c n_cc (agreements)
  * and E = Σ_c row_c·col_c (chance-agreement numerator at N² scale),
  * κ = (N·D − E)/(N² − E). Reported in sign-split truncating permicro;
  * p_o and p_e permicro are one truncating division each. All products
  * DECIMAL(38,0)-carried (N² outgrows BIGINT past ~3·10⁹ units); the
  * final quotients are ≤ 10⁶ so BIGINT-safe always. Degenerate guard:
  * N² = E (a rater with a single constant category and perfect
  * marginal agreement) → κ undefined, NULL.
  *
  * Scale: one groupBy to the (rater1, rater2) confusion cells (bounded
  * by category-domain², forever), then scalar aggregates over that
  * cell table. The 100 TB cost is the scan.
  */
object Kappa {

  /** One row: (n, agree, po_permicro, pe_permicro, kappa_permicro)
    * over judgment columns (aCol, bCol). */
  def cohensKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"))
      .localCheckpoint() // reused: totals, diagonal, both marginals
    val marg = cells.groupBy(col("a")).agg(sum(col("n")).as("row_n"))
      .join(cells.groupBy(col("b")).agg(sum(col("n")).as("col_n")),
        col("a") === col("b"))
      .agg(coalesce(sum(col("row_n") * col("col_n")), lit(0))
        .cast("decimal(38,0)").as("e"))
    // categories appearing only in one rater's output contribute 0 to E
    // (row·col with a zero marginal) — the inner join drops exactly those
    val diag = cells.agg(
      sum(col("n")).cast("decimal(38,0)").as("nn"),
      sum(when(col("a") === col("b"), col("n")).otherwise(lit(0)))
        .cast("decimal(38,0)").as("d"))
    diag.crossJoin(broadcast(marg))
      .select(
        col("nn").cast("long").as("n"),
        col("d").cast("long").as("agree"),
        expr("(CAST(1000000 AS DECIMAL(38,0)) * d) div nn")
          .as("po_permicro"),
        expr("(CAST(1000000 AS DECIMAL(38,0)) * e) div (nn * nn)")
          .as("pe_permicro"),
        expr("""CASE WHEN nn * nn <> e THEN
            (CASE WHEN nn * d < e THEN -1L ELSE 1L END)
              * ((CAST(1000000 AS DECIMAL(38,0)) * abs(nn * d - e))
                  div (nn * nn - e))
          END""").as("kappa_permicro"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: the marker-word language-ID heuristic
    * ([[graft.functions.TextFunctions.textLangid]]) judged against the
    * stored gold labels — κ of the classifier vs chance. */
  def kappaLangid(spark: SparkSession, dir: String): DataFrame =
    cohensKappa(
      graft.functions.TextFunctions.textLangid(spark, dir)
        .select(col("lang"), col("pred_lang")),
      "lang", "pred_lang")

  def oracleSql: String =
    """WITH t AS (
      |  SELECT doc_id, lang, string_split_regex(text, '\s+') ws
      |  FROM documents
      |), h AS (
      |  SELECT lang,
      |    CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','is','to'))) AS INT) AS en_hits,
      |    CAST(len(list_filter(ws, w -> w IN ('le','la','les','et','des','une'))) AS INT) AS fr_hits,
      |    CAST(len(list_filter(ws, w -> w IN ('der','die','und','das','ein','ist'))) AS INT) AS de_hits,
      |    CAST(len(list_filter(ws, w -> w IN ('el','los','las','y','una','es'))) AS INT) AS es_hits
      |  FROM t
      |), judged AS (
      |  SELECT lang AS a,
      |    CASE WHEN en_hits >= fr_hits AND en_hits >= de_hits AND en_hits >= es_hits AND en_hits > 0 THEN 'en'
      |         WHEN fr_hits >= de_hits AND fr_hits >= es_hits AND fr_hits > 0 THEN 'fr'
      |         WHEN de_hits >= es_hits AND de_hits > 0 THEN 'de'
      |         WHEN es_hits > 0 THEN 'es'
      |         ELSE 'und' END AS b
      |  FROM h
      |), cells AS (
      |  SELECT a, b, CAST(count(*) AS HUGEINT) AS n
      |  FROM judged GROUP BY 1, 2
      |), marg AS (
      |  SELECT CAST(coalesce(sum(r.row_n * c.col_n), 0) AS HUGEINT) AS e
      |  FROM (SELECT a, sum(n) AS row_n FROM cells GROUP BY 1) r
      |  JOIN (SELECT b, sum(n) AS col_n FROM cells GROUP BY 1) c
      |    ON r.a = c.b
      |), diag AS (
      |  SELECT CAST(sum(n) AS HUGEINT) AS nn,
      |    CAST(coalesce(sum(CASE WHEN a = b THEN n END), 0) AS HUGEINT) AS d
      |  FROM cells
      |)
      |SELECT CAST(nn AS BIGINT) AS n, CAST(d AS BIGINT) AS agree,
      |  CAST((1000000 * d) // nn AS BIGINT) AS po_permicro,
      |  CAST((1000000 * e) // (nn * nn) AS BIGINT) AS pe_permicro,
      |  CASE WHEN nn * nn <> e THEN CAST(
      |    (CASE WHEN nn * d < e THEN -1 ELSE 1 END)
      |      * ((1000000 * abs(nn * d - e)) // (nn * nn - e))
      |    AS BIGINT) END AS kappa_permicro
      |FROM diag CROSS JOIN marg""".stripMargin
}
