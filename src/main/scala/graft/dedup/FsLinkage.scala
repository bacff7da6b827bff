package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Fellegi-Sunter probabilistic record linkage — the SCORED layer the
  * repo's record-matching family was missing: [[EditDistance]] gives a
  * binary fuzzy edge and [[EntityResolution]] closes it transitively;
  * FS says HOW STRONGLY an agreement pattern argues for a match.
  * Per compared field f with declared priors m_f = P(agree|match),
  * u_f = P(agree|non-match), agreement contributes ln(m_f/u_f) and
  * disagreement ln((1−m_f)/(1−u_f)); a pair's weight is the sum, and
  * thresholds split link / possible / non-link (the clerical-review
  * band). The reference reconciles records by exact key equality
  * (DataEngineering/Python/merge_generator.py) — this is the
  * probabilistic generalization used when keys are dirty.
  *
  * Determinism: both log-odds per field (six literals) are PRECOMPUTED
  * Scala integer micros embedded identically in both engines (the
  * ndcg discount-table discipline — no libm at query time). Blocked
  * candidate generation (equi-join on the block key) keeps the pair
  * space linear-per-block; the output aggregates pairs to the 2³
  * agreement-pattern cells, so nothing row-shaped leaves the join.
  */
object FsLinkage {

  /** (m, u) priors per compared field — declared, as FS practice
    * initializes before EM refinement. */
  val Priors: Seq[(String, Double, Double)] = Seq(
    ("lang",   0.95, 0.25),
    ("source", 0.80, 0.20),
    ("length", 0.90, 0.05))

  /** ln(m/u) and ln((1−m)/(1−u)) in truncating micros, per field. */
  val WeightsMicro: Seq[(Long, Long)] = Priors.map { case (_, m, u) =>
    (math.round(1e6 * math.log(m / u)), math.round(1e6 * math.log((1 - m) / (1 - u))))
  }
  val LinkThresholdMicro = 3000000L     // ≥ 3.0 nats → link
  val NonLinkThresholdMicro = -3000000L // ≤ −3.0 nats → non-link

  /** Aggregate FS readout over prefix-blocked document pairs (the
    * [[EditDistance]] blocking shape — block cardinality GROWS with the
    * corpus, so the pair space stays linear-per-block at any scale):
    * one row per agreement pattern (agree_lang, agree_source,
    * agree_length) with n_pairs, weight_micros, cls — plus global
    * (n_link, n_possible, n_nonlink) repeated. */
  def linkageDocs(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.documents(spark, dir)
      .filter(length(col("text")) >= 12)
      .select(
        col("doc_id").as("id"), substring(col("text"), 1, 12).as("blk"),
        col("lang").as("f_lang"), col("source").as("f_src"),
        expr("n_chars div 100").as("f_len"))
    val pairs = p.as("a").join(p.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(
        (col("a.f_lang") === col("b.f_lang")).as("agree_lang"),
        (col("a.f_src") === col("b.f_src")).as("agree_source"),
        (col("a.f_len") === col("b.f_len")).as("agree_length"))
    val Seq((wa0, wd0), (wa1, wd1), (wa2, wd2)) = WeightsMicro
    val cells = pairs
      .groupBy(col("agree_lang"), col("agree_source"), col("agree_length"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("weight_micros",
        when(col("agree_lang"), lit(wa0)).otherwise(lit(wd0))
          + when(col("agree_source"), lit(wa1)).otherwise(lit(wd1))
          + when(col("agree_length"), lit(wa2)).otherwise(lit(wd2)))
      .withColumn("cls",
        when(col("weight_micros") >= LinkThresholdMicro, "link")
          .when(col("weight_micros") <= NonLinkThresholdMicro, "nonlink")
          .otherwise("possible"))
      .localCheckpoint() // consumed by output AND the summary aggregate
    val summary = cells.agg(
      coalesce(sum(when(col("cls") === "link", col("n_pairs"))), lit(0L))
        .as("n_link"),
      coalesce(sum(when(col("cls") === "possible", col("n_pairs"))), lit(0L))
        .as("n_possible"),
      coalesce(sum(when(col("cls") === "nonlink", col("n_pairs"))), lit(0L))
        .as("n_nonlink"))
    cells.crossJoin(broadcast(summary))
  }

  def oracleSql: String = {
    val Seq((wa0, wd0), (wa1, wd1), (wa2, wd2)) = WeightsMicro
    s"""WITH p AS (
      |  SELECT doc_id AS id, substr(text, 1, 12) AS blk,
      |    lang AS f_lang, source AS f_src, n_chars // 100 AS f_len
      |  FROM documents WHERE length(text) >= 12
      |), pairs AS (
      |  SELECT a.f_lang = b.f_lang AS agree_lang,
      |    a.f_src = b.f_src AS agree_source,
      |    a.f_len = b.f_len AS agree_length
      |  FROM p a JOIN p b ON a.blk = b.blk AND a.id < b.id
      |), cells AS (
      |  SELECT agree_lang, agree_source, agree_length,
      |    CAST(count(*) AS BIGINT) AS n_pairs,
      |    (CASE WHEN agree_lang THEN $wa0 ELSE $wd0 END
      |     + CASE WHEN agree_source THEN $wa1 ELSE $wd1 END
      |     + CASE WHEN agree_length THEN $wa2 ELSE $wd2 END) AS weight_micros
      |  FROM pairs GROUP BY 1, 2, 3
      |), classed AS (
      |  SELECT agree_lang, agree_source, agree_length, n_pairs,
      |    CAST(weight_micros AS BIGINT) AS weight_micros,
      |    CASE WHEN weight_micros >= $LinkThresholdMicro THEN 'link'
      |         WHEN weight_micros <= $NonLinkThresholdMicro THEN 'nonlink'
      |         ELSE 'possible' END AS cls
      |  FROM cells
      |), summary AS (
      |  SELECT
      |    CAST(coalesce(sum(CASE WHEN cls = 'link' THEN n_pairs END), 0)
      |      AS BIGINT) AS n_link,
      |    CAST(coalesce(sum(CASE WHEN cls = 'possible' THEN n_pairs END), 0)
      |      AS BIGINT) AS n_possible,
      |    CAST(coalesce(sum(CASE WHEN cls = 'nonlink' THEN n_pairs END), 0)
      |      AS BIGINT) AS n_nonlink
      |  FROM classed
      |)
      |SELECT c.agree_lang, c.agree_source, c.agree_length, c.n_pairs,
      |  c.weight_micros, c.cls, s.n_link, s.n_possible, s.n_nonlink
      |FROM classed c CROSS JOIN summary s""".stripMargin
  }
}
