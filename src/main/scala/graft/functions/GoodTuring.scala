package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Good-Turing frequency smoothing over the corpus count-of-counts —
  * the classic LM mass-reallocation beside [[BpeMerges]] and the
  * Kneser-Ney table ([[NgramStats]]): how much probability mass do
  * UNSEEN words deserve, and what is the adjusted count r* for words
  * seen r times? The vocabulary-budgeting readout of the reference's
  * tokenizer prep (/root/reference/NLP/llama2/src data prep).
  *
  * Everything is exact integers: term counts r, count-of-counts
  * N_r = |{terms seen exactly r times}|, and the GT estimate
  * r*_permicro = (10⁶·(r+1)·N_{r+1}) div N_r (truncating; NULL where
  * N_{r+1} = 0, i.e. the estimate is undefined — standard GT leaves
  * those to back-off). BIGINT is provably safe: r·N_r ≤ total tokens T
  * (those terms alone contribute r·N_r occurrences), so the numerator
  * (r+1)·N_{r+1}·10⁶ ≤ 10⁶·T — within BIGINT to T ≈ 9·10¹² tokens,
  * and the DECIMAL cast carries it beyond. P0_permicro = 10⁶·N_1/T is
  * the unseen-mass estimate, reported on every row for convenience.
  *
  * Scale: map-side token explode, one (term) groupBy, one (r) groupBy
  * over the Zipf-bounded count-of-counts table, then a self-join on
  * r+1 over that tiny table. The 100 TB cost is the scan.
  */
object GoodTuring {

  /** Count-of-counts table with GT-smoothed counts:
    * (r, n_r, r_star_permicro, p0_permicro). */
  def countOfCounts(df: DataFrame, termCol: String): DataFrame = {
    val terms = df.groupBy(col(termCol).as("term"))
      .agg(count(lit(1)).as("r"))
    val coc = terms.groupBy(col("r"))
      .agg(count(lit(1)).as("n_r")).localCheckpoint() // reused 3×
    val tot = coc.agg(
      sum(col("r").cast("decimal(38,0)") * col("n_r"))
        .cast("decimal(38,0)").as("t"),
      sum(when(col("r") === 1L, col("n_r")).otherwise(0L)).as("n1"))
    coc.as("a")
      .join(coc.as("b"), col("b.r") === col("a.r") + 1L, "left")
      .crossJoin(broadcast(tot))
      .select(col("a.r").as("r"), col("a.n_r").as("n_r"),
        expr("""CASE WHEN b.n_r IS NOT NULL THEN
            (CAST(1000000 AS DECIMAL(38,0)) * (a.r + 1) * b.n_r)
              div a.n_r END""").as("r_star_permicro"),
        expr("(CAST(1000000 AS DECIMAL(38,0)) * n1) div t")
          .as("p0_permicro"))
  }

  /** Chao1 species-richness estimate over the same count-of-counts:
    * how many DISTINCT terms does the full population hold, given what
    * the sample saw? The capacity-planning twin of the GT unseen mass
    * (vocabulary budgeting: "how big must the tokenizer vocab be as
    * the corpus grows 100×?"). Bias-corrected form
    *   Ŝ = S_obs + f₁(f₁−1) / (2(f₂+1))
    * (defined even when no doubletons exist), plus the Good-Turing
    * sample coverage Ĉ = 1 − f₁/T. All exact integers; the one
    * division is truncating in both engines. Output one row:
    * (s_obs, f1, f2, n_tokens, chao1_est, coverage_permicro). */
  def chao1(df: DataFrame, termCol: String): DataFrame =
    df.groupBy(col(termCol).as("term"))
      .agg(count(lit(1)).as("r"))
      .agg(
        count(lit(1)).as("s_obs"),
        sum(when(col("r") === 1L, 1L).otherwise(0L)).as("f1"),
        sum(when(col("r") === 2L, 1L).otherwise(0L)).as("f2"),
        sum(col("r").cast("decimal(38,0)")).cast("decimal(38,0)").as("t"))
      .select(col("s_obs"), col("f1"), col("f2"),
        col("t").cast("long").as("n_tokens"),
        expr("""s_obs + (CAST(f1 AS DECIMAL(38,0)) * (f1 - 1))
                  div (2 * (f2 + 1))""").as("chao1_est"),
        expr("""1000000 - (CAST(1000000 AS DECIMAL(38,0)) * f1) div t""")
          .as("coverage_permicro"))

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: lowercased alphanumeric word tokens over the
    * document corpus. */
  def goodTuringDocuments(spark: SparkSession, dir: String): DataFrame =
    countOfCounts(
      Tables.documents(spark, dir).select(
        explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
          .as("w")),
      "w")

  def oracleSql: String =
    """WITH toks AS (
      |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      |  FROM documents
      |), terms AS (
      |  SELECT w, CAST(count(*) AS BIGINT) AS r FROM toks GROUP BY 1
      |), coc AS (
      |  SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM terms GROUP BY 1
      |), tot AS (
      |  SELECT CAST(sum(CAST(r AS HUGEINT) * n_r) AS HUGEINT) AS t,
      |    CAST(sum(CASE WHEN r = 1 THEN n_r ELSE 0 END) AS BIGINT) AS n1
      |  FROM coc
      |)
      |SELECT a.r, a.n_r,
      |  CASE WHEN b.n_r IS NOT NULL THEN CAST(
      |    (1000000 * (CAST(a.r AS HUGEINT) + 1) * b.n_r) // a.n_r
      |    AS BIGINT) END AS r_star_permicro,
      |  CAST((1000000 * CAST(tot.n1 AS HUGEINT)) // tot.t AS BIGINT)
      |    AS p0_permicro
      |FROM coc a LEFT JOIN coc b ON b.r = a.r + 1
      |CROSS JOIN tot""".stripMargin

  /** Gated instance: Chao1 over the same word-token vocabulary. */
  def chao1Documents(spark: SparkSession, dir: String): DataFrame =
    chao1(
      Tables.documents(spark, dir).select(
        explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
          .as("w")),
      "w")

  def chao1OracleSql: String =
    """WITH toks AS (
      |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      |  FROM documents
      |), terms AS (
      |  SELECT w, CAST(count(*) AS BIGINT) AS r FROM toks GROUP BY 1
      |), agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS s_obs,
      |    CAST(sum(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
      |    CAST(sum(CASE WHEN r = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
      |    CAST(sum(CAST(r AS HUGEINT)) AS HUGEINT) AS t
      |  FROM terms
      |)
      |SELECT s_obs, f1, f2, CAST(t AS BIGINT) AS n_tokens,
      |  CAST(s_obs + (CAST(f1 AS HUGEINT) * (f1 - 1)) // (2 * (f2 + 1))
      |    AS BIGINT) AS chao1_est,
      |  CAST(1000000 - (1000000 * CAST(f1 AS HUGEINT)) // t AS BIGINT)
      |    AS coverage_permicro
      |FROM agg""".stripMargin
}
