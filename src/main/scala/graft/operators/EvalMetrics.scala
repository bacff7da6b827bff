package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** LLM-evaluation metrics, exact — the scoreboard a fine-tuning loop
  * reads after [[SftPrep]] exports and the reference's endpoints serve
  * (/root/reference/MachineLearning/AzureML/endpoint/score.py):
  *
  * `span_f1` — token-multiset F1 between a predicted and a gold span
  * (the SQuAD/extractive-QA metric): overlap = Σ_token min(c_pred,
  * c_gold) via one token-keyed aggregate per side, F1 = 2·overlap/
  * (len_p + len_g) in truncating permicro. The gated instance derives
  * both spans deterministically from each document (prediction =
  * tokens 1-10, gold = tokens 6-15) so the oracle is closed-form and
  * the overlap path non-degenerate.
  *
  * `pass_at_k` — the unbiased pass@k estimator (Codex/HumanEval):
  * pass@k = 1 − C(n−c, k)/C(n, k), computed EXACTLY as factorial
  * ratios from a PRECOMPUTED 0..20! BIGINT table (20! < 2⁶³ — the
  * ndcg table discipline): Π(n−c−j) = (n−c)!/(n−c−k)!, all divisions
  * exact integer, one truncating permicro per (unit, k). Per-user
  * (n trials, c successes) derive from the event feed capped at 20.
  */
object EvalMetrics {
  /** Fact(i) = i! for i = 0..20 — exact in BIGINT (20! < 2⁶³). */
  val Fact: Seq[Long] = (1 to 20).scanLeft(1L)(_ * _)

  // ---- span_f1 ----

  /** Per-doc (doc_id, len_p, len_g, overlap, f1_permicro). */
  def spanF1(pred: DataFrame, gold: DataFrame, idCol: String,
             tokCol: String): DataFrame = {
    def counts(df: DataFrame, side: String) =
      df.groupBy(col(idCol).as("doc_id"), col(tokCol).as("t"))
        .agg(count(lit(1)).as(s"c_$side"))
    val both = counts(pred, "p").join(counts(gold, "g"), Seq("doc_id", "t"), "outer")
      .groupBy(col("doc_id"))
      .agg(
        sum(coalesce(col("c_p"), lit(0L))).as("len_p"),
        sum(coalesce(col("c_g"), lit(0L))).as("len_g"),
        sum(least(coalesce(col("c_p"), lit(0L)),
          coalesce(col("c_g"), lit(0L)))).as("overlap"))
    both.withColumn("f1_permicro", expr(
      """CASE WHEN len_p + len_g > 0 THEN
           (2000000 * overlap) div (len_p + len_g) END"""))
  }

  /** Gated instance: prediction = doc tokens 1-10, gold = tokens 6-15
    * — a deterministic 5-token overlap structure. */
  def spanF1Docs(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir).select(col("doc_id"),
      expr("filter(split(lower(text), '[^a-z0-9]+'), x -> x <> '')").as("ts"))
    val pred = toks.select(col("doc_id"),
      explode(expr("slice(ts, 1, 10)")).as("t"))
    val gold = toks.select(col("doc_id"),
      explode(expr("slice(ts, 6, 10)")).as("t"))
    spanF1(pred, gold, "doc_id", "t")
  }

  def spanF1OracleSql: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(
      |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ts
      |  FROM documents
      |), pred AS (
      |  SELECT doc_id, unnest(ts[1:10]) AS t FROM toks
      |), gold AS (
      |  SELECT doc_id, unnest(ts[6:15]) AS t FROM toks
      |), cp AS (SELECT doc_id, t, count(*) AS c_p FROM pred GROUP BY 1, 2),
      |cg AS (SELECT doc_id, t, count(*) AS c_g FROM gold GROUP BY 1, 2),
      |merged AS (
      |  SELECT coalesce(cp.doc_id, cg.doc_id) AS doc_id,
      |    CAST(coalesce(cp.c_p, 0) AS BIGINT) AS c_p,
      |    CAST(coalesce(cg.c_g, 0) AS BIGINT) AS c_g
      |  FROM cp FULL OUTER JOIN cg
      |    ON cp.doc_id = cg.doc_id AND cp.t = cg.t
      |), agg AS (
      |  SELECT doc_id, CAST(sum(c_p) AS BIGINT) AS len_p,
      |    CAST(sum(c_g) AS BIGINT) AS len_g,
      |    CAST(sum(least(c_p, c_g)) AS BIGINT) AS overlap
      |  FROM merged GROUP BY 1
      |)
      |SELECT doc_id, len_p, len_g, overlap,
      |  CASE WHEN len_p + len_g > 0 THEN
      |    CAST((2000000 * overlap) // (len_p + len_g) AS BIGINT)
      |  END AS f1_permicro
      |FROM agg""".stripMargin

  // ---- pass_at_k ----

  /** Per-k rows (k, n_units, mean_pass_permicro): each unit's exact
    * pass@min(k, n) quantized once to permicro, averaged truncating. */
  def passAtK(units: DataFrame, nCol: String, cCol: String,
              ks: Seq[Int]): DataFrame = {
    val spark = units.sparkSession
    import spark.implicits._
    val factDf = Fact.zipWithIndex.map { case (f, i) => (i.toLong, f) }
      .toDF("i", "f")
    val kDf = ks.map(_.toLong).toDF("k")
    val u = units.select(col(nCol).cast("long").as("n"),
      col(cCol).cast("long").as("c"))
    // kk = min(k, n); pass = 1 − [(n−c)!/(n−c−kk)!] / [n!/(n−kk)!]
    val per = u.crossJoin(broadcast(kDf))
      .withColumn("kk", least(col("k"), col("n")))
      .join(broadcast(factDf.select(col("i").as("n"), col("f").as("fn"))), "n")
      .join(broadcast(factDf.select(col("i").as("__nk"), col("f").as("fnk"))),
        expr("__nk = n - kk"))
      .join(broadcast(factDf.select(col("i").as("__nc"), col("f").as("fnc"))),
        expr("__nc = n - c"))
      .join(broadcast(factDf.select(col("i").as("__nck"), col("f").as("fnck"))),
        expr("__nck = greatest(n - c - kk, 0L)"))
      .withColumn("pass_permicro", expr(
        // Π(n−c−j) ≤ 20¹⁰ ≈ 10¹³ and ×10⁶ tops BIGINT — DECIMAL ratio
        """CASE WHEN n - c - kk < 0 THEN 1000000L
           ELSE 1000000L - (1000000 * CAST(fnc div fnck AS DECIMAL(38,0)))
             div (fn div fnk) END"""))
    per.groupBy(col("k"))
      .agg(count(lit(1)).as("n_units"),
        sum(col("pass_permicro")).as("__s"))
      .select(col("k"), col("n_units"),
        expr("__s div n_units").as("mean_pass_permicro"))
  }

  /** Gated instance: per user n = events (cap 20), c = purchases. */
  def passAtKEvents(spark: SparkSession, dir: String): DataFrame = {
    val units = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(least(count(lit(1)), lit(20L)).as("n"),
        least(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)),
          least(count(lit(1)), lit(20L))).as("c"))
    passAtK(units, "n", "c", Seq(1, 5, 10))
  }

  def passAtKOracleSql: String = {
    val factRows = Fact.zipWithIndex
      .map { case (f, i) => s"($i, ${f})" }.mkString(", ")
    s"""WITH units AS (
      |  SELECT user_id, least(count(*), 20) AS n,
      |    least(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END),
      |      least(count(*), 20)) AS c
      |  FROM events GROUP BY 1
      |), fact(i, f) AS (VALUES $factRows),
      |ks(k) AS (VALUES (1), (5), (10)),
      |per AS (
      |  SELECT ks.k, u.n, u.c, least(ks.k, u.n) AS kk
      |  FROM units u CROSS JOIN ks
      |), scored AS (
      |  SELECT p.k,
      |    CASE WHEN p.n - p.c - p.kk < 0 THEN 1000000
      |    ELSE 1000000 - (1000000 * CAST(fnc.f // fnck.f AS HUGEINT))
      |      // (fn.f // fnk.f)
      |    END AS pass_permicro
      |  FROM per p
      |  JOIN fact fn ON fn.i = p.n
      |  JOIN fact fnk ON fnk.i = p.n - p.kk
      |  JOIN fact fnc ON fnc.i = p.n - p.c
      |  JOIN fact fnck ON fnck.i = greatest(p.n - p.c - p.kk, 0)
      |)
      |SELECT CAST(k AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_units,
      |  CAST(sum(pass_permicro) // count(*) AS BIGINT) AS mean_pass_permicro
      |FROM scored GROUP BY 1""".stripMargin
  }
}
