package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Structured-output (JSON-field) evaluation — the scoring half of the
  * reference's daily model-eval loop
  * (/root/reference/MachineLearning/Ray/zephyr/daily_eval.py:226-284:
  * the model emits a JSON structure with 'Action'/'ChimeraType' fields
  * and is graded binary exact-match against the gold ticket JSON, rolled
  * up per experiment/day). Relational shape: `from_json` with an
  * explicit schema (parse failure ⇒ null struct, the parse-validity
  * flag), per-field null-safe exact match, then one conditional
  * aggregate per (day, field) — map-side projection + a single
  * group-by, the whole thing a two-stage plan at any corpus size.
  *
  * Exactness: accuracies are exact permille integers
  * ((1000·matches) div n), never a float ratio, so the rollup sits
  * inside a DuckDB hash gate (json_extract oracle).
  */
object JsonFieldEval {

  /** The model-output schema: the reference's `[{"Action":…,
    * "ChimeraType":…}]` array-of-struct shape (daily_eval.py's template
    * examples). */
  val OutputSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("Action", StringType),
    StructField("ChimeraType", StringType))))

  /** Score (prediction JSON, gold fields) pairs: per `dayCol` ×
    * field, rows (day, field, n, n_valid, n_match, acc_permille) where
    * `valid` = the JSON parses to the expected shape and `match` =
    * valid AND field equals gold exactly (a missing field never
    * matches). The 'all_fields' row is the reference's binary score:
    * every field exact (daily_eval.py's Score-of-1 rule). */
  def score(df: DataFrame, dayCol: String, jsonCol: String,
            goldActionCol: String, goldChimeraCol: String): DataFrame = {
    val parsed = df.withColumn("__j",
        from_json(col(jsonCol), OutputSchema))
      .withColumn("__valid", col("__j").isNotNull && size(col("__j")) >= 1)
      .withColumn("__a", element_at(col("__j"), 1).getField("Action"))
      .withColumn("__c", element_at(col("__j"), 1).getField("ChimeraType"))
      .withColumn("__ma",
        col("__valid") && col("__a") === col(goldActionCol))
      .withColumn("__mc",
        col("__valid") && col("__c") === col(goldChimeraCol))
    val fields = Seq(
      ("action", col("__ma")),
      ("chimera_type", col("__mc")),
      ("all_fields", col("__ma") && col("__mc")))
    val perField = fields.map { case (f, m) =>
      parsed.select(col(dayCol).as("eval_day"), lit(f).as("field"),
        col("__valid").as("__v"), coalesce(m, lit(false)).as("__m"))
    }.reduce(_ unionByName _)
    perField.groupBy(col("eval_day"), col("field"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__v"), 1L).otherwise(0L)).as("n_valid"),
        sum(when(col("__m"), 1L).otherwise(0L)).as("n_match"))
      .withColumn("acc_permille", expr("(1000 * n_match) div n"))
  }

  // ---- gated instance ----

  /** Deterministic synthetic predictions over the documents corpus with
    * PLANTED defects, so every scoring branch provably fires inside the
    * gate: doc_id ≡ 3 (mod 7) → truncated (malformed) JSON; ≡ 2 (mod 5)
    * → wrong Action value; ≡ 4 (mod 11) → ChimeraType field missing;
    * else byte-exact gold. Day = doc_id mod 14 (the corpus has no
    * timestamps; the rollup shape is what daily_eval.py:345-352 writes
    * per day). Defect classes overlap (a doc can hit 3 mod 7 AND 2 mod
    * 5); precedence malformed > wrong-value > missing, first match
    * wins, mirrored in the oracle. */
  def jsonFieldEvalDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val gold = ChatTemplate.goldAction(col("doc_id"))
    val exact = ChatTemplate.goldJson(col("doc_id"), col("source"))
    val pred =
      when(pmod(col("doc_id"), lit(7)) === 3,
        concat(lit("[{\"Action\":\""), gold))
      .when(pmod(col("doc_id"), lit(5)) === 2,
        concat(lit("[{\"Action\":\"Unclear\",\"ChimeraType\":\""),
          col("source"), lit("\"}]")))
      .when(pmod(col("doc_id"), lit(11)) === 4,
        concat(lit("[{\"Action\":\""), gold, lit("\"}]")))
      .otherwise(exact)
    score(
      docs.select(pmod(col("doc_id"), lit(14)).cast("int").as("eval_day"),
        pred.as("y_pred"), gold.as("gold_action"),
        col("source").as("gold_chimera")),
      "eval_day", "y_pred", "gold_action", "gold_chimera")
  }

  /** Experiment-vs-experiment comparison — the readout the reference's
    * eval loop exists to produce (daily_eval.py stamps every prediction
    * with `experiment_name` and writes timestamped parquet per run; the
    * next question is always "did the new model beat the old one, per
    * field"): score both variants with [[score]], join per field, and
    * report exact-permille accuracies plus the delta and the pooled
    * eval counts. One extra narrow join over two scoring passes. */
  def compare(a: DataFrame, b: DataFrame, nameA: String, nameB: String,
              dayCol: String, jsonCol: String, goldActionCol: String,
              goldChimeraCol: String): DataFrame = {
    def total(df: DataFrame, sfx: String): DataFrame =
      score(df, dayCol, jsonCol, goldActionCol, goldChimeraCol)
        .groupBy(col("field"))
        .agg(sum("n").as(s"n_$sfx"), sum("n_match").as(s"__m_$sfx"))
        .withColumn(s"acc_${sfx}_permille",
          expr(s"(1000 * __m_$sfx) div n_$sfx"))
        .drop(s"__m_$sfx")
    total(a, "a").join(total(b, "b"), "field")
      .select(col("field"),
        lit(nameA).as("experiment_a"), lit(nameB).as("experiment_b"),
        col("n_a"), col("n_b"),
        col("acc_a_permille"), col("acc_b_permille"),
        (col("acc_b_permille") - col("acc_a_permille"))
          .as("delta_permille"))
  }

  /** Gated instance: experiment A = the [[jsonFieldEvalDocs]] defect
    * profile; experiment B = an "improved model" that fixed the
    * malformed-output class (mod-7 docs emit gold) but regresses a new
    * wrong-value class (mod-13 ≡ 6 → 'Unclear') — so the delta is
    * positive on some fields, negative on none trivially, and every
    * branch fires. */
  def evalExperimentDeltaDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val gold = ChatTemplate.goldAction(col("doc_id"))
    val exact = ChatTemplate.goldJson(col("doc_id"), col("source"))
    val predA =
      when(pmod(col("doc_id"), lit(7)) === 3,
        concat(lit("[{\"Action\":\""), gold))
      .when(pmod(col("doc_id"), lit(5)) === 2,
        concat(lit("[{\"Action\":\"Unclear\",\"ChimeraType\":\""),
          col("source"), lit("\"}]")))
      .when(pmod(col("doc_id"), lit(11)) === 4,
        concat(lit("[{\"Action\":\""), gold, lit("\"}]")))
      .otherwise(exact)
    val predB =
      when(pmod(col("doc_id"), lit(5)) === 2,
        concat(lit("[{\"Action\":\"Unclear\",\"ChimeraType\":\""),
          col("source"), lit("\"}]")))
      .when(pmod(col("doc_id"), lit(13)) === 6,
        concat(lit("[{\"Action\":\"Unclear\",\"ChimeraType\":\""),
          col("source"), lit("\"}]")))
      .otherwise(exact)
    def frame(pred: org.apache.spark.sql.Column): DataFrame =
      docs.select(pmod(col("doc_id"), lit(14)).cast("int").as("eval_day"),
        pred.as("y_pred"), gold.as("gold_action"),
        col("source").as("gold_chimera"))
    compare(frame(predA), frame(predB), "base", "candidate",
      "eval_day", "y_pred", "gold_action", "gold_chimera")
  }

  def deltaOracleSql: String =
    """WITH base AS (
      |  SELECT CASE doc_id % 3 WHEN 0 THEN 'Reboot' WHEN 1 THEN 'Replace'
      |      ELSE 'Inspect' END AS gold_action,
      |    source AS gold_chimera, doc_id,
      |    '[{"Action":"' || CASE doc_id % 3 WHEN 0 THEN 'Reboot'
      |      WHEN 1 THEN 'Replace' ELSE 'Inspect' END
      |      || '","ChimeraType":"' || source || '"}]' AS exact
      |  FROM documents),
      |pa AS (
      |  SELECT gold_action, gold_chimera,
      |    CASE
      |      WHEN doc_id % 7 = 3 THEN '[{"Action":"' || gold_action
      |      WHEN doc_id % 5 = 2 THEN
      |        '[{"Action":"Unclear","ChimeraType":"' || gold_chimera || '"}]'
      |      WHEN doc_id % 11 = 4 THEN '[{"Action":"' || gold_action || '"}]'
      |      ELSE exact
      |    END AS y_pred
      |  FROM base),
      |pb AS (
      |  SELECT gold_action, gold_chimera,
      |    CASE
      |      WHEN doc_id % 5 = 2 OR doc_id % 13 = 6 THEN
      |        '[{"Action":"Unclear","ChimeraType":"' || gold_chimera || '"}]'
      |      ELSE exact
      |    END AS y_pred
      |  FROM base),
      |sa AS (
      |  SELECT CASE WHEN json_valid(y_pred) THEN
      |      json_extract_string(y_pred, '$[0].Action') = gold_action
      |      ELSE false END AS ma,
      |    CASE WHEN json_valid(y_pred) THEN
      |      json_extract_string(y_pred, '$[0].ChimeraType') = gold_chimera
      |      ELSE false END AS mc
      |  FROM pa),
      |sb AS (
      |  SELECT CASE WHEN json_valid(y_pred) THEN
      |      json_extract_string(y_pred, '$[0].Action') = gold_action
      |      ELSE false END AS ma,
      |    CASE WHEN json_valid(y_pred) THEN
      |      json_extract_string(y_pred, '$[0].ChimeraType') = gold_chimera
      |      ELSE false END AS mc
      |  FROM pb),
      |ta AS (
      |  SELECT field, CAST(count(*) AS BIGINT) AS n_a,
      |    CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS nm
      |  FROM (
      |    SELECT 'action' AS field, coalesce(ma, false) AS m FROM sa
      |    UNION ALL SELECT 'chimera_type', coalesce(mc, false) FROM sa
      |    UNION ALL SELECT 'all_fields', coalesce(ma AND mc, false) FROM sa)
      |  GROUP BY field),
      |tb AS (
      |  SELECT field, CAST(count(*) AS BIGINT) AS n_b,
      |    CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS nm
      |  FROM (
      |    SELECT 'action' AS field, coalesce(ma, false) AS m FROM sb
      |    UNION ALL SELECT 'chimera_type', coalesce(mc, false) FROM sb
      |    UNION ALL SELECT 'all_fields', coalesce(ma AND mc, false) FROM sb)
      |  GROUP BY field)
      |SELECT ta.field, 'base' AS experiment_a, 'candidate' AS experiment_b,
      |  ta.n_a, tb.n_b,
      |  (1000 * ta.nm) // ta.n_a AS acc_a_permille,
      |  (1000 * tb.nm) // tb.n_b AS acc_b_permille,
      |  (1000 * tb.nm) // tb.n_b - (1000 * ta.nm) // ta.n_a
      |    AS delta_permille
      |FROM ta JOIN tb USING (field)""".stripMargin

  def oracleSql: String =
    """WITH base AS (
      |  SELECT CAST(doc_id % 14 AS INT) AS eval_day,
      |    CASE doc_id % 3 WHEN 0 THEN 'Reboot' WHEN 1 THEN 'Replace'
      |      ELSE 'Inspect' END AS gold_action,
      |    source AS gold_chimera, doc_id
      |  FROM documents),
      |pred AS (
      |  SELECT eval_day, gold_action, gold_chimera,
      |    CASE
      |      WHEN doc_id % 7 = 3 THEN '[{"Action":"' || gold_action
      |      WHEN doc_id % 5 = 2 THEN
      |        '[{"Action":"Unclear","ChimeraType":"' || gold_chimera || '"}]'
      |      WHEN doc_id % 11 = 4 THEN '[{"Action":"' || gold_action || '"}]'
      |      ELSE '[{"Action":"' || gold_action || '","ChimeraType":"'
      |        || gold_chimera || '"}]'
      |    END AS y_pred
      |  FROM base),
      |scored AS (
      |  -- json_extract on MALFORMED input is an ERROR in DuckDB (not
      |  -- NULL), so extraction stays behind the json_valid CASE guard
      |  SELECT eval_day,
      |    json_valid(y_pred) AS v,
      |    CASE WHEN json_valid(y_pred)
      |      THEN json_extract_string(y_pred, '$[0].Action') = gold_action
      |      ELSE false END AS ma,
      |    CASE WHEN json_valid(y_pred)
      |      THEN json_extract_string(y_pred, '$[0].ChimeraType') = gold_chimera
      |      ELSE false END AS mc
      |  FROM pred),
      |unp AS (
      |  SELECT eval_day, 'action' AS field, v, coalesce(ma, false) AS m FROM scored
      |  UNION ALL
      |  SELECT eval_day, 'chimera_type', v, coalesce(mc, false) FROM scored
      |  UNION ALL
      |  SELECT eval_day, 'all_fields', v, coalesce(ma AND mc, false) FROM scored)
      |SELECT eval_day, field, count(*) AS n,
      |  CAST(sum(CASE WHEN v THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
      |  CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
      |  (1000 * CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT)) // count(*)
      |    AS acc_permille
      |FROM unp GROUP BY eval_day, field""".stripMargin
}
