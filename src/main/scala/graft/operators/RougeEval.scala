package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** ROUGE-1 generation scoring — the reference's eval loop metric
  * (/root/reference/NLP/llama2/src/eval.py:45,77-88 scores every
  * prediction against gold with rouge1 precision/recall): unigram
  * overlap with CLIPPED counts,
  *   prec = Σ_w min(c_pred(w), c_gold(w)) / |pred|,
  *   recall = same numerator / |gold|,  F1 = 2·Σmin / (|pred|+|gold|)
  * — all ratios of integers, so the whole metric is exact micros.
  *
  * Relational shape: explode both token arrays, count per (id, word)
  * each side, one equi-join on (id, word) takes the min — never a
  * per-row bag-intersection UDF — then pooled per class by dividing
  * the SUMMED numerators by the SUMMED lengths (micro-average, the
  * way a daily eval rolls up; per-example macro means hide length
  * effects and stack float error). Every count is BIGINT; divisions
  * are truncating with positive operands (= floor) on both engines.
  *
  * Scale: two explodes + one (id, word)-keyed join — linear in token
  * volume, the same cost envelope as [[graft.functions.TextScoring]]'s
  * tf-idf; nothing driver-side.
  */
object RougeEval {

  /** Pooled ROUGE-1 per class: (eval_class, n_docs, clipped_tokens,
    * pred_tokens, gold_tokens, prec_micros, recall_micros, f1_micros).
    * `predToks`/`goldToks` are array<string> columns. */
  def rouge1Pooled(pairs: DataFrame, idCol: String, classCol: String,
                   predToks: Column, goldToks: Column): DataFrame = {
    val base = pairs.select(col(idCol).as("__id"),
      col(classCol).as("eval_class"),
      predToks.as("__p"), goldToks.as("__g"))
      .localCheckpoint() // consumed by the explode pass AND the length pass
    val cp = base.select(col("__id"), explode(col("__p")).as("__w"))
      .groupBy("__id", "__w").agg(count(lit(1)).as("__cp"))
    val cg = base.select(col("__id"), explode(col("__g")).as("__w"))
      .groupBy("__id", "__w").agg(count(lit(1)).as("__cg"))
    val clip = cp.join(cg, Seq("__id", "__w"))
      .groupBy("__id")
      .agg(sum(least(col("__cp"), col("__cg"))).as("__clip"))
    base.select(col("__id"), col("eval_class"),
        size(col("__p")).cast("long").as("__pl"),
        size(col("__g")).cast("long").as("__gl"))
      .join(clip, Seq("__id"), "left")
      .na.fill(0L, Seq("__clip"))
      .groupBy("eval_class")
      .agg(count(lit(1)).as("n_docs"),
        sum("__clip").as("clipped_tokens"),
        sum("__pl").as("pred_tokens"),
        sum("__gl").as("gold_tokens"))
      .selectExpr("eval_class", "n_docs", "clipped_tokens",
        "pred_tokens", "gold_tokens",
        "(1000000 * clipped_tokens) div pred_tokens AS prec_micros",
        "(1000000 * clipped_tokens) div gold_tokens AS recall_micros",
        "(2000000 * clipped_tokens) div (pred_tokens + gold_tokens) AS f1_micros")
  }

  // ---- query-map entries (hash-gated) ----

  /** The shared planted (pred, gold) pairs: gold = the doc's own
    * lowercased whitespace tokens; predictions planted per doc-id
    * class so every branch of the metric fires — `dup_half` (first
    * half REPEATED: clipping must cap the duplicates), `subst3` (first
    * three tokens replaced by an out-of-vocab token: symmetric
    * misses), `head5` (truncation: precision 1, low recall), `exact`
    * (both 1). Class precedence mirrors [[JsonFieldEval]]: first match
    * wins. */
  private def plantedPairs(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
      .withColumn("n", size(col("toks")))
    d.select(col("doc_id"), col("toks"),
      when(pmod(col("doc_id"), lit(7)) === 3, lit("dup_half"))
        .when(pmod(col("doc_id"), lit(5)) === 2, lit("subst3"))
        .when(pmod(col("doc_id"), lit(11)) === 4, lit("head5"))
        .otherwise(lit("exact")).as("eval_class"),
      expr("""CASE
        | WHEN doc_id % 7 = 3 THEN concat(
        |   slice(toks, 1, greatest(1, n div 2)),
        |   slice(toks, 1, greatest(1, n div 2)))
        | WHEN doc_id % 5 = 2 THEN CASE WHEN n >= 4
        |   THEN concat(array('zzz', 'zzz', 'zzz'), slice(toks, 4, n - 3))
        |   ELSE array('zzz') END
        | WHEN doc_id % 11 = 4 THEN slice(toks, 1, least(5, n))
        | ELSE toks END""".stripMargin).as("pred"))
  }

  def rouge1Docs(spark: SparkSession, dir: String): DataFrame = {
    val p = plantedPairs(spark, dir)
    rouge1Pooled(p, "doc_id", "eval_class", col("pred"), col("toks"))
  }

  /** Adjacent-token bigram of an array column expression by NAME. */
  private def bigrams(c: String): Column =
    when(size(col(c)) >= 2, expr(
      s"zip_with(slice($c, 1, size($c) - 1), slice($c, 2, size($c) - 1), " +
        "(a, b) -> concat(a, ' ', b))"))
      .otherwise(expr("CAST(array() AS ARRAY<STRING>)"))

  /** ROUGE-2: the same clipped-count machinery over adjacent-token
    * BIGRAMS (eval.py's scorer exposes rouge2 the same way) — order
    * now matters: `dup_half`'s repeat seam and `subst3`'s boundary
    * bigrams miss where their unigrams hit. Pairs shorter than 2
    * tokens contribute zero windows on that side (pooled micro-average
    * absorbs them; a zero pooled length would be a degenerate corpus). */
  def rouge2Docs(spark: SparkSession, dir: String): DataFrame = {
    val p = plantedPairs(spark, dir)
      .select(col("doc_id"), col("eval_class"),
        bigrams("pred").as("pred2"), bigrams("toks").as("gold2"))
    rouge1Pooled(p, "doc_id", "eval_class", col("pred2"), col("gold2"))
  }

  /** ROUGE-L — LCS-based scoring over the SAME planted-pairs chain
    * (eval.py's rouge_scorer exposes rougeL through the identical
    * interface): prec = LCS/|pred|, recall = LCS/|gold|, pooled exact
    * micros like [[rouge1Pooled]]. Both sides are token-capped at
    * [[RougeLCap]] (eval metrics run over bounded summaries; an
    * uncapped corpus-side LCS is inherently quadratic — declared), and
    * the LCS itself is the codegen'd [[graft.functions.LcsLength]]
    * primitive loop, not an interpreted HOF fold. Unlike clipped
    * n-grams, LCS respects order WITHOUT requiring adjacency: a
    * transposition costs exactly one token (spec-pinned). */
  def rougeLPooled(pairs: DataFrame, idCol: String, classCol: String,
                   predToks: Column, goldToks: Column,
                   cap: Int): DataFrame = {
    val base = pairs.select(col(idCol).as("__id"),
      col(classCol).as("eval_class"),
      slice(predToks, 1, cap).as("__p"), slice(goldToks, 1, cap).as("__g"))
    base.select(col("eval_class"),
        graft.functions.Native.call("graft_lcs_length",
          exprs => graft.functions.LcsLength(exprs(0), exprs(1)),
          col("__p"), col("__g")).as("__lcs"),
        size(col("__p")).cast("long").as("__pl"),
        size(col("__g")).cast("long").as("__gl"))
      .groupBy("eval_class")
      .agg(count(lit(1)).as("n_docs"),
        sum("__lcs").as("lcs_tokens"),
        sum("__pl").as("pred_tokens"),
        sum("__gl").as("gold_tokens"))
      .selectExpr("eval_class", "n_docs", "lcs_tokens",
        "pred_tokens", "gold_tokens",
        "(1000000 * lcs_tokens) div pred_tokens AS prec_micros",
        "(1000000 * lcs_tokens) div gold_tokens AS recall_micros",
        "(2000000 * lcs_tokens) div (pred_tokens + gold_tokens) AS f1_micros")
  }

  val RougeLCap = 40

  def rougeLDocs(spark: SparkSession, dir: String): DataFrame = {
    val p = plantedPairs(spark, dir)
    rougeLPooled(p, "doc_id", "eval_class", col("pred"), col("toks"),
      RougeLCap)
  }

  /** LCS in the oracle: the classic DP folded with list_reduce — the
    * accumulator is the DP row, each pred token rides as its gold
    * MATCH VECTOR (so accumulator and elements share the LIST<BIGINT>
    * type list_reduce requires), and the sequential dp_new[j−1]
    * dependency is eliminated by the prefix-max identity
    * dp_new[j] = max(dp_old[j], max_{k≤j, gold_k=p}(dp_old[k−1]+1)).
    * O(cap³) per doc — fine at the oracle's sf0.01 gate. */
  def rougeLOracleSql: String =
    "WITH " + plantedCtes + ",\n" +
      s"""wp AS (
        |  SELECT doc_id, eval_class,
        |    pred[1:least(len(pred), $RougeLCap)] AS pred,
        |    gold[1:least(len(gold), $RougeLCap)] AS gold
        |  FROM wp0
        |), mv AS (
        |  SELECT doc_id, eval_class,
        |    CAST(len(pred) AS BIGINT) AS pl, CAST(len(gold) AS BIGINT) AS gl,
        |    list_transform(pred, p -> list_transform(gold,
        |      g -> CAST(CASE WHEN g = p THEN 1 ELSE 0 END AS BIGINT))) AS mvs,
        |    [CAST(0 AS BIGINT)
        |     FOR x IN range(0, CAST(len(gold) AS BIGINT) + 1)] AS ini
        |  FROM wp
        |), l AS (
        |  SELECT doc_id, eval_class, pl, gl,
        |    coalesce(list_max(
        |      list_reduce(list_prepend(ini, mvs), (dp, m) ->
        |        list_prepend(CAST(0 AS BIGINT),
        |          [greatest(dp[CAST(j AS INT) + 1],
        |             coalesce(list_max([dp[CAST(k AS INT)] + 1
        |               FOR k IN range(1, j + 1) IF m[CAST(k AS INT)] = 1]), 0))
        |           FOR j IN range(1, CAST(len(m) AS BIGINT) + 1)]))), 0)
        |      AS lcs
        |  FROM mv
        |)
        |SELECT eval_class, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(lcs) AS BIGINT) AS lcs_tokens,
        |  CAST(sum(pl) AS BIGINT) AS pred_tokens,
        |  CAST(sum(gl) AS BIGINT) AS gold_tokens,
        |  CAST((1000000 * sum(lcs)) // sum(pl) AS BIGINT) AS prec_micros,
        |  CAST((1000000 * sum(lcs)) // sum(gl) AS BIGINT) AS recall_micros,
        |  CAST((2000000 * sum(lcs)) // (sum(pl) + sum(gl)) AS BIGINT)
        |    AS f1_micros
        |FROM l GROUP BY eval_class""".stripMargin

  /** Generation diversity — distinct-1 / distinct-2 (Li et al. 2016,
    * "A Diversity-Promoting Objective", arXiv:1510.03055: the ratio of
    * DISTINCT n-grams to total n-grams across a generation set; low
    * values expose mode collapse / repetition): pooled per class over
    * the same planted generations, exact permille. Two explode +
    * count/count-distinct aggregates — the [[graft.functions
    * .TextFunctions]] cost envelope. The dup_half class MUST score
    * lower distinct-1 than exact (its duplicates halve the distinct
    * mass) — pinned in the spec. */
  def genDiversity(pairs: DataFrame, classCol: String,
                   toksCol: Column): DataFrame = {
    val p = pairs.select(col(classCol).as("eval_class"),
        toksCol.as("pred"))
      .withColumn("pred2", bigrams("pred"))
      .localCheckpoint() // consumed by both n-gram passes
    def level(c: String, n: Int): DataFrame =
      p.select(col("eval_class"), explode(col(c)).as("__w"))
        .groupBy("eval_class")
        .agg(count(lit(1)).as(s"n_${n}grams"),
          countDistinct(col("__w")).as(s"distinct_$n"))
        .withColumn(s"d${n}_permille",
          expr(s"(1000 * distinct_$n) div n_${n}grams"))
    level("pred", 1).join(level("pred2", 2), "eval_class")
  }

  def genDiversityDocs(spark: SparkSession, dir: String): DataFrame =
    genDiversity(plantedPairs(spark, dir), "eval_class", col("pred"))

  def genDiversityOracleSql: String =
    "WITH " + plantedCtes + ",\n" +
      """u1 AS (
        |  SELECT eval_class, CAST(count(*) AS BIGINT) AS n_1grams,
        |    CAST(count(DISTINCT w) AS BIGINT) AS distinct_1
        |  FROM (SELECT eval_class, unnest(pred) AS w FROM wp0)
        |  GROUP BY eval_class
        |), b0 AS (
        |  SELECT eval_class,
        |    CASE WHEN len(pred) >= 2
        |      THEN [pred[i] || ' ' || pred[i + 1] FOR i IN range(1, len(pred))]
        |      ELSE [] END AS pred2
        |  FROM wp0
        |), u2 AS (
        |  SELECT eval_class, CAST(count(*) AS BIGINT) AS n_2grams,
        |    CAST(count(DISTINCT w) AS BIGINT) AS distinct_2
        |  FROM (SELECT eval_class, unnest(pred2) AS w FROM b0)
        |  GROUP BY eval_class
        |)
        |SELECT u1.eval_class, u1.n_1grams, u1.distinct_1,
        |  CAST((1000 * u1.distinct_1) // u1.n_1grams AS BIGINT) AS d1_permille,
        |  u2.n_2grams, u2.distinct_2,
        |  CAST((1000 * u2.distinct_2) // u2.n_2grams AS BIGINT) AS d2_permille
        |FROM u1 JOIN u2 USING (eval_class)""".stripMargin

  /** The planted-pairs CTE chain (`d`, `wp` with pred/gold lists). */
  private def plantedCtes: String =
    """d AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks,
      |    len(string_split_regex(lower(text), '\s+')) AS n
      |  FROM documents
      |), wp0 AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 7 = 3 THEN 'dup_half'
      |         WHEN doc_id % 5 = 2 THEN 'subst3'
      |         WHEN doc_id % 11 = 4 THEN 'head5'
      |         ELSE 'exact' END AS eval_class,
      |    CASE
      |      WHEN doc_id % 7 = 3 THEN list_concat(
      |        list_slice(toks, 1, greatest(1, n // 2)),
      |        list_slice(toks, 1, greatest(1, n // 2)))
      |      WHEN doc_id % 5 = 2 THEN CASE WHEN n >= 4
      |        THEN list_concat(['zzz', 'zzz', 'zzz'], list_slice(toks, 4, n))
      |        ELSE ['zzz'] END
      |      WHEN doc_id % 11 = 4 THEN list_slice(toks, 1, least(5, n))
      |      ELSE toks END AS pred,
      |    toks AS gold
      |  FROM d
      |)""".stripMargin

  /** The clipped-count scoring chain over a `wp(doc_id, eval_class,
    * pred, gold)` CTE. */
  private def scoringSql: String =
    """cp AS (
      |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
      |  FROM (SELECT doc_id, unnest(pred) AS w FROM wp) GROUP BY 1, 2
      |), cg AS (
      |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
      |  FROM (SELECT doc_id, unnest(gold) AS w FROM wp) GROUP BY 1, 2
      |), clip AS (
      |  SELECT cp.doc_id, CAST(sum(least(cp.c, cg.c)) AS BIGINT) AS clip
      |  FROM cp JOIN cg ON cg.doc_id = cp.doc_id AND cg.w = cp.w
      |  GROUP BY 1
      |), rows_ AS (
      |  SELECT wp.eval_class, CAST(len(wp.pred) AS BIGINT) AS pl,
      |    CAST(len(wp.gold) AS BIGINT) AS gl, coalesce(c.clip, 0) AS clip
      |  FROM wp LEFT JOIN clip c ON c.doc_id = wp.doc_id
      |)
      |SELECT eval_class, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(clip) AS BIGINT) AS clipped_tokens,
      |  CAST(sum(pl) AS BIGINT) AS pred_tokens,
      |  CAST(sum(gl) AS BIGINT) AS gold_tokens,
      |  CAST((1000000 * sum(clip)) // sum(pl) AS BIGINT) AS prec_micros,
      |  CAST((1000000 * sum(clip)) // sum(gl) AS BIGINT) AS recall_micros,
      |  CAST((2000000 * sum(clip)) // (sum(pl) + sum(gl)) AS BIGINT) AS f1_micros
      |FROM rows_ GROUP BY eval_class""".stripMargin

  def oracleSql: String =
    "WITH " + plantedCtes + ",\n" +
      "wp AS (SELECT * FROM wp0),\n" + scoringSql

  def rouge2OracleSql: String =
    "WITH " + plantedCtes + ",\n" +
      """wp AS (
        |  SELECT doc_id, eval_class,
        |    CASE WHEN len(pred) >= 2
        |      THEN [pred[i] || ' ' || pred[i + 1] FOR i IN range(1, len(pred))]
        |      ELSE [] END AS pred,
        |    CASE WHEN len(gold) >= 2
        |      THEN [gold[i] || ' ' || gold[i + 1] FOR i IN range(1, len(gold))]
        |      ELSE [] END AS gold
        |  FROM wp0
        |)""".stripMargin + ",\n" + scoringSql
}
