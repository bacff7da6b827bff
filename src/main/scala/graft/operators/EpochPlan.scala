package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Repeated-epoch training-data allocation under a token budget — the
  * data-constrained scaling recipe (Muennighoff et al. 2023,
  * arXiv:2305.16264: repeating a corpus up to ~4 epochs is nearly as
  * good as fresh data, beyond that returns decay): given per-source
  * unique token counts U_s, a total budget B and an epoch cap R,
  * water-fill an equal per-source level L so that
  * Σ_s min(R·U_s, L) = B — small sources saturate at their capacity
  * R·U_s (capped), the rest share the remaining budget evenly.
  *
  * Exact closed form instead of an iterative fill: sort sources by
  * capacity C_s = R·U_s ascending; source k is capped iff
  * cum_{k−1} + C_k·(n−k+1) ≤ B (if the level were C_k, the budget
  * still fits), a prefix property; then L = (B − cum_capped) div
  * n_uncapped. One window cumsum over the SOURCE table (domain-sized,
  * never the corpus) — the corpus is touched once by the per-source
  * token aggregate. Integer floors throughout; ≤ n_uncapped tokens of
  * the budget stay unallocated by the floor (declared).
  *
  * This is the planning half that [[Sampling]]'s submix/temperature
  * keys execute: epochs_permille feeds the per-source repeat factor a
  * shard-writer applies.
  */
object EpochPlan {

  /** Per source: (source, unique_tokens, capacity_tokens, alloc_tokens,
    * epochs_permille, capped). `budget`/`epochCap` are the paper's B
    * and R. Requires positive per-source token counts. */
  def plan(tokensPerSource: DataFrame, sourceCol: String, tokCol: String,
           budget: Long, epochCap: Int): DataFrame = {
    require(epochCap >= 1 && budget >= 0)
    import org.apache.spark.sql.expressions.Window
    // domain-sized frame: the unpartitioned windows run over one row
    // per SOURCE (a handful), never data-shaped
    val w = Window.orderBy(col("capacity_tokens"), col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = tokensPerSource.select(
      col(sourceCol).as("source"),
      col(tokCol).cast("long").as("unique_tokens"))
      .withColumn("capacity_tokens", col("unique_tokens") * epochCap)
      .withColumn("__cum", sum("capacity_tokens").over(w))
      .withColumn("__idx", row_number().over(
        Window.orderBy(col("capacity_tokens"), col("source"))))
      .withColumn("__n", count(lit(1)).over(
        Window.orderBy(lit(1)).rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      // capped iff even a level AT this capacity still fits the budget
      .withColumn("capped",
        (col("__cum") - col("capacity_tokens")) +
          col("capacity_tokens") * (col("__n") - col("__idx") + 1)
          <= budget)
    val lvl = base.agg(
      coalesce(sum(when(col("capped"), col("capacity_tokens"))), lit(0L))
        .as("__capsum"),
      sum(when(col("capped"), 1L).otherwise(0L)).as("__ncap"),
      first(col("__n")).as("__nn"))
      .withColumn("__level", when(col("__ncap") < col("__nn"),
        expr(s"($budget - __capsum) div (__nn - __ncap)")))
    base.crossJoin(broadcast(lvl))
      .withColumn("alloc_tokens",
        when(col("capped"), col("capacity_tokens"))
          .otherwise(least(col("capacity_tokens"), col("__level"))))
      .withColumn("epochs_permille",
        expr("(1000 * alloc_tokens) div unique_tokens"))
      .select("source", "unique_tokens", "capacity_tokens",
        "alloc_tokens", "epochs_permille", "capped")
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: whitespace tokens per document source, budget =
    * ⌊3.9 × corpus tokens⌋ at epoch cap 4 — high enough that the small
    * sources saturate at 4 epochs while the large ones water-fill
    * below it, so both branches sit inside the gate. */
  def epochPlanDocs(spark: SparkSession, dir: String): DataFrame = {
    val u = Tables.documents(spark, dir)
      .select(col("source"),
        size(split(col("text"), "\\s+")).cast("long").as("toks"))
      .groupBy("source").agg(sum("toks").as("unique_tokens"))
      .localCheckpoint() // consumed by the plan AND the budget scalar
    plan(u, "source", "unique_tokens", corpusBudget(u), epochCap = 4)
  }

  /** ⌊3.9 × corpus tokens⌋, with a loud failure on an empty corpus
    * (a null sum would otherwise surface as an opaque NPE at getLong). */
  private def corpusBudget(u: DataFrame): Long = {
    val row = u.agg(sum("unique_tokens")).collect()(0)
    require(!row.isNullAt(0),
      "epoch plan: empty corpus — no per-source token counts to budget")
    row.getLong(0) * 39L / 10L
  }

  /** Execute a plan: expand each document to its repeat copies — the
    * shard-writer step after [[plan]]. Whole epochs repeat every doc;
    * the fractional remainder epoch admits docs by the deterministic
    * [[Sampling.portableBucket]] draw against the per-source threshold
    * ⌊rem·M/U⌋, so the materialized token count matches the allocation
    * in expectation with zero RNG state (the importance_select
    * discipline). Output: (doc id, slice, copy_idx, tokens) — one
    * broadcast of the domain-sized plan + one explode, linear in the
    * output. Requires an integral id column (the portableBucket
    * contract).
    *
    * PRECONDITION: every `sliceCol` value in `docs` must appear in
    * `planned` (docs-sources ⊆ plan-sources) — the plan join is inner,
    * so a document whose slice is absent from the plan is treated as
    * allocated zero copies. Both gated instances derive the plan from
    * the same docs frame, which satisfies this by construction; a
    * caller pairing a stale plan with a grown corpus must re-plan (or
    * diff `docs.select(slice).distinct` against the plan) first. */
  def materialize(docs: DataFrame, idCol: String, sliceCol: String,
                  tokCol: String, planned: DataFrame): DataFrame = {
    val p = planned.select(col("source"), col("unique_tokens"),
      col("alloc_tokens"))
    docs.select(col(idCol), col(sliceCol).as("source"),
        col(tokCol).cast("long").as("n_tokens"))
      .join(broadcast(p), "source")
      .withColumn("__full", expr("alloc_tokens div unique_tokens"))
      .withColumn("__thr", expr(
        s"((alloc_tokens - __full * unique_tokens) * ${Sampling.M}) div unique_tokens"))
      .withColumn("n_copies", col("__full") +
        when(Sampling.portableBucket(col(idCol)) < col("__thr"), 1L)
          .otherwise(0L))
      .filter(col("n_copies") >= 1)
      .select(col(idCol), col("source"),
        explode(expr("sequence(1, n_copies)")).as("copy_idx"),
        col("n_tokens"))
  }

  def epochMaterializeDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), "\\s+")).cast("long").as("toks"))
      .localCheckpoint() // feeds the plan aggregate AND the expansion
    val u = docs.groupBy("source").agg(sum("toks").as("unique_tokens"))
      .localCheckpoint()
    materialize(docs, "doc_id", "source", "toks",
      plan(u, "source", "unique_tokens", corpusBudget(u), epochCap = 4))
  }

  /** The plan chain (u/b/s/f/lvl) shared by both oracles; the final
    * per-source allocation is the `f`+`lvl` CASE. */
  private def planOracleCtes: String =
    """u AS (
      |  SELECT source,
      |    CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT)
      |      AS unique_tokens
      |  FROM documents GROUP BY source
      |), b AS (
      |  SELECT CAST(sum(unique_tokens) * 39 // 10 AS BIGINT) AS budget FROM u
      |), s AS (
      |  SELECT source, unique_tokens,
      |    unique_tokens * 4 AS capacity_tokens,
      |    CAST(sum(unique_tokens * 4) OVER (ORDER BY unique_tokens * 4, source
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |    CAST(ROW_NUMBER() OVER (ORDER BY unique_tokens * 4, source) AS BIGINT) AS idx,
      |    CAST(count(*) OVER () AS BIGINT) AS n
      |  FROM u
      |), f AS (
      |  SELECT s.*, b.budget,
      |    (cum - capacity_tokens) + capacity_tokens * (n - idx + 1) <= b.budget
      |      AS capped
      |  FROM s CROSS JOIN b
      |), lvl AS (
      |  SELECT coalesce(sum(CASE WHEN capped THEN capacity_tokens END), 0) AS capsum,
      |    CAST(sum(CASE WHEN capped THEN 1 ELSE 0 END) AS BIGINT) AS ncap,
      |    CAST(max(n) AS BIGINT) AS nn, max(budget) AS budget
      |  FROM f
      |), alloc AS (
      |  SELECT f.source, f.unique_tokens, f.capacity_tokens,
      |    CAST(CASE WHEN f.capped THEN f.capacity_tokens
      |      ELSE least(f.capacity_tokens,
      |        (l.budget - l.capsum) // (l.nn - l.ncap)) END AS BIGINT)
      |      AS alloc_tokens,
      |    f.capped
      |  FROM f CROSS JOIN lvl l
      |)""".stripMargin

  def oracleSql: String =
    "WITH " + planOracleCtes + "\n" +
      """SELECT source, unique_tokens, capacity_tokens, alloc_tokens,
        |  CAST((1000 * alloc_tokens) // unique_tokens AS BIGINT)
        |    AS epochs_permille,
        |  capped
        |FROM alloc""".stripMargin

  def materializeOracleSql: String =
    "WITH " + planOracleCtes + ",\n" +
      s"""docs AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens
        |  FROM documents
        |), mm AS (
        |  SELECT d.doc_id, d.source, d.n_tokens,
        |    a.alloc_tokens // a.unique_tokens AS fullc,
        |    ((a.alloc_tokens - (a.alloc_tokens // a.unique_tokens) * a.unique_tokens)
        |      * ${Sampling.M}) // a.unique_tokens AS thr
        |  FROM docs d JOIN alloc a USING (source)
        |), e AS (
        |  SELECT doc_id, source, n_tokens,
        |    fullc + CASE WHEN
        |      (((doc_id % 100003) * 1103515245 + 12345) % ${Sampling.M}
        |        + ${Sampling.M}) % ${Sampling.M} < thr
        |      THEN 1 ELSE 0 END AS n_copies
        |  FROM mm
        |)
        |SELECT doc_id, source,
        |  CAST(unnest(range(1, n_copies + 1)) AS BIGINT) AS copy_idx,
        |  n_tokens
        |FROM e WHERE n_copies >= 1""".stripMargin
}
