package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Offline ranking-evaluation metrics — nDCG@k, MRR, precision@k per
  * query group — the scoreboard of the reference's recommender work
  * (/root/reference/MachineLearning/Ray/recsys/ray_train_pointwise.py
  * trains pointwise rankers; this is the distributed evaluation those
  * scores feed). The classification twin is [[ExactAuc]]; this is the
  * RANKED-LIST side of model evaluation.
  *
  * Determinism discipline: the 1/log₂(pos+1) discount table is
  * PRECOMPUTED in Scala and embedded as integer-micros literals in
  * both engines (positions ≤ k, a fixed k-element set) — so unlike a
  * per-row libm call, no transcendental ever runs inside either
  * engine. Ranks use TOTAL orders ((score DESC, item ASC) for the
  * model ranking; (rel DESC, item ASC) for the ideal), gains and DCG
  * sums are exact BIGINT micros, and the final ratios are truncating
  * BIGINT division — micro-resolution metrics, engine-exact.
  *
  * Scale: one shuffle on the group key; two per-group window sorts
  * (model order, ideal order) at per-group cardinality; one aggregate.
  * Output = one row per group. No corpus-wide window anywhere.
  */
object RankMetrics {

  /** 1e6/log₂(pos+1) for pos = 1..k, micros-rounded once here. */
  private[graft] def discounts(k: Int): Seq[Long] =
    (1 to k).map(p => math.round(1e6 / (math.log(p + 1.0) / math.log(2.0))))

  private[graft] def discountSql(k: Int): String =
    discounts(k).mkString("[", ", ", "]")

  /** Per-group ranking metrics over (group, item, score, rel) rows:
    * (group, n_items, dcg_micros, idcg_micros, ndcg_permicro,
    * rr_micros, prec_at_k_permicro). `rel` is a small non-negative
    * integer grade; `relevant` is the grade floor counted by MRR and
    * precision. Groups with idcg = 0 (no relevant items) emit NULL
    * ndcg; groups with no item ≥ `relevant` emit rr_micros = 0. */
  def rankingMetrics(df: DataFrame, groupCol: String, itemCol: String,
                     scoreCol: String, relCol: String,
                     k: Int, relevant: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val disc = discounts(k)
    val wModel = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(itemCol).asc)
    val wIdeal = Window.partitionBy(col(groupCol))
      .orderBy(col(relCol).desc, col(itemCol).asc)
    val discArr = array(disc.map(lit): _*)
    val scored = df
      .withColumn("__pos", row_number().over(wModel))
      .withColumn("__ipos", row_number().over(wIdeal))
      .withColumn("__gain",
        when(col("__pos") <= k,
          col(relCol) * element_at(discArr, col("__pos"))).otherwise(lit(0L)))
      .withColumn("__igain",
        when(col("__ipos") <= k,
          col(relCol) * element_at(discArr, col("__ipos"))).otherwise(lit(0L)))
    scored.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_items"),
        sum("__gain").as("dcg_micros"),
        sum("__igain").as("idcg_micros"),
        min(when(col(relCol) >= relevant, col("__pos"))).as("__first_rel"),
        sum(when(col("__pos") <= k && col(relCol) >= relevant, 1L)
          .otherwise(0L)).as("__hits"))
      .withColumn("ndcg_permicro",
        when(col("idcg_micros") > 0,
          expr("(1000000 * dcg_micros) div idcg_micros")))
      .withColumn("rr_micros",
        coalesce(expr("1000000 div __first_rel"), lit(0L)))
      .withColumn("prec_at_k_permicro", expr(s"(1000000 * __hits) div $k"))
      .drop("__first_rel", "__hits")
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: per user, events ranked by value (exact cents,
    * event_id tie-break) against the graded relevance `props.k mod 4`
    * — nDCG@10 / MRR / P@10 with grade-2 relevance floor. */
  def ndcgEvents(spark: SparkSession, dir: String): DataFrame =
    rankingMetrics(
      Tables.events(spark, dir).select(
        col("user_id"), col("event_id"),
        round(col("value") * 100).cast("long").as("score_cents"),
        (get_json_object(col("props"), "$.k").cast("long") % 4).as("rel")),
      "user_id", "event_id", "score_cents", "rel", k = 10, relevant = 2)

  def oracleSql: String =
    s"""WITH base AS (
      |  SELECT user_id, event_id,
      |    CAST(round(value * 100) AS BIGINT) AS score_cents,
      |    CAST(json_extract_string(props, '$$.k') AS BIGINT) % 4 AS rel
      |  FROM events
      |), ranked AS (
      |  SELECT *,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY score_cents DESC, event_id ASC) AS pos,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY rel DESC, event_id ASC) AS ipos
      |  FROM base
      |), gains AS (
      |  SELECT user_id, rel, pos,
      |    CASE WHEN pos <= 10
      |      THEN rel * (${discountSql(10)})[CAST(pos AS INT)] ELSE 0 END AS gain,
      |    CASE WHEN ipos <= 10
      |      THEN rel * (${discountSql(10)})[CAST(ipos AS INT)] ELSE 0 END AS igain
      |  FROM ranked
      |), agg AS (
      |  SELECT user_id, count(*) AS n_items,
      |    CAST(sum(gain) AS BIGINT) AS dcg_micros,
      |    CAST(sum(igain) AS BIGINT) AS idcg_micros,
      |    min(CASE WHEN rel >= 2 THEN pos END) AS first_rel,
      |    CAST(sum(CASE WHEN pos <= 10 AND rel >= 2 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS hits
      |  FROM gains GROUP BY user_id
      |)
      |SELECT user_id, n_items, dcg_micros, idcg_micros,
      |  CASE WHEN idcg_micros > 0
      |    THEN (1000000 * dcg_micros) // idcg_micros END AS ndcg_permicro,
      |  coalesce(1000000 // first_rel, 0) AS rr_micros,
      |  (1000000 * hits) // 10 AS prec_at_k_permicro
      |FROM agg""".stripMargin
}
