package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** One distributed ALS half-step in exact integer arithmetic — the
  * matrix-factorization training primitive under the reference's
  * recommender loop (/root/reference/MachineLearning/Ray/recsys/
  * ray_train_pointwise.py learns user/item embeddings from labeled
  * pairs; ALS is the relational way to fit the same factors): holding
  * rank-2 item factors fixed, every user's factor solve is an
  * INDEPENDENT 2×2 ridge normal-equation system — one groupBy away,
  * the [[graft.operators.LinReg]] Cramer discipline per user, gating
  * the alternation's inner iteration the way kmeans_step gates Lloyd.
  *
  * Item factors are the deterministic milli init both engines derive
  * from the item id (the codebook-free bootstrap round; subsequent
  * alternations would feed solved factors back the kmeans_step2 way).
  * ALS-WR regularization λ·n_u rides the diagonal so every user with
  * ≥ 1 rating has det > 0 (positive definite) — no NULL solves, no
  * float: sufficient statistics are BIGINT sums, the solve is
  * DECIMAL(38) cross-multiplication, factors come out in sign-split
  * truncating micros. One corpus touch (the ratings join), then one
  * user-keyed aggregate; the solve is O(1) arithmetic per user row.
  */
object AlsStep {
  val LambdaMm = 1000L // ALS-WR λ in milli² units, per rating (~2% of a typical ‖v‖²)

  /** Deterministic rank-2 item factor init in milli, engine-portable. */
  private def itemInit(item: String): (String, String) =
    (s"(($item * 31) % 1001) - 500", s"(($item * 57) % 1001) - 500")

  /** Per-user solved factors (user, n_ratings, x1_micro, x2_micro)
    * from (userCol, itemCol, ratingCol integer) triples. */
  def userFactors(ratings: DataFrame, userCol: String, itemCol: String,
                  ratingCol: String): DataFrame = {
    val (v1, v2) = itemInit(itemCol)
    val stats = ratings
      .select(col(userCol).as("u"), expr(v1).as("v1"), expr(v2).as("v2"),
        col(ratingCol).cast("long").as("r"))
      .groupBy(col("u"))
      .agg(count(lit(1)).as("n_ratings"),
        sum(expr("v1 * v1")).as("a11"),
        sum(expr("v1 * v2")).as("a12"),
        sum(expr("v2 * v2")).as("a22"),
        sum(expr("v1 * r")).as("b1"),
        sum(expr("v2 * r")).as("b2"))
    stats.select(col("u"), col("n_ratings"),
        (col("a11") + lit(LambdaMm) * col("n_ratings"))
          .cast("decimal(38,0)").as("r11"),
        col("a12").cast("decimal(38,0)").as("r12"),
        (col("a22") + lit(LambdaMm) * col("n_ratings"))
          .cast("decimal(38,0)").as("r22"),
        col("b1").cast("decimal(38,0)").as("d1"),
        col("b2").cast("decimal(38,0)").as("d2"))
      .select(col("u"), col("n_ratings"),
        signedDiv("1000000 * (d1 * r22 - d2 * r12)",
          "r11 * r22 - r12 * r12").as("x1_micro"),
        signedDiv("1000000 * (d2 * r11 - d1 * r12)",
          "r11 * r22 - r12 * r12").as("x2_micro"))
  }

  /** Sign-split truncating division (the repo-wide div discipline). */
  private def signedDiv(num: String, den: String) = expr(
    s"(CASE WHEN ($num) < 0 THEN -1L ELSE 1L END) * (abs($num) div ($den))")

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: users = customers, items = parts, rating =
    * lineitem quantity (orders⋈lineitem). */
  def alsStepOrders(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"),
        round(col("l_quantity")).cast("long").as("r"))
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val ratings = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .select(col("o_custkey").as("custkey"), col("l_partkey").as("part"), col("r"))
    userFactors(ratings, "custkey", "part", "r")
  }

  def oracleSql: String =
    s"""WITH ratings AS (
      |  SELECT o.o_custkey AS u,
      |    ((l.l_partkey * 31) % 1001) - 500 AS v1,
      |    ((l.l_partkey * 57) % 1001) - 500 AS v2,
      |    CAST(round(l.l_quantity) AS BIGINT) AS r
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |), stats AS (
      |  SELECT u, CAST(count(*) AS BIGINT) AS n_ratings,
      |    CAST(sum(v1 * v1) + $LambdaMm * count(*) AS HUGEINT) AS r11,
      |    CAST(sum(v1 * v2) AS HUGEINT) AS r12,
      |    CAST(sum(v2 * v2) + $LambdaMm * count(*) AS HUGEINT) AS r22,
      |    CAST(sum(v1 * r) AS HUGEINT) AS d1,
      |    CAST(sum(v2 * r) AS HUGEINT) AS d2
      |  FROM ratings GROUP BY 1
      |)
      |SELECT u, n_ratings,
      |  CAST((CASE WHEN 1000000 * (d1 * r22 - d2 * r12) < 0 THEN -1 ELSE 1 END)
      |    * (abs(1000000 * (d1 * r22 - d2 * r12))
      |        // (r11 * r22 - r12 * r12)) AS BIGINT) AS x1_micro,
      |  CAST((CASE WHEN 1000000 * (d2 * r11 - d1 * r12) < 0 THEN -1 ELSE 1 END)
      |    * (abs(1000000 * (d2 * r11 - d1 * r12))
      |        // (r11 * r22 - r12 * r12)) AS BIGINT) AS x2_micro
      |FROM stats""".stripMargin
}
