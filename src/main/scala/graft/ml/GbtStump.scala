package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Sampling

/** Depth-1 single-iteration tree fit (a decision stump) expressed
  * DECLARATIVELY — the distributed histogram-split algorithm that every
  * tree ensemble iteration runs (per-feature bin statistics aggregated
  * map-side, then an impurity argmax over candidate thresholds), pulled
  * out of the MLlib black box and into plain relational operators so a
  * DuckDB hash gate can pin it bit-for-bit. This is to the RF/GBT keys
  * what `bpe_first_merge` is to `bpe_merges`: the machinery of one
  * boosting/bagging iteration made SQL-expressible.
  *
  * Reference anchor: the xgboost/RF legs of the tabular stack
  * (/root/reference/MachineLearning/Ray/tabular/minimal_xgboost_ray.py,
  * /root/reference/DataEngineering/DataBricks/spark_randomforest.py:41-72)
  * fit exactly this histogram-split primitive at depth d; depth 1 with
  * integer-exact scoring is its gateable core.
  *
  * Determinism discipline: every quantity is BIGINT until one final
  * IEEE division. Features are integerized by the caller; bins are
  * equal-width in integer arithmetic ((v−min)·B div (max−min+1), all
  * non-negative); the split score — minimizing weighted Gini cost
  * Σ_side n_s·(1 − (pos_s²+neg_s²)/n_s²) is equivalent to maximizing
  *   score = (pos_l²+neg_l²)/n_l + (pos_r²+neg_r²)/n_r
  *         = [(pos_l²+neg_l²)·n_r + (pos_r²+neg_r²)·n_l] / (n_l·n_r)
  * — is carried as that exact integer numerator/denominator pair, and
  * the ranking double is ONE correctly-rounded division of those two
  * integers, so any engine computes the identical double and the
  * argmax order cannot diverge. Exact-integer scoring is safe to ~2M
  * rows per fit (num ≲ N³ must fit in int64); past that a production
  * stump scores in doubles — the gate runs at gate scale by design.
  *
  * Scale shape: one pass computes per-feature ranges (map-side min/max
  * partials), one pass the (feature, bin) histogram (map-side combine;
  * ≤ |features|·B rows survive the shuffle), and the cumulative scan +
  * argmax run on that bounded frame — nothing row-shaped leaves the
  * executors, same contract as MLlib's own `findBestSplits` aggregate.
  */
object GbtStump {

  /** Best split per integerized feature, globally ranked. `features`
    * maps name → non-negative-range integer column (any int range;
    * internally shifted by the observed min). With `byCols`, the whole
    * fit runs independently PER GROUP (ranges, histogram, argmax) —
    * the per-node form one level of recursive tree growth needs.
    * Output one row per (group ×) feature that admits a split:
    * (byCols…, rank, feature, split_bin, minv, maxv, n_left,
    * pos_left, n_right, pos_right, score_num, score_den) — rank 1 is
    * the group's chosen split. */
  def bestSplits(df: DataFrame, labelCol: String,
                 features: Seq[(String, Column)], bins: Int = 32,
                 byCols: Seq[String] = Nil): DataFrame = {
    require(bins >= 2, "need at least 2 bins")
    val by = byCols.map(col)
    val tall = df.select(
        by :+ col(labelCol).cast("long").as("__y") :+
        array(features.map { case (n, c) =>
          struct(lit(n).as("f"), c.cast("long").as("v"))
        }: _*).as("__fs"): _*)
      .select(by :+ explode(col("__fs")).as("__fv") :+ col("__y"): _*)
      .select(by :+ col("__fv.f").as("feature") :+ col("__fv.v").as("v") :+ col("__y"): _*)

    val grp = byCols :+ "feature"
    val ranges = tall.groupBy(grp.map(col): _*)
      .agg(min("v").as("minv"), max("v").as("maxv"))
      .filter(col("maxv") > col("minv")) // constant features admit no split

    val hist = tall.join(broadcast(ranges), grp)
      .withColumn("bin",
        expr(s"((v - minv) * $bins) div (maxv - minv + 1)"))
      .groupBy((grp ++ Seq("minv", "maxv", "bin")).map(col): _*)
      .agg(count(lit(1)).as("n"), sum("__y").as("pos"))

    val wCum = Window.partitionBy(grp.map(col): _*).orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(grp.map(col): _*)
    val cand = hist
      .withColumn("n_left", sum("n").over(wCum))
      .withColumn("pos_left", sum("pos").over(wCum))
      .withColumn("n_tot", sum("n").over(wTot))
      .withColumn("pos_tot", sum("pos").over(wTot))
      .filter(col("n_left") < col("n_tot")) // right side must be non-empty
      .withColumn("n_right", col("n_tot") - col("n_left"))
      .withColumn("pos_right", col("pos_tot") - col("pos_left"))
      .withColumn("neg_left", col("n_left") - col("pos_left"))
      .withColumn("neg_right", col("n_right") - col("pos_right"))
      .withColumn("score_num",
        (col("pos_left") * col("pos_left") + col("neg_left") * col("neg_left")) * col("n_right") +
          (col("pos_right") * col("pos_right") + col("neg_right") * col("neg_right")) * col("n_left"))
      .withColumn("score_den", col("n_left") * col("n_right"))
      .withColumn("__score",
        col("score_num").cast("double") / col("score_den").cast("double"))

    val perFeature = cand
      .withColumn("__rn", row_number().over(
        Window.partitionBy(grp.map(col): _*).orderBy(desc("__score"), col("bin"))))
      .filter(col("__rn") === 1)

    // |groups|·|features| rows remain — the rank window is bounded
    val wRank =
      if (byCols.isEmpty) Window.orderBy(desc("__score"), col("feature"), col("bin"))
      else Window.partitionBy(by: _*).orderBy(desc("__score"), col("feature"), col("bin"))
    perFeature
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .select(by ++ Seq(col("rank"), col("feature"), col("bin").as("split_bin"),
        col("minv"), col("maxv"), col("n_left"), col("pos_left"),
        col("n_right"), col("pos_right"), col("score_num"), col("score_den")): _*)
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: the SAME planted-signal orders features and the
    * SAME deterministic 0.8 hash split as `rf_train_eval`/
    * `gbt_train_eval` (so this gate pins the split machinery those
    * rows-gated keys run on), with features integerized — price in
    * cents, year/month/priority already integral. */
  def gbtStump(spark: SparkSession, dir: String): DataFrame = {
    val thr = (0.8 * Sampling.M).toLong
    val train = Tables.orders(spark, dir)
      .filter(Sampling.portableBucket(col("o_orderkey")) < thr)
      .withColumn("label01",
        when(col("o_totalprice") > 250000.0, 1L).otherwise(0L))
    bestSplits(train, "label01", Seq(
      "f_price" -> floor(col("o_totalprice") * lit(100.0)).cast("long"),
      "f_year" -> year(col("o_orderdate")).cast("long"),
      "f_month" -> month(col("o_orderdate")).cast("long"),
      "f_priority" -> substring(col("o_orderpriority"), 1, 1).cast("long")))
  }

  /** The shared CTE chain up to `best` (per-feature best splits) —
    * exposed so [[stumpAttribution]]'s oracle composes on it
    * STRUCTURALLY instead of duplicating the fit (same discipline as
    * HoltWinters.sharedCte for the forecast family). */
  private val fitCtes: String =
    """raw AS (
      |  SELECT o_orderkey, CAST(o_totalprice > 250000.0 AS BIGINT) AS y,
      |    CAST(floor(o_totalprice * 100.0) AS BIGINT) AS f_price,
      |    CAST(year(o_orderdate) AS BIGINT) AS f_year,
      |    CAST(month(o_orderdate) AS BIGINT) AS f_month,
      |    CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS f_priority,
      |    ((o_orderkey % 100003) * 1103515245 + 12345) % 1000000 AS bkt
      |  FROM orders
      |), t AS (
      |  SELECT * FROM raw WHERE bkt < 800000
      |), tall AS (
      |  SELECT 'f_price' AS feature, f_price AS v, y FROM t
      |  UNION ALL SELECT 'f_year', f_year, y FROM t
      |  UNION ALL SELECT 'f_month', f_month, y FROM t
      |  UNION ALL SELECT 'f_priority', f_priority, y FROM t
      |), rng AS (
      |  SELECT feature, min(v) AS minv, max(v) AS maxv FROM tall
      |  GROUP BY feature HAVING max(v) > min(v)
      |), hist AS (
      |  SELECT tall.feature, minv, maxv,
      |    ((v - minv) * 32) // (maxv - minv + 1) AS bin,
      |    count(*) AS n, CAST(sum(y) AS BIGINT) AS pos
      |  FROM tall JOIN rng ON tall.feature = rng.feature
      |  GROUP BY tall.feature, minv, maxv, bin
      |), cum AS (
      |  SELECT *,
      |    CAST(sum(n) OVER (PARTITION BY feature ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_left,
      |    CAST(sum(pos) OVER (PARTITION BY feature ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pos_left,
      |    CAST(sum(n) OVER (PARTITION BY feature) AS BIGINT) AS n_tot,
      |    CAST(sum(pos) OVER (PARTITION BY feature) AS BIGINT) AS pos_tot
      |  FROM hist
      |), cand AS (
      |  SELECT feature, bin, minv, maxv, n_left, pos_left,
      |    n_tot - n_left AS n_right, pos_tot - pos_left AS pos_right,
      |    (pos_left * pos_left + (n_left - pos_left) * (n_left - pos_left)) * (n_tot - n_left)
      |      + ((pos_tot - pos_left) * (pos_tot - pos_left)
      |         + (n_tot - n_left - (pos_tot - pos_left)) * (n_tot - n_left - (pos_tot - pos_left))) * n_left
      |      AS score_num,
      |    n_left * (n_tot - n_left) AS score_den
      |  FROM cum WHERE n_left < n_tot
      |), best AS (
      |  SELECT *, CAST(score_num AS DOUBLE) / CAST(score_den AS DOUBLE) AS score,
      |    ROW_NUMBER() OVER (PARTITION BY feature
      |      ORDER BY CAST(score_num AS DOUBLE) / CAST(score_den AS DOUBLE) DESC, bin) AS rn
      |  FROM cand
      |)""".stripMargin

  def oracleSql: String =
    s"""WITH $fitCtes
      |SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, feature, bin) AS BIGINT) AS rank,
      |  feature, bin AS split_bin, minv, maxv, n_left, pos_left,
      |  n_right, pos_right, score_num, score_den
      |FROM best WHERE rn = 1""".stripMargin

  // ---- second tree level (hash-gated) ----

  /** One full LEVEL of recursive tree growth: tag every train row with
    * its side of the winning root split, then run the per-node
    * histogram-split fit independently on each side — depth recursion
    * made relational, the way [[graft.ann.KmeansStep.kmeansStep2Embeddings]]
    * gates Lloyd ITERATION. Output: the per-feature best splits of
    * each child node, ranked within the node. */
  def gbtStump2(spark: SparkSession, dir: String): DataFrame = {
    val thr = (0.8 * Sampling.M).toLong
    val win = gbtStump(spark, dir).filter(col("rank") === 1)
    val train = Tables.orders(spark, dir)
      .filter(Sampling.portableBucket(col("o_orderkey")) < thr)
      .withColumn("label01",
        when(col("o_totalprice") > 250000.0, 1L).otherwise(0L))
      .withColumn("f_price_v", floor(col("o_totalprice") * lit(100.0)).cast("long"))
      .withColumn("f_year_v", year(col("o_orderdate")).cast("long"))
      .withColumn("f_month_v", month(col("o_orderdate")).cast("long"))
      .withColumn("f_priority_v",
        substring(col("o_orderpriority"), 1, 1).cast("long"))
    // train values sit inside the root fit's [min, max] by construction.
    // localCheckpoint: bestSplits reads its input twice (ranges pass +
    // histogram pass); without it the root fit AND the side tagging are
    // planned — and run — twice, the multi-consumer double-plan this
    // repo materializes away everywhere (BowVectors/DistinctSketch).
    val sided = train.crossJoin(broadcast(win))
      .withColumn("__v", expr(
        "CASE feature WHEN 'f_price' THEN f_price_v WHEN 'f_year' THEN f_year_v " +
          "WHEN 'f_month' THEN f_month_v ELSE f_priority_v END"))
      .withColumn("side", expr(
        "CASE WHEN ((__v - minv) * 32) div (maxv - minv + 1) <= split_bin " +
          "THEN 'L' ELSE 'R' END"))
      .select("side", "label01", "f_price_v", "f_year_v", "f_month_v",
        "f_priority_v")
      .localCheckpoint()
    bestSplits(sided, "label01", Seq(
      "f_price" -> col("f_price_v"),
      "f_year" -> col("f_year_v"),
      "f_month" -> col("f_month_v"),
      "f_priority" -> col("f_priority_v")), byCols = Seq("side"))
  }

  def oracle2Sql: String =
    s"""WITH $fitCtes, win AS (
      |  SELECT * FROM best WHERE rn = 1
      |  ORDER BY score DESC, feature, bin LIMIT 1
      |), t2 AS (
      |  SELECT t.y, t.f_price, t.f_year, t.f_month, t.f_priority,
      |    CASE WHEN ((CASE w.feature
      |        WHEN 'f_price' THEN t.f_price WHEN 'f_year' THEN t.f_year
      |        WHEN 'f_month' THEN t.f_month ELSE t.f_priority END
      |      - w.minv) * 32) // (w.maxv - w.minv + 1) <= w.bin
      |      THEN 'L' ELSE 'R' END AS side
      |  FROM t, win w
      |), tall2 AS (
      |  SELECT side, 'f_price' AS feature, f_price AS v, y FROM t2
      |  UNION ALL SELECT side, 'f_year', f_year, y FROM t2
      |  UNION ALL SELECT side, 'f_month', f_month, y FROM t2
      |  UNION ALL SELECT side, 'f_priority', f_priority, y FROM t2
      |), rng2 AS (
      |  SELECT side, feature, min(v) AS minv, max(v) AS maxv FROM tall2
      |  GROUP BY side, feature HAVING max(v) > min(v)
      |), hist2 AS (
      |  SELECT tall2.side, tall2.feature, minv, maxv,
      |    ((v - minv) * 32) // (maxv - minv + 1) AS bin,
      |    count(*) AS n, CAST(sum(y) AS BIGINT) AS pos
      |  FROM tall2 JOIN rng2
      |    ON tall2.side = rng2.side AND tall2.feature = rng2.feature
      |  GROUP BY tall2.side, tall2.feature, minv, maxv, bin
      |), cum2 AS (
      |  SELECT *,
      |    CAST(sum(n) OVER (PARTITION BY side, feature ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_left,
      |    CAST(sum(pos) OVER (PARTITION BY side, feature ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pos_left,
      |    CAST(sum(n) OVER (PARTITION BY side, feature) AS BIGINT) AS n_tot,
      |    CAST(sum(pos) OVER (PARTITION BY side, feature) AS BIGINT) AS pos_tot
      |  FROM hist2
      |), cand2 AS (
      |  SELECT side, feature, bin, minv, maxv, n_left, pos_left,
      |    n_tot - n_left AS n_right, pos_tot - pos_left AS pos_right,
      |    (pos_left * pos_left + (n_left - pos_left) * (n_left - pos_left)) * (n_tot - n_left)
      |      + ((pos_tot - pos_left) * (pos_tot - pos_left)
      |         + (n_tot - n_left - (pos_tot - pos_left)) * (n_tot - n_left - (pos_tot - pos_left))) * n_left
      |      AS score_num,
      |    n_left * (n_tot - n_left) AS score_den
      |  FROM cum2 WHERE n_left < n_tot
      |), best2 AS (
      |  SELECT *, CAST(score_num AS DOUBLE) / CAST(score_den AS DOUBLE) AS score,
      |    ROW_NUMBER() OVER (PARTITION BY side, feature
      |      ORDER BY CAST(score_num AS DOUBLE) / CAST(score_den AS DOUBLE) DESC, bin) AS rn
      |  FROM cand2
      |)
      |SELECT side,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY side ORDER BY score DESC, feature, bin) AS BIGINT) AS rank,
      |  feature, bin AS split_bin, minv, maxv, n_left, pos_left,
      |  n_right, pos_right, score_num, score_den
      |FROM best2 WHERE rn = 1""".stripMargin

  // ---- Saabas attribution over the stump (hash-gated) ----

  /** Per-row Saabas attribution over the fitted stump, all in integer
    * micros: prediction = root positive rate + the split-side delta —
    * the telescoping node-delta principle the rows-gated
    * rf/gbt_attribution keys run over full ensembles, pinned here
    * bit-for-bit on the one-node tree where it IS SQL-expressible.
    * Test rows are the held-out 0.2 hash split; values are clamped
    * into the trained [min, max] before binning (unseen-range policy:
    * extreme values fall in the edge bins, matching MLlib's behavior
    * for out-of-range continuous splits).
    *
    * Scale shape: the 1-row winning split broadcasts; scoring is pure
    * map-side expression arithmetic — no shuffle at any corpus size. */
  def stumpAttribution(spark: SparkSession, dir: String): DataFrame = {
    val thr = (0.8 * Sampling.M).toLong
    val win = gbtStump(spark, dir).filter(col("rank") === 1)
    val test = Tables.orders(spark, dir)
      .filter(Sampling.portableBucket(col("o_orderkey")) >= thr)
      .select(col("o_orderkey"),
        floor(col("o_totalprice") * lit(100.0)).cast("long").as("f_price"),
        year(col("o_orderdate")).cast("long").as("f_year"),
        month(col("o_orderdate")).cast("long").as("f_month"),
        substring(col("o_orderpriority"), 1, 1).cast("long").as("f_priority"))
    test.crossJoin(broadcast(win))
      .withColumn("__v", expr(
        "CASE feature WHEN 'f_price' THEN f_price WHEN 'f_year' THEN f_year " +
          "WHEN 'f_month' THEN f_month ELSE f_priority END"))
      .withColumn("__vc", expr("least(greatest(__v, minv), maxv)"))
      .withColumn("__bin", expr("((__vc - minv) * 32) div (maxv - minv + 1)"))
      .withColumn("side", expr("CASE WHEN __bin <= split_bin THEN 'L' ELSE 'R' END"))
      .withColumn("root_micros", expr(
        "((pos_left + pos_right) * 1000000) div (n_left + n_right)"))
      .withColumn("pred_micros", expr(
        "CASE WHEN __bin <= split_bin THEN (pos_left * 1000000) div n_left " +
          "ELSE (pos_right * 1000000) div n_right END"))
      .withColumn("contrib_micros", col("pred_micros") - col("root_micros"))
      .select("o_orderkey", "feature", "side",
        "root_micros", "pred_micros", "contrib_micros")
  }

  def attributionOracleSql: String =
    s"""WITH $fitCtes, win AS (
      |  SELECT * FROM best WHERE rn = 1
      |  ORDER BY score DESC, feature, bin LIMIT 1
      |), testr AS (
      |  SELECT o_orderkey, f_price, f_year, f_month, f_priority
      |  FROM raw WHERE bkt >= 800000
      |), scored AS (
      |  SELECT o_orderkey, w.feature,
      |    ((least(greatest(CASE w.feature
      |        WHEN 'f_price' THEN f_price WHEN 'f_year' THEN f_year
      |        WHEN 'f_month' THEN f_month ELSE f_priority END,
      |      w.minv), w.maxv) - w.minv) * 32) // (w.maxv - w.minv + 1) AS bin_t,
      |    w.bin AS split_bin, w.n_left, w.pos_left, w.n_right, w.pos_right
      |  FROM testr, win w
      |)
      |SELECT o_orderkey, feature,
      |  CASE WHEN bin_t <= split_bin THEN 'L' ELSE 'R' END AS side,
      |  ((pos_left + pos_right) * 1000000) // (n_left + n_right) AS root_micros,
      |  CASE WHEN bin_t <= split_bin THEN (pos_left * 1000000) // n_left
      |       ELSE (pos_right * 1000000) // n_right END AS pred_micros,
      |  CASE WHEN bin_t <= split_bin THEN (pos_left * 1000000) // n_left
      |       ELSE (pos_right * 1000000) // n_right END
      |    - ((pos_left + pos_right) * 1000000) // (n_left + n_right) AS contrib_micros
      |FROM scored""".stripMargin
}
