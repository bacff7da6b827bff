package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Split-conformal calibration for a regression model, distributed.
  *
  * Reference anchor: /root/reference/MachineLearning/Ray/
  * ray_air_data_tune_conformal_demo.py:280-330 — calibration scores,
  * the `ceil((n+1)(1-alpha))/n` quantile threshold (`method='higher'`,
  * i.e. an ORDER STATISTIC, never interpolated), and the empirical
  * coverage check on a held-out set. The demo does randomized RAPS for
  * classification; the distribution-free core it demonstrates is split
  * conformal: qhat = the ceil((n+1)(1−α))-th smallest calibration
  * score, giving ≥ 1−α coverage on exchangeable validation points.
  * This implements that core for absolute-residual regression scores,
  * deterministically (no tie-breaking randomization — ties broken by
  * row id, so the gate hashes).
  *
  * Scale: the model fit is a bounded per-category aggregate; the order
  * statistic uses [[Ranks.globalRowNumber]] (range repartition + slice
  * rank + bounded offset rollup — NO unpartitioned window, no
  * driver-side sort); coverage is one exact-ratio aggregate with the
  * 1-row threshold broadcast.
  */
object Conformal {

  /** Calibrate |y − ŷ| split-conformal threshold and validate coverage.
    *
    * @param scored  rows with an id, a long label `yCents` and a double
    *                prediction `yHat`
    * @param calPred marks calibration rows; `valPred` validation rows
    * @return one row: n_cal, k, qhat, n_val, covered, coverage
    */
  def calibrate(scored: DataFrame, idCol: String, yCents: String,
                yHat: String, calPred: org.apache.spark.sql.Column,
                valPred: org.apache.spark.sql.Column,
                alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha in (0,1)")
    val withR = scored.withColumn("__r", abs(col(yCents) - col(yHat)))
    val cal = withR.filter(calPred)
    val nCal = cal.count()
    // k-th order statistic, k = ceil((n+1)(1-alpha)) — capped at n for
    // tiny calibration sets (where finite-sample coverage is vacuous)
    val k = math.min(nCal, math.ceil((nCal + 1) * (1 - alpha)).toLong)
    val qhat = Ranks.globalRowNumber(
        cal.select(col("__r"), col(idCol)),
        Seq(col("__r"), col(idCol)), "__grn")
      .filter(col("__grn") === k)
      .select(col("__r").as("qhat"))
    withR.filter(valPred)
      .crossJoin(broadcast(qhat))
      .agg(
        lit(nCal).as("n_cal"), lit(k).as("k"),
        first("qhat").as("qhat"),
        count(lit(1)).as("n_val"),
        sum(when(col("__r") <= col("qhat"), 1L).otherwise(0L)).as("covered"))
      .withColumn("coverage", col("covered") / col("n_val"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: ŷ = per-event-type mean cents fit on the train
    * split; calibrate on cal, check coverage on val (splits via the
    * portable id hash, α = 0.1). */
  def conformalEvents(spark: SparkSession, dir: String): DataFrame = {
    import Sampling.{M, portableBucket}
    val ev = Tables.events(spark, dir)
      .withColumn("__cents", round(col("value") * 100, 0).cast("long"))
      .withColumn("__b", portableBucket(col("event_id")))
    val train = ev.filter(col("__b") < M * 6 / 10)
    val model = train.groupBy("event_type")
      .agg((sum("__cents") / count(lit(1))).as("__yhat"))
    val scored = ev.join(broadcast(model), "event_type")
    calibrate(scored, "event_id", "__cents", "__yhat",
      calPred = col("__b") >= M * 6 / 10 && col("__b") < M * 8 / 10,
      valPred = col("__b") >= M * 8 / 10,
      alpha = 0.1)
  }

  def oracleSql: String =
    """WITH ev AS (
      |  SELECT event_id, event_type,
      |    CAST(round(value*100, 0) AS BIGINT) AS cents,
      |    ((event_id % 100003) * 1103515245 + 12345) % 1000000 AS b
      |  FROM events),
      |model AS (
      |  SELECT event_type, CAST(sum(cents) AS DOUBLE)/count(*) AS yhat
      |  FROM ev WHERE b < 600000 GROUP BY event_type),
      |scored AS (
      |  SELECT ev.*, abs(ev.cents - model.yhat) AS r
      |  FROM ev JOIN model USING (event_type)),
      |cal AS (SELECT * FROM scored WHERE b >= 600000 AND b < 800000),
      |n AS (SELECT count(*) AS n_cal,
      |  least(count(*), CAST(ceil((count(*) + 1) * 0.9) AS BIGINT)) AS k
      |  FROM cal),
      |q AS (
      |  SELECT r AS qhat FROM cal, n
      |  ORDER BY r, event_id LIMIT 1 OFFSET (SELECT k - 1 FROM n))
      |SELECT n.n_cal, n.k, q.qhat,
      |  count(*) AS n_val,
      |  CAST(sum(CASE WHEN v.r <= q.qhat THEN 1 ELSE 0 END) AS BIGINT)
      |    AS covered,
      |  CAST(sum(CASE WHEN v.r <= q.qhat THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*) AS coverage
      |FROM scored v, q, n WHERE v.b >= 800000
      |GROUP BY n.n_cal, n.k, q.qhat""".stripMargin
}
