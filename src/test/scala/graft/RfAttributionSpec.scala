package graft

import org.apache.spark.sql.functions._
import graft.ml.RfAttribution

/** Saabas path-contribution attribution: the telescoping decomposition
  * is EXACT (score = baseline + Σ contributions per row, to float
  * round-off) and the attribution mass must land on the planted signal
  * feature — the properties sampling-based SHAP can only approximate. */
class RfAttributionSpec extends SparkSpec {

  private lazy val attr = RfAttribution.rfAttribution(spark, sfDir)
    .localCheckpoint()

  test("every held-out row decomposes exactly: score = baseline + sum(contribs)") {
    val contribCols = attr.columns.filter(_.startsWith("contrib_"))
    val resid = attr.select(
      abs(col("score") - col("baseline") -
        contribCols.map(col).reduce(_ + _)).as("r"))
      .agg(max("r")).head().getDouble(0)
    assert(resid < 1e-9, s"additivity violated: max residual $resid")
  }

  test("scores are valid vote shares and rows cover the test split") {
    val n = attr.count()
    assert(n > 0)
    // weighted accumulation (Σ 1/n · leaf) carries float round-off, so
    // a unanimous vote can land at 1 ± a few ulp — bound to round-off
    val bad = attr.filter(col("score") < -1e-9 || col("score") > 1 + 1e-9).count()
    assert(bad == 0, "vote share outside [0,1] beyond round-off")
  }

  test("attribution mass concentrates on the planted signal feature") {
    val means = attr.agg(
      avg(abs(col("contrib_f_price"))).as("p"),
      avg(abs(col("contrib_f_year"))).as("y"),
      avg(abs(col("contrib_f_month"))).as("m"),
      avg(abs(col("contrib_f_priority"))).as("pr")).head()
    val (p, rest) = (means.getDouble(0), Seq(means.getDouble(1), means.getDouble(2), means.getDouble(3)))
    assert(rest.forall(p > _), s"signal not dominant: price=$p others=$rest")
  }

  test("gbt attribution: exact margin additivity and signal concentration") {
    val g = RfAttribution.gbtAttribution(spark, sfDir).localCheckpoint()
    val contribCols = g.columns.filter(_.startsWith("contrib_"))
    val resid = g.select(
      abs(col("score") - col("baseline") -
        contribCols.map(col).reduce(_ + _)).as("r"))
      .agg(max("r")).head().getDouble(0)
    assert(resid < 1e-9, s"margin additivity violated: max residual $resid")
    val means = g.agg(
      avg(abs(col("contrib_f_price"))).as("p"),
      avg(abs(col("contrib_f_year"))).as("y"),
      avg(abs(col("contrib_f_month"))).as("m"),
      avg(abs(col("contrib_f_priority"))).as("pr")).head()
    val (p, rest) = (means.getDouble(0),
      Seq(means.getDouble(1), means.getDouble(2), means.getDouble(3)))
    assert(rest.forall(p > _), s"signal not dominant in margins: price=$p others=$rest")
  }

  test("contributions separate the classes the model predicts") {
    // rows the forest votes positive on should carry net-positive
    // contributions (score > baseline) and vice versa
    val wrong = attr.filter(
      (col("score") > col("baseline") + 0.3) && col("label") === 0.0).count()
    val total = attr.count()
    assert(wrong < total / 4, "strongly-positive attributions mostly on negatives")
  }
}
