package graft

import org.apache.spark.sql.functions._
import graft.operators.{AutoForecast, DemandClassify, RouteForecast}

/** The router is a pure composition: its quadrant must equal
  * demand_classify's, its leaderboard columns must equal
  * auto_forecast's, and the routed model must follow the family rule
  * exactly. */
class RouteForecastSpec extends SparkSpec {

  test("route = classify ⋈ leaderboard with the family CASE") {
    val out = RouteForecast.routeForecastEvents(spark, sfDir)
      .localCheckpoint()
    assert(out.columns.toSeq == Seq("user_id", "demand_class",
      "adi_permicro", "cv2_permicro", "best_model", "best_mae_cents",
      "routed_model"))
    // the family rule holds row by row
    val badRule = out.filter(
      (col("demand_class").isin("intermittent", "lumpy") &&
        col("routed_model") =!= "croston") ||
      (!col("demand_class").isin("intermittent", "lumpy") &&
        col("routed_model") =!= col("best_model"))).count()
    assert(badRule == 0, "routed_model must follow the quadrant rule")
    // quadrant agrees with the gated classifier on every common key
    val cls = DemandClassify.demandClassifyEvents(spark, sfDir)
      .select(col("user_id"), col("demand_class").as("dc2"))
    assert(out.join(cls, "user_id")
      .filter(col("demand_class") =!= col("dc2")).count() == 0)
    // leaderboard agrees with the gated auto_forecast on every key
    val af = AutoForecast.autoForecastEvents(spark, sfDir)
      .select(col("user_id"), col("best_model").as("bm2"),
        col("best_mae_cents").as("bmae2"))
    assert(out.join(af, "user_id")
      .filter(col("best_model") =!= col("bm2") ||
        col("best_mae_cents") =!= col("bmae2")).count() == 0)
    // router covers exactly the leaderboard's keys (full-span series)
    assert(out.count() == af.count())
  }
}
