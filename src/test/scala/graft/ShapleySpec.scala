package graft

import org.apache.spark.sql.functions._
import graft.operators.Shapley

class ShapleySpec extends SparkSpec {
  import spark.implicits._

  test("shapley: hand lattice — marginal credits and efficiency axiom") {
    // masks over bits (click=1, view=2): u4 converts untouched (v∅=1)
    val users = Seq(
      (1L, 1L, true),   // click only, converts
      (2L, 3L, true),   // click+view, converts
      (3L, 2L, false),  // view only, no conversion
      (4L, 0L, true)    // untouched, converts
    ).toDF("id", "mask", "conv")
    val got = Shapley.attribution(users, "mask", "conv")
      .select($"channel", $"shapley_x24").as[(String, Long)].collect().toMap
    // hand-computed over the 16-cell lattice (see scaladoc): click 36/24,
    // view 12/24, untouched channels exactly 0
    assert(got === Map("click" -> 36L, "view" -> 12L,
      "signup" -> 0L, "error" -> 0L))
    // efficiency: Σφ·24 = 24·(v(full) − v(∅)) = 24·(3 − 1)
    assert(got.values.sum === 48L)
  }

  test("shapley: symmetric channels get identical credit") {
    val users = Seq(
      (1L, 1L, true), (2L, 2L, true), // click-only and view-only convert
      (3L, 0L, false)
    ).toDF("id", "mask", "conv")
    val got = Shapley.attribution(users, "mask", "conv")
      .select($"channel", $"shapley_x24").as[(String, Long)].collect().toMap
    assert(got("click") === got("view"))
    assert(got("click") > 0L)
  }

  test("shapley gated instance: efficiency holds at corpus scale") {
    val got = Shapley.shapleyEvents(spark, sfDir)
      .select($"channel", $"shapley_x24", $"n_conv_total")
      .as[(String, Long, Long)].collect()
    assert(got.length === Shapley.Channels.length)
    // v(∅) = conversions among fully-untouched users
    val vEmpty = Tables.events(spark, sfDir)
      .groupBy($"user_id")
      .agg(sum(when($"event_type" === "purchase", 0L).otherwise(1L)).as("t"),
        (sum(when($"event_type" === "purchase", 1L).otherwise(0L)) > 0L).as("c"))
      .filter($"t" === 0L && $"c").count()
    assert(got.map(_._2).sum ===
      Shapley.Denominator * (got.head._3 - vEmpty))
  }
}
