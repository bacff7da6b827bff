package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.operators.TrendTests

/** Hirsch–Slack seasonal MK: within-stratum pairs only, summed
  * statistics, and the property plain MK lacks — a pure weekly cycle
  * contributes NOTHING (every stratum is constant). */
class SeasonalMkSpec extends SparkSpec {
  import spark.implicits._

  private val day0 = Date.valueOf("2024-01-01").toLocalDate
  private val pattern = Array(0L, 250L, 500L, 150L, -300L, -450L, 100L)

  private def cells(f: Int => Long) = (0 until 28).map { t =>
    ("a", Date.valueOf(day0.plusDays(t)), f(t))
  }.toDF("g", "day", "y")
    .withColumn("dow",
      pmod(datediff(col("day"), lit("1970-01-05").cast("date")), lit(7)))

  test("trend + cycle: S and 18·Var are the exact per-stratum sums") {
    // y = 100·t + cycle: within each weekday strictly increasing over
    // the 4 weeks ⇒ S_s = C(4,2) = 6 per stratum, S = 42; no ties ⇒
    // 18·Var = 7 · 4·3·13 = 1092
    val df = cells(t => 100L * t + pattern(t % 7))
    val r = TrendTests.seasonalMannKendall(df, "g", "dow", "day", "y")
      .collect().head
    assert(r.getLong(1) == 28L)
    assert(r.getLong(2) == 42L, s"S must be 7·C(4,2): $r")
    assert(r.getString(3) == "1092", s"18·Var must be 1092: $r")
    assert(r.getLong(4) > 0L, "z must be positive on an upward trend")
  }

  test("a pure weekly cycle contributes nothing (constant strata)") {
    val df = cells(t => pattern(t % 7))
    val r = TrendTests.seasonalMannKendall(df, "g", "dow", "day", "y")
      .collect().head
    assert(r.getLong(2) == 0L, "within-weekday values are constant")
    assert(r.getString(3) == "0", "all-tied strata ⇒ zero variance")
    assert(r.isNullAt(4), "z undefined at zero variance")
  }

  test("downward trend gives the mirrored negative z") {
    val up = TrendTests.seasonalMannKendall(
      cells(t => 100L * t), "g", "dow", "day", "y").collect().head
    val dn = TrendTests.seasonalMannKendall(
      cells(t => -100L * t), "g", "dow", "day", "y").collect().head
    assert(up.getLong(2) == -dn.getLong(2))
    assert(up.getLong(4) == -dn.getLong(4))
  }

  test("gated instance: one row per event type, MK schema") {
    val out = TrendTests.seasonalMkEvents(spark, sfDir).localCheckpoint()
    assert(out.columns.toSeq ==
      Seq("event_type", "n", "s_stat", "var18", "z_permicro"))
    assert(out.count() ==
      Tables.events(spark, sfDir).select("event_type").distinct().count())
  }
}
