package graft

import org.apache.spark.sql.functions._
import graft.operators.TheilSen

/** Seasonal Sen slope: within-weekday pairs only, so a weekly cycle
  * cannot alias into the slope — and on a clean trend it equals the
  * plain Theil-Sen answer. */
class SenSlopeSeasonalSpec extends SparkSpec {
  import spark.implicits._

  private val pattern = Array(0L, 2500L, 5000L, 1500L, -3000L, -4500L, 1000L)

  private def pts(f: Int => Long) = (0 until 28).map { t =>
    ("a", t.toLong, (t % 7).toLong, f(t))
  }.toDF("g", "x", "dow", "y")

  test("pure trend: seasonal and plain agree on the exact slope") {
    val df = pts(t => 100L * t)
    val plain = TheilSen.fit(df, "g", "x", "y").collect().head
    val seas = TheilSen.fit(df, "g", "x", "y", Some("dow")).collect().head
    assert(plain.getAs[Long]("slope_permicro") == 100000000L)
    assert(seas.getAs[Long]("slope_permicro") == 100000000L)
    // within-stratum pairs only: 7 strata × C(4,2) = 42 vs C(28,2) = 378
    assert(seas.getAs[Long]("n_pairs") == 42L)
    assert(plain.getAs[Long]("n_pairs") == 378L)
  }

  test("trend + weekly cycle: the seasonal slope is exact, plain is noisy") {
    // y = 100·t + cycle: within a stratum the cycle term is constant,
    // so EVERY within-stratum slope is exactly 100 ⇒ median exact
    val df = pts(t => 100L * t + pattern(t % 7))
    val seas = TheilSen.fit(df, "g", "x", "y", Some("dow")).collect().head
    assert(seas.getAs[Long]("slope_permicro") == 100000000L,
      s"cycle must not alias into the seasonal slope: $seas")
  }

  test("gated instance matches theil_sen's schema with fewer pairs") {
    val seas = TheilSen.senSlopeSeasonalEvents(spark, sfDir)
      .localCheckpoint()
    val plain = TheilSen.theilSenEvents(spark, sfDir)
      .select(col("event_type"), col("n_pairs").as("np_plain"))
    assert(seas.columns.toSeq == Seq("event_type", "n_days", "n_pairs",
      "slope_permicro", "intercept_permicro"))
    assert(seas.join(plain, "event_type")
      .filter(col("n_pairs") >= col("np_plain")).count() == 0,
      "within-stratum pairing must be a strict subset")
  }
}
