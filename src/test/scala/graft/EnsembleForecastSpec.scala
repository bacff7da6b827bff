package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.operators.EnsembleForecast

/** The blend must (a) keep its micro-weights summing to exactly 10⁶,
  * (b) concentrate weight on a model that is near-perfect on the
  * calibration window, and (c) never be worse than the worst member by
  * more than the 1-cent floor slack (convexity of |·| over a convex
  * combination, plus ⌊·⌋ ≤ 1 cent per row). */
class EnsembleForecastSpec extends SparkSpec {
  import spark.implicits._

  private val day0 = Date.valueOf("2024-01-01").toLocalDate
  private val pattern = Array(0L, 2500L, 5000L, 1500L, -3000L, -4500L, 1000L)

  private def step(t: Long): Long = {
    var z = t + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    ((z ^ (z >>> 31)) % 501L + 501L) % 1001L - 500L
  }

  /** key 1: pure weekly periodic (SN forecasts it EXACTLY — weight must
    * concentrate on SN/HW, both exact). key 2: trend + season (HW's home
    * turf). key 3: aperiodic walk. */
  private def series = (0 until 42).flatMap { t =>
    val walk = (0 to t).map(i => step(i.toLong)).sum
    Seq(
      (1L, Date.valueOf(day0.plusDays(t)), 10000L + pattern(t % 7)),
      (2L, Date.valueOf(day0.plusDays(t)), 10000L + 200L * t + pattern(t % 7)),
      (3L, Date.valueOf(day0.plusDays(t)), 10000L + walk))
  }.toDF("key", "day", "cents")

  test("weights sum to exactly 1e6 and concentrate on the calibration winner") {
    val out = EnsembleForecast.ensembleBacktest(series, "key", "day",
      "cents", season = 7, horizon = 7).collect()
    assert(out.length == 3)
    out.foreach { r =>
      val (wsn, whw, wth) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(wsn + whw + wth == 1000000L,
        s"weights must sum to exactly 1e6: key=${r.getLong(0)} ($wsn, $whw, $wth)")
      assert(wsn >= 0 && whw >= 0 && wth >= 0)
    }
    val byKey = out.map(r => r.getLong(0) -> r).toMap
    // key 1 is purely periodic: SN and HW both have calibration SAE 0 ⇒
    // their (SAE+1)=1 numerators dwarf theta's; each gets ~half the mass
    val r1 = byKey(1L)
    assert(r1.getLong(1) + r1.getLong(2) > 900000L,
      s"periodic series must concentrate on the exact models: $r1")
    // key 2 trends+seasons: HW must carry the largest single weight
    val r2 = byKey(2L)
    assert(r2.getLong(2) > r2.getLong(1) && r2.getLong(2) > r2.getLong(3),
      s"trending seasonal series must weight HW highest: $r2")
  }

  test("ensemble MAE never exceeds the worst member's by more than floor slack") {
    val out = EnsembleForecast.ensembleBacktest(series, "key", "day",
      "cents", season = 7, horizon = 7).collect()
    out.foreach { r =>
      val maes = Seq(r.getDouble(5), r.getDouble(6), r.getDouble(7))
      val ens = r.getDouble(8)
      assert(ens <= maes.max + 1.0,
        s"convexity bound violated: key=${r.getLong(0)} ens=$ens members=$maes")
    }
  }

  test("a perfectly forecastable series yields a (near-)exact ensemble") {
    // key 1: SN and HW are exact on the test window; theta's residual
    // weight is ≤ (1/3)·10⁶-ish of a bounded error — with SAE+1 pair
    // products, theta's weight is ~1/(sae_th+1) ≤ a few percent, so the
    // floor-div blend lands within a few cents of truth per row.
    val out = EnsembleForecast.ensembleBacktest(series, "key", "day",
      "cents", season = 7, horizon = 7)
      .filter(col("key") === 1L).collect().head
    assert(out.getDouble(5) == 0.0, "SN must be exact on the periodic series")
    assert(out.getDouble(8) <= out.getDouble(7),
      s"ensemble must beat the theta member on the periodic series: $out")
  }

  test("gated instance runs on the test tables with full schema") {
    val out = EnsembleForecast.ensembleForecastEvents(spark, sfDir)
      .localCheckpoint()
    assert(out.count() > 0)
    assert(out.columns.toSeq == Seq("user_id", "w_sn_micros", "w_hw_micros",
      "w_theta_micros", "n_eval", "mae_sn_cents", "mae_hw_cents",
      "mae_theta_cents", "mae_ens_cents"))
    val bad = out.filter(
      col("w_sn_micros") + col("w_hw_micros") + col("w_theta_micros")
        =!= 1000000L).count()
    assert(bad == 0, "every key's weights must sum to exactly 1e6")
  }
}
