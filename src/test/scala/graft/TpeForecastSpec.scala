package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.ml.TpeForecast

/** TPE over the forecast family: the planted series must drive the
  * α proposal into the true parameter's cell. */
class TpeForecastSpec extends SparkSpec {
  import spark.implicits._

  private def denseFrame(rows: Seq[(String, Int, Long)]) =
    rows.map { case (k, d, c) =>
      (k, Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(d)), c)
    }.toDF("key", "day", "cents")

  test("pulse series: high-α trials win, proposal lands high") {
    // 60 train days at level 1000 with a 20-day 50000-pulse CENTERED in
    // the train window (days 20..39) — symmetric, so the OLS drift is
    // ~0 and only the SES level separates the trials. High α forgets
    // the pulse by the cutoff (l ≈ 1000 = the eval actuals); α = 1/16
    // still carries thousands of cents of pulse residue.
    val series = (0 until 67).map { d =>
      ("a", d, if (d >= 20 && d <= 39) 50000L else 1000L)
    }
    val trialRows = TpeForecast.trials(denseFrame(series))
      .orderBy(desc("obs_acc")).collect()
    // error is non-increasing in α: every trial at or above α = 1/2
    // beats every trial below α = 3/16 (fast-forgetting wins), and the
    // single worst trial is the slowest α of all
    val errByAlpha = trialRows
      .map(r => r.getAs[Long]("threshold") -> -r.getAs[Long]("obs_acc")).toMap
    assert((8 to 16).map(j => errByAlpha(j * 62500L)).max <
      (1 to 2).map(j => errByAlpha(j * 62500L)).min)
    assert(trialRows.last.getAs[Long]("threshold") === 62500L,
      s"worst trial ${trialRows.last} is not the slowest α")
    val p = graft.ml.TpeSweep.proposeGrid(
        TpeForecast.trials(denseFrame(series)),
        graft.ml.TpeSweep.Gamma, TpeForecast.BandW, TpeForecast.CandLo,
        TpeForecast.CandStep, TpeForecast.CandN)
      .filter("proposed = 1").collect()(0)
    // the proposal clears the bad low-α region the slow trials occupy
    assert(p.getAs[Long]("cand_threshold") >= 300000L,
      s"proposed ${p.getAs[Long]("cand_threshold")} stuck in the low-α cells")
  }

  test("alternating series: low-α smoothing wins, proposal lands low") {
    // a noisy-constant series alternating around 5000: the lower α, the
    // closer the level is to the mean, the better the flat forecast
    val series = (0 until 67).map { d =>
      ("a", d, if (d % 2 == 0) 4000L else 6000L)
    }
    // eval days alternate too; drift is ~0, so error is driven by how
    // hard the level chases the last observation
    val trialRows = TpeForecast.trials(denseFrame(series))
      .orderBy(desc("obs_acc")).collect()
    assert(trialRows.head.getAs[Long]("threshold") <= 312500L,
      s"best trial ${trialRows.head} not low-α")
    val p = graft.ml.TpeSweep.proposeGrid(
        TpeForecast.trials(denseFrame(series)),
        graft.ml.TpeSweep.Gamma, TpeForecast.BandW, TpeForecast.CandLo,
        TpeForecast.CandStep, TpeForecast.CandN)
      .filter("proposed = 1").collect()(0)
    assert(p.getAs[Long]("cand_threshold") <= 350000L,
      s"proposed ${p.getAs[Long]("cand_threshold")} not in the low-α cell")
  }

  test("trial grid is complete, exact, and α=8/16 matches Theta's level") {
    val series = (0 until 30).map(d => ("a", d, 1000L + 37L * d))
    val t = TpeForecast.trials(denseFrame(series)).collect()
    assert(t.length === TpeForecast.TrialN)
    assert(t.map(_.getAs[Long]("threshold")).sorted.toSeq ===
      (1 to 16).map(_ * 62500L))
    // all objectives are non-positive (negated absolute errors)
    assert(t.forall(_.getAs[Long]("obs_acc") <= 0L))
  }

  test("round 2: the loop closes over the forecast objective") {
    val r1 = TpeForecast.tpeForecastEvents(spark, sfDir)
      .filter("proposed = 1").collect()(0)
    val r2 = TpeForecast.tpeForecastRound2(spark, sfDir).collect()
    assert(r2.length === TpeForecast.CandN)
    assert(r2.count(_.getAs[Int]("proposed") == 1) === 1)
    // trial 17 (round 1's winner, backtested at the 1/64 grid) adds
    // kernel mass at round 1's proposed candidate: total density there
    // strictly grows
    val at2 = r2.filter(_.getAs[Long]("cand_threshold") ==
      r1.getAs[Long]("cand_threshold"))(0)
    val dens1 = r1.getAs[Long]("good_density") + r1.getAs[Long]("bad_density")
    val dens2 = at2.getAs[Long]("good_density") + at2.getAs[Long]("bad_density")
    assert(dens2 > dens1,
      s"round-2 density $dens2 did not grow past round-1 $dens1 at the winner")
  }

  test("gated instance: 64 scored candidates, exactly one proposed") {
    val out = TpeForecast.tpeForecastEvents(spark, sfDir).collect()
    assert(out.length === TpeForecast.CandN)
    assert(out.count(_.getAs[Int]("proposed") == 1) === 1)
    // determinism
    val again = TpeForecast.tpeForecastEvents(spark, sfDir).collect()
    assert(out.map(_.toString).sorted.toSeq ===
      again.map(_.toString).sorted.toSeq)
  }
}
