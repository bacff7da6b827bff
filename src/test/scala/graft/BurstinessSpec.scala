package graft

import java.sql.Timestamp
import graft.operators.Burstiness

/** Planted arrival patterns: a metronome (B → −10⁶, Fano 0), and
  * hand-computed moments on a tiny gap multiset. */
class BurstinessSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("metronome arrivals: zero variance, burstiness -1e6 exactly") {
    // one user, gaps all exactly 60 s
    val rows = (0L to 10L).map(i => ("u1", "tick", ts(i * 60), i))
      .toDF("user", "typ", "t", "id")
    val r = Burstiness.interArrival(rows, "user", "typ", "t", "id")
      .collect().head
    assert(r.getAs[Long]("n_gaps") === 10L)
    assert(r.getAs[Long]("mean_gap_s") === 60L)
    assert(r.getAs[String]("ssn") === "0")
    assert(r.getAs[Long]("fano_ppm") === 0L)
    // σ = 0: B = (0 − μ)/(0 + μ) = −1 → −1e6 ppm
    assert(r.getAs[Long]("burstiness_ppm") === -1000000L)
  }

  test("hand-computed moments: gaps {10, 40} per one user") {
    val rows = Seq(("u", "e", ts(0), 1L), ("u", "e", ts(10), 2L),
      ("u", "e", ts(50), 3L)).toDF("user", "typ", "t", "id")
    val r = Burstiness.interArrival(rows, "user", "typ", "t", "id")
      .collect().head
    // n=2 sg=50 sgg=1700 → ssn = 2·1700 − 2500 = 900; nσ = 30
    assert(r.getAs[Long]("n_gaps") === 2L)
    assert(r.getAs[String]("ssn") === "900")
    // fano = 1e6·900/(2·50) = 9e6 ppm (variance 225 s² / mean 25 s)
    assert(r.getAs[Long]("fano_ppm") === 9000000L)
    // B = (30−50)/(30+50) = −0.25 → −250000
    assert(r.getAs[Long]("burstiness_ppm") === -250000L)
  }

  test("gaps never cross users or event types") {
    // two users interleaved in time: per-user gap is 100 s, not 50
    val rows = Seq(("a", "e", ts(0), 1L), ("b", "e", ts(50), 2L),
      ("a", "e", ts(100), 3L), ("b", "e", ts(150), 4L))
      .toDF("user", "typ", "t", "id")
    val r = Burstiness.interArrival(rows, "user", "typ", "t", "id")
      .collect().head
    assert(r.getAs[Long]("n_gaps") === 2L)
    assert(r.getAs[Long]("mean_gap_s") === 100L)
  }

  test("single events produce no gaps and groups with no gaps no rows") {
    val rows = Seq(("u", "once", ts(0), 1L)).toDF("user", "typ", "t", "id")
    assert(Burstiness.interArrival(rows, "user", "typ", "t", "id").count() === 0)
  }

  test("gated instance: one row per event type at sf0.001") {
    val out = Burstiness.burstinessEvents(spark, sfDir).collect()
    assert(out.length > 0)
    assert(out.forall(_.getAs[Long]("n_gaps") > 0))
  }
}
