package graft

import org.apache.spark.sql.functions._
import graft.operators.EbShrinkage

/** Beta-binomial EB shrinkage: identical groups collapse to the pool,
  * small groups shrink harder than large ones, bounds hold, and the
  * single-group degenerate path emits the pooled rate. */
class EbShrinkageSpec extends SparkSpec {
  import spark.implicits._

  private def units(spec: (String, Int, Int)*) =
    spec.flatMap { case (g, hits, misses) =>
      Seq.fill(hits)((g, true)) ++ Seq.fill(misses)((g, false))
    }.toDF("g", "hit")

  test("identical group rates: s2 = 0, every group emits the pooled rate") {
    val df = units(("a", 1, 3), ("b", 2, 6), ("c", 3, 9)) // all 25%
    val out = EbShrinkage.betaBinomial(df, "g", "hit").collect()
    assert(out.forall(_.getAs[Long]("shrunk_micro") === 250000L))
  }

  test("small groups shrink toward the pool harder than large groups") {
    // pool 50%, moderate dispersion (rates .9/.9/.1/.1/.5): MoM gives
    // K_micro = (.25·1e6²)/(.128e12)·1e6 − 1e6 = 953125, a FRACTIONAL
    // prior (K ≈ 0.95) that only survives the micro-carried division
    val df = units(("tiny", 9, 1), ("big", 900, 100), ("lowT", 1, 9),
      ("lowB", 100, 900), ("mid", 500, 500))
    val rows = EbShrinkage.betaBinomial(df, "g", "hit").collect()
    assert(rows.head.getAs[Long]("k_micro") === 953125L)
    val out = rows
      .map(r => r.getString(0) -> r.getAs[Long]("shrunk_micro")).toMap
    // same observed rate: the small group is pulled further toward pool
    assert(out("tiny") < out("big"))   // tiny high pulled down harder
    assert(out("lowT") > out("lowB"))  // tiny low pulled up harder
    // exact hand-computed values: (1e12·x + K·p̄) div (1e6·n + K)
    assert(out("tiny") === (9_000_000_000_000L + 953125L * 500000L) /
      (10_000_000L + 953125L))
    assert(out("lowT") === (1_000_000_000_000L + 953125L * 500000L) /
      (10_000_000L + 953125L))
  }

  test("shrunk rates stay within [pooled, observed] bounds per group") {
    val df = units(("a", 9, 1), ("b", 1, 9), ("c", 5, 5))
    val out = EbShrinkage.betaBinomial(df, "g", "hit").collect()
    out.foreach { r =>
      val (rate, pbar, shrunk) = (r.getAs[Long]("rate_micro"),
        r.getAs[Long]("pbar_micro"), r.getAs[Long]("shrunk_micro"))
      val (lo, hi) = (math.min(rate, pbar), math.max(rate, pbar))
      // truncation can undershoot by a micro; allow that exact slack
      assert(shrunk >= lo - 1 && shrunk <= hi + 1,
        s"${r.getString(0)}: $shrunk not in [$lo, $hi]")
    }
  }

  test("single group: no between-variance, pooled rate emitted") {
    val out = EbShrinkage.betaBinomial(units(("only", 3, 1)), "g", "hit")
      .collect().head
    assert(out.getAs[Long]("k_micro") === 0L)
    assert(out.getAs[Long]("shrunk_micro") === 750000L)
  }

  test("gated instance: 25 nations, shrunk rates bounded at sf0.001") {
    val out = EbShrinkage.ebNationReturns(spark, sfDir)
    assert(out.count() === 25L)
    assert(out.filter(col("shrunk_micro") < 0L ||
      col("shrunk_micro") > 1000000L).count() === 0)
  }
}
