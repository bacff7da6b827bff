package graft

import graft.ml.TpeSweep

/** TPE proposal on planted trial tables. */
class TpeSweepSpec extends SparkSpec {
  import spark.implicits._

  test("planted response surface: proposal lands inside the optimum's cell") {
    // accuracy peaks at threshold 220000; good quantile = the 4 trials
    // nearest the peak, so l(x)/g(x) must argmax within the peak cell
    val trials = (0 until 16).map { j =>
      val t = 60000L + 20000L * j
      val acc = 1000000L - math.abs(t - 220000L) / 2
      (j.toLong, t, acc)
    }.toDF("config_id", "threshold", "obs_acc")
    val p = TpeSweep.propose(trials)
      .filter("proposed = 1").collect()(0)
    val proposed = p.getAs[Long]("cand_threshold")
    assert(math.abs(proposed - 220000L) <= 20000L,
      s"proposed $proposed not inside the optimum cell around 220000")
  }

  test("good density dominates near good trials, bad near bad ones") {
    val trials = Seq(
      (0L, 100000L, 900000L), (1L, 110000L, 910000L),
      (2L, 120000L, 920000L), (3L, 130000L, 930000L), // the good 4
      (4L, 300000L, 100000L), (5L, 310000L, 110000L),
      (6L, 320000L, 120000L), (7L, 330000L, 130000L))
      .toDF("config_id", "threshold", "obs_acc")
    val rows = TpeSweep.propose(trials).collect()
      .map(r => r.getAs[Long]("cand_threshold") ->
        ((r.getAs[Long]("good_density"), r.getAs[Long]("bad_density")))).toMap
    val (gNear, bNear) = rows(115000L)
    assert(gNear > 0 && bNear === 0L)
    val (gFar, bFar) = rows(315000L)
    assert(gFar === 0L && bFar > 0)
  }

  test("round 2: the loop closes — the evaluated proposal reshapes the model") {
    val r1 = graft.ml.TpeSweep.tpeOrders(spark, sfDir)
      .filter("proposed = 1").collect()(0)
    val r2 = graft.ml.TpeSweep.tpeRound2Orders(spark, sfDir).collect()
    assert(r2.length === 64)
    assert(r2.count(_.getAs[Int]("proposed") == 1) === 1)
    // the new trial at round 1's proposed threshold contributes kernel
    // mass: total density at that candidate strictly grows
    val at = r2.filter(_.getAs[Long]("cand_threshold") ==
      r1.getAs[Long]("cand_threshold"))(0)
    val r1row = graft.ml.TpeSweep.tpeOrders(spark, sfDir).collect()
      .filter(_.getAs[Long]("cand_threshold") ==
        r1.getAs[Long]("cand_threshold"))(0)
    val d1 = r1row.getAs[Long]("good_density") + r1row.getAs[Long]("bad_density")
    val d2 = at.getAs[Long]("good_density") + at.getAs[Long]("bad_density")
    assert(d2 > d1, "the evaluated trial must add kernel mass at its threshold")
  }

  test("exactly one proposal; observed picks the deepest evaluated rung") {
    val sweep = Seq(
      // (config, thr, n/acc per rung..., promoted flags)
      (0L, 60000L, 10L, 111L, 10L, 222L, 10L, 333L, 10L, 444L, 1, 1, 1, 1),
      (1L, 80000L, 10L, 555L, 10L, 666L, 10L, 777L, 10L, 888L, 1, 1, 0, 0),
      (2L, 100000L, 10L, 99L, 10L, 98L, 10L, 97L, 10L, 96L, 1, 0, 0, 0),
      (3L, 120000L, 10L, 50L, 10L, 40L, 10L, 30L, 10L, 20L, 0, 0, 0, 0))
      .toDF("config_id", "threshold", "n_0", "acc_0", "n_1", "acc_1",
        "n_2", "acc_2", "n_3", "acc_3", "promoted_0", "promoted_1",
        "promoted_2", "winner")
    val obs = TpeSweep.observed(sweep).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(obs === Map(0L -> 444L, 1L -> 777L, 2L -> 98L, 3L -> 50L))
    val props = TpeSweep.propose(
      TpeSweep.observed(sweep)).filter("proposed = 1").count()
    assert(props === 1L)
  }
}
