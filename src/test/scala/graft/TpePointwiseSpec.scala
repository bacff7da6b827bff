package graft

import org.apache.spark.sql.functions._
import graft.ml.{LogRegStep, TpePointwise}

/** tune×recsys: the TPE sweep over the pointwise ranker's
  * negative-sampling ratio — incremental-equals-batch on the prefix
  * sums, Cramer cross-validated against the gated LogRegStep, the
  * scoreboard hand-checked, and planted trials that discriminate. */
class TpePointwiseSpec extends SparkSpec {
  import spark.implicits._

  /** (user, item, label, dmin, x1, x2) rows shaped like drawFeatures
    * output: positives dmin = −1, negatives dmin = draw index. */
  private def feats(rows: Seq[(Long, Long, Int, Long, Long, Long)]) =
    rows.toDF("user_id", "item_id", "label", "dmin", "x1", "x2")

  private def mkConfs(n: Int) =
    (1 to n).map(j => (j.toLong, j * 62500L, j.toLong))
      .toDF("config_id", "threshold", "__cfg")

  // deterministic pseudo-random planted frame (LCG, no RNG state)
  private def plantedFrame(n: Int): Seq[(Long, Long, Int, Long, Long, Long)] =
    (1 to n).map { i =>
      val h = (i * 2654435761L) & 0x7fffffffL
      val label = if (h % 3 == 0) 1 else 0
      val dmin = if (label == 1) -1L else h % 16
      (h % 7 + 1, i.toLong, label, dmin, h % 40 + label * 5, h % 300)
    }

  test("prefix sums: incremental trial sums equal batch per-j recompute") {
    val f = feats(plantedFrame(400))
    val viaPrefix = TpePointwise.cramer(
        // exercise the real prefix path through the public entry pieces
        invokePrefix(f, 16))
      .collect().map(r => r.getAs[Long]("config_id") ->
        (r.getAs[Long]("w0_micros"), r.getAs[Long]("w1_micros"),
          r.getAs[Long]("w2_micros"))).toMap
    (1 to 16).foreach { j =>
      val batch = LogRegStep.newtonStep(
        f.filter(col("dmin") < j), col("label") === 1,
        col("x1"), col("x2"), probeX1 = 0L, probeX2 = 0L).collect()(0)
      assert(viaPrefix(j.toLong) === (batch.getAs[Long]("w0_micros"),
        batch.getAs[Long]("w1_micros"), batch.getAs[Long]("w2_micros")),
        s"trial $j: prefix-sum fit diverges from the batch LogRegStep fit")
    }
  }

  /** Reflection-free access to the prefix path: groupedSums + the join
    * + cramer, exactly what tpePointwiseOrders composes. */
  private def invokePrefix(f: org.apache.spark.sql.DataFrame, n: Int) = {
    val gs = TpePointwise.groupedSums(f)
    val sums = mkConfs(n).join(broadcast(gs), col("dmin") < col("__cfg"))
      .groupBy("config_id", "threshold")
      .agg(sum("n").as("n"), sum("s1").as("s1"), sum("s2").as("s2"),
        sum("sz").as("sz"), sum("s11").as("s11"), sum("s12").as("s12"),
        sum("s22").as("s22"), sum("s1z").as("s1z"), sum("s2z").as("s2z"))
    sums
  }

  test("trialTable: hand-checked nDCG@10 on a 1-user frame") {
    // user 1, three candidates: item 1 relevant, items 2-3 not.
    // fit A ranks (1,2,3): ndcg = 1e6. fit B ranks (2,3,1):
    // dcg = disc(3) = 500000 micros -> ndcg = 500000.
    val f = feats(Seq(
      (1L, 1L, 1, -1L, 10L, 0L),
      (1L, 2L, 0, 0L, 5L, 100L),
      (1L, 3L, 0, 0L, 4L, 100L)))
    val fits = Seq(
      (1L, 62500L, 0L, 1000L, 0L),     // margin = 1000·x1: item 1 first
      (2L, 125000L, 0L, 0L, 1000L))    // margin = 1000·x2: item 1 LAST
      .toDF("config_id", "threshold", "w0_micros", "w1_micros", "w2_micros")
    val t = TpePointwise.trialTable(f, fits).collect()
      .map(r => r.getAs[Long]("config_id") -> r.getAs[Long]("obs_acc")).toMap
    assert(t(1L) === 1000000L)
    assert(t(2L) === 500000L) // 1/log2(3+1) = 0.5 exactly
  }

  test("planted ratio knob: trials discriminate and the proposal lands" +
      " in the planted-good cells") {
    // Early draws (0..3) are clean: positives (x1=10) vs negatives
    // (x1=1), with x2 EXACTLY balanced ±1 inside every class — so
    // s2 = s12 = s2z = 0 and the early trials' w2 is EXACTLY zero.
    // The eval frame plants 12 tie negatives per user at x1=10 (the
    // positives' popularity) with LOWER item ids: at w2 = 0 their
    // margins tie the positives' and the id tie-break buries every
    // positive below rank 10 -> nDCG 0 for trials 1..4. Draws 4+ add
    // x2-high poison negatives, the refit drives w2 strictly negative,
    // the x2=+2 ties now rank BELOW the x2=±1 positives -> nDCG 10^6.
    // Planted-best region: the ratio >= 5/16 cells.
    var iid = 0
    val rows = (1 to 8).flatMap { u =>
      val p = (0 until 8).map { k =>
        iid += 1
        (u.toLong, 100000L + iid, 1, -1L, 10L, if (k % 2 == 0) 1L else -1L) }
      val clean = (0 until 10).map { k =>
        iid += 1
        (u.toLong, iid.toLong, 0, (k % 4).toLong, 1L,
          if (k % 2 == 0) 1L else -1L) }
      val ties = (0 until 12).map { k =>
        iid += 1; (u.toLong, iid.toLong, 0, (4 + k % 12).toLong, 10L, 2L) }
      val poison = (0 until 20).map { k =>
        iid += 1; (u.toLong, iid.toLong, 0, (4 + k % 12).toLong, 9L, 50L) }
      p ++ clean ++ ties ++ poison
    }
    val f = feats(rows).localCheckpoint()
    val fits = TpePointwise.cramer(invokePrefix(f, 16))
    val trials = TpePointwise.trialTable(f, fits).collect()
      .map(r => r.getAs[Long]("config_id") -> r.getAs[Long]("obs_acc")).toMap
    (1 to 4).foreach(j => assert(trials(j.toLong) === 0L,
      s"trial $j: the exact-zero-w2 tie trap did not zero the nDCG"))
    (5 to 16).foreach(j => assert(trials(j.toLong) === 1000000L,
      s"trial $j: the poison-draw refit did not rank positives on top"))
    val p = graft.ml.TpeSweep.proposeGrid(
        TpePointwise.trialTable(f, fits), graft.ml.TpeSweep.Gamma,
        TpePointwise.BandW, TpePointwise.CandLo, TpePointwise.CandStep,
        TpePointwise.CandN)
      .filter("proposed = 1").collect()(0)
    val cand = p.getAs[Long]("cand_threshold")
    assert(cand >= 281250L && cand <= 531250L,
      s"proposed $cand outside the planted-good ratio>=5/16 region")
  }

  test("gated instance: 64 scored candidates, exactly one proposed," +
      " deterministic") {
    val out = TpePointwise.tpePointwiseOrders(spark, sfDir).collect()
    assert(out.length === TpePointwise.CandN)
    assert(out.count(_.getAs[Int]("proposed") == 1) === 1)
    val again = TpePointwise.tpePointwiseOrders(spark, sfDir).collect()
    assert(out.map(_.toString).sorted.toSeq ===
      again.map(_.toString).sorted.toSeq)
  }

  test("round 2: the loop closes over the ranking objective") {
    val r1 = TpePointwise.tpePointwiseOrders(spark, sfDir)
      .filter("proposed = 1").collect()(0)
    val r2 = TpePointwise.tpePointwiseRound2(spark, sfDir).collect()
    assert(r2.length === TpePointwise.CandN)
    assert(r2.count(_.getAs[Int]("proposed") == 1) === 1)
    // trial 17 (round 1's winner, realized as a fractional draw ratio)
    // adds kernel mass at round 1's proposed candidate
    val at2 = r2.filter(_.getAs[Long]("cand_threshold") ==
      r1.getAs[Long]("cand_threshold"))(0)
    val dens1 = r1.getAs[Long]("good_density") + r1.getAs[Long]("bad_density")
    val dens2 = at2.getAs[Long]("good_density") + at2.getAs[Long]("bad_density")
    assert(dens2 > dens1,
      s"round-2 density $dens2 did not grow past round-1 $dens1 at the winner")
  }
}
