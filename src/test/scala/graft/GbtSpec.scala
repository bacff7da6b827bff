package graft

import org.apache.spark.sql.functions._
import graft.ml.GbtTrain

/** GBT train/eval through the shared tree harness: learnable data must
  * clear baselines, metrics must be deterministic, and the gated orders
  * instance must recover the planted signal — mirroring
  * RandomForestSpec for the boosted sibling. */
class GbtSpec extends SparkSpec {
  import spark.implicits._

  private def synth = {
    def mix(x: Long): Long = {
      var z = x + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    (0L until 2000L).map { i =>
      val x1 = (mix(i) % 1000L).toDouble / 100.0
      val x2 = (mix(i + 5000L) % 1000L).toDouble / 100.0
      (i, if (x1 > 0) 1.0 else 0.0, x1, x2)
    }.toDF("id", "y", "x1", "x2")
  }

  test("separable data: AUC and accuracy clear the majority baseline") {
    val m = GbtTrain.trainEval(synth, "id", "y", Seq("x1", "x2"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("n_train") + m("n_test") == 2000.0)
    assert(m("auc") > 0.95, s"separable data must be learnable: $m")
    assert(m("accuracy") > m("majority_baseline"), s"no lift over majority: $m")
    assert(m("importance_x1") > m("importance_x2"))
  }

  test("fixed seed + hash split: byte-identical metrics across runs") {
    val a = GbtTrain.trainEval(synth, "id", "y", Seq("x1", "x2"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    val b = GbtTrain.trainEval(synth, "id", "y", Seq("x1", "x2"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(a == b, s"nondeterministic training: ${a.diff(b)} vs ${b.diff(a)}")
  }

  test("stump: picks the separating feature and a pure planted split") {
    import graft.ml.GbtStump
    // x1 in [0, 99] separates y perfectly at 50; x2 is noise. The stump
    // must rank x1 first, and its best bin boundary must split pure:
    // every left row negative, every right row positive (bins are
    // equal-width over [0, 99], so boundary 16 = value 50 exactly).
    val rows = (0L until 640L).map { i =>
      val x1 = i % 100L
      val x2 = (i * 2654435761L) % 97L
      (if (x1 >= 50) 1L else 0L, x1, x2)
    }.toDF("y", "x1", "x2")
    val got = GbtStump.bestSplits(rows, "y",
      Seq("x1" -> col("x1"), "x2" -> col("x2")), bins = 32)
      .collect().map(r => r.getAs[String]("feature") ->
        (r.getAs[Long]("rank"), r.getAs[Long]("split_bin"),
          r.getAs[Long]("pos_left"), r.getAs[Long]("n_left"),
          r.getAs[Long]("pos_right"), r.getAs[Long]("n_right"))).toMap
    val (rank1, bin1, posL, nL, posR, nR) = got("x1")
    assert(rank1 == 1L, s"signal feature not ranked first: $got")
    assert(posL == 0L && posR == nR, s"best x1 split not pure: $got")
    assert(nL + nR == 640L)
    assert(got("x2")._1 == 2L)

    // gated instance: f_price (the label's own threshold) must win, and
    // its winning split must be far cleaner than any other feature's
    val gate = GbtStump.gbtStump(spark, sfDir)
      .collect().map(r => r.getAs[Long]("rank") -> r.getAs[String]("feature")).toMap
    assert(gate(1L) == "f_price", s"stump chose ${gate(1L)} over f_price")
  }

  test("level 2: each side refits independently and finds its own feature") {
    import graft.ml.GbtStump
    // y = 1 when x1 >= 50, else (x2 >= 45): the root must split on x1
    // (cost 0.1875n vs x2's 0.375n), the LEFT child's signal then
    // lives entirely in x2 (pure at the 44/45 bin boundary), and the
    // RIGHT child is pure-positive (no split can improve; every
    // candidate ties). This pins per-node independence of the level fit.
    val rows = (0L until 1200L).map { i =>
      val x1 = i % 100L
      val x2 = (i * 7L) % 60L
      (if (x1 >= 50 || x2 >= 45) 1L else 0L, x1, x2)
    }.toDF("y", "x1", "x2")
    val root = GbtStump.bestSplits(rows, "y",
        Seq("x1" -> col("x1"), "x2" -> col("x2")), bins = 32)
      .filter(col("rank") === 1).head()
    assert(root.getAs[String]("feature") == "x1", s"root not on x1: $root")
    val sided = rows.withColumn("side",
      when(expr(s"((x1 - 0) * 32) div 100 <= ${root.getAs[Long]("split_bin")}"),
        "L").otherwise("R"))
    val lvl2 = GbtStump.bestSplits(sided, "y",
        Seq("x1" -> col("x1"), "x2" -> col("x2")), bins = 32,
        byCols = Seq("side"))
      .collect().map(r => (r.getAs[String]("side"), r.getAs[Long]("rank")) ->
        ((r.getAs[String]("feature"), r.getAs[Long]("pos_left"),
          r.getAs[Long]("n_left"), r.getAs[Long]("pos_right"),
          r.getAs[Long]("n_right"))).asInstanceOf[Any]).toMap
    val (lf, lposL, _, lposR, lnR) =
      lvl2(("L", 1L)).asInstanceOf[(String, Long, Long, Long, Long)]
    assert(lf == "x2", s"left child not on x2: $lvl2")
    assert(lposL == 0L && lposR == lnR, s"left child split not pure: $lvl2")
    val (_, rposL, rnL, rposR, rnR) =
      lvl2(("R", 1L)).asInstanceOf[(String, Long, Long, Long, Long)]
    assert(rposL == rnL && rposR == rnR, "right child must be pure-positive")
  }

  test("stump attribution: additive node deltas that separate the planted label") {
    import graft.ml.GbtStump
    val rows = GbtStump.stumpAttribution(spark, sfDir)
      .select("o_orderkey", "side", "root_micros", "pred_micros", "contrib_micros")
      .as[(Long, String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // Saabas identity, exact in integer micros
    assert(rows.forall(r => r._4 == r._3 + r._5), "pred != root + contrib")
    // the winning split is on f_price at the planted 250k threshold, so
    // the two sides' predicted positive rates must be far apart —
    // right (high price) near-certain positive, left near-certain not
    val predL = rows.filter(_._2 == "L").map(_._4)
    val predR = rows.filter(_._2 == "R").map(_._4)
    assert(predL.nonEmpty && predR.nonEmpty)
    assert(predR.head > predL.head + 500000,
      s"stump sides not separated: L=${predL.head} R=${predR.head}")
    // contributions carry the separation sign
    assert(rows.filter(_._2 == "R").forall(_._5 > 0))
    assert(rows.filter(_._2 == "L").forall(_._5 < 0))
  }

  test("gated orders instance: recovers the planted price threshold") {
    val m = GbtTrain.gbtTrainEval(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("n_train") > 0 && m("n_test") > 0)
    assert(m("auc") > 0.9 && m("accuracy") > m("majority_baseline"),
      s"planted threshold not recovered: $m")
    assert(m("importance_f_price") > 0.5, s"importance off the signal feature: $m")
  }
}
