package graft

import org.apache.spark.sql.functions._
import graft.ml.{AshaPointwise, TpePointwise}
import graft.operators.Sampling

/** ASHA over the pointwise ranker: the full-pool rung must equal the
  * searcher's observed objective (scheduler and searcher race the SAME
  * scoreboard), rung pools must nest, and the promotion chain must
  * halve deterministically. */
class AshaPointwiseSpec extends SparkSpec {
  import spark.implicits._

  private def feats(rows: Seq[(Long, Long, Int, Long, Long, Long)]) =
    rows.toDF("user_id", "item_id", "label", "dmin", "x1", "x2")

  private def mkConfs(n: Int) =
    (1 to n).map(j => (j.toLong, j * 62500L, j.toLong))
      .toDF("config_id", "threshold", "__cfg")

  // deterministic planted frame with enough distinct users to spread
  // across the rung bucket space (LCG ids, no RNG state)
  private def plantedFrame(n: Int): Seq[(Long, Long, Int, Long, Long, Long)] =
    (1 to n).map { i =>
      val h = (i * 2654435761L) & 0x7fffffffL
      val label = if (h % 3 == 0) 1 else 0
      val dmin = if (label == 1) -1L else h % 16
      (h % 997 + 1, i.toLong, label, dmin, h % 40 + label * 5, h % 300)
    }

  private def fits(f: org.apache.spark.sql.DataFrame) = {
    val gs = TpePointwise.groupedSums(f)
    TpePointwise.cramer(
      mkConfs(16).join(broadcast(gs), col("dmin") < col("__cfg"))
        .groupBy("config_id", "threshold")
        .agg(sum("n").as("n"), sum("s1").as("s1"), sum("s2").as("s2"),
          sum("sz").as("sz"), sum("s11").as("s11"), sum("s12").as("s12"),
          sum("s22").as("s22"), sum("s1z").as("s1z"), sum("s2z").as("s2z")))
  }

  test("full-pool rung equals the searcher's observed objective per config") {
    val f = feats(plantedFrame(600))
    val pu = TpePointwise.perUserNdcg(f, fits(f))
    val viaAsha = AshaPointwise.halve(pu).collect()
      .map(r => r.getAs[Long]("config_id") -> r.getAs[Long]("ndcg_3")).toMap
    val viaTpe = TpePointwise.trialTable(f, fits(f)).collect()
      .map(r => r.getAs[Long]("config_id") -> r.getAs[Long]("obs_acc")).toMap
    assert(viaAsha.keySet === viaTpe.keySet)
    viaTpe.foreach { case (cfg, acc) =>
      assert(viaAsha(cfg) === acc,
        s"config $cfg: full rung ndcg_3 diverges from trialTable obs_acc")
    }
  }

  test("rung counts nest, are config-independent, and match the bucket cut") {
    val f = feats(plantedFrame(600))
    val out = AshaPointwise.halve(TpePointwise.perUserNdcg(f, fits(f)))
      .collect()
    // n_r identical across configs (same users scoreable for every fit)
    (0 to 3).foreach { r =>
      assert(out.map(_.getAs[Long](s"n_$r")).distinct.length === 1)
    }
    val ns = (0 to 3).map(r => out.head.getAs[Long](s"n_$r"))
    assert(ns == ns.sorted, s"rung counts must nest: $ns")
    // full rung covers every scoreable user: recompute independently
    val scoreable = f.filter(col("label") === 1)
      .select("user_id").distinct().count()
    assert(ns(3) === scoreable)
    // rung 0 is the bucket-prefix cut of the same set
    val cut = f.filter(col("label") === 1).select("user_id").distinct()
      .filter(Sampling.portableBucket(col("user_id")) < lit(Sampling.M / 8))
      .count()
    assert(ns(0) === cut)
  }

  test("promotion chain halves 16 -> 8 -> 4 -> 2 -> 1 and the winner is the argmax") {
    val f = feats(plantedFrame(600))
    val out = AshaPointwise.halve(TpePointwise.perUserNdcg(f, fits(f)))
      .collect()
    assert(out.length === 16)
    assert(out.count(_.getAs[Int]("promoted_0") === 1) === 8)
    assert(out.count(_.getAs[Int]("promoted_1") === 1) === 4)
    assert(out.count(_.getAs[Int]("promoted_2") === 1) === 2)
    assert(out.count(_.getAs[Int]("winner") === 1) === 1)
    // monotone containment: a rung-r survivor survived rung r-1
    out.foreach { r =>
      assert(r.getAs[Int]("promoted_1") <= r.getAs[Int]("promoted_0"))
      assert(r.getAs[Int]("promoted_2") <= r.getAs[Int]("promoted_1"))
      assert(r.getAs[Int]("winner") <= r.getAs[Int]("promoted_2"))
    }
    val finalists = out.filter(_.getAs[Int]("promoted_2") === 1)
    val w = out.filter(_.getAs[Int]("winner") === 1).head
    // winner = (ndcg_3 desc, config_id asc) argmax among finalists
    val best = finalists.minBy(r =>
      (-r.getAs[Long]("ndcg_3"), r.getAs[Long]("config_id")))
    assert(w.getAs[Long]("config_id") === best.getAs[Long]("config_id"))
  }
}
