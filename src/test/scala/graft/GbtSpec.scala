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

  test("gated orders instance: recovers the planted price threshold") {
    val m = GbtTrain.gbtTrainEval(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("n_train") > 0 && m("n_test") > 0)
    assert(m("auc") > 0.9 && m("accuracy") > m("majority_baseline"),
      s"planted threshold not recovered: $m")
    assert(m("importance_f_price") > 0.5, s"importance off the signal feature: $m")
  }
}
