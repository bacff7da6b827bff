package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.ml.AlsStep
import graft.functions.Hll
import graft.streaming.HllMonitor
import graft.streaming.HllMonitor.Obs

class AlsHllMonitorSpec extends SparkSpec {
  import spark.implicits._

  test("als: single-item users recover the ridge-shrunk projection") {
    // one user, one item rated r: solve (vvT + λI)x = v·r exactly
    val ratings = Seq((1L, 10L, 5L)).toDF("u", "item", "r")
    val got = AlsStep.userFactors(ratings, "u", "item", "r")
      .select($"n_ratings", $"x1_micro", $"x2_micro")
      .as[(Long, Long, Long)].head()
    // v = ((10·31)%1001−500, (10·57)%1001−500) = (−190, 70)
    val (v1, v2, r, lam) = (-190L, 70L, 5L, AlsStep.LambdaMm)
    val (r11, r12, r22) = (v1 * v1 + lam, v1 * v2, v2 * v2 + lam)
    val det = r11 * r22 - r12 * r12
    def sd(n: Long) = (if (n < 0) -1L else 1L) * (math.abs(n) / det)
    assert(got === ((1L,
      sd(1000000L * (v1 * r * r22 - v2 * r * r12)),
      sd(1000000L * (v2 * r * r11 - v1 * r * r12)))))
  }

  test("als: factors reproduce ratings on an exactly-solvable pair") {
    // two items with independent factor directions, λ small vs signal:
    // prediction x·v should land near each rating (micros × milli / 1e9)
    val ratings = Seq((1L, 10L, 20L), (1L, 17L, 40L)).toDF("u", "item", "r")
    val f = AlsStep.userFactors(ratings, "u", "item", "r")
      .select($"x1_micro", $"x2_micro").as[(Long, Long)].head()
    def v(item: Long) = ((item * 31 % 1001) - 500, (item * 57 % 1001) - 500)
    for ((item, r) <- Seq((10L, 20L), (17L, 40L))) {
      val (v1, v2) = v(item)
      // x is in rating-per-milli units ⇒ x_micro·v_milli / 1e6 = rating
      val pred = (f._1 * v1 + f._2 * v2) / 1e6
      assert(math.abs(pred - r) < r * 0.25, s"item $item pred $pred vs $r")
    }
  }

  test("als gated instance: every rating-holding customer solves") {
    val got = AlsStep.alsStepOrders(spark, sfDir)
    assert(got.filter($"x1_micro".isNull || $"x2_micro".isNull).isEmpty)
    assert(got.count() > 0)
  }

  test("hll monitor: streaming registers equal the batch sketch of the union") {
    val root = Files.createTempDirectory("graft_hllmon").toString
    val in = MemoryStream[Obs](spark)
    val q = HllMonitor.estimates(in.toDS()).writeStream
      .format("memory").queryName("hll_est")
      .option("checkpointLocation", s"$root/chk")
      .outputMode("append").start()
    in.addData((1L to 200L).map(i => Obs("click", i)): _*)
    q.processAllAvailable()
    in.addData((150L to 400L).map(i => Obs("click", i)): _*)
    in.addData((1L to 50L).map(i => Obs("view", i)): _*)
    q.processAllAvailable()
    val rows = spark.table("hll_est")
      .select($"key", $"n_batches", $"registers", $"est_micro")
      .as[(String, Long, Seq[Long], Long)].collect()
    q.stop()
    // latest click state = batch sketch registers over 1..400 exactly
    val clickFinal = rows.filter(_._1 == "click").maxBy(_._2)
    val batchRegs = Hll.sketch((1L to 400L).toDF("k"), "k")
      .select($"bucket", $"register").as[(Long, Long)].collect()
      .sortBy(_._1).map(_._2).toSeq
    assert(clickFinal._3 === batchRegs)
    // and the readout agrees with the batch estimate column
    val batchEst = Hll.sketch((1L to 400L).toDF("k"), "k")
      .select($"est_micro").as[Long].head()
    assert(clickFinal._4 === batchEst)
    // keys are isolated: view's first-batch estimate ≈ 50, not 400
    val viewEst = rows.filter(_._1 == "view").maxBy(_._2)._4 / 1e6
    assert(viewEst > 20 && viewEst < 100, s"view est $viewEst")
  }
}
