package graft

import graft.ml.AshaSweep
import org.apache.spark.sql.functions._

/** Successive-halving contracts: the perfect config wins, promotion
  * sets halve and nest, and every rung's pool is a prefix. */
class AshaSweepSpec extends SparkSpec {
  import spark.implicits._

  test("perfect threshold survives every rung and wins") {
    // dollars = id % 300, label = dollars > 150: config thr=150 is
    // exactly right; neighbors misclassify a band of values
    val df = spark.range(1, 20001).toDF("id")
      .withColumn("dollars", col("id") % 300)
      .withColumn("label01", (col("dollars") > 150).cast("long"))
    val grid = Seq(50L, 100L, 130L, 150L, 170L, 200L, 250L, 290L)
    val got = AshaSweep.sweep(df, "id", "dollars", "label01", grid)
      .orderBy("config_id").collect()
    assert(got.length == 8)
    val byThr = got.map(r => r.getAs[Long]("threshold") -> r).toMap
    val winner = got.filter(_.getAs[Int]("winner") == 1)
    assert(winner.length == 1)
    assert(winner.head.getAs[Long]("threshold") == 150L)
    // the perfect config is exactly 1e6 accurate at every rung it ran
    (0 to 3).foreach { r =>
      assert(byThr(150L).getAs[Long](s"acc_$r") == 1000000L)
    }
    // promotion counts halve: 4, 2, 1
    assert(got.count(_.getAs[Int]("promoted_0") == 1) == 4)
    assert(got.count(_.getAs[Int]("promoted_1") == 1) == 2)
    assert(got.count(_.getAs[Int]("promoted_2") == 1) == 1)
    // nesting: promoted_{r+1} implies promoted_r
    got.foreach { r =>
      assert(r.getAs[Int]("promoted_1") <= r.getAs[Int]("promoted_0"))
      assert(r.getAs[Int]("promoted_2") <= r.getAs[Int]("promoted_1"))
      assert(r.getAs[Int]("winner") <= r.getAs[Int]("promoted_2"))
    }
    // rung pools are nested prefixes: n_0 <= n_1 <= n_2 <= n_3, all > 0
    got.foreach { r =>
      val ns = (0 to 3).map(i => r.getAs[Long](s"n_$i"))
      assert(ns == ns.sorted && ns.head > 0)
    }
  }
}
