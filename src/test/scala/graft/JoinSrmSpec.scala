package graft

import org.apache.spark.sql.functions._
import graft.operators.{JoinEstimate, SrmCheck}

class JoinSrmSpec extends SparkSpec {
  import spark.implicits._

  test("join estimate: sum of per-key products, top keys first") {
    val a = Seq(1L, 1L, 1L, 2L, 3L).toDF("k")      // counts 3,1,1
    val b = Seq(1L, 1L, 2L, 4L).toDF("k")          // counts 2,1,1
    val got = JoinEstimate.joinSize(a, "k", b, "k", show = 5)
      .select($"key", $"pairs".cast("long"), $"est_rows".cast("long"),
        $"n_matching_keys").as[(Long, Long, Long, Long)].collect()
    // matching keys 1 (3·2 = 6) and 2 (1·1 = 1); key 3 and 4 don't match
    assert(got.map(_._3).distinct.toSeq === Seq(7L))
    assert(got.map(_._4).distinct.toSeq === Seq(2L))
    assert(got.sortBy(-_._2).map(r => (r._1, r._2)).toSeq ===
      Seq((1L, 6L), (2L, 1L)))
    // the estimate equals the materialized join size
    assert(a.join(b, "k").count() === 7L)
  }

  test("join estimate gated instance: estimate matches the real join") {
    val got = JoinEstimate.joinSizeEventsOrders(spark, sfDir)
      .select($"est_rows".cast("long")).as[Long].head()
    val real = Tables.events(spark, sfDir).select($"user_id".as("k"))
      .join(Tables.orders(spark, sfDir).select($"o_custkey".as("k")), "k")
      .count()
    assert(got === real)
  }

  test("srm: exact balance scores zero, gross imbalance flags") {
    val bal = Seq.fill(50)("a").map((_, 1)) ++ Seq.fill(50)("b").map((_, 1))
    val r1 = SrmCheck.check(bal.toDF("arm", "x"), "arm", "a", "b")
      .select($"chi2_micro", $"srm_flag").as[(Long, Boolean)].head()
    assert(r1 === ((0L, false)))
    // 80/20 on n=100: chi2 = 3600/100 = 36 >> 3.84
    val skew = Seq.fill(80)("a").map((_, 1)) ++ Seq.fill(20)("b").map((_, 1))
    val r2 = SrmCheck.check(skew.toDF("arm", "x"), "arm", "a", "b")
      .select($"chi2_micro", $"srm_flag").as[(Long, Boolean)].head()
    assert(r2 === ((36000000L, true)))
  }

  test("srm gated instance: uniform generator passes the gate") {
    val r = SrmCheck.srmLineitem(spark, sfDir)
      .select($"n1", $"n2", $"srm_flag").as[(Long, Long, Boolean)].head()
    assert(r._1 > 0 && r._2 > 0)
    assert(!r._3, s"generator flags SRM: ${r._1} vs ${r._2}")
  }
}
