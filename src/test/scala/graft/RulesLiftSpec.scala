package graft

import org.apache.spark.sql.functions._
import graft.operators.{Basket, Calibration}

class RulesLiftSpec extends SparkSpec {
  import spark.implicits._

  test("assoc rules: hand baskets give exact confidence and lift, both directions") {
    // t1{1,2} t2{1,2} t3{1,3} t4{2}(dropped: <2 items)
    // universe N=3, supp(1)=3 supp(2)=2 supp(3)=1; pair (1,2) support 2
    val fact = Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 3L), (4L, 2L)
    ).toDF("tx", "item")
    val got = Basket.rules(fact, "tx", "item", minSupport = 2L)
      .select($"antecedent", $"consequent", $"support",
        $"confidence_permicro", $"lift_permicro")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      // 1→2: conf 2/3, lift 3·2/(3·2) = 1
      (1L, 2L, 2L, 666666L, 1000000L),
      // 2→1: conf 2/2, lift 1
      (2L, 1L, 2L, 1000000L, 1000000L)))
  }

  test("assoc rules: perfectly anti-correlated items get lift < 1") {
    // 1 and 2 never co-occur except once out of many; co-pair (1,3) strong
    val fact = Seq(
      (1L, 1L), (1L, 3L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 3L),
      (4L, 2L), (4L, 3L), (5L, 2L), (5L, 3L)
    ).toDF("tx", "item")
    val got = Basket.rules(fact, "tx", "item", minSupport = 2L)
      .filter($"antecedent" === 1L && $"consequent" === 3L)
      .select($"lift_permicro").as[Long].head()
    // supp(1)=3, supp(3)=5, supp(1,3)=3, N=5: lift = 5·3/(3·5) = 1
    assert(got === 1000000L)
  }

  test("lift deciles: separable scores give top-bin lift = 1/prevalence") {
    // scores desc: 40,30 labeled 1; 20,10 labeled 0; k=2
    val df = Seq(
      (1L, 0.40, 1L), (2L, 0.30, 1L), (3L, 0.20, 0L), (4L, 0.10, 0L)
    ).toDF("id", "score", "y")
    val got = Calibration.liftDeciles(df, "id", "score", "y", k = 2)
      .orderBy("bin")
      .select($"bin", $"n", $"pos", $"cum_n", $"cum_pos",
        $"capture_permicro", $"cum_lift_permicro")
      .as[(Int, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1, 2L, 2L, 2L, 2L, 1000000L, 2000000L),
      (2, 2L, 0L, 4L, 2L, 1000000L, 1000000L)))
  }

  test("lift deciles: zero positives emit NULL lift, not a crash") {
    val df = Seq((1L, 0.4, 0L), (2L, 0.3, 0L)).toDF("id", "score", "y")
    val got = Calibration.liftDeciles(df, "id", "score", "y", k = 2)
      .select($"cum_lift_permicro").as[Option[Long]].collect().toSeq
    assert(got === Seq(None, None))
  }

  test("gated instances run: 10 lift bins; rules symmetric pair count") {
    assert(Calibration.liftEvents(spark, sfDir).count() === 10L)
    val r = Basket.assocRulesLineitem(spark, sfDir)
    val pairs = Basket.basketPairsLineitem(spark, sfDir).count()
    assert(r.count() === 2 * pairs) // each surviving pair yields 2 rules
  }
}
