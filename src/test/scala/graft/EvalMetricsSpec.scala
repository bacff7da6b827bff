package graft

import org.apache.spark.sql.functions._
import graft.operators.EvalMetrics

class EvalMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("factorial table: exact values, 20! fits") {
    assert(EvalMetrics.Fact(0) === 1L)
    assert(EvalMetrics.Fact(5) === 120L)
    assert(EvalMetrics.Fact(20) === 2432902008176640000L)
  }

  test("span f1: multiset overlap counts duplicates correctly") {
    val pred = Seq((1L, "a"), (1L, "a"), (1L, "b")).toDF("doc_id", "t")
    val gold = Seq((1L, "a"), (1L, "c"), (1L, "c")).toDF("doc_id", "t")
    val r = EvalMetrics.spanF1(pred, gold, "doc_id", "t")
      .select($"len_p", $"len_g", $"overlap", $"f1_permicro")
      .as[(Long, Long, Long, Long)].head()
    // overlap = min(2,1) on 'a' = 1; F1 = 2·1/6 = 1/3
    assert(r === ((3L, 3L, 1L, 333333L)))
  }

  test("span f1: disjoint spans score zero, identical spans score 1e6") {
    val p = Seq((1L, "x"), (2L, "s")).toDF("doc_id", "t")
    val g = Seq((1L, "y"), (2L, "s")).toDF("doc_id", "t")
    val got = EvalMetrics.spanF1(p, g, "doc_id", "t")
      .select($"doc_id", $"f1_permicro").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 1000000L))
  }

  test("pass@k: hand values match the Codex estimator") {
    // n=4, c=1: pass@1 = 1/4; pass@2 = 1 − C(3,2)/C(4,2) = 1 − 3/6 = 1/2
    val units = Seq((4L, 1L)).toDF("n", "c")
    val got = EvalMetrics.passAtK(units, "n", "c", Seq(1, 2, 4))
      .select($"k", $"mean_pass_permicro").as[(Long, Long)].collect().toMap
    assert(got(1L) === 250000L)
    assert(got(2L) === 500000L)
    assert(got(4L) === 1000000L) // k = n with c ≥ 1 always passes
  }

  test("pass@k: zero successes score zero at every k; k > n clamps") {
    val units = Seq((3L, 0L), (2L, 2L)).toDF("n", "c")
    val got = EvalMetrics.passAtK(units, "n", "c", Seq(10))
      .select($"n_units", $"mean_pass_permicro").as[(Long, Long)].head()
    // unit 1: 0; unit 2 (kk=2, c=n): 1e6 → mean 500000
    assert(got === ((2L, 500000L)))
  }

  test("gated instances: monotone in k, f1 bounded") {
    val pk = EvalMetrics.passAtKEvents(spark, sfDir)
      .orderBy($"k").select($"mean_pass_permicro").as[Long].collect()
    assert(pk.length === 3)
    assert(pk.toSeq === pk.sorted) // pass@k is monotone in k
    val f1 = EvalMetrics.spanF1Docs(spark, sfDir)
    assert(f1.filter($"f1_permicro" < 0 || $"f1_permicro" > 1000000).isEmpty)
    assert(f1.count() > 0)
  }
}
