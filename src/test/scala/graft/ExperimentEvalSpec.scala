package graft

import org.apache.spark.sql.functions._
import graft.operators.{Cuped, MannWhitney}

class ExperimentEvalSpec extends SparkSpec {
  import spark.implicits._

  test("mann-whitney: complete dominance gives rb = 1, reversal -1") {
    val df = Seq(("a", 10L), ("a", 11L), ("b", 1L), ("b", 2L), ("b", 3L))
      .toDF("g", "v")
    val r = MannWhitney.uStats(df, "v", "g", "a", "b")
      .select($"n1", $"n2", $"u2_g1".cast("long"), $"rank_biserial_permicro")
      .as[(Long, Long, Long, Long)].head()
    assert(r === ((2L, 3L, 12L, 1000000L))) // 2U = 2·n1·n2 = 12
    val rev = MannWhitney.uStats(df, "v", "g", "b", "a")
      .select($"rank_biserial_permicro").as[Long].head()
    assert(rev === -1000000L)
  }

  test("mann-whitney: all-tied arms give U = n1·n2/2 exactly (2U integer)") {
    val df = Seq(("a", 5L), ("a", 5L), ("b", 5L)).toDF("g", "v")
    val r = MannWhitney.uStats(df, "v", "g", "a", "b")
      .select($"u2_g1".cast("long"), $"u2_g2".cast("long"),
        $"rank_biserial_permicro").as[(Long, Long, Long)].head()
    assert(r === ((2L, 2L, 0L))) // 2U1 = 2U2 = n1·n2 = 2
  }

  test("mann-whitney gated instance: one row, U identity holds") {
    val r = MannWhitney.mannWhitneyLineitem(spark, sfDir)
      .select($"n1", $"n2", $"u2_g1".cast("long"), $"u2_g2".cast("long"))
      .as[(Long, Long, Long, Long)].collect()
    assert(r.length === 1)
    val (n1, n2, u1, u2) = r.head
    assert(n1 > 0 && n2 > 0)
    assert(u1 + u2 === 2 * n1 * n2)
  }

  test("cuped: perfectly linear covariate removes all variance") {
    val units = Seq((1L, 100L, 200L), (2L, 200L, 400L), (3L, 300L, 600L))
      .toDF("id", "x", "y")
    val r = Cuped.varianceReduction(units, "x", "y")
      .select($"theta_micro", $"ss_adj".cast("long"), $"reduction_permicro")
      .as[(Long, Long, Long)].head()
    assert(r === ((2000000L, 0L, 1000000L)))
  }

  test("cuped: constant covariate is a no-op (theta 0, reduction 0)") {
    val units = Seq((1L, 7L, 10L), (2L, 7L, 30L)).toDF("id", "x", "y")
    val r = Cuped.varianceReduction(units, "x", "y")
      .select($"theta_micro", $"ss_y".cast("long"), $"ss_adj".cast("long"),
        $"reduction_permicro").as[(Long, Long, Long, Long)].head()
    assert(r._1 === 0L)
    assert(r._2 === r._3)
    assert(r._4 === 0L)
  }

  test("cuped gated instance: pre-period spend explains some variance") {
    val r = Cuped.cupedOrders(spark, sfDir)
      .select($"n", $"reduction_permicro").as[(Long, Long)].collect()
    assert(r.length === 1)
    assert(r.head._1 > 0)
    // adjustment can never be told to increase SS on the fit sample
    assert(r.head._2 >= 0L && r.head._2 <= 1000000L)
  }
}
