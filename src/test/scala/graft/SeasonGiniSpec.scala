package graft

import org.apache.spark.sql.functions._
import graft.operators.{Gini, SeasonalDecompose}

class SeasonGiniSpec extends SparkSpec {
  import spark.implicits._

  test("seasonal decompose: pure weekly pattern has zero residual on interior days") {
    // x = 100·(1 + (idx-1)%7): exactly periodic, linear-trend-free
    val cells = (1 to 21).map(i => ("s", i, 100L * (1 + (i - 1) % 7)))
      .toDF("grp", "idx", "x")
    val got = SeasonalDecompose.decompose(cells, "grp", "idx", "x")
    // interior days 4..18 have full windows; a perfectly periodic series'
    // residual is 0 there (MA over any 7 consecutive = series mean)
    val resid = got.filter($"idx".between(4, 18))
      .select($"residual_permicro").as[Long].collect()
    assert(resid.nonEmpty && resid.forall(_ === 0L))
    // edge days carry NULL trend
    assert(got.filter($"idx" === 1).select($"trend_sum7").as[Option[Long]].head().isEmpty)
  }

  test("seasonal decompose: trend_sum7 is the exact 7-day sum") {
    val cells = (1 to 9).map(i => ("s", i, i.toLong)).toDF("grp", "idx", "x")
    val got = SeasonalDecompose.decompose(cells, "grp", "idx", "x")
      .filter($"idx" === 5).select($"trend_sum7").as[Option[Long]].head()
    assert(got === Some((2 to 8).sum.toLong))
  }

  test("gini: perfect equality -> 0; maximal concentration -> (n-1)/n") {
    val eq = Gini.lorenzGini(
        Seq(("a", 10L), ("b", 10L), ("c", 10L), ("d", 10L)).toDF("k", "x"),
        "k", "x", k = 2)
      .select($"gini_permicro").as[Long].head()
    assert(eq === 0L)
    val conc = Gini.lorenzGini(
        Seq(("a", 0L), ("b", 0L), ("c", 0L), ("d", 100L)).toDF("k", "x"),
        "k", "x", k = 2)
      .select($"gini_permicro").as[Long].head()
    assert(conc === 750000L) // (n-1)/n = 3/4
  }

  test("gini: lorenz curve is monotone and ends at (1,1)") {
    val got = Gini.giniCustomerRevenue(spark, sfDir)
      .orderBy("cell")
      .select($"cell", $"pop_permicro", $"mass_permicro")
      .as[(Int, Long, Long)].collect().toSeq
    assert(got.length === 20)
    assert(got.last._2 === 1000000L && got.last._3 === 1000000L)
    // mass share never exceeds population share for ascending ordering
    assert(got.forall { case (_, p, m) => m <= p })
    assert(got.sliding(2).forall {
      case Seq((_, p1, m1), (_, p2, m2)) => p2 >= p1 && m2 >= m1
      case _ => true
    })
  }
}
