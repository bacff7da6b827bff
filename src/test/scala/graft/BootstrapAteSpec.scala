package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bootstrap, StratifiedAte}

class BootstrapAteSpec extends SparkSpec {
  import spark.implicits._

  test("poisson table: cumulative ppm is monotone and ends near 1e6") {
    val t = Bootstrap.PoissonCumPpm
    assert(t.head === 367879L) // e^-1 in ppm
    assert(t === t.sorted)
    assert(t.last >= 999998L && t.last <= 1000000L)
  }

  test("bootstrap: CI brackets the true mean on a well-behaved sample") {
    val df = (1L to 2000L).map(i => (i, 1000L + (i % 7) * 10)).toDF("id", "v")
    val r = Bootstrap.meanCi(df, "id", "v")
      .select($"n", $"mean_micro", $"ci_lo_micro", $"ci_hi_micro")
      .as[(Long, Long, Long, Long)].head()
    assert(r._1 === 2000L)
    assert(r._3 <= r._2 && r._2 <= r._4, s"CI [${r._3}, ${r._4}] vs mean ${r._2}")
    // replicate noise on n=2000 stays well inside ±5% of the mean
    assert(r._4 - r._3 < r._2 / 10)
  }

  test("bootstrap: constant data gives zero-width CI at the constant") {
    val df = (1L to 500L).map(i => (i, 777L)).toDF("id", "v")
    val r = Bootstrap.meanCi(df, "id", "v")
      .select($"mean_micro", $"ci_lo_micro", $"ci_hi_micro")
      .as[(Long, Long, Long)].head()
    assert(r === ((777000000L, 777000000L, 777000000L)))
  }

  test("strat ate: hand strata combine by size, one-arm stratum excluded") {
    val units = Seq(
      // stratum 1: treated mean 30, control mean 10 → Δ 20
      (1L, true, 30L), (2L, true, 30L), (3L, false, 10L),
      // stratum 2: treated mean 5, control mean 10 → Δ −5
      (4L, true, 5L), (5L, false, 10L),
      // stratum 3: control only → excluded from pooling
      (6L, false, 99L)
    ).zipWithIndex.map { case ((id, t, y), i) =>
      (id, if (id <= 3) 1L else if (id <= 5) 2L else 3L, t, y)
    }.toDF("id", "s", "t", "y")
    val got = StratifiedAte.ate(units, "s", "t", "y")
    val rows = got.select($"stratum", $"delta_micro").as[(Long, Option[Long])]
      .collect().toMap
    assert(rows(1L) === Some(20000000L))
    assert(rows(2L) === Some(-5000000L))
    assert(rows(3L) === None)
    val pooled = got.select($"n_used", $"ate_micro").as[(Long, Long)].head()
    // (3·20e6 + 2·(−5e6)) div 5 = 10e6
    assert(pooled === ((5L, 10000000L)))
  }

  test("strat ate gated instance: strata bounded, pooled weight accounts") {
    val got = StratifiedAte.stratifiedAteEvents(spark, sfDir)
    val rows = got.select($"stratum", $"n_treat", $"n_ctrl", $"delta_micro",
      $"n_used").as[(Long, Long, Long, Option[Long], Long)].collect()
    assert(rows.nonEmpty && rows.forall(r => r._1 >= 0 && r._1 <= 3))
    val used = rows.filter(_._4.isDefined).map(r => r._2 + r._3).sum
    assert(rows.head._5 === used)
  }
}
