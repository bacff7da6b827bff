package graft

import org.apache.spark.sql.functions._
import graft.ml.Isotonic
import graft.operators.RocCurve

class IsoRocSpec extends SparkSpec {
  import spark.implicits._

  private def blocks(rates: Seq[(Long, Long)]) =
    rates.zipWithIndex.map { case ((n, pos), i) =>
      ("k", i + 1, i + 1, i + 1, n, pos)
    }.toDF("series", "idx", "lo", "hi", "n", "pos")

  test("pava step: maximal decreasing run pools to the weighted mean") {
    // rates 1, 3, 2, 0 (n=1 each): [1] stays, [3,2,0] pools
    val got = Isotonic.pavaStep(blocks(Seq((1L,1L),(1L,3L),(1L,2L),(1L,0L))), "series")
      .orderBy("idx").select($"idx", $"lo", $"hi", $"n", $"pos")
      .as[(Int, Int, Int, Long, Long)].collect().toSeq
    assert(got === Seq((1, 1, 1, 1L, 1L), (2, 2, 4, 3L, 5L)))
  }

  test("pava iterate: cascading violations converge to the isotonic fit") {
    // rates 2, 3, 1, 1 -> one step gives [2],[5/3] which still violates;
    // the fixed point pools everything to 7/4
    val got = Isotonic.iterate(blocks(Seq((1L,2L),(1L,3L),(1L,1L),(1L,1L))), "series")
      .select($"lo", $"hi", $"n", $"pos", $"rate_permicro")
      .as[(Int, Int, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1, 4, 4L, 7L, 1750000L)))
    // monotone input is a fixed point
    val mono = Isotonic.iterate(blocks(Seq((1L,0L),(1L,1L),(1L,2L))), "series")
    assert(mono.count() === 3L)
  }

  test("roc points: hand case with known TPR/FPR/precision") {
    // scores desc: 30(pos),20(neg),10(pos) -> P=2, N=1
    val df = Seq((30L, 1L), (20L, 0L), (10L, 1L)).toDF("s", "y")
    val got = RocCurve.rocPoints(df, "s", "y")
      .orderBy($"score".desc)
      .select($"score", $"tp", $"fp", $"tpr_permicro", $"fpr_permicro",
        $"precision_permicro")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (30L, 1L, 0L, 500000L, 0L, 1000000L),
      (20L, 1L, 1L, 500000L, 1000000L, 500000L),
      (10L, 2L, 1L, 1000000L, 1000000L, 666666L)))
  }

  test("roc points: all-negative labels yield NULL tpr, defined fpr") {
    val df = Seq((30L, 0L), (10L, 0L)).toDF("s", "y")
    val got = RocCurve.rocPoints(df, "s", "y")
      .select($"tpr_permicro", $"fpr_permicro")
      .as[(Option[Long], Option[Long])].collect().toSeq
    assert(got.forall(_._1.isEmpty))
    assert(got.forall(_._2.isDefined))
  }

  test("gated instances: isotonic step output is pooled; roc ends at (1,1)") {
    val iso = Isotonic.isotonicStepEvents(spark, sfDir)
    assert(iso.count() <= 20L && iso.count() >= 1L)
    val roc = RocCurve.rocEvents(spark, sfDir)
      .orderBy($"score".asc).limit(1)
      .select($"tpr_permicro", $"fpr_permicro").as[(Long, Long)].head()
    assert(roc === ((1000000L, 1000000L)))
  }
}
