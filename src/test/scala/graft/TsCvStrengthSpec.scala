package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{SeasonalDecompose, TsCvSplits}

class TsCvStrengthSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("ts cv: folds expand, never overlap, and tile the span") {
    // 50 days of observations, one per day
    val obs = (0 until 50).map { i =>
      Tuple1(new Timestamp(ts("2024-01-01 12:00:00").getTime + i * 86400000L))
    }.toDF("t")
    val got = TsCvSplits.splits(obs, "t", k = 4)
      .orderBy($"fold")
      .select($"fold", $"train_end_off", $"test_end_off", $"n_train", $"n_test")
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(got.length === 4)
    // span 49 days → slice 9: boundaries 9/18, 18/27, 27/36, 36/45
    assert(got.map(r => (r._2, r._3)).toSeq ===
      Seq((9L, 18L), (18L, 27L), (27L, 36L), (36L, 45L)))
    // expanding train, fixed-width test, train(f+1) = train(f) + test(f)
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 === a._4 + a._5)
    case _ => }
    assert(got.map(_._4).toSeq === got.map(_._4).toSeq.sorted)
  }

  test("ts cv gated instance: k folds, counts consistent") {
    val got = TsCvSplits.tsCvEvents(spark, sfDir)
      .orderBy($"fold").select($"n_train", $"n_test")
      .as[(Long, Long)].collect()
    assert(got.length === 4)
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._1 === a._1 + a._2)
    case _ => }
    assert(got.forall(r => r._1 > 0 && r._2 > 0))
  }

  test("seasonal strength: planted pure weekly pattern scores near 1e6") {
    // 35 days of an exact 7-periodic series: residual ≈ 0 everywhere
    val cells = (1 to 35).map(i => ("g", i, 1000L + ((i - 1) % 7) * 500L))
      .toDF("g", "idx", "x")
    // strength via the same formula the operator uses, on this frame
    val q = SeasonalDecompose.decompose(cells, "g", "idx", "x")
      .filter($"detr7".isNotNull && $"seas_cnt" > 0)
      .select(expr("""(CASE WHEN detr7 < 0 THEN -1L ELSE 1L END)
          * ((1000000 * abs(detr7)) div 7)""").as("dp"),
        $"residual_permicro".as("rp"))
    val (ssd, ssr) = q
      .select($"dp".cast("decimal(38,0)").as("dp"),
        $"rp".cast("decimal(38,0)").as("rp"))
      .agg(
        (count(lit(1)) * sum($"dp" * $"dp") - sum($"dp") * sum($"dp"))
          .cast("decimal(38,0)").as("a"),
        (count(lit(1)) * sum($"rp" * $"rp") - sum($"rp") * sum($"rp"))
          .cast("decimal(38,0)").as("b"))
      .selectExpr("CAST(a AS DOUBLE)", "CAST(b AS DOUBLE)")
      .as[(Double, Double)].head()
    assert(ssd > 0)
    // pure seasonality: residual SS is tiny vs detrended SS
    assert(ssr * 20 < ssd, s"ssr $ssr vs ssd $ssd")
  }

  test("seasonal strength gated instance: one row per event type, bounded") {
    val got = SeasonalDecompose.seasonalStrength(spark, sfDir)
      .select($"event_type", $"strength_permicro").as[(String, Long)].collect()
    assert(got.length === 5)
    assert(got.forall(_._2 <= 1000000L))
  }
}
