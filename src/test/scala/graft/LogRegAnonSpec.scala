package graft

import org.apache.spark.sql.functions._
import graft.ml.LogRegStep
import graft.operators.KAnonymity

class LogRegAnonSpec extends SparkSpec {
  import spark.implicits._

  test("logreg step: separable feature gets the full gradient pull") {
    // x1 perfectly separates the class, x2 is constant-ish noise
    val df = Seq((true, 10L, 1L), (true, 10L, 2L),
      (false, -10L, 1L), (false, -10L, 2L)).toDF("y", "x1", "x2")
    val r = LogRegStep.newtonStep(df, col("y"), col("x1"), col("x2"), 0L, 0L)
      .select($"n", $"n_pos", $"w1_micros").as[(Long, Long, Long)].head()
    assert(r._1 === 4L && r._2 === 2L)
    // exact: (XᵀX)⁻¹Xᵀz decouples to Σx₁z/Σx₁² = 40/400, then ×2 for
    // the Newton factor → 200000 micros
    assert(r._3 === 200000L)
  }

  test("logreg step: balanced label uncorrelated with features → w ≈ 0") {
    // every (x1,x2) combo carries one of each label → all z-sums are 0;
    // three non-affine feature points keep the Gram determinant > 0
    val df = Seq((true, 1L, 5L), (false, 1L, 5L), (true, 2L, 7L),
      (false, 2L, 7L), (true, 3L, 6L), (false, 3L, 6L)).toDF("y", "x1", "x2")
    val r = LogRegStep.newtonStep(df, col("y"), col("x1"), col("x2"), 0L, 0L)
      .select($"w0_micros", $"w1_micros", $"w2_micros")
      .as[(Long, Long, Long)].head()
    assert(r === ((0L, 0L, 0L)))
  }

  test("logreg gated instance: one row, margin composes from weights") {
    val r = LogRegStep.logregLineitem(spark, sfDir)
      .select($"w0_micros", $"w1_micros", $"w2_micros", $"margin_probe_micros")
      .as[(Long, Long, Long, Long)].collect()
    assert(r.length === 1)
    val (w0, w1, w2, m) = r.head
    assert(m === w0 + 30 * w1 + 5 * w2)
  }

  test("k-anon: small cell flagged, constant sensitive flagged") {
    val df = Seq(
      // cell (1, A): 5 members, diverse sensitive → clean
      (1L, "A", "x"), (1L, "A", "y"), (1L, "A", "x"), (1L, "A", "y"),
      (1L, "A", "x"),
      // cell (2, B): 2 members → k-violation
      (2L, "B", "x"), (2L, "B", "y"),
      // cell (3, C): 6 members all same sensitive → l-violation only
      (3L, "C", "x"), (3L, "C", "x"), (3L, "C", "x"), (3L, "C", "x"),
      (3L, "C", "x"), (3L, "C", "x")
    ).toDF("nat", "seg", "s")
    val got = KAnonymity.audit(df, Seq("nat", "seg"), col("s"), k = 5L, l = 2L)
    val byNat = got.select($"nat", $"violates_k", $"violates_l")
      .as[(Long, Boolean, Boolean)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(byNat(1L) === ((false, false)))
    assert(byNat(2L) === ((true, false)))
    assert(byNat(3L) === ((false, true)))
    val sum = got.select($"n_cells", $"n_k_violations", $"n_l_violations",
      $"pop_at_risk").as[(Long, Long, Long, Long)].head()
    assert(sum === ((3L, 1L, 1L, 8L))) // 2 + 6 members at risk
  }

  test("k-anon gated instance: summary consistent with cell flags") {
    val got = KAnonymity.kAnonymityCustomer(spark, sfDir)
    val rows = got.select($"n", $"violates_k", $"violates_l", $"n_cells",
      $"pop_at_risk").as[(Long, Boolean, Boolean, Long, Long)].collect()
    assert(rows.length === rows.head._4)
    val atRisk = rows.filter(r => r._2 || r._3).map(_._1).sum
    assert(atRisk === rows.head._5)
  }
}
