package graft

import org.apache.spark.sql.functions._

/** Linear SHAP on planted planes with hand-computable attributions. */
class LinearShapSpec extends SparkSpec {
  import spark.implicits._

  test("exact plane: coefficients, mean |SHAP| and probe phi are hand-exact") {
    // y = 3 + 2*x1 - x2 exactly on a 4-point grid; x̄1 = 2.5, x̄2 = 1.5
    val df = Seq(
      (1L, 1L), (4L, 1L), (1L, 2L), (4L, 2L)
    ).toDF("x1", "x2")
      .withColumn("y", lit(3L) + lit(2L) * col("x1") - col("x2"))
    val out = graft.ml.LinearShap.shapReport(df, col("y"), col("x1"), col("x2"),
      "x1", "x2", probeX1 = 4L, probeX2 = 1L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).sortBy(_._1)
    val x1row = out(0); val x2row = out(1)
    assert(x1row._2 === 2000000L, "b1 = 2")
    assert(x2row._2 === -1000000L, "b2 = -1")
    // mean|x1 - 2.5| = 1.5 -> |b1|*1.5 = 3.0; mean|x2 - 1.5| = 0.5 -> 0.5
    assert(x1row._3 === 3000000L)
    assert(x2row._3 === 500000L)
    // phi(probe) = b*(probe - mean): 2*(4-2.5)=3; -1*(1-1.5)=0.5
    assert(x1row._4 === 3000000L)
    assert(x2row._4 === 500000L)
    // x1 dominates the ranking
    assert(x1row._5 === 1 && x2row._5 === 2)
  }

  test("negative-coefficient floor division is sign-safe") {
    // y = -3*x1 + x2; probe below the x1 mean makes phi positive for a
    // negative coefficient — the floor/truncate divergence hot spot
    val df = Seq(
      (0L, 0L), (3L, 0L), (0L, 4L), (3L, 4L)
    ).toDF("x1", "x2")
      .withColumn("y", lit(-3L) * col("x1") + col("x2"))
    val out = graft.ml.LinearShap.shapReport(df, col("y"), col("x1"), col("x2"),
      "x1", "x2", probeX1 = 0L, probeX2 = 0L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
      .sortBy(_._1)
    assert(out(0)._2 === -3000000L)
    // phi_x1(0) = -3*(0 - 1.5) = 4.5
    assert(out(0)._3 === 4500000L)
    // phi_x2(0) = 1*(0 - 2) = -2
    assert(out(1)._3 === -2000000L)
  }

  test("collinear features yield NULL coefficients, ranking still total") {
    val df = Seq((1L, 2L, 5L), (2L, 4L, 7L), (3L, 6L, 9L))
      .toDF("x1", "x2", "y")
    val out = graft.ml.LinearShap.shapReport(df, col("y"), col("x1"), col("x2"),
      "x1", "x2", probeX1 = 1L, probeX2 = 1L).collect()
    assert(out.forall(_.isNullAt(1)))
    assert(out.map(_.getInt(4)).sorted.toSeq === Seq(1, 2))
  }

  test("gated instance runs and additivity ties out on sf0.001") {
    val out = graft.ml.LinearShap.shapLineitem(spark, sfDir)
    val rows = out.collect()
    assert(rows.length === 2)
    assert(rows.map(_.getInt(4)).sorted.toSeq === Seq(1, 2))
    // cross-check against the gated LinReg fit: same coefficients
    val fit = graft.ml.LinReg.linregLineitem(spark, sfDir).collect()(0)
    val byName = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName("quantity") === fit.getLong(2))
    assert(byName("discount_pct") === fit.getLong(3))
  }
}
