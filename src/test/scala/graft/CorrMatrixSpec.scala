package graft

import org.apache.spark.sql.functions._
import graft.operators.CorrMatrix

/** The one-pass matrix must reproduce textbook correlations exactly at
  * micro precision and emit exactly p(p−1)/2 pairs. */
class CorrMatrixSpec extends SparkSpec {
  import spark.implicits._

  test("perfect linear, anti-linear, and constant relationships") {
    // y = 2x (corr +1), z = −x (corr −1), w constant (undefined → NULL)
    val df = (1 to 10).map(i =>
      (i.toDouble, 2.0 * i, -i.toDouble, 7.0)).toDF("x", "y", "z", "w")
    val out = CorrMatrix.corrMatrix(df, Seq("x", "y", "z", "w"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out.size == 6, "4 columns ⇒ 6 pairs")
    assert(out(("x", "y")) == Some(1000000L))
    assert(out(("x", "z")) == Some(-1000000L))
    assert(out(("y", "z")) == Some(-1000000L))
    assert(out(("x", "w")) == None, "zero variance ⇒ NULL")
    assert(out(("y", "w")) == None && out(("z", "w")) == None)
  }

  test("a hand-computed non-trivial correlation") {
    // x = 1..4, y = (1, 2, 4, 3): n=4 Σx=Σy=10 Σxx=Σyy=30 Σxy=29
    // → r = (116−100)/(√20·√20) = 0.8 exactly
    val df = Seq((1.0, 1.0), (2.0, 2.0), (3.0, 4.0), (4.0, 3.0))
      .toDF("x", "y")
    val r = CorrMatrix.corrMatrix(df, Seq("x", "y")).collect().head
    assert(r.getLong(3) == 800000L, s"r must be exactly 0.8: $r")
  }

  test("gated instance: 6 pairs, |r| ≤ 1, n = corpus") {
    val out = CorrMatrix.corrMatrixLineitem(spark, sfDir).localCheckpoint()
    assert(out.count() == 6)
    val n = Tables.lineitem(spark, sfDir).count()
    assert(out.filter(col("n") =!= n).count() == 0)
    assert(out.filter(abs(col("corr_micros")) > 1000000L).count() == 0)
    // this generator draws price independently of quantity — the matrix
    // must read that as near-zero, not as spurious structure
    val qp = out.filter(col("col_x") === "l_quantity" &&
      col("col_y") === "l_extendedprice").collect().head
    assert(math.abs(qp.getLong(3)) < 100000L,
      s"independent draws must decorrelate: $qp")
  }
}
