package graft

import org.apache.spark.sql.functions._

/** t-closeness EMD audit on planted distributions. */
class TClosenessSpec extends SparkSpec {
  import spark.implicits._

  test("hand EMD: concentrated cell vs uniform global") {
    // global: 3 cells x 3 rows, ranks spread so global = (3,3,3)/9
    // cell 'a' = all rank 1 -> cum diffs: |3*9-3*3|=18, |3*9-6*3|=9
    // EMD = (18+9)/(3*9*2) = 27/54 = 0.5 -> 500000 micros
    val df = Seq(
      ("a", 1), ("a", 1), ("a", 1),
      ("b", 2), ("b", 2), ("b", 2),
      ("c", 3), ("c", 3), ("c", 3)
    ).toDF("cell", "rk")
    val out = graft.operators.TCloseness.audit(df, Seq("cell"), col("rk"),
      m = 3, tMicros = 400000L).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getBoolean(3))).sortBy(_._1)
    assert(out(0) === ("a", 500000L, true))
    // cell 'b' = all rank 2: cum diffs |0*9-3*3|=9, |3*9-6*3|=9 -> 18/54
    assert(out(1) === ("b", 333333L, false))
    // cell 'c' = all rank 3: |0-9|=9, |0-18|=18 -> 27/54 = 0.5
    assert(out(2) === ("c", 500000L, true))
  }

  test("cell matching the global distribution has EMD zero") {
    val df = Seq(
      ("a", 1), ("a", 2), ("a", 3),
      ("b", 1), ("b", 2), ("b", 3)
    ).toDF("cell", "rk")
    val out = graft.operators.TCloseness.audit(df, Seq("cell"), col("rk"),
      m = 3, tMicros = 1L).collect()
    assert(out.forall(r => r.getLong(2) === 0L && !r.getBoolean(3)))
    assert(out.forall(r => r.getLong(5) === 0L && r.getLong(6) === 0L),
      "no violations, pop_at_risk 0")
  }

  test("summary accounting: violations and population at risk") {
    val df = Seq.fill(10)(("big", 1)) ++ Seq(("odd", 2), ("odd", 2))
    val out = graft.operators.TCloseness.audit(df.toDF("cell", "rk"),
      Seq("cell"), col("rk"), m = 2, tMicros = 100000L).collect()
    val byCell = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getBoolean(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // global = (10, 2)/12; cell big: |10*12-10*10|/(10*12) = 20/120
    assert(byCell("big")._2 === true)
    // cell odd: |0*12-10*2|/(2*12) = 20/24 -> violates
    assert(byCell("odd")._2 === true)
    assert(out.forall(r => r.getLong(4) === 2L && r.getLong(5) === 2L &&
      r.getLong(6) === 12L), "2 cells, 2 violations, all 12 rows at risk")
  }

  test("gated instance runs with full summary consistency") {
    val out = graft.operators.TCloseness.tClosenessCustomer(spark, sfDir).collect()
    assert(out.nonEmpty)
    val nCells = out.head.getLong(5)
    assert(out.length.toLong === nCells)
    val nViol = out.count(_.getBoolean(4)).toLong
    assert(out.head.getLong(6) === nViol)
  }
}
