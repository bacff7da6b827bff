package graft

import org.apache.spark.sql.functions._
import graft.operators.{KAnonymity, MondrianAnon}

/** The Mondrian repair must: cut only when both sides keep ≥ k, release
  * cells that ALL pass the k-audit, use the exact lower median as the
  * cut point, and leave an uncuttable partition whole. */
class MondrianAnonSpec extends SparkSpec {
  import spark.implicits._

  test("median cut splits a 40-row uniform frame into k-satisfying cells") {
    // 40 rows, values 1..40 on one dim, constant second dim
    val df = (1L to 40L).map(v => (v, 0L)).toDF("x", "y")
    val cells = MondrianAnon.generalize(df, Seq("x", "y"), k = 5L, depth = 3)
      .collect()
    // depth 3 with dims (x, y, x): y never splits (constant ⇒ right side
    // empty), x splits twice ⇒ 4 leaf cells of 10
    assert(cells.length == 4, s"expected 4 cells: ${cells.mkString(";")}")
    cells.foreach { c =>
      assert(c.getAs[Long]("n") == 10L)
      assert(c.getAs[Boolean]("satisfies_k"))
    }
    // the released ranges tile 1..40 without overlap
    val ranges = cells.map(c =>
      (c.getAs[Long]("x_lo"), c.getAs[Long]("x_hi"))).sorted
    assert(ranges === Array((1L, 10L), (11L, 20L), (21L, 30L), (31L, 40L)))
  }

  test("a cut that would strand fewer than k rows is refused") {
    // 7 rows: any split leaves a side < 5 ⇒ single whole cell
    val df = (1L to 7L).map(v => (v, v)).toDF("x", "y")
    val cells = MondrianAnon.generalize(df, Seq("x", "y"), k = 5L, depth = 4)
      .collect()
    assert(cells.length == 1)
    assert(cells.head.getAs[Long]("n") == 7L)
    assert(cells.head.getAs[Long]("x_lo") == 1L &&
      cells.head.getAs[Long]("x_hi") == 7L)
  }

  test("lower-median cut point is tie-safe") {
    // 10 rows all equal on x: median = the value, everything goes left,
    // right side empty ⇒ no cut ever; then y (1..10) splits 5/5
    val df = (1L to 10L).map(v => (42L, v)).toDF("x", "y")
    val cells = MondrianAnon.generalize(df, Seq("x", "y"), k = 5L, depth = 2)
      .collect()
    assert(cells.length == 2)
    assert(cells.map(_.getAs[Long]("n")).toSeq == Seq(5L, 5L))
    assert(cells.forall(c => c.getAs[Long]("x_lo") == 42L &&
      c.getAs[Long]("x_hi") == 42L))
  }

  test("repaired export passes the k-audit it failed raw") {
    // 60 customers-like rows with a sparse QI tail: raw (x, y) cells
    // violate k; the Mondrian cells must not
    val df = (1L to 60L).map(v => (v, v % 7)).toDF("x", "y")
    val k = 5L
    val raw = KAnonymity.audit(df, Seq("x", "y"), col("y"), k, 1L)
    assert(raw.filter(col("violates_k")).count() > 0,
      "the raw export must actually fail the audit for the test to bite")
    // repair: assign partitions, release pid as the generalized QI
    val repaired = MondrianAnon.assignPartitions(df, Seq("x", "y"), k,
      depth = 4)
    val audit = KAnonymity.audit(repaired, Seq("__pid"), col("y"), k, 1L)
    assert(audit.filter(col("violates_k")).count() == 0,
      "every released Mondrian cell must satisfy k")
  }

  test("gated instance: every released cell satisfies k and tiles the data") {
    val out = MondrianAnon.mondrianCustomer(spark, sfDir).localCheckpoint()
    val cells = out.collect()
    assert(cells.nonEmpty && cells.length <= 16)
    assert(cells.forall(_.getAs[Boolean]("satisfies_k")))
    // total membership = corpus size (a partition, not a sample)
    val total = cells.map(_.getAs[Long]("n")).sum
    assert(total == Tables.customer(spark, sfDir).count())
  }
}
