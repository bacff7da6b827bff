package graft

import graft.operators.CramerVonMises

/** Two-sample CvM: zero on identical samples, the closed-form value on
  * complete separation, monotone in shift, gated sanity. */
class CramerVonMisesSpec extends SparkSpec {
  import spark.implicits._

  private def cvm(rows: (Long, String)*) =
    CramerVonMises.tStats(rows.toDF("v", "g"), "v", "g", "p", "q")
      .collect().head

  test("identical samples: every ECDF gap is zero, T = 0") {
    val r = cvm((1L, "p"), (2L, "p"), (3L, "p"),
      (1L, "q"), (2L, "q"), (3L, "q"))
    assert(r.getAs[String]("s") === "0")
    assert(r.getAs[Long]("cvm_t_permicro") === 0L)
  }

  test("complete separation of n=m=2: T = 1/2 exactly") {
    // cells: v=1 a=2, v=2 b=2; gap 1.0 at v=1, 0 at v=2
    val r = cvm((1L, "p"), (1L, "p"), (2L, "q"), (2L, "q"))
    assert(r.getAs[Long]("n1") === 2L && r.getAs[Long]("n2") === 2L)
    assert(r.getAs[String]("s") === "2000000000000") // 2·(1e6)²
    assert(r.getAs[Long]("cvm_t_permicro") === 500000L)
    // null mean (1+1/N)/6 = 5/24
    assert(r.getAs[Long]("null_mean_permicro") === 208333L)
  }

  test("a location shift scores higher than a partial overlap") {
    val shifted = cvm((1L, "p"), (2L, "p"), (3L, "p"),
      (4L, "q"), (5L, "q"), (6L, "q"))
    val mixed = cvm((1L, "p"), (2L, "p"), (3L, "p"),
      (2L, "q"), (3L, "q"), (4L, "q"))
    assert(shifted.getAs[Long]("cvm_t_permicro") >
      mixed.getAs[Long]("cvm_t_permicro"))
    assert(mixed.getAs[Long]("cvm_t_permicro") >= 0L)
  }

  test("gated instance: R vs N quantity, T >= 0, counts positive") {
    val r = CramerVonMises.cvmLineitem(spark, sfDir).collect().head
    assert(r.getAs[Long]("n1") > 0L && r.getAs[Long]("n2") > 0L)
    assert(r.getAs[Long]("cvm_t_permicro") >= 0L)
    assert(r.getAs[Long]("null_mean_permicro") >= 166666L)
  }
}
