package graft

import graft.operators.Jonckheere

/** Jonckheere-Terpstra: perfect increasing/decreasing trends hit ±1e6,
  * exchangeable groups score 0, and the gated join is well-formed. */
class JonckheereSpec extends SparkSpec {
  import spark.implicits._

  private def jt(rows: (Long, Long)*) =
    Jonckheere.jtStats(rows.toDF("g", "v"), "g", "v").collect().head

  test("perfectly increasing groups: 2J = 2P, trend = +1e6") {
    val r = jt((1L, 1L), (1L, 1L), (2L, 2L), (2L, 2L), (3L, 3L), (3L, 3L))
    assert(r.getAs[String]("j2") === "24")
    assert(r.getAs[String]("e_j2") === "12") // P = 4+4+4
    assert(r.getAs[Long]("trend_permicro") === 1000000L)
  }

  test("perfectly decreasing groups: 2J = 0, trend = -1e6") {
    val r = jt((1L, 3L), (2L, 2L), (3L, 1L))
    assert(r.getAs[String]("j2") === "0")
    assert(r.getAs[Long]("trend_permicro") === -1000000L)
  }

  test("identically distributed groups: 2J = P, trend = 0") {
    val r = jt((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L))
    assert(r.getAs[String]("j2") === "4")
    assert(r.getAs[String]("e_j2") === "4")
    assert(r.getAs[Long]("trend_permicro") === 0L)
  }

  test("single group: no ordered pairs, trend undefined") {
    val r = jt((1L, 1L), (1L, 2L))
    assert(r.getAs[String]("e_j2") === "0")
    assert(r.isNullAt(r.fieldIndex("trend_permicro")))
  }

  test("gated instance: 5 priority groups, trend within bounds") {
    val r = Jonckheere.jtPriorityQuantity(spark, sfDir).collect().head
    assert(r.getAs[Long]("k_groups") === 5L)
    assert(r.getAs[Long]("n") === Tables.lineitem(spark, sfDir).count())
    val t = r.getAs[Long]("trend_permicro")
    assert(t >= -1000000L && t <= 1000000L)
  }
}
