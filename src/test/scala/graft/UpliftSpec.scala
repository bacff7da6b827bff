package graft

import org.apache.spark.sql.functions._
import graft.operators.Uplift

/** Planted checks for the Qini/uplift table: decile cell assignment,
  * cumulative identity, the zero-uplift null frame, and a constructed
  * responder pattern with hand-checkable counts. */
class UpliftSpec extends SparkSpec {
  import spark.implicits._

  test("deciles partition by score cells, decile 1 = highest scores") {
    // 100 units, distinct scores 1..100 → decile d holds scores
    // (100−10d, 100−10(d−1)]
    val units = (1L to 100L).map(u => (u, u, false)).toDF("u", "s", "hit")
    val out = Uplift.qiniDeciles(units, "u", "s", "hit")
    val sizes = out.select("decile", "n_t", "n_c")
      .collect().map(r => (r.getLong(0), r.getLong(1) + r.getLong(2)))
    assert(sizes.length === 10)
    assert(sizes.forall(_._2 === 10L))
  }

  test("tied scores share a decile (cell indivisibility)") {
    val units = (1L to 40L).map(u => (u, 7L, false)) // one score cell
      .toDF("u", "s", "hit")
    val out = Uplift.qiniDeciles(units, "u", "s", "hit").collect()
    assert(out.length === 1 && out.head.getLong(0) === 1L)
  }

  test("all-hit frame: uplift 0, qini_cum 0 in every decile") {
    val units = (1L to 200L).map(u => (u, u % 20, true)).toDF("u", "s", "hit")
    val out = Uplift.qiniDeciles(units, "u", "s", "hit")
    // r_t = n_t and r_c = n_c per decile → uplift exactly 0; cumulative
    // r_tc − r_cc·n_tc/n_cc = n_tc − (n_cc·n_tc) div n_cc = 0
    assert(out.filter(col("uplift_permicro") =!= 0L).count() === 0)
    assert(out.filter(col("qini_cum") =!= 0L).count() === 0)
  }

  test("responders only in the treated arm produce positive qini") {
    // hit iff treated (perfect uplift): qini_cum at the last decile
    // must equal total treated responders
    val base = (1L to 500L).map(u => (u, u % 50)).toDF("u", "s")
    val armed = base.withColumn("hit",
      graft.functions.Native.call("graft_mix_mod61",
        e => graft.functions.MixMod61(e.head), col("u")) % 2 === 0)
    val out = Uplift.qiniDeciles(armed, "u", "s", "hit")
      .orderBy(desc("decile")).collect()
    val last = out.head
    val totalRt = out.map(_.getAs[Long]("r_t")).sum
    assert(totalRt > 0)
    assert(last.getAs[Long]("qini_cum") === totalRt)
    assert(out.forall(r => r.getAs[Long]("r_c") === 0L))
  }

  test("gated instance: 10 deciles, cumulative counts monotone at sf0.001") {
    val rows = Uplift.qiniOrders(spark, sfDir)
      .orderBy("decile").collect()
    assert(rows.length === 10)
    assert(rows.map(_.getAs[Long]("n_t")).forall(_ > 0))
  }
}
