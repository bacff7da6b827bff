package graft

import org.apache.spark.sql.functions._
import graft.operators.OpsAudit

class OpsAuditSpec extends SparkSpec {
  import spark.implicits._

  test("backfill plan: exactly the planted weekly holes, coalesced") {
    val got = OpsAudit.backfillPlan(spark, sfDir)
      .select($"gap_start_off", $"gap_end_off", $"n_days")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.nonEmpty)
    // every gap is exactly one planted day ≡ 3 (mod 7): the event feed
    // covers every day, so gaps never merge
    got.foreach { g =>
      assert(g._1 === g._2 && g._3 === 1L)
      assert(g._1 % 7 === 3L)
    }
    // consecutive gaps are 7 days apart
    got.sliding(2).foreach {
      case Array(a, b) => assert(b._1 - a._1 === 7L)
      case _ =>
    }
  }

  test("fk orphans: clean relationship scores zero, planted one doesn't") {
    val got = OpsAudit.fkOrphans(spark, sfDir)
      .select($"fact", $"n_fact", $"n_orphans", $"orphan_permille")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // lineitem→part is referentially intact in the generator
    assert(got("lineitem")._3 === 0L && got("lineitem")._4 === 0L)
    // the withheld customer decade plants ~10% orphaned orders
    val o = got("orders")
    assert(o._3 > 0L)
    assert(o._4 >= 50L && o._4 <= 150L, s"orphan permille ${o._4}")
  }
}
