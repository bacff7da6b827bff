package graft

import org.apache.spark.sql.functions._
import graft.operators.{BucketedJoin, DataQuality, Funnel}

/** Bucketed co-located join (plan shape), funnel ordering semantics, and
  * the data-quality report's pass/fail paths. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join plans with zero Exchange on either side") {
    val l = (1L to 1000L).map(i => (i, s"o$i")).toDF("k", "otag")
    val r = (1L to 3000L).map(i => (i % 1000 + 1, s"l$i")).toDF("k", "ltag")
    BucketedJoin.writeBucketed(l, "graft_spec_l", "k", 4)
    BucketedJoin.writeBucketed(r, "graft_spec_r", "k", 4)
    // forbid broadcast so the no-shuffle claim is about BUCKETING, not size
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = BucketedJoin.joinBucketed(spark, "graft_spec_l", "graft_spec_r", "k")
      assert(j.count() == 3000L)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // sanity: same join WITHOUT bucketing does shuffle
      val plain = l.join(r, "k")
      plain.count()
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("funnel: strict ordering, partial stages, and no-entry users") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // user 1 completes in order
      (1L, t("2024-01-01 10:00:00"), "view"),
      (1L, t("2024-01-01 10:01:00"), "click"),
      (1L, t("2024-01-01 10:02:00"), "purchase"),
      // user 2: purchase BEFORE click -> stops at click (stage 2)
      (2L, t("2024-01-01 10:00:00"), "view"),
      (2L, t("2024-01-01 10:00:30"), "purchase"),
      (2L, t("2024-01-01 10:01:00"), "click"),
      // user 3: click only, never viewed -> stage 0
      (3L, t("2024-01-01 10:00:00"), "click"),
      // user 4: view only -> stage 1
      (4L, t("2024-01-01 10:00:00"), "view")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .select($"user_id", $"stage").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 3, 2L -> 2, 3L -> 0, 4L -> 1))
  }

  test("dq report: single-pass rules pass/fail correctly; fk orphans counted") {
    val df = Seq((1L, Some("a")), (2L, Some("b")), (2L, None))
      .toDF("id", "tag")
    val rep = DataQuality.report(df, Seq(
        DataQuality.rowCountAtLeast(3),
        DataQuality.unique("id"),              // fails: id=2 twice
        DataQuality.nullFractionAtMost("tag", 0.5),
        DataQuality.valuesIn("tag", Seq("a", "b"))))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(rep("row_count") == ((3.0, true)))
    assert(!rep("unique_id")._2 && rep("unique_id")._1 < 1.0)
    assert(rep("null_fraction_tag")._2)
    assert(rep("values_in_tag") == ((0.0, true)))

    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(1L, 2L, 9L, 9L).toDF("fk")
    val fk = DataQuality.fkOrphans("fk", child, "fk", parent, "pk").collect()(0)
    assert(fk.getDouble(1) == 2.0 && !fk.getBoolean(2))
  }
}
