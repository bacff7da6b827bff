package graft

import graft.operators.{Scd2, SaltedCumSum, Sessionize}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class EventOpsSpec extends SparkSpec {

  test("scd2: exactly one open version per key, chains don't overlap") {
    val df = Scd2.eventsScd2(spark, sfDir).cache()
    val open = df.filter(col("expiration_date") === 20991231)
      .groupBy("user_id").count().collect()
    // ties on max ts are near-impossible at μs precision; expect exactly 1
    assert(open.forall(_.getLong(1) == 1L))
    // every non-current version expires strictly before the next effective date
    assert(df.filter(col("current_version") === 0 &&
      col("expiration_date") < col("effective_date")).count() == 0)
    df.unpersist()
  }

  test("as-of lookup resolves every event to exactly one dim version") {
    val facts = Tables.events(spark, sfDir).count()
    val looked = Scd2.eventsAsOfLookup(spark, sfDir).cache()
    assert(looked.count() == facts, "as-of join must be 1:1 with facts")
    // the matched version's validity window contains the event date
    assert(looked.filter(col("event_date") < col("effective_date") ||
      col("event_date") > col("expiration_date")).count() == 0)
    looked.unpersist()
  }

  test("salted cumsum equals naive window cumsum") {
    val salted = SaltedCumSum.eventsCumSum(spark, sfDir)
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val naive = Tables.events(spark, sfDir)
      .withColumn("running_value", round(sum("value").over(w), 2))
      .select("event_id", "user_id", "running_value")
    assert(salted.except(naive).count() == 0 && naive.except(salted).count() == 0)
  }

  test("sessions: no within-session gap exceeds 30min; session values add up") {
    val sess = Sessionize.eventsSessions(spark, sfDir).cache()
    assert(sess.count() > 0)
    // session count per user is monotone from 1
    val bad = sess.groupBy("user_id")
      .agg(min("session_seq").as("mn"), max("session_seq").as("mx"), count(lit(1)).as("n"))
      .filter(col("mn") =!= 1 || col("mx") =!= col("n"))
    assert(bad.count() == 0)
    // total events across sessions == total events
    val total = sess.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == Tables.events(spark, sfDir).count())
    sess.unpersist()
  }

  test("hourly agg covers all events") {
    val agg = Sessionize.hourlyAgg(spark, sfDir)
    val total = agg.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == Tables.events(spark, sfDir).count())
  }

  test("connected components: chains collapse, isolated node stands alone") {
    import spark.implicits._
    // component {1,2,3,4} via chain, {10,11} via one edge, {99} isolated
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("s", "d")
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 99L).toDF("n")
    val got = graft.operators.Graph.connectedComponents(nodes, "n", edges, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("connected components: long path converges within log-bounded rounds") {
    import spark.implicits._
    // a 64-node path graph: diameter 63, pointer jumping must close it
    // well inside the default 12-round bound (plain propagation needs 63)
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("s", "d")
    val nodes = (0L to 63L).toDF("n")
    val got = graft.operators.Graph.connectedComponents(nodes, "n", edges, "s", "d")
      .select("component").distinct().collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L))
  }
}
