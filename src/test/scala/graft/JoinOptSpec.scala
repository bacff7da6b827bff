package graft

import org.apache.spark.sql.functions._
import graft.operators.{BloomPrune, RangeJoin}

/** Join-optimization operators: binned range join and bloom semi-join
  * pruning — both must be RESULT-identical to the naive formulation
  * (that identity is also their driver hash gate) and must produce
  * hash-join-shaped plans. */
class JoinOptSpec extends SparkSpec {
  import spark.implicits._

  test("range join equals the naive range-predicate join") {
    val got = RangeJoin.rangeJoinEvents(spark, sfDir)
      .select("event_id", "b_event_id")
    val ev = Tables.events(spark, sfDir)
    val naive = ev.as("a").join(ev.as("b"),
      $"a.user_id" === $"b.user_id" &&
        $"a.ts" >= $"b.ts" &&
        $"a.ts" < $"b.ts" + expr("INTERVAL 1 DAYS") &&
        $"a.event_id" =!= $"b.event_id")
      .select($"a.event_id", $"b.event_id".as("b_event_id"))
    assert(got.count() > 0, "join must be non-degenerate on the test data")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("range join plans as a hash/sort-merge join, not nested-loop") {
    val plan = RangeJoin.rangeJoinEvents(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"nested-loop fallback in:\n$plan")
  }

  test("interval membership at the bucket boundary is exact") {
    val ev = Seq((1L, 5L, "2024-03-01 00:00:00"), // == start: in
      (2L, 5L, "2024-03-07 23:59:59"),            // last covered second: in
      (3L, 5L, "2024-03-08 00:00:00"),            // == start+7d: out
      (4L, 5L, "2024-02-29 23:59:59"))            // before start: out
      .toDF("event_id", "user_id", "s")
      .withColumn("ts", to_timestamp($"s"))
    val ord = Seq((100L, 5L, "2024-03-01 00:00:00"))
      .toDF("o_orderkey", "o_custkey", "s")
      .withColumn("o_orderdate", to_timestamp($"s"))
    val got = RangeJoin.pointInInterval(ev, ord, "user_id", "o_custkey",
      "ts", "o_orderdate", days = 7)
      .select("event_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("salted join equals the plain join — every pair meets exactly once") {
    val li = Tables.lineitem(spark, sfDir)
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderpriority")
    val got = graft.operators.SkewJoin.saltedJoin(li, ord,
      "l_orderkey", "o_orderkey", hotKeys = (0L to 7L), r = 8,
      saltSource = "l_partkey")
      .select("l_orderkey", "l_linenumber", "o_orderpriority")
    val plain = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_orderpriority")
    assert(got.count() == plain.count()) // exactly-once, no dup pairs
    assert(got.exceptAll(plain).isEmpty && plain.exceptAll(got).isEmpty)
  }

  test("salted join spreads a hot key across salt partitions") {
    import spark.implicits._
    // one pathological key: 1000 left rows, 1 right row
    val left = (1L to 1000L).map(i => (42L, i)).toDF("k", "rid")
    val right = Seq((42L, "hot")).toDF("k2", "tag")
    val salted = graft.operators.SkewJoin.saltedJoin(left, right,
      "k", "k2", hotKeys = Seq(42L), r = 4, saltSource = "rid")
    assert(salted.count() == 1000L)
    // the salt column spreads the key over all 4 salts pre-join
    val salts = left.withColumn("s", pmod($"rid", lit(4)))
      .select("s").distinct().count()
    assert(salts == 4L)
  }

  test("k-per-group sample returns exactly min(k, group size) rows") {
    val docs = Tables.documents(spark, sfDir)
    val got = graft.operators.Sampling.sampleKPerGroup(docs, "source",
      "doc_id", 20)
    val sizes = got.groupBy("source").count()
    val truth = docs.groupBy("source").count()
      .withColumnRenamed("count", "n")
    val bad = sizes.join(truth, "source")
      .filter(col("count") =!= least(lit(20L), col("n"))).count()
    assert(bad == 0L)
    // deterministic: two runs agree
    val again = graft.operators.Sampling.sampleKPerGroup(docs, "source",
      "doc_id", 20)
    assert(got.exceptAll(again).isEmpty)
  }

  test("bloom semi join equals the exact semi join (no FNs, FPs removed)") {
    val fact = Tables.lineitem(spark, sfDir)
    val dim = Tables.orders(spark, sfDir)
      .filter($"o_orderpriority" === "1-URGENT")
    val got = BloomPrune.semiJoin(fact, dim, "l_orderkey", "o_orderkey",
      expectedItems = 10000L, fpp = 0.5) // high fpp: force real FP removal
      .select("l_orderkey", "l_linenumber")
    val exact = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"),
      "left_semi").select("l_orderkey", "l_linenumber")
    assert(got.count() > 0)
    assert(got.exceptAll(exact).isEmpty && exact.exceptAll(got).isEmpty)
  }
}
