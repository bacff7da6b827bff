package graft

import org.apache.spark.sql.functions._
import graft.operators.{FeaturePipeline, SeqAugment}

/** Sequence augmentation + train-fit feature pipeline (repair-RL prep
  * analogues): inversions, window slices, chain combine, expanding
  * leave-one-out mean, expanding mode, ordinal encoding, median
  * imputation, group split. */
class SeqFeatureSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, Long, String, Double)*) =
    rows.toDF("event_id", "user_id", "us", "event_type", "value")
      .withColumn("ts", timestamp_micros($"us" * 1000000L))

  test("invert re-ranks eligible groups in reverse, drops short/zero groups") {
    val df = ev((1L, 1L, 10L, "a", 1.0), (2L, 1L, 20L, "b", 2.0),
      (3L, 1L, 30L, "c", 3.0),
      (4L, 2L, 10L, "x", 5.0), // size-1 group: dropped
      (5L, 3L, 10L, "y", 0.0), (6L, 3L, 20L, "z", 0.0)) // zero-sum: dropped
    val got = SeqAugment.invert(df, "user_id", Seq("ts", "event_id"), "value")
      .select("event_id", "seq_pos").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 3, 2L -> 2, 3L -> 1))
  }

  test("window slices cover every contiguous w-window, groups > w only") {
    val df = ev((1L, 1L, 10L, "a", 1.0), (2L, 1L, 20L, "b", 1.0),
      (3L, 1L, 30L, "c", 1.0), (4L, 1L, 40L, "d", 1.0),
      (5L, 2L, 10L, "x", 1.0), (6L, 2L, 20L, "y", 1.0),
      (7L, 2L, 30L, "z", 1.0)) // size == w: excluded (strictly greater)
    val got = SeqAugment.windowSlices(df, "user_id", Seq("ts", "event_id"), 3)
      .select("event_id", "slice_id", "slice_pos")
      .as[(Long, Long, Int)].collect().toSet
    // user 1 (n=4, w=3): slices 1=[1,2,3], 2=[2,3,4]; user 2 dropped
    assert(got == Set((1L, 1L, 1), (2L, 1L, 2), (3L, 1L, 3),
      (2L, 2L, 1), (3L, 2L, 2), (4L, 2L, 3)))
  }

  test("chains split on >24h backward gaps and combine members in order") {
    val H = 3600L
    val df = ev((1L, 1L, 0L, "a", 1.0), (2L, 1L, 10L * H, "b", 2.0),
      (3L, 1L, 40L * H, "c", 4.0), // 30h after prev -> new chain
      (4L, 1L, 50L * H, "d", 8.0))
    val got = SeqAugment.chains(df, "user_id", "ts", Seq("ts", "event_id"),
      "event_type", "value", gapHours = 24)
      .select("chain_id", "chain_len", "chain_cents", "last_event_id",
        "chain_types")
      .as[(Long, Int, Long, Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 2, 300L, 2L, "a|b"),
      (2L, 2, 1200L, 4L, "c|d")))
    // an isolated row (no neighbour within the gap) forms its own chain
    val flagged = ev((1L, 9L, 0L, "a", 1.0), (2L, 9L, 10L * H, "b", 1.0),
      (3L, 9L, 100L * H, "c", 1.0))
    val lens = SeqAugment.chains(flagged, "user_id", "ts",
      Seq("ts", "event_id"), "event_type", "value", 24)
      .select("chain_id", "chain_len").as[(Long, Int)].collect().toMap
    assert(lens == Map(1L -> 2, 2L -> 1))
  }

  test("expanding LOO mean excludes the current row; first row is null") {
    val df = ev((1L, 1L, 10L, "a", 1.0), (2L, 1L, 20L, "b", 2.0),
      (3L, 1L, 30L, "c", 6.0))
    val got = FeaturePipeline.expandingLooMean(df, "user_id",
      Seq("ts", "event_id"), "value")
      .select("event_id", "loo_cnt", "loo_mean")
      .collect().map(r => (r.getLong(0),
        (r.getInt(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
      .toMap
    assert(got == Map(1L -> ((0, None)), 2L -> ((1, Some(100.0))),
      3L -> ((2, Some(150.0)))))
  }

  test("expanding mode tracks most frequent previous value, last-wins ties") {
    val df = ev((1L, 1L, 10L, "a", 1.0), (2L, 1L, 20L, "b", 1.0),
      (3L, 1L, 30L, "b", 1.0), (4L, 1L, 40L, "a", 1.0),
      (5L, 1L, 50L, "a", 1.0))
    val got = FeaturePipeline.expandingMode(df, "user_id",
      Seq("ts", "event_id"), "event_type")
      .select("event_id", "prev_mode")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    // row2: {a:1} -> a; row3: tie a/b, b seen later -> b; row4: b leads 2-1;
    // row5: tie 2-2, a reached 2 most recently -> a
    assert(got == Map(1L -> null, 2L -> "a", 3L -> "b", 4L -> "b", 5L -> "a"))
  }

  test("ordinal encode: sorted codes fit on train, unseen maps to K+1") {
    val full = Seq((1L, "beta"), (2L, "alpha"), (3L, "gamma"),
      (4L, null.asInstanceOf[String])).toDF("id", "cat")
    val train = full.filter($"id" <= 2) // categories: alpha, beta
    val got = FeaturePipeline.ordinalEncode(full, train, "cat", "code")
      .select("id", "code").as[(Long, Long)].collect().toMap
    // sorted train cats: alpha=1, beta=2; K=2 so gamma and NAN_NULL -> 3
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
    // null handled as its own category when present in train
    val train2 = full // NAN_NULL, alpha, beta, gamma -> 4 cats sorted
    val got2 = FeaturePipeline.ordinalEncode(full, train2, "cat", "code")
      .select("id", "code").as[(Long, Long)].collect().toMap
    assert(got2 == Map(2L -> 2L, 1L -> 3L, 3L -> 4L, 4L -> 1L))
  }

  test("median impute fills masked rows with the train median of the rest") {
    val df = ev((1L, 1L, 10L, "a", 1.0), (2L, 1L, 20L, "a", 2.0),
      (3L, 1L, 30L, "a", 3.0), (7L, 1L, 40L, "a", 99.0),
      (14L, 1L, 50L, "a", 98.0))
    val got = FeaturePipeline.imputeMedian(df,
      trainPred = lit(true), missing = col("event_id") % 7 === 0,
      valueCol = "value", outCol = "out")
      .select("event_id", "out").as[(Long, Double)].collect().toMap
    // non-missing train: 100, 200, 300 cents -> median 200
    assert(got == Map(1L -> 100.0, 2L -> 200.0, 3L -> 300.0,
      7L -> 200.0, 14L -> 200.0))
  }

  test("group split never straddles a group across splits") {
    val df = Tables.events(spark, sfDir)
    val per = FeaturePipeline.groupSplit(df, "user_id",
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
      .groupBy("user_id").agg(count_distinct(col("split")).as("n"))
      .agg(max("n")).head().getLong(0)
    assert(per == 1L)
  }

  test("group entropy: uniform 2-way split is ln 2; singleton is 0") {
    val df = ev((1L, 1L, 10L, "a", 1.0), (2L, 1L, 20L, "b", 1.0),
      (3L, 2L, 10L, "x", 1.0))
    val got = FeaturePipeline.groupEntropy(df, "user_id", "event_type")
      .as[(Long, Double)].collect().toMap
    assert(math.abs(got(1L) - math.log(2)) < 1e-6 && got(2L) == 0.0)
  }
}
