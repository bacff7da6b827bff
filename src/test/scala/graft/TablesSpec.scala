package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Regression spec for the schema-adaptive events loader (the round-12
  * outage: the driver regenerated events.ts from TIMESTAMP(NANOS) —
  * surfaced as BIGINT nanos under `nanosAsLong` — to timestamp[us],
  * and a hard-coded nanos conversion broke every events consumer).
  * `Tables.events` must surface IDENTICAL timestamps from every
  * physical era the test data has shipped under. */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  test("events loader surfaces identical timestamps from all three ts eras") {
    val root = Files.createTempDirectory("graft_tables").toString
    val times = Seq(
      Timestamp.valueOf("2024-01-01 10:00:00"),
      Timestamp.valueOf("2024-06-15 23:59:59"))
    val base = times.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, i.toLong * 10, "click", 1.0, "{}")
    }

    // era 1: BIGINT nanos (how TIMESTAMP(NANOS) parquet surfaces under
    // spark.sql.legacy.parquet.nanosAsLong)
    base.map { case (id, t, u, e, v, p) => (id, t.getTime * 1000000L, u, e, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$root/nanos/events.parquet")
    // era 2: TIMESTAMP_NTZ (timestamp[us] without UTC adjustment)
    base.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.parquet(s"$root/ntz/events.parquet")
    // era 3: plain TIMESTAMP
    base.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$root/tsz/events.parquet")

    def loaded(dir: String): Map[Long, Timestamp] =
      Tables.events(spark, dir).select("event_id", "ts")
        .as[(Long, Timestamp)].collect().toMap

    val nanos = loaded(s"$root/nanos")
    val ntz = loaded(s"$root/ntz")
    val tsz = loaded(s"$root/tsz")
    val expected = base.map(r => r._1 -> r._2).toMap
    assert(tsz == expected, s"plain-timestamp era mangled: $tsz")
    assert(ntz == expected, s"NTZ era mangled: $ntz")
    assert(nanos == expected, s"nanos era mangled: $nanos")
    // and the surfaced type is always a plain timestamp
    for (d <- Seq("nanos", "ntz", "tsz"))
      assert(Tables.events(spark, s"$root/$d").schema("ts").dataType.typeName
        == "timestamp", s"era $d surfaced wrong type")
  }
}
