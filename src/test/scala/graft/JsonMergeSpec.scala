package graft

/** Ordered JSON combine + last-wins dict merge semantics. */
class JsonMergeSpec extends SparkSpec {

  test("gated instance: combined arrays are ordered, merged objects last-wins") {
    val out = graft.operators.JsonMerge.jsonMergeEvents(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nEvents = r.getLong(2); val nTypes = r.getLong(3)
      val combined = r.getString(4); val merged = r.getString(5)
      assert(nTypes <= nEvents && nTypes >= 1)
      assert(combined.startsWith("[") && combined.endsWith("]"))
      assert(merged.startsWith("{") && merged.endsWith("}"))
      // combined holds exactly n_events payload objects
      assert(combined.sliding(4).count(_ == "{\"k\"") === nEvents.toInt)
      // merged keys are sorted and unique
      val keys = "\"([a-z_]+)\":".r.findAllMatchIn(merged).map(_.group(1)).toSeq
      assert(keys.length === nTypes.toInt)
      assert(keys === keys.sorted && keys.distinct === keys)
    }
  }

  test("last-wins: the merged value is the latest event's payload value") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("seq_day"), col("ts"),
        col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("v"))
    // independent latest computation via window
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id", "seq_day", "event_type")
      .orderBy(col("ts").desc, col("event_id").desc)
    val want = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("seq_day"), col("event_type"), col("v"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toString,
        r.getString(2)) -> r.getLong(3)).toMap
    val got = graft.operators.JsonMerge.jsonMergeEvents(spark, sfDir)
      .collect().flatMap { r =>
        val uid = r.getLong(0); val day = r.getDate(1).toString
        "\"([a-z_]+)\": (-?\\d+)".r.findAllMatchIn(r.getString(5))
          .map(m => (uid, day, m.group(1)) -> m.group(2).toLong)
      }.toMap
    assert(got === want)
  }
}
