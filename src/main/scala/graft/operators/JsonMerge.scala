package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Ordered JSON combination per sequence — the distributed form of
  * /root/reference/MachineLearning/Ray/recsys/generate_data.py:153-168
  * (`combine_jsons`: per (ResourceId, sequence_id) the time-ordered
  * concatenation of each row's JSON payload into one combined
  * document, merged back onto the main frame). Two combine semantics
  * ship together:
  *
  *  - `combined_json` — the reference's exact operation: payloads
  *    concatenated in (ts, id) order into one JSON array, byte-exact.
  *  - `merged_json`   — the dict-union generalization: per payload
  *    KEY the LAST value in time order wins, keys emitted sorted — the
  *    "current state" document a sequence of patches folds to.
  *
  * Both are grouped aggregates over the events fact: one shuffle on
  * the sequence key for the concat, one on (sequence, key) + one on
  * the sequence for last-wins. String assembly is deterministic
  * (sort_array on (ts, id) structs; sorted key order), so the whole
  * operator hash-gates against DuckDB's ORDER BY string_agg.
  *
  * Scale: payload strings travel the shuffle once; per-group state is
  * the group's own payload bytes (sequence-bounded, never
  * corpus-bounded). 100 TB: group by the natural sequence key and the
  * shuffle is the corpus size — the same cost as any groupBy; no
  * driver-side JSON parsing anywhere.
  */
object JsonMerge {

  /** Per (user_id, seq_day): event count, distinct payload-key count,
    * the ordered combined JSON array and the last-wins merged object.
    * Sequence = one user's one day of events (the gate's stand-in for
    * the reference's repair sequence_id). */
  def jsonMergeEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("user_id"), to_date(col("ts")).as("seq_day"),
      col("ts"), col("event_id"), col("event_type"), col("props"),
      get_json_object(col("props"), "$.k").cast("long").as("v"))
    val comb = ev.groupBy("user_id", "seq_day")
      .agg(count(lit(1)).as("n_events"),
        concat(lit("["),
          array_join(expr(
            "transform(sort_array(collect_list(struct(ts, event_id, props))), x -> x.props)"),
            ", "),
          lit("]")).as("combined_json"))
    val latest = ev.groupBy("user_id", "seq_day", "event_type")
      .agg(max(struct(col("ts"), col("event_id"), col("v")))
        .getField("v").as("v"))
    val merged = latest.groupBy("user_id", "seq_day")
      .agg(count(lit(1)).as("n_types"),
        concat(lit("{"),
          array_join(expr(
            """transform(sort_array(collect_list(struct(event_type, v))),
              |  x -> concat('"', x.event_type, '": ', x.v))""".stripMargin),
            ", "),
          lit("}")).as("merged_json"))
    comb.join(merged, Seq("user_id", "seq_day"))
      .select("user_id", "seq_day", "n_events", "n_types",
        "combined_json", "merged_json")
  }

  def oracleSql: String =
    """WITH ev AS (
      |  SELECT user_id, CAST(ts AS DATE) AS seq_day, ts, event_id,
      |    event_type, props, CAST(json_extract(props, '$.k') AS BIGINT) AS v
      |  FROM events),
      |comb AS (
      |  SELECT user_id, seq_day, count(*) AS n_events,
      |    '[' || string_agg(props, ', ' ORDER BY ts, event_id, props) || ']' AS combined_json
      |  FROM ev GROUP BY user_id, seq_day),
      |rk AS (
      |  SELECT *, ROW_NUMBER() OVER (
      |    PARTITION BY user_id, seq_day, event_type
      |    ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM ev),
      |mg AS (
      |  SELECT user_id, seq_day, count(*) AS n_types,
      |    '{' || string_agg('"' || event_type || '": ' || v, ', ' ORDER BY event_type) || '}' AS merged_json
      |  FROM rk WHERE rn = 1 GROUP BY user_id, seq_day)
      |SELECT c.user_id, c.seq_day, c.n_events, m.n_types,
      |  c.combined_json, m.merged_json
      |FROM comb c JOIN mg m USING (user_id, seq_day)""".stripMargin
}
