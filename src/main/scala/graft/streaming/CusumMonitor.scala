package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming two-sided CUSUM control chart — the ONLINE twin of the
  * batch [[graft.operators.Changepoint]] locator, and the stateful
  * counterpart of the stateless per-batch [[DriftMonitor]]: PSI says
  * "this batch's distribution differs"; CUSUM accumulates evidence
  * ACROSS batches and alarms on a sustained small shift long before
  * any single batch looks anomalous (the monitoring loop behind the
  * reference's streaming ingestion, /root/reference/DataEngineering/
  * DataBricks/spark_stream.py).
  *
  * Standard Page CUSUM against a fixed reference mean μ₀ with slack s
  * and threshold h, all INTEGER MICROS (exact, replay-stable):
  * hi ← max(0, hi + (x−μ₀−s)), lo ← max(0, lo − (x−μ₀+s)); alarm when
  * either exceeds h, then reset that side to 0 (restart the chart).
  * Events fold in (ts, event_id) order inside each group so a replayed
  * micro-batch folds identically.
  *
  * Per-key state is two BIGINT accumulators + a count — O(1) per key
  * regardless of stream volume, the [[SessionizeState]] discipline.
  * Output (append mode): one row per ALARM, carrying the side, the
  * crossing value, and the event that tripped it.
  */
object CusumMonitor {

  case class Obs(key: String, ts: Timestamp, event_id: Long, value_micros: Long)
  case class Chart(hi: Long, lo: Long, n: Long)
  case class Alarm(key: String, ts: Timestamp, event_id: Long,
                   side: String, stat_micros: Long, n_since_reset: Long)

  /** Fold a micro-batch's observations into the chart, emitting alarms.
    * Pure function of (sorted batch, prior state) — replay-idempotent. */
  def updateChart(muMicros: Long, slackMicros: Long, hMicros: Long)(
      key: String, obs: Iterator[Obs],
      state: GroupState[Chart]): Iterator[Alarm] = {
    val sorted = obs.toSeq.sortBy(o => (o.ts.getTime, o.event_id))
    var c = state.getOption.getOrElse(Chart(0L, 0L, 0L))
    val alarms = Seq.newBuilder[Alarm]
    sorted.foreach { o =>
      val dx = o.value_micros - muMicros
      var hi = math.max(0L, c.hi + dx - slackMicros)
      var lo = math.max(0L, c.lo - dx - slackMicros)
      var n = c.n + 1
      if (hi > hMicros) {
        alarms += Alarm(key, o.ts, o.event_id, "high", hi, n)
        hi = 0L; n = 0L
      }
      if (lo > hMicros) {
        alarms += Alarm(key, o.ts, o.event_id, "low", lo, n)
        lo = 0L; n = 0L
      }
      c = Chart(hi, lo, n)
    }
    state.update(c)
    alarms.result().iterator
  }

  /** Wire the chart onto a keyed observation stream. No timeout: a
    * silent key keeps its accumulated evidence until data returns. */
  def alarms(obs: Dataset[Obs], muMicros: Long, slackMicros: Long,
             hMicros: Long): Dataset[Alarm] = {
    implicit val ae = Encoders.product[Alarm]
    implicit val ce = Encoders.product[Chart]
    implicit val ke = Encoders.STRING
    obs.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(
        updateChart(muMicros, slackMicros, hMicros))
  }
}
