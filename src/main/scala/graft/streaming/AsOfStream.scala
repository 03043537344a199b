package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of (temporal) enrichment: each probe row picks up the
  * latest state row for its key with state-time ≤ probe-time — the
  * streaming counterpart of [[graft.relational.AsOfJoin.backward]]
  * (a batch union + ordered window there; per-key O(1) custom state
  * here). The Flink world calls this a temporal join; Structured
  * Streaming has no built-in for it because the "latest value at time t"
  * contract needs a per-key recurrence, which is exactly what
  * `flatMapGroupsWithState` provides.
  *
  * Semantics (shared with the batch op and the DuckDB oracle): at equal
  * timestamps the state update applies BEFORE the probe (inclusive ≤),
  * and among state rows with the same (key, ts) the highest event_id
  * wins — a total order, so the enrichment is deterministic on any input.
  * Within a batch the group's slice is sorted by (ts, kind, id) and
  * folded; across batches the fold resumes from state. Like
  * [[StatefulEwma]], cross-batch REGRESSION in event time is surfaced,
  * not absorbed: a probe arriving in a later batch than a younger state
  * update sees that update (state is "latest seen", the temporal-join
  * contract under watermarked ingestion), which is why bounded ordered
  * replays equal the batch as-of join exactly.
  *
  * State per key is ONE (id, micros, value) triple — O(1) regardless of
  * stream length, the same bounded-state argument as the EWMA fold; a
  * whale key costs its shuffle share and 24 bytes of state.
  */
object AsOfStream extends Serializable {

  final case class Ev(
      event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
  final case class LastState(p_id: Long, pUs: Long, p_value: Double)
  final case class Enriched(
      click_id: Long, ts: Timestamp, user_id: Long,
      p_id: Option[Long], p_ts: Option[Timestamp], p_value: Option[Double])

  /** Full-precision epoch micros (Timestamp.getTime is millis-truncated). */
  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  private def toTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** events: a mixed stream of state rows (event_type = `stateType`) and
    * probe rows (everything else). Emits one enriched row per probe.
    */
  def enrich(events: Dataset[Ev], stateType: String = "purchase"): Dataset[Enriched] = {
    implicit val outEnc = Encoders.product[Enriched]
    implicit val stEnc = Encoders.product[LastState]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[LastState]) =>
          val sorted = it.toSeq.sortBy(e =>
            (micros(e.ts), if (e.event_type == stateType) 0 else 1, e.event_id))
          val out = Seq.newBuilder[Enriched]
          var st = state.getOption
          sorted.foreach { e =>
            if (e.event_type == stateType) {
              val us = micros(e.ts)
              val newer = st.forall(s =>
                us > s.pUs || (us == s.pUs && e.event_id > s.p_id))
              if (newer) st = Some(LastState(e.event_id, us, e.value))
            } else {
              out += Enriched(e.event_id, e.ts, uid,
                st.map(_.p_id), st.map(s => toTs(s.pUs)), st.map(_.p_value))
            }
          }
          st.foreach(state.update)
          out.result().iterator
      }
  }
}
