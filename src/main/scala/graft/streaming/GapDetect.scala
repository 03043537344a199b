package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event-time gap detection (heartbeat-loss monitoring): emit one
  * row per consecutive-event pair whose spacing exceeds a threshold,
  * per key — the op an ingestion pipeline runs to notice a source going
  * quiet (reference context: the pipeline's daily-run contract assumes a
  * continuously-fed tick stream; a silent feed is its primary failure
  * mode). Structured Streaming has no built-in "lag across the stream":
  * the per-key recurrence lives in `flatMapGroupsWithState`, exactly like
  * [[AsOfStream]].
  *
  * Semantics (shared with the DuckDB oracle): events totally ordered per
  * key by (ts, event_id); a gap is a consecutive pair with
  * `next.ts − prev.ts > threshold`. Within a batch the group's slice is
  * sorted and folded; across batches the fold resumes from the per-key
  * state — ONE (event_id, micros) pair, O(1) regardless of stream length
  * (same bounded-state argument as [[AsOfStream]]: a whale key costs its
  * shuffle share and 16 bytes of state). A gap whose endpoints straddle a
  * batch boundary is found exactly once — the resume property
  * GapDetectSpec pins. Cross-batch event-time REGRESSION follows the
  * AsOfStream convention: state advances only on a strictly newer
  * (ts, id), and an out-of-order stale event neither emits (its delta
  * from state is negative) nor rewinds the fold — under the time-ordered
  * replay the gate runs, the fold equals the batch lag window exactly.
  */
object GapDetect extends Serializable {

  final case class Ev(event_id: Long, ts: Timestamp, user_id: Long)
  final case class LastSeen(last_id: Long, lastUs: Long)
  final case class Gap(
      user_id: Long, prev_id: Long, next_id: Long,
      gap_start: Timestamp, gap_end: Timestamp, gap_minutes: Long)

  /** Full-precision epoch micros (Timestamp.getTime is millis-truncated). */
  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  private def toTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  def gaps(events: Dataset[Ev], thresholdUs: Long): Dataset[Gap] = {
    implicit val outEnc = Encoders.product[Gap]
    implicit val stEnc = Encoders.product[LastSeen]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[LastSeen]) =>
          val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          val out = Seq.newBuilder[Gap]
          var st = state.getOption
          sorted.foreach { e =>
            val us = micros(e.ts)
            val newer = st.forall(s =>
              us > s.lastUs || (us == s.lastUs && e.event_id > s.last_id))
            if (newer) {
              st.foreach { s =>
                if (us - s.lastUs > thresholdUs)
                  out += Gap(uid, s.last_id, e.event_id,
                    toTs(s.lastUs), e.ts, (us - s.lastUs) / 60000000L)
              }
              st = Some(LastSeen(e.event_id, us))
            }
          }
          st.foreach(state.update)
          out.result().iterator
      }
  }
}
