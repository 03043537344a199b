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

  final case class OpenGap(user_id: Long, last_id: Long, last_seen: Timestamp)

  /** The alarm [[gaps]] cannot raise: a source that goes quiet and NEVER
    * recovers has no next event to measure against, so arrival-driven
    * folds stay silent forever. This is the other half of heartbeat
    * monitoring — TIMEOUT-triggered emission via
    * `GroupStateTimeout.EventTimeTimeout`: every update re-arms a per-key
    * event-time timer at `last_seen + threshold`; when the WATERMARK
    * passes it with no new data, the callback fires once with an empty
    * input iterator, emits the open-gap row, and removes the state (fire
    * exactly once). Requires `withWatermark` upstream; the timer re-arm
    * clamps to watermark+1ms because Spark rejects timers at or behind
    * the current watermark (a stale key re-arming after a long batch gap
    * would otherwise throw).
    *
    * State per key is the same 16-byte (id, µs) pair as [[gaps]] plus the
    * engine-managed timer — O(keys), dropped at fire time, so a quiet
    * source costs nothing after its alarm.
    */
  def openGaps(events: Dataset[Ev], thresholdUs: Long): Dataset[OpenGap] = {
    implicit val outEnc = Encoders.product[OpenGap]
    implicit val stEnc = Encoders.product[LastSeen]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[LastSeen]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(OpenGap(uid, s.last_id, toTs(s.lastUs)))
          } else {
            var st = state.getOption
            it.foreach { e =>
              val us = micros(e.ts)
              if (st.forall(s =>
                us > s.lastUs || (us == s.lastUs && e.event_id > s.last_id)))
                st = Some(LastSeen(e.event_id, us))
            }
            st.foreach { s =>
              state.update(s)
              // CEILING division to ms: the oracle contract is strict
              // (mx − last_seen > threshold in µs), and Spark fires when
              // the ms watermark passes the ms timer — truncating lastUs
              // and thresholdUs separately could arm up to ~1ms early on
              // sub-ms data; ceil of the single µs sum never does
              state.setTimeoutTimestamp(math.max(
                (s.lastUs + thresholdUs + 999L) / 1000L,
                state.getCurrentWatermarkMs() + 1L))
            }
            Iterator.empty
          }
      }
  }

  /** Per-trigger memory bound: the group's BATCH SLICE is buffered once
    * for the in-batch sort (a flat array of (id, ts, key) rows — ~48
    * bytes/event), while cross-batch state stays at one 16-byte pair. A
    * whale key therefore costs its slice, not its history:
    * GapDetectSpec pins 10⁶ events for one key in a single batch (the
    * sessionize bound, commit e4f09ae) — ~50 MB transient, well inside an
    * executor core's share; a key hot enough to beat that bound needs
    * rate-limited triggers (`maxFilesPerTrigger` /
    * `maxOffsetsPerTrigger`), which cap the slice by construction.
    */
  def gaps(events: Dataset[Ev], thresholdUs: Long): Dataset[Gap] = {
    implicit val outEnc = Encoders.product[Gap]
    implicit val stEnc = Encoders.product[LastSeen]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[LastSeen]) =>
          val sorted = it.toArray.sortInPlaceBy(e => (micros(e.ts), e.event_id))
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
