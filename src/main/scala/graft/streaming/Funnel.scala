package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING sequence-pattern matching — the funnel state machine
  * (`view → next click ≤ step → next purchase ≤ step`) as per-key
  * `flatMapGroupsWithState`, the MATCH_RECOGNIZE shape Structured
  * Streaming lacks natively. Emits one row per COMPLETED chain the moment
  * its purchase arrives; shares the batch [[graft.queries]] funnel's
  * DuckDB oracle (nearest-successor semantics), so the gate proves the
  * incremental state machine equal to the declarative three-way join.
  *
  * Semantics (= the batch form exactly):
  *  - a view waits for its FIRST strictly-later click; that click either
  *    continues the chain (within `stepUs`) or kills it — either way the
  *    view leaves the state (nearest-successor: a later click can never
  *    be the nearest);
  *  - a (view, click) pair likewise waits for the first strictly-later
  *    purchase;
  *  - duplicate view events at one timestamp collapse (the batch GROUP BY
  *    does the same), and equal timestamps never chain (strict >).
  *
  * State bound: pending entries older than `stepUs` behind the newest
  * processed event are IMPOSSIBLE — any future successor is even later,
  * so the bound already failed — and are pruned on every event. State is
  * therefore O(events per step-window per key), not O(history); the
  * in-batch sort buffer obeys the [[GapDetect.gaps]] slice bound.
  * Cross-batch resume: the fold continues from the pruned pending lists,
  * so a chain whose steps straddle a batch boundary completes exactly
  * once (FunnelStreamSpec pins it).
  */
object Funnel extends Serializable {

  final case class Ev(user_id: Long, ts: Timestamp, event_type: String)
  final case class Chain(
      user_id: Long, view_ts: Timestamp, click_ts: Timestamp,
      purchase_ts: Timestamp)
  /** Pending views + (view, click) pairs as parallel µs arrays. */
  final case class FState(views: Seq[Long], pairV: Seq[Long], pairC: Seq[Long])

  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  private def toTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  def chains(events: Dataset[Ev], stepUs: Long): Dataset[Chain] = {
    implicit val outEnc = Encoders.product[Chain]
    implicit val stEnc = Encoders.product[FState]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[FState]) =>
          val sorted = it.toArray.sortInPlaceBy(e => (micros(e.ts), e.event_type))
          val st = state.getOption.getOrElse(FState(Nil, Nil, Nil))
          var views = st.views.toBuffer
          val pairV = st.pairV.toBuffer
          val pairC = st.pairC.toBuffer
          val out = Seq.newBuilder[Chain]
          sorted.foreach { e =>
            val us = micros(e.ts)
            // prune the impossible: a pending entry whose deadline passed
            // can never chain (any future successor is >= us)
            views = views.filter(tv => us - tv <= stepUs)
            var i = 0
            while (i < pairC.length) {
              if (us - pairC(i) > stepUs) { pairV.remove(i); pairC.remove(i) }
              else i += 1
            }
            e.event_type match {
              case "view" =>
                if (!views.contains(us)) views += us // batch GROUP BY dedup
              case "click" =>
                // the FIRST strictly-later click resolves EVERY waiting view
                val (resolved, waiting) = views.partition(_ < us)
                resolved.foreach { tv =>
                  if (us - tv <= stepUs) { pairV += tv; pairC += us }
                }
                views = waiting
              case "purchase" =>
                var j = 0
                while (j < pairC.length) {
                  if (pairC(j) < us) {
                    if (us - pairC(j) <= stepUs)
                      out += Chain(uid, toTs(pairV(j)), toTs(pairC(j)), toTs(us))
                    pairV.remove(j); pairC.remove(j)
                  } else j += 1
                }
              case _ => () // non-funnel event types pass through silently
            }
          }
          state.update(FState(views.toSeq, pairV.toSeq, pairC.toSeq))
          out.result().iterator
      }
  }
}
