package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.streaming.AsOfStream.{Enriched, Ev}

/** AsOfStream semantics beyond the gate's single-batch oracle run:
  * batch-boundary behavior (resume-from-state, the "latest seen"
  * temporal-join contract) driven deterministically with MemoryStream.
  */
class AsOfStreamSpec extends SparkSpec {

  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  /** The operator's contract, restated as a driver-side fold. */
  private def referenceFold(evs: Seq[Ev]): Seq[Enriched] = {
    val sorted = evs.sortBy(e =>
      (micros(e.ts), if (e.event_type == "purchase") 0 else 1, e.event_id))
    var st = Map.empty[Long, Ev]
    val out = Seq.newBuilder[Enriched]
    sorted.foreach { e =>
      if (e.event_type == "purchase") {
        val keep = st.get(e.user_id).forall(p =>
          micros(e.ts) > micros(p.ts) ||
            (micros(e.ts) == micros(p.ts) && e.event_id > p.event_id))
        if (keep) st += (e.user_id -> e)
      } else {
        val p = st.get(e.user_id)
        out += Enriched(e.event_id, e.ts, e.user_id,
          p.map(_.event_id), p.map(_.ts), p.map(_.value))
      }
    }
    out.result()
  }

  private def runBatches(name: String, batches: Seq[Seq[Ev]]): Seq[Enriched] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = AsOfStream.enrich(src.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => src.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).as[Enriched].collect().toSeq.sortBy(_.click_id)
  }

  test("time-ordered multi-batch replay equals the one-shot run equals the fold") {
    import spark.implicits._
    val evs = Tables.events(spark, sf0001)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Ev].collect().toSeq
    assert(evs.count(_.event_type == "click") > 0)
    assert(evs.count(_.event_type == "purchase") > 0)
    val expected = referenceFold(evs).sortBy(_.click_id)

    val oneShot = runBatches("asof_oneshot", Seq(evs))
    assert(oneShot === expected)

    // split at distinct-timestamp terciles: batches are time-ordered and
    // no timestamp straddles a boundary
    val cuts = evs.map(e => micros(e.ts)).distinct.sorted
    val (t1, t2) = (cuts(cuts.length / 3), cuts(2 * cuts.length / 3))
    val batches = Seq(
      evs.filter(e => micros(e.ts) < t1),
      evs.filter(e => micros(e.ts) >= t1 && micros(e.ts) < t2),
      evs.filter(e => micros(e.ts) >= t2))
    assert(batches.forall(_.nonEmpty))
    assert(runBatches("asof_3batch", batches) === expected)
  }

  test("probes resume from prior-batch state; equal-ts ties resolve to max event_id") {
    def ts(sec: Int) = Timestamp.valueOf(s"2024-03-01 00:00:${"%02d".format(sec)}")
    val b1 = Seq(
      Ev(1L, ts(10), 7L, "purchase", 5.0),
      Ev(2L, ts(10), 7L, "purchase", 9.0), // same ts: higher id wins
      Ev(3L, ts(10), 7L, "click", 0.0))    // equal-ts probe sees the update (inclusive)
    val b2 = Seq(
      Ev(4L, ts(20), 7L, "click", 0.0),    // later batch, resumes from state
      Ev(5L, ts(30), 8L, "click", 0.0))    // keyless user: null enrichment
    val got = runBatches("asof_state", Seq(b1, b2)).map(e =>
      (e.click_id, e.p_id, e.p_value)).toSet
    assert(got === Set(
      (3L, Some(2L), Some(9.0)),
      (4L, Some(2L), Some(9.0)),
      (5L, None, None)))
  }
}
