package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.streaming.GapDetect.{Ev, Gap}

/** GapDetect semantics beyond the gate's single-batch oracle run: the
  * load-bearing property is a gap whose endpoints straddle a BATCH
  * boundary — found exactly once, from resumed state. Plus equality with
  * the declarative lag window on real data under a multi-batch replay.
  */
class GapDetectSpec extends SparkSpec {

  private val HourUs = 3600L * 1000000L

  private def runBatches(name: String, batches: Seq[Seq[Ev]], thresholdUs: Long): Seq[Gap] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = GapDetect.gaps(src.toDS(), thresholdUs)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => src.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).as[Gap].collect().toSeq.sortBy(g => (g.user_id, g.prev_id))
  }

  test("multi-batch replay equals the batch lag window on real events") {
    import spark.implicits._
    val evs = Tables.events(spark, sf0001)
      .select(col("event_id"), col("ts"), col("user_id"))
      .as[Ev].collect().toSeq
    val threshold = 48L * HourUs
    // declarative restatement: per-user lag over (ts, event_id)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val expected = Tables.events(spark, sf0001)
      .select(col("event_id"), col("ts"), col("user_id"))
      .select(col("user_id"), lag(col("event_id"), 1).over(w).as("prev_id"),
        col("event_id").as("next_id"), lag(col("ts"), 1).over(w).as("gap_start"),
        col("ts").as("gap_end"))
      .filter(col("prev_id").isNotNull &&
        (unix_micros(col("gap_end")) - unix_micros(col("gap_start"))) > threshold)
      .select(col("user_id"), col("prev_id"), col("next_id"),
        col("gap_start"), col("gap_end"),
        expr("(unix_micros(gap_end) - unix_micros(gap_start)) div 60000000L")
          .as("gap_minutes"))
      .as[Gap].collect().toSeq.sortBy(g => (g.user_id, g.prev_id))
    assert(expected.nonEmpty, "fixture must contain 48h+ gaps")

    def us(e: Ev) = e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L
    val ordered = evs.sortBy(e => (us(e), e.event_id))
    assert(runBatches("gaps_oneshot", Seq(ordered), threshold) === expected)
    // time-ordered tercile batches: resume-from-state on real data
    val cuts = ordered.map(us).distinct.sorted
    val (t1, t2) = (cuts(cuts.length / 3), cuts(2 * cuts.length / 3))
    val batches = Seq(
      ordered.filter(e => us(e) < t1),
      ordered.filter(e => us(e) >= t1 && us(e) < t2),
      ordered.filter(e => us(e) >= t2))
    assert(batches.forall(_.nonEmpty))
    assert(runBatches("gaps_3batch", batches, threshold) === expected)
  }

  test("gaps: a 10^6-event single-key batch slice completes with correct gaps (whale bound)") {
    import spark.implicits._
    // the documented worst case for the per-trigger sort buffer: ONE key
    // whose whole slice lands in a single group invocation (batch-mode
    // flatMapGroupsWithState hands the group its entire slice, exactly the
    // maxFilesPerTrigger-unbounded streaming case). ~50 MB transient; must
    // complete, not OOM — the sessionize 10^6 bound applied to GapDetect.
    // Every 1000th event jumps +3h (a gap at threshold 2h), others +1s.
    val n = 1000000L
    val ev = spark.range(n).select(
      col("id").as("event_id"),
      timestamp_micros(lit(1700000000000000L) + col("id") * lit(1000000L) +
        (col("id") / lit(1000L)).cast("long") * lit(3L * HourUs)).as("ts"),
      lit(7L).as("user_id")).as[Ev]
    val got = GapDetect.gaps(ev, 2L * HourUs).collect()
    assert(got.length === 999, s"got ${got.length} gaps")
    assert(got.forall(g => g.user_id == 7L && g.gap_minutes == 180L))
  }

  test("a gap straddling a batch boundary is found exactly once, from state") {
    def ts(h: Int) = Timestamp.valueOf(f"2024-03-01 $h%02d:00:00")
    val b1 = Seq(Ev(1L, ts(0), 7L), Ev(2L, ts(1), 7L))
    // 9h of silence crosses the batch boundary; user 8 appears fresh in b2
    val b2 = Seq(Ev(3L, ts(10), 7L), Ev(4L, ts(11), 8L))
    val got = runBatches("gaps_boundary", Seq(b1, b2), 2L * HourUs)
    assert(got.map(g => (g.user_id, g.prev_id, g.next_id, g.gap_minutes)) ===
      Seq((7L, 2L, 3L, 540L)))
  }

  test("openGaps: event-time timeout fires exactly once per quiet key, after the watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def ts(h: Int) = Timestamp.valueOf(f"2024-03-01 00:00:00").toInstant
      .plusSeconds(h * 3600L)
    def ev(id: Long, h: Int, u: Long) = GapDetect.Ev(id, Timestamp.from(ts(h)), u)
    val src = MemoryStream[GapDetect.Ev]
    val q = GapDetect.openGaps(
      src.toDS().withWatermark("ts", "0 seconds"), 2L * HourUs)
      .writeStream.format("memory").queryName("open_gaps").outputMode("append").start()
    try {
      // b1: users 7 and 8 both active at h0/h1
      src.addData(Seq(ev(1L, 0, 7L), ev(2L, 1, 7L), ev(3L, 1, 8L)))
      q.processAllAvailable()
      assert(spark.table("open_gaps").count() === 0L, "no alarm while watermark lags")
      // b2: user 8 reappears at h10 -> watermark advances to h10; user 7's
      // timer (h1+2h=h3) is now behind it and must fire exactly once
      src.addData(Seq(ev(4L, 10, 8L)))
      q.processAllAvailable()
      val fired = spark.table("open_gaps").as[GapDetect.OpenGap].collect()
      assert(fired.map(g => (g.user_id, g.last_id)).toSeq === Seq((7L, 2L)))
      // b3: more data, watermark advances further - user 7 must NOT re-fire
      // (state removed at fire time); user 8's re-armed timer (h10+2h) fires
      src.addData(Seq(ev(5L, 20, 9L)))
      q.processAllAvailable()
      val all = spark.table("open_gaps").as[GapDetect.OpenGap].collect()
        .map(g => (g.user_id, g.last_id)).sorted.toSeq
      assert(all === Seq((7L, 2L), (8L, 4L)), "fire once per quiet key, never twice")
    } finally q.stop()
  }

  test("property: random streams at random ts-respecting batch splits equal the fold") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val HrUs = HourUs
    for (seed <- 1L to 5L) {
      val evGen = for {
        u <- Gen.choose(1L, 4L)
        h <- Gen.choose(0L, 400L) // hours; collisions likely
      } yield (u, h * HrUs)
      val raw = Gen.listOfN(80, evGen)
        .apply(Gen.Parameters.default, Seed(seed)).get
      val evs = raw.zipWithIndex.map { case ((u, us), i) =>
        Ev(i.toLong + 1L, new java.sql.Timestamp(us / 1000L), u)
      }
      def us(e: Ev) = e.ts.getTime * 1000L
      val ordered = evs.sortBy(e => (us(e), e.event_id))
      val threshold = 10L * HrUs
      // reference: per-user consecutive pairs over the global (ts, id) order
      val expected = ordered.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
        es.sliding(2).collect {
          case Seq(a, b) if us(b) - us(a) > threshold =>
            GapDetect.Gap(u, a.event_id, b.event_id, a.ts, b.ts,
              (us(b) - us(a)) / 60000000L)
        }
      }.sortBy(g => (g.user_id, g.prev_id))
      // random batch boundaries, only at strict timestamp increases (the
      // documented time-ordered-replay contract)
      val legalCuts = (1 until ordered.size)
        .filter(i => us(ordered(i)) > us(ordered(i - 1)))
      val nCuts = math.min(3, legalCuts.size)
      val cuts = Gen.pick(nCuts, legalCuts)
        .apply(Gen.Parameters.default, Seed(seed + 100)).get.toSeq.sorted
      val batches = (Seq(0) ++ cuts ++ Seq(ordered.size)).sliding(2).toSeq
        .collect { case Seq(a, b) if a < b => ordered.slice(a, b) }
      val got = runBatches(s"gaps_prop_$seed", batches, threshold)
      assert(got === expected, s"seed=$seed cuts=$cuts")
    }
  }

  test("stale out-of-order events neither emit nor rewind the fold") {
    def ts(h: Int) = Timestamp.valueOf(f"2024-03-01 $h%02d:00:00")
    val b1 = Seq(Ev(1L, ts(0), 7L), Ev(2L, ts(10), 7L))
    // a late replay of an old timestamp must not create a second (2→3)
    // measurement from a rewound baseline, nor a negative-delta emission
    val b2 = Seq(Ev(3L, ts(5), 7L), Ev(4L, ts(20), 7L))
    val got = runBatches("gaps_stale", Seq(b1, b2), 2L * HourUs)
    assert(got.map(g => (g.prev_id, g.next_id, g.gap_minutes)) ===
      Seq((1L, 2L, 600L), (2L, 4L, 600L)))
  }
}
