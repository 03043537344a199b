package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** IntervalJoinExec corners the session-shaped gate fixture cannot reach:
  * OVERLAPPING intervals (the open buffer holds >1), inclusive bounds,
  * unmatched points vanishing (inner), null handling, and plan shape.
  */
class IntervalJoinNativeSpec extends SparkSpec {

  import spark.implicits._

  private def join(points: org.apache.spark.sql.DataFrame,
      ivs: org.apache.spark.sql.DataFrame) =
    IntervalJoinNative.contains(points, ivs, Seq("k"), "ts", "lo", "hi", Seq("tag"))

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000L)

  test("overlapping intervals: a point matches every container, inclusive bounds") {
    val points = Seq((1L, 5L), (1L, 10L), (1L, 20L), (1L, 31L))
      .map { case (k, t) => (k, ts(t * 1000000L)) }.toDF("k", "ts")
    val ivs = Seq((1L, 0L, 10L, "a"), (1L, 5L, 30L, "b"), (1L, 25L, 40L, "c"))
      .map { case (k, lo, hi, tag) =>
        (k, ts(lo * 1000000L), ts(hi * 1000000L), tag) }
      .toDF("k", "lo", "hi", "tag")
    val got = join(points, ivs)
      .select(unix_micros(col("ts")) / 1000000L, col("tag"))
      .collect().map(r => (r.getDouble(0).toLong, r.getString(1))).toSet
    // t=5: in [0,10] and [5,30] (inclusive start); t=10: both (inclusive
    // end of a); t=20: only b; t=31: only c (b closed at 30)
    assert(got === Set((5L, "a"), (5L, "b"), (10L, "a"), (10L, "b"),
      (20L, "b"), (31L, "c")))
  }

  test("inner semantics: uncontained points and foreign keys emit nothing") {
    val points = Seq((1L, 50L), (2L, 5L)) // t=50 past all; key 2 has no intervals
      .map { case (k, t) => (k, ts(t * 1000000L)) }.toDF("k", "ts")
    val ivs = Seq((1L, 0L, 10L, "a"))
      .map { case (k, lo, hi, tag) =>
        (k, ts(lo * 1000000L), ts(hi * 1000000L), tag) }
      .toDF("k", "lo", "hi", "tag")
    assert(join(points, ivs).count() === 0L)
  }

  test("native sweep equals the composed time-binned range join on real data") {
    val events = Tables.events(spark, sf001)
      .select(col("user_id"), col("ts"), col("value"))
    val sessions = graft.streaming.Sessionize
      .sessionizeRelational(events, gapMs = 30L * 60000L)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.mkString("|")).sorted.toSeq
    val native = IntervalJoinNative.contains(
      events.select(col("user_id"), col("ts")), sessions, Seq("user_id"),
      "ts", "session_start", "session_end",
      Seq("session_start", "session_end", "n_events"))
    val composed = graft.relational.RangeJoin.pointInInterval(
        events.select(col("user_id"), col("ts")), sessions, Seq("user_id"),
        "ts", "session_start", "session_end", binWidthUs = 1800000000L)
      .select(col("user_id"), col("ts"), col("session_start"),
        col("session_end"), col("n_events"))
    assert(canon(native) === canon(composed))
    assert(native.count() > 0L)
  }

  test("plan: IntervalJoinExec with the SortMergeJoin envelope, pruned point scan") {
    val events = Tables.events(spark, sf001)
    val sessions = graft.streaming.Sessionize
      .sessionizeRelational(
        events.select(col("user_id"), col("ts"), col("value")),
        gapMs = 30L * 60000L)
    val df = IntervalJoinNative.contains(
        events, sessions, Seq("user_id"),
        "ts", "session_start", "session_end", Seq("n_events"))
      .select(col("user_id"), col("n_events"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("IntervalJoin"), plan)
    assert(plan.contains("Sort "), plan)
    // the pruning rule narrows the events scan: value/event_id/event_type
    // are never read (events schema has them; only user_id+ts required)
    val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchemas.contains("event_type"), plan)
  }
}
