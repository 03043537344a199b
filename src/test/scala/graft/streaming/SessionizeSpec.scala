package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions.{col, lit, timestamp_micros}
import org.apache.spark.sql.streaming.{GroupStateTimeout, Trigger}

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {

  import Sessionize._

  test("batch sessionization splits on gap and aggregates per session") {
    import spark.implicits._
    def t(m: Long) = new Timestamp(1700000000000L + m * 60000L)
    val ev = Seq(
      Event(1L, t(0), 1.0), Event(1L, t(10), 2.0),  // session A (gap 30m)
      Event(1L, t(50), 4.0),                        // session B
      Event(2L, t(5), 8.0)                          // user 2, one session
    ).toDS()
    val sessions = sessionize(ev, gapMs = 30L * 60000L)
      .collect().sortBy(s => (s.user_id, s.session_start.getTime))
    assert(sessions.length === 3)
    assert(sessions(0).n_events === 2 && sessions(0).value_sum === 3.0)
    assert(sessions(1).n_events === 1 && sessions(1).value_sum === 4.0)
    assert(sessions(2).user_id === 2L)
  }

  test("a 10^6-event single-user batch completes with correct session shape") {
    import spark.implicits._
    // the documented worst case for the custom-state path: ONE user whose
    // whole history lands in one group — the sort buffer holds all 10^6
    // events (~56 MB) and must complete, not OOM. Events alternate inside/
    // outside the gap so the fold also closes sessions while scanning.
    val n = 1000000L
    val gapMs = 60000L
    // every 1000th event jumps 2×gap (forces a session break), others +1s
    val ev = spark.range(n).select(
      lit(7L).as("user_id"),
      timestamp_micros(lit(1700000000000000L) +
        (col("id") * lit(1000000L)) +
        (col("id") / lit(1000L)).cast("long") * lit(2L * gapMs * 1000L)).as("ts"),
      lit(0.5).as("value")).as[Event]
    val sessions = sessionize(ev, gapMs).collect()
    assert(sessions.length === 1000, s"got ${sessions.length} sessions")
    assert(sessions.map(_.n_events).sum === n)
    assert(sessions.forall(s => s.user_id == 7L && s.n_events == 1000L))
    assert(sessions.forall(s => math.abs(s.value_sum - 500.0) < 1e-9))
  }

  test("relational sessionization equals the stateful operator on real events") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sf0001)
      .select($"user_id", $"ts", $"value")
    val gap = 30L * 60000L
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select($"user_id", $"session_start", $"session_end", $"n_events", $"value_sum")
        .collect().map(_.mkString("|")).sorted.toSeq
    val stateful = canon(Sessionize.sessionizeBatch(ev, gap))
    val relational = canon(Sessionize.sessionizeRelational(ev, gap))
    assert(relational.nonEmpty)
    assert(relational === stateful)
  }

  test("session_window form equals the stateful operator on real events") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sf0001)
      .select($"user_id", $"ts", $"value")
    val gap = 30L * 60000L
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select($"user_id", $"session_start", $"session_end", $"n_events", $"value_sum")
        .collect().map(_.mkString("|")).sorted.toSeq
    val stateful = canon(Sessionize.sessionizeBatch(ev, gap))
    val windowed = canon(Sessionize.sessionizeWindowed(ev, gap))
    assert(windowed.nonEmpty)
    assert(windowed === stateful)
  }

  test("session_window merges at exactly-gap like the stateful operator") {
    import spark.implicits._
    val gap = 30L * 60000L
    def t(us: Long) = {
      val ts = new Timestamp(us / 1000000L * 1000L)
      ts.setNanos((us % 1000000L).toInt * 1000)
      ts
    }
    val base = 1700000000000000L // µs
    // user 1: diff == gap exactly (must merge — inclusive rule);
    // user 2: diff == gap + 1ms (must split)
    val ev = Seq(
      (1L, t(base), 1.0), (1L, t(base + gap * 1000L), 2.0),
      (2L, t(base), 4.0), (2L, t(base + gap * 1000L + 1000L), 8.0)
    ).toDF("user_id", "ts", "value")
    def sessions(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.groupBy("user_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val win = sessions(Sessionize.sessionizeWindowed(ev, gap))
    val st = sessions(Sessionize.sessionizeBatch(ev, gap))
    assert(win === Map(1L -> 1L, 2L -> 2L))
    assert(st === win)
  }

  test("relational sessionization adds no exchange after the window shuffle") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sf0001)
      .select($"user_id", $"ts", $"value")
    val plan = Sessionize.sessionizeRelational(ev, 30L * 60000L)
      .queryExecution.executedPlan.toString
    // one shuffle on user_id for the window; the session groupBy must reuse
    // it (user_id is a prefix of the grouping key)
    assert(plan.split("Exchange hashpartitioning").length - 1 === 1, plan)
  }

  test("session_window form shuffles once with map-side partial aggregation") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sf0001)
      .select($"user_id", $"ts", $"value")
    val plan = Sessionize.sessionizeWindowed(ev, 30L * 60000L)
      .queryExecution.executedPlan.toString
    // one hash exchange on user_id; sessions merge through the spillable
    // sort AFTER a partial aggregate (the shuffle carries per-window
    // partials, not the event stream)
    assert(plan.split("Exchange hashpartitioning").length - 1 === 1, plan)
    assert(plan.contains("partial_min"), plan)
    assert(plan.contains("MergingSessions"), plan)
  }

  test("session_window form runs as a streaming aggregation end-to-end") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sessw_in").toString
    graft.Tables.events(spark, sf0001)
      .select($"user_id", $"ts", $"value")
      .write.mode("overwrite").parquet(dir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))
    val stream = spark.readStream.schema(schema).parquet(dir)
      .withWatermark("ts", "1 minute")
    val q = Sessionize.sessionizeWindowed(stream, gapMs = 30L * 60000L)
      .writeStream.format("memory").queryName("sessions_window_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(180000), "stream must drain before asserting")
    // append mode emits sessions finalized by the watermark; each emitted
    // session must match the batch answer exactly (the tail may be
    // withheld as open state — correct append-mode semantics)
    val emitted = spark.table("sessions_window_stream")
      .collect().map(_.mkString("|")).toSet
    val batch = Sessionize.sessionizeWindowed(
        graft.Tables.events(spark, sf0001).select($"user_id", $"ts", $"value"),
        gapMs = 30L * 60000L)
      .collect().map(_.mkString("|")).toSet
    assert(emitted.nonEmpty, "bounded run emitted no closed sessions")
    assert(emitted.subsetOf(batch),
      s"streamed sessions diverge from batch: ${(emitted -- batch).take(3)}")
  }

  test("streaming sessionization with event-time timeout runs end-to-end") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sess_in").toString
    graft.Tables.events(spark, sf0001)
      .select($"user_id", $"ts", $"value")
      .write.mode("overwrite").parquet(dir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))
    val stream = spark.readStream.schema(schema).parquet(dir)
      .withWatermark("ts", "1 minute").as[Event]
    val q = sessionize(stream, gapMs = 30L * 60000L,
        timeout = GroupStateTimeout.EventTimeTimeout)
      .writeStream.format("memory").queryName("sessions_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(180000), "stream must drain before asserting")
    // bounded stream: sessions whose timeout predates the final watermark
    // are emitted; the tail may be withheld as open state — that's correct
    // append-mode semantics. The assertion is that the stateful operator
    // executes and emits well-formed sessions.
    val out = spark.table("sessions_stream")
    assert(out.columns.toSeq ===
      Seq("user_id", "session_start", "session_end", "n_events", "value_sum"))
    assert(out.filter("session_end < session_start").count() === 0)
  }
}
