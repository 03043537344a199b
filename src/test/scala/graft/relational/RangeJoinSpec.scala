package graft.relational

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class RangeJoinSpec extends SparkSpec {

  private lazy val events =
    Tables.events(spark, sf0001).select(col("user_id"), col("ts"), col("value"))

  private lazy val sessions = graft.streaming.Sessionize
    .sessionizeRelational(events, gapMs = 30L * 60000L)
    .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))

  test("binned range join equals the naive inequality join, no duplicates") {
    // distinct points so output-row uniqueness isolates JOIN duplication
    // from fixture duplication (two events can share a µs-truncated ts)
    val points = events.select(col("user_id"), col("ts")).distinct()
    val binned = RangeJoin.pointInInterval(points, sessions, Seq("user_id"),
        "ts", "session_start", "session_end", binWidthUs = 1800000000L)
      .select(col("user_id"), col("ts"), col("session_start"))
      .collect().map(_.mkString("|")).sorted.toSeq
    val naive = points.as("p")
      .join(sessions.as("i"),
        col("p.user_id") === col("i.user_id") &&
          col("p.ts") >= col("i.session_start") &&
          col("p.ts") <= col("i.session_end"))
      .select(col("p.user_id"), col("p.ts"), col("i.session_start"))
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(binned.nonEmpty)
    assert(binned === naive)
    assert(binned.distinct.size === binned.size, "each match exactly once")
  }

  test("odd bin width still finds every match (bins misaligned to sessions)") {
    val points = events.select(col("user_id"), col("ts"))
    val odd = RangeJoin.pointInInterval(points, sessions, Seq("user_id"),
        "ts", "session_start", "session_end", binWidthUs = 777777L)
      .count()
    val aligned = RangeJoin.pointInInterval(points, sessions, Seq("user_id"),
        "ts", "session_start", "session_end", binWidthUs = 1800000000L)
      .count()
    assert(odd === aligned)
  }

  test("sessions partition events: per-session range count equals n_events") {
    val joined = RangeJoin.pointInInterval(
        events.select(col("user_id"), col("ts")), sessions, Seq("user_id"),
        "ts", "session_start", "session_end", binWidthUs = 1800000000L)
      .groupBy(col("user_id"), col("session_start"), col("n_events"))
      .agg(count(lit(1)).as("n_in_range"))
    assert(joined.filter(col("n_in_range") =!= col("n_events")).count() === 0)
  }
}
