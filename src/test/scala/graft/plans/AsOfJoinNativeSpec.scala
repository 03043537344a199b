package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.RelationalQueries

/** AsOfJoinExec: the oracle proves value-equality with DuckDB's ASOF JOIN;
  * this pins (a) the custom operator actually PLANS (AsOfJoinExec in the
  * physical plan, no Window, no union), (b) bit-equality with the composed
  * union+window form on real data, and (c) the edge semantics a gate run
  * may not cover — left rows before any right row, per-key isolation, and
  * the inclusive-≤ tie.
  */
class AsOfJoinNativeSpec extends SparkSpec {

  test("plans as AsOfJoinExec: no Window, no Union, SMJ-style exchanges + sorts") {
    val df = RelationalQueries.queries("asof_join_native")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin ["), plan.linesIterator.take(8).mkString("\n"))
    assert(!plan.contains("Window"), "custom plan must not fall back to the window form")
    assert(!plan.contains("Union"))
  }

  test("bit-equal to the composed union+window form on real data") {
    val native = RelationalQueries.queries("asof_join_native")(spark, sf0001)
      .collect().map(_.mkString("|")).toSeq
    val composed = RelationalQueries.queries("asof_join")(spark, sf0001)
      .collect().map(_.mkString("|")).toSeq
    assert(native.nonEmpty)
    assert(native === composed)
  }

  test("pruning rule: a narrow projection over the node reaches the probe scan") {
    // sf0.01, not sf0.001: MultiSymbolSpec caches the sf0.001 events table
    // on the suite-shared session, and a cached subtree substitutes an
    // InMemoryRelation for the scan — correct behavior, but it hides the
    // FileScan ReadSchema this test asserts on
    val ev = graft.Tables.events(spark, sf001) // 6 source columns
    val hourly = ev.groupBy(col("event_type"),
        graft.forex.Resample.bucket(col("ts"), graft.forex.Resample.byName("1h"))
          .as("h_bucket"))
      .agg(max(col("value")).as("h_high"))
    val narrow = AsOfJoinNative.backward(ev, hourly, "ts", "h_bucket",
        Seq("event_type"), Seq("h_high"))
      .select("event_id", "h_high")
    val scans = narrow.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("FileScan parquet") && l.contains("events.parquet"))
      .toSeq
    assert(scans.size >= 2, "probe scan + hourly scan expected")
    val readSchemas = scans.map(_.split("ReadSchema:").last)
    // the probe scan needs event_id (projected) + ts/event_type (join);
    // NO events scan anywhere in the plan may read the unused user_id/props
    assert(readSchemas.exists(s => s.contains("event_id") && s.contains("event_type")))
    readSchemas.foreach { s =>
      assert(!s.contains("user_id") && !s.contains("props"),
        s"unpruned events scan: $s")
    }
    // and values still match the composed form under the pruned plan
    val composed = graft.relational.AsOfJoin.backward(ev, hourly, "ts", "h_bucket",
        Seq("event_type"), Seq("h_high"))
      .select("event_id", "h_high")
    assert(narrow.collect().map(_.mkString("|")).sorted.toSeq ===
      composed.collect().map(_.mkString("|")).sorted.toSeq)
  }

  test("edges: pre-first-state nulls, per-key isolation, inclusive tie") {
    import spark.implicits._
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-03-01 $h%02d:00:00")
    val left = Seq(
      (1L, ts(0), "a"),  // before any state row -> nulls
      (2L, ts(5), "a"),  // exactly at a state ts -> inclusive match
      (3L, ts(7), "a"),  // between states -> earlier one
      (4L, ts(9), "b"),  // other key: must not see key a's state
      (5L, ts(1), "c")   // key with no state at all
    ).toDF("id", "ts", "k")
    val right = Seq(
      ("a", ts(5), 50.0), ("a", ts(8), 80.0), ("b", ts(2), 20.0)
    ).toDF("k", "rts", "v")
    val got = AsOfJoinNative.backward(left, right, "ts", "rts", Seq("k"), Seq("v"))
      .orderBy(col("id"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toSeq
    assert(got === Seq(
      (1L, None), (2L, Some(50.0)), (3L, Some(50.0)), (4L, Some(20.0)), (5L, None)))
  }
}
