package graft.ingest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** TickSource (DataSource V2): the gate hash-proves the generated rows;
  * this pins the CONNECTOR mechanics the oracle cannot see — page-grained
  * parallelism, pushed tick_id bounds narrowing the planned pages, and
  * column pruning reaching the readers.
  */
class TickSourceSpec extends SparkSpec {

  private def ticks(rows: Long = 10000L, pages: Int = 8) =
    spark.read.format("graft-ticks")
      .option("rows", rows.toString).option("pages", pages.toString).load()

  test("metadata column _row_in_page: hidden from *, by-name resolvable, " +
      "page-origin-anchored under pushdown") {
    val df = ticks()
    // hidden from the table schema and SELECT *
    assert(!df.schema.fieldNames.contains("_row_in_page"))
    // resolvable by name; ordinal computed from the page's ORIGINAL start
    // even when the pushed range clips the page mid-way (page size 1250)
    val rows = df.filter(col("tick_id") >= 1249L && col("tick_id") <= 1251L)
      .select(col("tick_id"), col("_row_in_page"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows === Map(1249L -> 1249L, 1250L -> 0L, 1251L -> 1L),
      "ordinal must reset at the page boundary and ignore pushed clipping")
  }

  test("one input partition per page; pushed bounds drop whole pages") {
    assert(ticks().rdd.getNumPartitions === 8)
    // bounds [2500, 5000) intersect pages 2 and 3 only (1250 ids/page)
    val bounded = ticks().filter(col("tick_id") >= 2500L && col("tick_id") < 5000L)
    assert(bounded.rdd.getNumPartitions === 2,
      "out-of-range pages must never be planned (the skipped REST request)")
    assert(bounded.count() === 2500L)
    // boundary exactness: no dropped or duplicated edge rows
    val ids = bounded.agg(min("tick_id"), max("tick_id")).head()
    assert(ids.getLong(0) === 2500L && ids.getLong(1) === 4999L)
  }

  test("filters are PUSHED (plan) and non-range predicates stay residual") {
    val df = ticks().filter(col("tick_id") >= 100L && col("symbol") === "EURUSD")
    val plan = df.queryExecution.executedPlan.toString
    // the accepted bound narrows the scan's generated range (visible in
    // the Scan description) and VANISHES from the residual predicates
    assert(plan.contains("range=[100,10000)"), plan)
    // Filter OPERATOR lines (not the scan's RuntimeFilters tag): the
    // residual must evaluate symbol only — the pushed bound must not be
    // re-evaluated
    val filterOps = plan.linesIterator.filter(_.matches(""".*\*?\(?\d*\)? ?Filter \(.*""")).toSeq
    assert(filterOps.exists(_.contains("symbol")), plan)
    assert(!filterOps.exists(_.contains("tick_id")),
      "pushed bound must not be re-evaluated as a residual filter\n" + plan)
    assert(df.count() === ticks().filter(col("tick_id") >= 100L)
      .filter(col("symbol") === "EURUSD").count())
  }

  test("column pruning reaches the scan: only requested columns are generated") {
    val df = ticks().select(col("price"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=price"), plan)
    assert(!plan.contains("cols=tick_id"), plan)
    assert(df.agg(sum("price")).head().getDouble(0) > 0.0)
  }

  test("streaming: rate-limited micro-batches tile the feed exactly once") {
    val q = spark.readStream.format("graft-ticks")
      .option("rows", "2000").option("pages", "4")
      .option("maxTicksPerTrigger", "600").load()
      .writeStream.format("memory").queryName("tick_stream_spec")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try assert(q.awaitTermination(120000), "bounded stream must finish")
    finally q.stop()
    // 2000 ids at 600/trigger → 4 data batches (600+600+600+200)
    val sizes = q.recentProgress.map(_.numInputRows).filter(_ > 0L).toSeq
    assert(sizes === Seq(600L, 600L, 600L, 200L), sizes.toString)
    // exactly-once tiling: streamed rows == batch rows, no dup, no gap
    val streamed = spark.table("tick_stream_spec")
    assert(streamed.count() === 2000L)
    assert(streamed.select("tick_id").distinct().count() === 2000L)
    val batch = ticks(2000L, 4).collect().map(_.mkString("|")).sorted.toSeq
    assert(streamed.collect().map(_.mkString("|")).sorted.toSeq === batch)
  }

  test("page parallelism scales without changing content") {
    def canon(pages: Int) = ticks(1000L, pages)
      .select("tick_id", "ts", "symbol", "price")
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(canon(1) === canon(7))
  }

  test("aggregate pushdown: count/min/max answered without generating rows") {
    val df = ticks().filter(col("tick_id") >= 100L && col("tick_id") < 900L)
      .agg(count(lit(1)).as("n"), min(col("tick_id")).as("lo"),
        max(col("tick_id")).as("hi"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates=[count(*),min(tick_id),max(tick_id)]"), plan)
    val r = df.head()
    assert(r.getLong(0) === 800L && r.getLong(1) === 100L && r.getLong(2) === 899L)
  }

  test("aggregate pushdown declines non-monotone columns (falls back to scan)") {
    val df = ticks().agg(min(col("price")).as("p"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("PushedAggregates"), plan)
    assert(df.head().getDouble(0) === ticks().select(min("price")).head().getDouble(0))
  }

  test("pushed count over an empty range is 0, min is NULL (not an empty result)") {
    val df = ticks().filter(col("tick_id") >= 50000L)
      .agg(count(lit(1)).as("n"), min(col("tick_id")).as("lo"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates"), plan)
    val r = df.head()
    assert(r.getLong(0) === 0L)
    assert(r.isNullAt(1))
  }

  test("runtime filter narrows the range and prunes pages the key set misses") {
    import org.apache.spark.sql.sources.In
    // drive the SupportsRuntimeFiltering contract directly (the engine
    // calls filter() with the build side's observed keys before planning)
    val scan = new graft.sources.TickScanBuilder(10000L, 8, None).build()
    val rf = scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsRuntimeFiltering]
    assert(rf.filterAttributes().map(_.describe()).toSeq === Seq("tick_id"))
    rf.filter(Array[org.apache.spark.sql.sources.Filter](
      In("tick_id", Array[Any](130L, 180L, 9100L))))
    val parts = scan.toBatch.planInputPartitions()
    // pages are 1250 wide: ids 130/180 live in page 0, 9100 in page 7 —
    // pages 1..6 hold none of the keys and must not be planned
    assert(parts.length === 2, parts.mkString(","))
    assert(scan.description().contains("range=[130,9101)"), scan.description())
  }

  test("runtime-filtered join returns exactly the matching rows") {
    import spark.implicits._
    val keys = Seq(5L, 700L, 1300L, 9999L).toDF("k")
    val got = ticks().join(keys, col("tick_id") === col("k"))
      .select(col("tick_id"), col("price"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val expect = Set(5L, 700L, 1300L, 9999L)
      .map(i => (i, 1.0 + ((i * 7919L) % 10000L).toDouble / 10000.0))
    assert(got === expect)
  }

  test("post-pushdown statistics drive auto-broadcast without a hint") {
    // a 200-row pushed slice reports ~200 rows via SupportsReportStatistics,
    // far under the broadcast threshold -> the UNHINTED join broadcasts the
    // tick side; the full 10k feed against threshold 1KB does not
    val slim = ticks().filter(col("tick_id") >= 100L && col("tick_id") < 300L)
    val fat = spark.range(0, 100000L).toDF("k")
    val joined = fat.join(slim, col("k") === col("tick_id"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(joined.count() === 200L)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
      val wide = fat.join(ticks(), col("k") === col("tick_id"))
      val widePlan = wide.queryExecution.executedPlan.toString
      assert(!widePlan.contains("BroadcastHashJoin"), widePlan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("limit pushdown clips the id range after pushed filters") {
    val df = ticks().filter(col("tick_id") >= 1000L).limit(50)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("range=[1000,1050)"), plan)
    val ids = df.collect().map(_.getLong(0)).sorted.toSeq
    assert(ids === (1000L until 1050L).toSeq)
  }
}
