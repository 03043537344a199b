package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property specs for the round-5 analytics/curation additions — each op's
  * defining invariant, asserted independently of the DuckDB oracle gate.
  */
class AnalyticsRound5Spec extends SparkSpec {

  test("funnel_steps: user counts are monotonically non-increasing") {
    val rows = RelationalQueries.funnelSteps(spark, sf001).collect()
    assert(rows.map(_.getAs[String]("step")).toSeq ===
      Seq("1_view", "2_click", "3_purchase"))
    val ns = rows.map(_.getAs[Long]("n_users"))
    assert(ns(0) >= ns(1) && ns(1) >= ns(2),
      "a later funnel stage can never have more users than an earlier one")
    assert(ns(0) > 0, "fixture must have viewers")
    val rates = rows.map(_.getAs[Double]("conv_rate"))
    assert(rates.forall(r => r > 0.0 && r <= 1.0))
    assert(rates(0) === 1.0, "first step converts from itself")
  }

  test("retention_cohorts: offset-0 equals cohort size; offsets non-negative") {
    val rows = RelationalQueries.retentionCohorts(spark, sf001).collect()
    assert(rows.forall(_.getAs[Long]("day_offset") >= 0L),
      "activity cannot precede first-seen")
    // every user is active on their first-seen day, so the offset-0 cell
    // must equal the cohort's total user count
    val cohortSizes = RelationalQueries.retentionCohorts(spark, sf001)
      .filter(col("day_offset") === 0).collect()
      .map(r => r.getAs[java.sql.Date]("cohort_day") -> r.getAs[Long]("n_users")).toMap
    val firstSeen = graft.Tables.events(spark, sf001)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .groupBy(col("user_id")).agg(min(col("d")).as("cohort_day"))
      .groupBy(col("cohort_day")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[java.sql.Date]("cohort_day") -> r.getAs[Long]("n")).toMap
    assert(cohortSizes === firstSeen)
  }

  test("collocations: lift positive, support floor respected, k bounded") {
    val rows = TextQueries.collocations(spark, sf001).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_xy") >= 5L), "support floor")
    val lifts = rows.map(_.getAs[Double]("lift"))
    assert(lifts.forall(_ > 0.0))
    assert(lifts.sameElements(lifts.sortBy(-_)), "ranked by lift desc")
  }

  test("media_phash_pairs: hamming bounded and pairs share a band") {
    val rows = MediaQueries.mediaPhashPairs(spark, sf001).collect()
    assert(rows.nonEmpty, "fixture corpus has near-dup payloads")
    assert(rows.forall(r => r.getAs[Long]("hamming") >= 0L &&
      r.getAs[Long]("hamming") <= 3L))
    // blocking soundness: every emitted pair agrees on at least one band
    val hashes = graft.multimodal.Multimodal.phashStub(
        graft.multimodal.Multimodal.fromDocuments(graft.Tables.documents(spark, sf001)))
      .collect().map(h => h.media_id -> h.phash).toMap
    rows.foreach { r =>
      val (pa, pb) = (hashes(r.getAs[Long]("media_id_a")), hashes(r.getAs[Long]("media_id_b")))
      assert(pa % 65536 == pb % 65536 || pa / 65536 == pb / 65536,
        "pair must come from a shared band bucket")
      assert(java.lang.Long.bitCount(pa ^ pb) === r.getAs[Long]("hamming").toInt)
    }
  }

  test("pagerank_authority: ranks bounded below by the damping base") {
    val rows = RelationalQueries.pagerankAuthority(spark, sf001).collect()
    assert(rows.nonEmpty)
    // every vertex receives at least the teleport mass
    assert(rows.forall(_.getAs[Double]("rank") >= 0.15),
      "rank can never fall below 1 - d")
    val byType = rows.groupBy(_.getAs[String]("node_type")).view.mapValues(_.length).toMap
    assert(byType.keySet === Set("customer", "supplier"))
  }

  test("incremental_mv: merged result equals one-shot recompute in-engine") {
    import org.apache.spark.sql.types.DecimalType
    val mv = RelationalQueries.incrementalMv(spark, sf001)
    val direct = graft.Tables.events(spark, sf001)
      .filter(to_date(col("ts")) <= lit(java.sql.Date.valueOf("2024-01-20")))
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.Parity.pround(
          sum(col("value").cast(DecimalType(30, 10))).cast("double"), 2).as("total"))
      .orderBy(col("user_id"), col("event_type"))
    assert(mv.exceptAll(direct).isEmpty && direct.exceptAll(mv).isEmpty,
      "incremental maintenance must equal the full recompute")
  }
}
