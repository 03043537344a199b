package graft.relational

import org.apache.spark.sql.Row

import graft.SparkSpec

/** mvApplyRetractions / mvApplyUpdates: the arms the driver data cannot
  * reach. The `incremental_mv_deletes` / `incremental_mv_updates` oracle
  * rows prove delta == recompute on real data, but (a) no group in the
  * testdata ever loses ALL its rows, (b) no driver batch ever violates the
  * subset/known-key contract, and (c) the update==retract+insert
  * equivalence needs a row-level recompute to compare against — so those
  * branches are pinned here on synthetic fixtures.
  */
class IncrementalMvSpec extends SparkSpec {

  private def base = {
    import spark.implicits._
    Seq(
      (1L, "error", 1.25), (1L, "error", 2.50), // fully deleted below
      (1L, "click", 3.00), (1L, "click", 0.75),
      (2L, "error", 1.00), (2L, "error", 4.00), (2L, "error", 0.50)
    ).toDF("user_id", "event_type", "value")
  }

  test("retractions subtract exactly and fully-drained groups drop out") {
    import spark.implicits._
    val deletes = Seq(
      (1L, "error", 1.25), (1L, "error", 2.50), // drains (1, error) to zero
      (2L, "error", 4.00)
    ).toDF("user_id", "event_type", "value")

    val out = graft.queries.RelationalQueries
      .mvApplyRetractions(base, deletes).collect().toSeq

    assert(out === Seq(
      Row(1L, "click", 2L, 3.75),
      Row(2L, "error", 2L, 1.50)))
    // the drained group is gone entirely, not present with n=0
    assert(!out.exists(r => r.getLong(0) == 1L && r.getString(1) == "error"))
  }

  private def rootMessages(t: Throwable): String =
    if (t == null) "" else s"${t.getMessage}\n${rootMessages(t.getCause)}"

  test("over-retraction fails loudly instead of vanishing as a drained group") {
    import spark.implicits._
    // three deletes against a group that only has two rows: a caller
    // contract violation, indistinguishable from a drain under a silent
    // n > 0 filter — must raise instead
    val over = Seq(
      (1L, "error", 1.25), (1L, "error", 2.50), (1L, "error", 9.99)
    ).toDF("user_id", "event_type", "value")

    val e = intercept[Exception] {
      graft.queries.RelationalQueries.mvApplyRetractions(base, over).collect()
    }
    assert(rootMessages(e).contains("not a subset"),
      s"expected the subset-contract error, got: ${rootMessages(e)}")
  }

  test("an update batch equals retract-then-insert at the row level") {
    import spark.implicits._
    // re-state two rows' values; (1, error) corrected up, (2, error) down
    val updates = Seq(
      (1L, "error", 1.25, 10.00),
      (2L, "error", 4.00, 2.00)
    ).toDF("user_id", "event_type", "value", "new_value")
    val noUpdates =
      Seq.empty[(Long, String, Double, Double)]
        .toDF("user_id", "event_type", "value", "new_value")

    // row-level retract+insert: base minus the old rows, plus the new rows
    val corrected = Seq(
      (1L, "error", 10.00), (1L, "error", 2.50),
      (1L, "click", 3.00), (1L, "click", 0.75),
      (2L, "error", 1.00), (2L, "error", 2.00), (2L, "error", 0.50)
    ).toDF("user_id", "event_type", "value")

    val viaDelta = graft.queries.RelationalQueries
      .mvApplyUpdates(base, updates).collect().toSeq
    // empty update batch ⇒ mvApplyUpdates is the plain MV aggregate
    val recompute = graft.queries.RelationalQueries
      .mvApplyUpdates(corrected, noUpdates).collect().toSeq

    assert(viaDelta === recompute)
    assert(viaDelta === Seq(
      Row(1L, "click", 2L, 3.75),
      Row(1L, "error", 2L, 12.50),
      Row(2L, "error", 3L, 3.50)))
  }

  test("a mixed CDC batch equals the row-level recompute") {
    import spark.implicits._
    // one pass: insert a brand-new key, insert onto an existing key,
    // delete one row, update one row
    val batch = Seq(
      (5L, "view", "insert", 7.00, Double.NaN),   // new key
      (1L, "click", "insert", 1.00, Double.NaN),  // existing key grows
      (2L, "error", "delete", 4.00, Double.NaN),  // one row removed
      (1L, "error", "update", 1.25, 10.00)        // one row re-stated
    ).toDF("user_id", "event_type", "op", "value", "new_value")

    // the same change applied at the row level
    val corrected = Seq(
      (1L, "error", 10.00), (1L, "error", 2.50),
      (1L, "click", 3.00), (1L, "click", 0.75), (1L, "click", 1.00),
      (2L, "error", 1.00), (2L, "error", 0.50),
      (5L, "view", 7.00)
    ).toDF("user_id", "event_type", "value")
    val noUpdates =
      Seq.empty[(Long, String, Double, Double)]
        .toDF("user_id", "event_type", "value", "new_value")

    val viaCdc = graft.queries.RelationalQueries
      .mvApplyCdc(base, batch).collect().toSeq
    val recompute = graft.queries.RelationalQueries
      .mvApplyUpdates(corrected, noUpdates).collect().toSeq
    assert(viaCdc === recompute)
    assert(viaCdc.exists(r => r.getLong(0) == 5L && r.getString(1) == "view"))
  }

  test("CDC contract violations fail loudly") {
    import spark.implicits._
    // update on a key absent from base, with no net insert for it
    val orphanUpdate = Seq(
      (9L, "error", "update", 1.00, 2.00)
    ).toDF("user_id", "event_type", "op", "value", "new_value")
    val e1 = intercept[Exception] {
      graft.queries.RelationalQueries.mvApplyCdc(base, orphanUpdate).collect()
    }
    assert(rootMessages(e1).contains("absent from base"),
      s"expected the absent-key error, got: ${rootMessages(e1)}")

    // a batch with an op tag outside {insert, delete, update}
    val badOp = Seq(
      (1L, "error", "upsert", 1.00, 2.00)
    ).toDF("user_id", "event_type", "op", "value", "new_value")
    val e2 = intercept[Exception] {
      graft.queries.RelationalQueries.mvApplyCdc(base, badOp).collect()
    }
    assert(rootMessages(e2).contains("unknown op"),
      s"expected the unknown-op error, got: ${rootMessages(e2)}")
  }

  test("the CDC merge join reuses the aggregate partitioning: two hash exchanges total") {
    // the scale property of the whole MV family: base and batch each
    // shuffle ONCE (map-side partials first), and the full-outer merge
    // join runs on those partitionings with no third exchange — a
    // refactor that breaks partition reuse fails here, not in a review
    val plan = graft.queries.RelationalQueries
      .incrementalMvCdc(spark, sf0001).queryExecution.executedPlan.toString
    assert(plan.split("Exchange hashpartitioning").length - 1 === 2, plan)
    assert(plan.contains("SortMergeJoin") && plan.contains("FullOuter"), plan)
    assert(plan.contains("partial_sum"), plan)
  }

  test("an update for a key absent from base fails loudly") {
    import spark.implicits._
    val unknown = Seq(
      (9L, "error", 1.00, 2.00) // no (9, error) group in base
    ).toDF("user_id", "event_type", "value", "new_value")

    val e = intercept[Exception] {
      graft.queries.RelationalQueries.mvApplyUpdates(base, unknown).collect()
    }
    assert(rootMessages(e).contains("absent from base"),
      s"expected the known-key-contract error, got: ${rootMessages(e)}")
  }
}
