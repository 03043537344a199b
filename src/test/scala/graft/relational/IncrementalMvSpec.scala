package graft.relational

import org.apache.spark.sql.Row

import graft.SparkSpec

/** mvApplyRetractions: the zero-drain arm. The driver's `incremental_mv_deletes`
  * oracle row proves retraction == recompute on real data, but no group in
  * the testdata ever loses ALL its rows — so the `n > 0` drop-out branch is
  * pinned here on a synthetic fixture where one group fully drains.
  */
class IncrementalMvSpec extends SparkSpec {

  test("retractions subtract exactly and fully-drained groups drop out") {
    import spark.implicits._
    val base = Seq(
      (1L, "error", 1.25), (1L, "error", 2.50), // fully deleted below
      (1L, "click", 3.00), (1L, "click", 0.75),
      (2L, "error", 1.00), (2L, "error", 4.00), (2L, "error", 0.50)
    ).toDF("user_id", "event_type", "value")
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
}
