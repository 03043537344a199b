package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.Funnel.{Chain, Ev}

/** Funnel state-machine corners the single-batch gate replay cannot see:
  * chains whose steps STRADDLE batch boundaries (resume-from-state), the
  * nearest-successor kill rule, strictness at equal timestamps, and the
  * prune bound.
  */
class FunnelStreamSpec extends SparkSpec {

  private val HourUs = 3600000000L

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def runBatches(name: String, batches: Seq[Seq[Ev]]): Seq[Chain] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val src = MemoryStream[Ev]
    val q = Funnel.chains(src.toDS(), HourUs)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => src.addData(b); q.processAllAvailable() }
    } finally q.stop()
    import spark.implicits._
    spark.table(name).as[Chain].collect().toSeq
      .sortBy(c => (c.user_id, c.view_ts.getTime))
  }

  test("a chain straddling two batch boundaries completes exactly once") {
    val out = runBatches("funnel_straddle", Seq(
      Seq(Ev(1L, ts(100), "view")),
      Seq(Ev(1L, ts(700), "click")),       // 10 min after the view
      Seq(Ev(1L, ts(1300), "purchase")))) // 10 min after the click
    assert(out.map(c => (c.user_id, c.view_ts.getTime / 1000L,
      c.click_ts.getTime / 1000L, c.purchase_ts.getTime / 1000L))
      === Seq((1L, 100L, 700L, 1300L)))
  }

  test("nearest-successor kill: an out-of-window first click ends the chain forever") {
    val out = runBatches("funnel_kill", Seq(
      Seq(Ev(1L, ts(100), "view"),
        Ev(1L, ts(100 + 7200), "click"),      // first click 2h later: kills
        Ev(1L, ts(100 + 7300), "purchase")))) // would have been in range of the click
    assert(out.isEmpty)
  }

  test("equal timestamps never chain (strict successor)") {
    val out = runBatches("funnel_strict", Seq(
      Seq(Ev(1L, ts(100), "view"), Ev(1L, ts(100), "click"),
        Ev(1L, ts(200), "purchase"))))
    // the click at the view's own ts is not a successor; with no later
    // click the view expires -> no chain
    assert(out.isEmpty)
  }

  test("one click resolves several waiting views; duplicates collapse") {
    val out = runBatches("funnel_multi", Seq(
      Seq(Ev(1L, ts(100), "view"), Ev(1L, ts(100), "view"), // duplicate
        Ev(1L, ts(200), "view"),
        Ev(1L, ts(300), "click"),
        Ev(1L, ts(400), "purchase"))))
    assert(out.length === 2, out.toString) // views 100 and 200, dup collapsed
    assert(out.map(_.view_ts.getTime / 1000L) === Seq(100L, 200L))
    assert(out.forall(_.purchase_ts.getTime / 1000L == 400L))
  }

  test("pruning: stale pending state is dropped, later events start fresh") {
    val out = runBatches("funnel_prune", Seq(
      Seq(Ev(1L, ts(100), "view")),
      // 3h of silence: the view is unreachable by any future click
      Seq(Ev(1L, ts(100 + 10900), "view"),
        Ev(1L, ts(100 + 11000), "click"),
        Ev(1L, ts(100 + 11100), "purchase"))))
    assert(out.map(_.view_ts.getTime / 1000L) === Seq(11000L))
  }
}
