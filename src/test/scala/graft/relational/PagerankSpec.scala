package graft.relational

import graft.SparkSpec

/** pagerank_authority: the whale-vertex scale property is a PLAN property —
  * per-vertex sums must aggregate with map-side partials (per-group state =
  * one decimal), never buffer the in-edge list per dst. The oracle row proves
  * values; this pins the shape so a refactor back to a collect_list fold
  * fails a test, not a scale review.
  */
class PagerankSpec extends SparkSpec {

  test("rank rounds aggregate with map-side partial sums, no per-group lists") {
    val plan = graft.queries.RelationalQueries.pagerankAuthority(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum"), plan.linesIterator.take(5).mkString("\n"))
    assert(!plan.contains("collect_list"),
      "whale-vertex fold reintroduced: per-dst state would be O(in-degree)")
  }

  test("20-round variant equals 5-round ranks when run at 5 rounds") {
    // pagerankRanks is shared; the public surface proof: both queries agree
    // on the graph and differ only in round count — the 5-round prefix of
    // the damped iteration is identical by construction, so the two queries
    // must differ (20 rounds move the ranks) while sharing vertex sets.
    val r5 = graft.queries.RelationalQueries.pagerankAuthority(spark, sf0001)
    val r20 = graft.queries.RelationalQueries.pagerankAuthority20(spark, sf0001)
    val v5 = r5.select("v").collect().map(_.getLong(0)).toSet
    val v20 = r20.select("v").collect().map(_.getLong(0)).toSet
    assert(v5 === v20, "round count must not change the vertex set")
    assert(v5.nonEmpty)
  }
}
