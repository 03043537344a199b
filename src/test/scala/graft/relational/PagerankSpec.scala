package graft.relational

import graft.SparkSpec
import graft.queries.RelationalQueries

/** pagerank_authority: the whale-vertex scale property is a PLAN property —
  * per-vertex sums must aggregate with map-side partials (per-group state =
  * one decimal), never buffer the in-edge list per dst. The oracle row proves
  * values; this pins the shape so a refactor back to a collect_list fold
  * fails a test, not a scale review. Plus the round-count and convergence
  * properties the oracle rows cannot see.
  */
class PagerankSpec extends SparkSpec {

  private def rankMap(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.select("v", "rank").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("rank rounds aggregate with map-side partial sums, no per-group lists") {
    val plan = RelationalQueries.pagerankAuthority(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum"), plan.linesIterator.take(5).mkString("\n"))
    assert(!plan.contains("collect_list"),
      "whale-vertex fold reintroduced: per-dst state would be O(in-degree)")
  }

  test("20-round variant actually iterates further: same vertices, moved ranks") {
    val r5 = rankMap(RelationalQueries.pagerankAuthority(spark, sf0001))
    val r20 = rankMap(RelationalQueries.pagerankAuthority20(spark, sf0001))
    assert(r5.nonEmpty)
    assert(r5.keySet === r20.keySet, "round count must not change the vertex set")
    // a regression where the 20-round query silently runs 5 rounds would
    // make the maps identical; 15 extra damped rounds must move some rank
    assert(r5 !== r20, "20 rounds produced bit-identical ranks to 5 rounds")
    // and both must match the shared implementation run at their count
    assert(r5 === rankMap(RelationalQueries.pagerankRanks(spark, sf0001, 5)))
    assert(r20 === rankMap(RelationalQueries.pagerankRanks(spark, sf0001, 20)))
  }

  test("ppr_segment: mass conserved, concentrated on the seed segment, map-side partials") {
    val df = RelationalQueries.pprSegment(spark, sf0001)
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    // total restart mass is 1 and the symmetric graph has no dangling
    // vertices, so total rank stays 1 up to quantization drift + pround
    val total = rows.map(_._3).sum
    assert(math.abs(total - 1.0) < 1e-3, s"mass leaked: $total")
    // personalization: seeds (nation-7 customers in the graph) must hold
    // more average mass than non-seeds — the property that distinguishes
    // PPR from the global rank
    val seedIds = graft.Tables.customer(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("c_nationkey") === 7)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val (seed, non) = rows.partition(r => seedIds.contains(r._1))
    assert(seed.nonEmpty && non.nonEmpty)
    assert(seed.map(_._3).sum / seed.size > non.map(_._3).sum / non.size,
      "seed segment must out-rank the background on average")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum"))
    assert(!plan.contains("collect_list"))
  }

  test("convergence termination stops before the cap and equals the fixed-round run") {
    val (df, rounds) =
      RelationalQueries.pagerankRanksUntil(spark, sf0001, eps = 2.0, maxRounds = 40)
    assert(rounds < 40, s"L1 delta never dropped below eps within $rounds rounds")
    assert(rounds > 1, "eps so loose the loop is vacuous")
    // the converged frame IS the fixed-round frame of the same length —
    // same quantized iteration, bit-for-bit (node_type and pround included)
    val fixed = RelationalQueries.pagerankRanks(spark, sf0001, rounds)
    assert(df.collect().map(_.mkString("|")).toSeq ===
      fixed.collect().map(_.mkString("|")).toSeq)
    // monotonicity: a looser eps can only stop at or before this round
    val (_, loose) =
      RelationalQueries.pagerankRanksUntil(spark, sf0001, eps = 10.0, maxRounds = 40)
    assert(loose <= rounds,
      s"loose eps stopped at $loose rounds, after tight eps at $rounds")
  }
}
