package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.RelationalQueries

/** bfs_hops internal-consistency properties beyond the oracle's CTE-chain
  * restatement: seed-set shape, min-hop uniqueness, and an independent
  * recount of the 1-hop frontier.
  */
class BfsSpec extends SparkSpec {

  private lazy val hist =
    RelationalQueries.bfsHops(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("hop"), r.getAs[Long]("n_parts"),
        r.getAs[Long]("min_part"), r.getAs[Long]("max_part"))).toSeq

  private lazy val graph = {
    val d = graft.Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("it")).distinct()
    val half = d.as("d1").join(d.as("d2"), Seq("ok"))
      .filter(col("d1.it") < col("d2.it"))
      .select(col("d1.it").as("src"), col("d2.it").as("dst")).distinct()
    half.unionAll(half.select(col("dst").as("src"), col("src").as("dst")))
  }

  test("hop 0 is exactly the 3 smallest vertices of the edge relation") {
    val seeds = graph.select(col("src")).distinct()
      .orderBy(col("src")).limit(3).collect().map(_.getLong(0)).toSeq
    val h0 = hist.find(_._1 == 0L).get
    assert(h0._2 === 3L)
    assert(h0._3 === seeds.min)
    assert(h0._4 === seeds.max)
  }

  test("hop 1 matches an independent neighborhood recount") {
    val seeds = graph.select(col("src")).distinct()
      .orderBy(col("src")).limit(3).collect().map(_.getLong(0)).toSeq
    val n1 = graph.filter(col("src").isin(seeds: _*))
      .select(col("dst")).distinct()
      .filter(!col("dst").isin(seeds: _*))
      .count()
    val h1 = hist.find(_._1 == 1L).map(_._2).getOrElse(0L)
    assert(h1 === n1)
  }

  test("sssp: seeds at distance 0, every distance realizable, fixpoint sane") {
    val rows = RelationalQueries.ssspWeighted(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("d"), r.getAs[Long]("n_parts"))).toMap
    // the 3 seeds sit at distance 0
    assert(rows.getOrElse(0L, 0L) === 3L)
    // weighted distances are nonnegative and the reachable set is bounded
    // by the vertex universe
    assert(rows.keys.forall(_ >= 0L))
    val nVerts = graph.select(col("src")).distinct().count()
    assert(rows.values.sum <= nVerts)
  }

  test("sssp: a weighted distance never exceeds maxWeight * its BFS hop count") {
    // dist(v) <= 7 * hops(v) for every vertex both label (edge weights are
    // 1..7 and both run the same 4 rounds), and dist(v) >= hops(v) since
    // weights are >= 1 — pinning that the relaxation really is min-plus
    // over the same graph, not a rescaled hop count
    val hops = RelationalQueries.bfsHops(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("hop"), r.getAs[Long]("n_parts"))).toMap
    val dists = RelationalQueries.ssspWeighted(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("d"), r.getAs[Long]("n_parts"))).toMap
    val maxHop = hops.keys.max
    val maxDist = dists.keys.max
    assert(maxDist <= 7L * maxHop)
    assert(maxDist >= maxHop)
    // identical coverage: round r of Bellman-Ford relaxes every path of
    // <= r edges, exactly the <= r-hop reachable set BFS labels
    assert(hops.values.sum === dists.values.sum)
  }

  test("hops are contiguous from 0 and total coverage never exceeds |V|") {
    val hops = hist.map(_._1).sorted
    assert(hops === (0L until hops.length.toLong))
    val nv = graph.select(col("src")).distinct().count()
    assert(hist.map(_._2).sum <= nv)
    // min-hop uniqueness: a vertex appears under exactly one hop, so each
    // hop's [min_part, max_part] envelope holds n_parts >= 1 rows
    hist.foreach { case (_, n, lo, hi) =>
      assert(n >= 1L && lo <= hi)
    }
  }
}
