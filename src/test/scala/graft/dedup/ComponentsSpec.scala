package graft.dedup

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.queries.DedupQueries

/** Connected-components invariants: fixpoint labels on a hand-built graph
  * (chains force >1 propagation round), and the corpus-level clustering
  * query's structural guarantees.
  */
class ComponentsSpec extends SparkSpec {

  test("min-label propagation: chains, pairs, and singletons all converge") {
    import spark.implicits._
    // component {1,2,3,9} is a chain 9-3-2-1 (diameter 3: needs multiple
    // rounds), {5,6} a pair, {4,7} singletons
    val vertices = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 9L).toDF("v")
    val edges = Seq((2L, 1L), (3L, 2L), (9L, 3L), (5L, 6L)).toDF("a", "b")
    val got = Components.connectedComponents(vertices, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L,
      4L -> 4L, 5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("long chain (diameter 32): fixpoint correct; star variant needs O(log n) rounds") {
    import spark.implicits._
    // a 33-vertex path 0-1-…-32 — the adversarial shape for min-label
    // propagation (label 0 travels one hop per round), far beyond the
    // shallow diameters LSH near-dup graphs produce. This pins the
    // documented boundary: min-propagation pays O(diameter) rounds and
    // still reaches the provable fixpoint; large-star/small-star closes
    // the same graph in O(log n).
    val n = 33
    val vertices = (0L until n.toLong).toDF("v")
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("a", "b")

    val (lblProp, roundsProp) =
      Components.connectedComponentsCounted(vertices, edges)
    val propMap = lblProp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(propMap === (0L until n.toLong).map(_ -> 0L).toMap)
    // 32 propagation rounds + the final no-change round proving the fixpoint
    assert(roundsProp === n, s"min-propagation rounds: $roundsProp")

    val (lblStar, roundsStar) =
      Components.connectedComponentsStarCounted(vertices, edges)
    val starMap = lblStar.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(starMap === propMap)
    assert(roundsStar <= 8, s"star rounds: $roundsStar (expected O(log n))")
    assert(roundsStar < roundsProp)
  }

  test("star variant matches min-propagation on chains, pairs, and singletons") {
    import spark.implicits._
    val vertices = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 9L).toDF("v")
    val edges = Seq((2L, 1L), (3L, 2L), (9L, 3L), (5L, 6L)).toDF("a", "b")
    val got = Components.connectedComponentsStar(vertices, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L,
      4L -> 4L, 5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("seeded random graph: both algorithms match a local union-find oracle") {
    import spark.implicits._
    // 200 vertices, 180 random edges (seed 7): sparse enough for many
    // components of varied shape, dense enough for multi-edge merges.
    // Ground truth is an in-memory union-find with min-root labels — an
    // independent third implementation both distributed variants must match.
    val rng = new scala.util.Random(7)
    val n = 200
    val edges = Seq.fill(180)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = (0 until n).map(v => v.toLong -> find(v).toLong).toMap
    val vertices = (0L until n.toLong).toDF("v")
    val edgesDf = edges.toDF("a", "b")
    val gotProp = Components.connectedComponents(vertices, edgesDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotStar = Components.connectedComponentsStar(vertices, edgesDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotProp === want)
    assert(gotStar === want)
  }

  test("dedup_clusters: total labeling, pair-consistent, sizes partition the corpus") {
    val docs = Tables.documents(spark, sf0001)
    val out = DedupQueries.dedupClusters(spark, sf0001).collect()
    // one row per document, label never exceeds the member id
    assert(out.length === docs.count())
    assert(out.forall(r => r.getAs[Long]("cluster_id") <= r.getAs[Long]("doc_id")))
    // cluster sizes are consistent and partition the corpus
    val byCluster = out.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("cluster_size")).distinct.length === 1)
      assert(rows.head.getAs[Long]("cluster_size") === rows.length.toLong)
    }
    // every gated near-dup pair ended up in the same cluster
    val label = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    val pairs = DocDedup.estimatedJaccardPairs(docs)
      .filter(col("est_jaccard") >= 0.5)
      .select("doc_id_a", "doc_id_b").collect()
    assert(pairs.nonEmpty, "fixture should contain at least one near-dup pair")
    pairs.foreach { p =>
      assert(label(p.getLong(0)) === label(p.getLong(1)),
        s"pair ${p.getLong(0)}~${p.getLong(1)} split across clusters")
    }
  }
}
