package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.RelationalQueries

/** label_prop: internal-consistency properties the driver's DuckDB oracle
  * cannot see. The load-bearing one is determinism — `max_by` picks
  * arbitrarily among TIED ordering keys, so the argmax key must be unique
  * within every vertex's candidate set; a refactor that drops the `−label`
  * tiebreak component would stay green on the oracle only by luck, and
  * fails here.
  */
class LabelPropSpec extends SparkSpec {

  private def communities(): Map[Long, Long] =
    RelationalQueries.labelProp(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap

  test("deterministic: two runs produce identical community assignments") {
    val a = communities()
    val b = communities()
    assert(a.nonEmpty)
    assert(a === b, "max_by tiebreak must be unique — ties picked arbitrarily")
  }

  test("labels coalesce: fewer communities than vertices, ids from the vertex set") {
    val out = RelationalQueries.labelProp(spark, sf0001).collect()
    val verts = out.map(_.getLong(0)).toSet
    val comms = out.map(_.getLong(2)).toSet
    assert(comms.subsetOf(verts), "a community id is always some vertex's id")
    assert(comms.size < verts.size, "4 rounds must merge at least one label")
    out.foreach { r =>
      val (v, t) = (r.getLong(0), r.getString(1))
      assert(t === (if (v < 0) "supplier" else "customer"))
    }
  }

  test("one round of max_by equals the windowed plurality argmax") {
    // independent formulation of a propagation round: per-dst plurality
    // with (cnt DESC, label ASC) row_number — the oracle's shape — must
    // equal the engine's (cnt, −label) max_by fold on the same input
    val pairs = graft.Tables.orders(spark, sf0001)
      .join(graft.Tables.lineitem(spark, sf0001),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), (-col("l_suppkey")).as("p"))
      .distinct()
    val edges = pairs.select(col("c").as("src"), col("p").as("dst"))
      .union(pairs.select(col("p").as("src"), col("c").as("dst")))
    val l0 = edges.select(col("src").as("v")).distinct()
      .withColumn("label", col("v"))
    val counted = edges.join(l0, edges("src") === l0("v"))
      .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("cnt"))
    val viaMaxBy = counted.groupBy(col("dst"))
      .agg(max_by(col("label"), struct(col("cnt"), (-col("label")).as("nl")))
        .as("label"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("dst")).orderBy(col("cnt").desc, col("label").asc)
    val viaWindow = counted.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaMaxBy === viaWindow)
    assert(viaMaxBy.nonEmpty)
  }

  test("rounds aggregate with map-side partials, no per-vertex label lists") {
    // the per-round job shape (rounds now execute as scratch-write jobs,
    // so the final df's plan no longer contains them — assert on a round
    // built exactly as labelPropagate builds it)
    val pairs = graft.Tables.orders(spark, sf0001)
      .join(graft.Tables.lineitem(spark, sf0001),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), (-col("l_suppkey")).as("p"))
      .distinct()
    val edges = pairs.select(col("c").as("src"), col("p").as("dst"))
      .union(pairs.select(col("p").as("src"), col("c").as("dst")))
    val l0 = edges.select(col("src").as("v")).distinct()
      .withColumn("label", col("v"))
    val round = edges.join(l0, edges("src") === l0("v"))
      .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("dst"))
      .agg(max_by(col("label"), struct(col("cnt"), (-col("label")).as("nl")))
        .as("label"))
    val plan = round.queryExecution.executedPlan.toString
    assert(plan.contains("partial_max_by") || plan.contains("partial_maxby") ||
      plan.contains("partial_max"), plan.linesIterator.take(8).mkString("\n"))
    assert(!plan.contains("collect_list"),
      "per-vertex neighbor-label fold reintroduced: state would be O(degree)")
  }

  test("fixpoint early exit: a converged label vector stops before the round cap") {
    import spark.implicits._
    // triangle 1-2-3: l1=(1→2,2→1,3→1), l2=(1,1,1), l3=l2 → exit at 3
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val edges = tri.select(col("a").as("src"), col("b").as("dst"))
      .union(tri.select(col("b").as("src"), col("a").as("dst")))
    val (labels10, rounds) = RelationalQueries.labelPropagate(edges, maxRounds = 10)
    assert(rounds === 3, s"expected fixpoint exit at round 3, ran $rounds")
    val got = labels10.orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 1L), (2L, 1L), (3L, 1L)))
    // early exit is bit-identical to running the cap out
    val (labelsCap, _) = RelationalQueries.labelPropagate(edges, maxRounds = 3)
    assert(labelsCap.orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      === got)
  }

  test("modularity: contributions bounded, intra edges never exceed degree mass") {
    val rows = RelationalQueries.modularityScore(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val (n, intra, dsum, q) = (r.getAs[Long]("n_nodes"),
        r.getAs[Long]("intra_edges"), r.getAs[Long]("degree_sum"),
        r.getAs[Double]("q_contrib"))
      assert(n > 0L)
      // each intra edge contributes 2 to the community's degree sum
      assert(2L * intra <= dsum, s"intra=$intra dsum=$dsum")
      // Q_c ∈ (-0.25, 1): the random-expectation term is at most
      // (d_c/2m)² ≤ 1/4 of itself... more precisely Q_c <= m_c/m <= 1
      assert(q <= 1.0 && q >= -1.0)
    }
    // ordered by size desc
    val sizes = rows.map(_.getAs[Long]("n_nodes")).toSeq
    assert(sizes == sizes.sortBy(-_))
  }
}
