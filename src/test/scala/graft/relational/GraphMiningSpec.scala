package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.RelationalQueries

/** assoc_rules + graph_triangles: internal-consistency properties that the
  * driver's DuckDB oracle cannot express (it only re-states the same SQL).
  */
class GraphMiningSpec extends SparkSpec {

  test("assoc_rules: support/confidence/lift are consistent and bounded") {
    val rules = RelationalQueries.assocRules(spark, sf0001).collect()
    assert(rules.nonEmpty)
    rules.foreach { r =>
      val (sup, conf, lift) =
        (r.getAs[Double]("support"), r.getAs[Double]("confidence"), r.getAs[Double]("lift"))
      assert(sup > 0.0 && sup <= 1.0)
      assert(conf >= sup - 1e-9, "confidence >= support: n_a <= n_baskets")
      assert(conf <= 1.0 + 1e-9)
      assert(lift > 0.0)
      assert(r.getAs[Long]("n_ab") >= 5L, "min-support gate")
    }
    // output is the top-20 by lift, descending
    val lifts = rules.map(_.getAs[Double]("lift")).toSeq
    assert(lifts == lifts.sortBy(-_))
    assert(rules.length <= 20)
  }

  test("assoc_rules: pair counts are symmetric (n_ab == n_ba on the full pair set)") {
    // recompute the un-limited directed pair relation and assert symmetry —
    // a property the top-20 projection can hide
    val items = graft.Tables.lineitem(spark, sf0001)
      .join(graft.Tables.part(spark, sf0001), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("ok"), col("p_brand").as("item")).distinct()
    val pairs = items.as("a").join(items.as("b"), Seq("ok"))
      .filter(col("a.item") =!= col("b.item"))
      .groupBy(col("a.item").as("x"), col("b.item").as("y")).agg(count(lit(1)).as("n"))
    val asym = pairs.as("p").join(pairs.as("q"),
        col("p.x") === col("q.y") && col("p.y") === col("q.x"))
      .filter(col("p.n") =!= col("q.n")).count()
    assert(asym === 0L)
  }

  test("graph_triangles: degree-ordered enumeration equals canonical id-ordered count") {
    // canonical recount: u<v<w id-ordered closure (the oracle's formulation),
    // computed independently here over the same co-order graph
    val d = graft.Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("it")).distinct()
    val ed = d.as("d1").join(d.as("d2"), Seq("ok"))
      .filter(col("d1.it") < col("d2.it"))
      .select(col("d1.it").as("u"), col("d2.it").as("v")).distinct()
    val tri = ed.as("e1").join(ed.as("e2"), col("e1.v") === col("e2.u"))
      .join(ed.as("e3"), col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .select(explode(array(col("e1.u"), col("e1.v"), col("e2.v"))).as("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("p")).limit(20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = RelationalQueries.graphTriangles(spark, sf0001)
      .collect().map(r => (r.getAs[Long]("p_partkey"), r.getAs[Long]("n_triangles"))).toSeq
    assert(got === tri)
    assert(got.nonEmpty)
  }

  test("graph_triangles plan: broadcast probes only — the wedge stream never shuffles") {
    val plan = RelationalQueries.graphTriangles(spark, sf0001)
      .queryExecution.executedPlan.toString
    // two broadcast-hash probes (wedge + closure) over the scratch scan
    assert(plan.split("BroadcastHashJoin").length - 1 === 2, plan)
    // the only hash exchange is the 20k-group aggregate's final round —
    // wedges flow scan→probe→probe→partial-agg inside one pipeline
    assert(plan.split("Exchange hashpartitioning").length - 1 === 1, plan)
    // top-20 is TakeOrdered, not a global sort exchange
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("graph_triangles: above the broadcast gate the shuffle path is bit-equal") {
    val hinted = RelationalQueries.graphTriangles(spark, sf0001)
      .collect().map(r => (r.getAs[Long]("p_partkey"), r.getAs[Long]("n_triangles"))).toSeq
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // -1 disables planner AND AQE broadcast conversion: with the gate at 0
    // rows, no hint survives, so this is exactly the 100 TB plan
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = RelationalQueries.graphTriangles(spark, sf0001, broadcastRowLimit = 0L)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      val got = df.collect()
        .map(r => (r.getAs[Long]("p_partkey"), r.getAs[Long]("n_triangles"))).toSeq
      assert(got === hinted)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("assoc_rules plan: dimension and count relations broadcast; no cartesian") {
    val plan = RelationalQueries.assocRules(spark, sf0001)
      .queryExecution.executedPlan.toString
    // part dim + the two item-frequency relations ride in as broadcasts
    assert(plan.split("BroadcastHashJoin").length - 1 >= 3, plan)
    // the 1-row consts relation joins as a broadcast loop, never cartesian
    assert(plan.split("BroadcastNestedLoopJoin").length - 1 === 1, plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("graph_triangles: orientation bounds out-degree by the sqrt(2m) envelope") {
    // the scale property the orientation exists for: no oriented out-degree
    // exceeds ~sqrt(2m) (ties can push one past the exact bound; allow 2x)
    val d = graft.Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("it")).distinct()
    val ed = d.as("d1").join(d.as("d2"), Seq("ok"))
      .filter(col("d1.it") < col("d2.it"))
      .select(col("d1.it").as("u"), col("d2.it").as("v")).distinct()
    val m = ed.count()
    val deg = ed.select(col("u").as("x")).unionAll(ed.select(col("v").as("x")))
      .groupBy(col("x")).agg(count(lit(1)).as("deg"))
    val oriented = ed
      .join(deg.select(col("x").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("x").as("v"), col("deg").as("dv")), Seq("v"))
      .select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          col("u")).otherwise(col("v")).as("src"))
    val maxOut = oriented.groupBy(col("src")).agg(count(lit(1)).as("out"))
      .agg(max(col("out"))).head().getLong(0)
    assert(maxOut <= 2L * math.ceil(math.sqrt(2.0 * m)).toLong,
      s"max oriented out-degree $maxOut vs sqrt(2m) bound for m=$m")
  }
}
