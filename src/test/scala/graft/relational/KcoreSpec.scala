package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.RelationalQueries

/** kcore_parts: the peeling semantics pinned against an independent
  * in-memory recompute, plus the fixpoint/idempotence properties the
  * early-exit relies on.
  */
class KcoreSpec extends SparkSpec {

  private def collectedGraph(): (Set[(Long, Long)], Long) = {
    val d = graft.Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("it")).distinct()
    val edges = d.as("d1").join(d.as("d2"), Seq("ok"))
      .filter(col("d1.it") < col("d2.it"))
      .select(col("d1.it"), col("d2.it")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val verts = edges.flatMap(e => Seq(e._1, e._2))
    val k = if (verts.isEmpty) 0L else (13L * edges.size) / (10L * verts.size)
    (edges, k)
  }

  private def naivePeel(edges0: Set[(Long, Long)], k: Long): Map[Long, Int] = {
    var edges = edges0
    var changed = true
    while (changed) {
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= k).keySet
      val next = edges.filter(e => keep(e._1) && keep(e._2))
      changed = next.size != edges.size
      edges = next
    }
    edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size).toMap
  }

  test("kcore_parts equals a naive iterate-to-fixpoint peel") {
    val (edges, k) = collectedGraph()
    val expect = naivePeel(edges, k)
    val got = RelationalQueries.kcoreParts(spark, sf0001)
      .collect().map(r => r.getAs[Long]("p_partkey") -> r.getAs[Long]("degree").toInt).toMap
    assert(got === expect)
    assert(got.nonEmpty, "core must be non-empty at the chosen subcritical k")
    val vstart = edges.flatMap(e => Seq(e._1, e._2))
    assert(got.size < vstart.size, "peeling must remove at least one vertex")
  }

  test("kcore_parts: every surviving degree meets the k threshold (fixpoint reached)") {
    val (_, k) = collectedGraph()
    val rows = RelationalQueries.kcoreParts(spark, sf0001).collect()
    rows.foreach(r => assert(r.getAs[Long]("degree") >= k,
      s"vertex ${r.getAs[Long]("p_partkey")} below k=$k at fixpoint"))
  }

  test("kcore_parts: above the broadcast gate the shuffle path is bit-equal") {
    val hinted = RelationalQueries.kcoreParts(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val got = RelationalQueries
        .kcoreParts(spark, sf0001, maxRounds = 12, broadcastRowLimit = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === hinted)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("broadcastIfAtMost: the gate drops the hint above the limit (shuffle semi-join)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val e = spark.range(1000).selectExpr("id AS u", "id % 100 AS w")
      val keep = spark.range(50).selectExpr("id AS x")
      val over = e.join(
        RelationalQueries.broadcastIfAtMost(50L, 0L)(keep).as("k1"),
        col("u") === col("k1.x"), "left_semi")
      val overPlan = over.queryExecution.executedPlan.toString
      assert(!overPlan.contains("BroadcastHashJoin"), overPlan)
      assert(overPlan.contains("SortMergeJoin") || overPlan.contains("ShuffledHashJoin"),
        overPlan)
      val under = e.join(
        RelationalQueries.broadcastIfAtMost(50L, 100L)(keep).as("k2"),
        col("u") === col("k2.x"), "left_semi")
      assert(under.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("kcore_parts: extra rounds past the fixpoint change nothing (early-exit soundness)") {
    val a = RelationalQueries.kcoreParts(spark, sf0001, maxRounds = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = RelationalQueries.kcoreParts(spark, sf0001, maxRounds = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a === b)
  }
}
