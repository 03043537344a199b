package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Round-12 fifth wave: higher moments, graph assortativity, HLL overlap,
  * PCA projection, and the right-to-be-forgotten purge. */
class Wave5OpsSpec extends SparkSpec {

  test("moments_report: skewness/kurtosis match the driver-side central moments") {
    val got = DriftQueries.momentsReport(spark, sf0001).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("skewness"), r.getAs[Double]("kurtosis_excess"))).toMap
    val byType = Tables.events(spark, sf0001)
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).map { case (t, rs) => t -> rs.map(_.getDouble(1)) }
    def relClose(a: Double, b: Double) =
      math.abs(a - b) <= 1e-5 * math.max(1.0, math.max(math.abs(a), math.abs(b)))
    byType.foreach { case (t, vs) =>
      val n = vs.length.toDouble
      val mu = vs.sum / n
      val m2 = vs.map(v => (v - mu) * (v - mu)).sum / n
      val m3 = vs.map(v => math.pow(v - mu, 3)).sum / n
      val m4 = vs.map(v => math.pow(v - mu, 4)).sum / n
      val (sk, ku) = got(t)
      assert(relClose(sk, m3 / math.pow(m2, 1.5)), s"$t skewness")
      assert(relClose(ku, m4 / (m2 * m2) - 3.0), s"$t kurtosis")
    }
  }

  test("degree_assortativity: equals the driver-side Pearson r over edge degrees") {
    val r = RelationalQueries.degreeAssortativity(spark, sf0001).collect().head
    val o = Tables.orders(spark, sf0001).select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(spark, sf0001).select(col("l_orderkey"), col("l_suppkey"))
    val pairs = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), (-col("l_suppkey")).as("p")).distinct()
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val edges = pairs.flatMap(e => Seq(e, e.swap))
    val deg = edges.groupBy(_._1).map { case (v, es) => v -> es.length.toLong }
    val xy = edges.map { case (u, v) => (deg(u).toDouble, deg(v).toDouble) }
    val n = xy.length.toDouble
    val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
    val sxy = xy.map { case (a, b) => a * b }.sum
    val sxx = xy.map(a => a._1 * a._1).sum
    val syy = xy.map(a => a._2 * a._2).sum
    val want = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(r.getAs[Long]("n_edges") === xy.length.toLong)
    val a = r.getAs[Double]("assortativity")
    assert(math.abs(a - want) < 1e-5, s"assortativity $a vs $want")
    assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9)
  }

  test("hll_overlap: inclusion-exclusion identity, exact overlap recomputed") {
    val rows = RelationalQueries.hllOverlap(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val du = Tables.events(spark, sf0001)
      .select(col("event_type"), col("user_id")).distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val sets = du.groupBy(_._1).map { case (t, rs) => t -> rs.map(_._2).toSet }
    rows.foreach { r =>
      val (ta, tb) = (r.getAs[String]("ta"), r.getAs[String]("tb"))
      assert(ta < tb)
      assert(r.getAs[Long]("exact_overlap") ===
        (sets(ta) intersect sets(tb)).size.toLong)
      // est_overlap is the stated inclusion-exclusion of its own columns
      val ie = r.getAs[Double]("est_a") + r.getAs[Double]("est_b") -
        r.getAs[Double]("est_union")
      assert(math.abs(r.getAs[Double]("est_overlap") - ie) < 1e-5)
      assert(r.getAs[Double]("est_union") > 0.0)
    }
    val k = sets.size
    assert(rows.length === k * (k - 1) / 2)
  }

  test("pca_project: projections are centered and not degenerate") {
    val proj = SimilarityQueries.pcaProject(spark, sf0001).collect()
      .map(_.getAs[Double]("projection"))
    assert(proj.length === Tables.embeddings(spark, sf0001).count())
    val mean = proj.sum / proj.length
    // centered input ⋅ any fixed vector ⇒ zero mean up to the 1e-7 grid
    assert(math.abs(mean) < 0.01, s"projection mean $mean should be ~0")
    assert(proj.distinct.length > 1, "projections must not collapse")
  }

  test("gdpr_purge: zero purged rows remain, survivors all accounted for") {
    val rows = StoreQueries.gdprPurge(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_purged_remaining") === 0L))
    val kept = Tables.events(spark, sf0001)
      .filter(col("user_id") % 97 =!= 0).count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum === kept,
      "every surviving row and only surviving rows")
  }

  test("gdpr_purge honors spark.graft.scratch.dir: store lands under the " +
      "conf root, result unchanged (VERDICT r12 wrong #2)") {
    val base = StoreQueries.gdprPurge(spark, sf0001).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
    val root = java.nio.file.Files.createTempDirectory("graft_scratch_conf").toString
    spark.conf.set(graft.Scratch.ScratchDirConf, root)
    try {
      val confed = StoreQueries.gdprPurge(spark, sf0001).collect()
        .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
      assert(confed === base)
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(root, "graft_store", "gdpr_purge")),
        "purge store must be rooted at the shared scratch conf")
    } finally spark.conf.unset(graft.Scratch.ScratchDirConf)
  }
}
