package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Driver-side invariants for the round-13 wave-3 additions (the oracle
  * pins cross-engine equality; these pin the math itself, mostly by
  * independent driver-side recomputation).
  */
class R13Wave3OpsSpec extends SparkSpec {

  test("holt_chunked tracks the sequential Holt recurrence (chunk " +
      "association only reorders rounding) and seeds at the first close") {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("candle_start",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("close_price",
        org.apache.spark.sql.types.DoubleType)))
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val prices = (0 until 200).map(i => 100.0 + 7.0 * math.sin(i / 9.0) + (i % 13))
    val rows = prices.zipWithIndex.map { case (p, i) =>
      Row(new java.sql.Timestamp(base + i * 3600000L), p)
    }
    val cs = spark.createDataFrame(rows.asJava, schema)
    // candlesPerChunk = 16 over 200 rows → 13 chunks: exercises the carry
    val out = graft.forex.TechIndicators.holtChunked(cs, candlesPerChunk = 16)
      .orderBy(col("candle_start")).collect()
    assert(out.length === 200)
    // sequential reference: l0 = x0, b0 = 0; each element applied in order
    val (alpha, beta) = (0.2, 0.1)
    var (l, b) = (prices.head, 0.0)
    out.zipWithIndex.foreach { case (r, i) =>
      val x = prices(i)
      val lNew = alpha * x + (1 - alpha) * (l + b)
      b = beta * (lNew - l) + (1 - beta) * b
      l = lNew
      assert(math.abs(r.getAs[Double]("level") - l) < 1e-6,
        s"row $i level ${r.getAs[Double]("level")} vs seq $l")
      assert(math.abs(r.getAs[Double]("trend") - b) < 1e-6,
        s"row $i trend ${r.getAs[Double]("trend")} vs seq $b")
      assert(math.abs(r.getAs[Double]("forecast") -
        (r.getAs[Double]("level") + r.getAs[Double]("trend"))) < 2e-6)
    }
    assert(out.head.getAs[Double]("level") === prices.head)
    assert(out.head.getAs[Double]("trend") === 0.0)
  }

  test("systematic_sample: total draw count is exactly w_total DIV stride " +
      "and every per-doc count is the independent prefix recomputation") {
    val out = SamplingQueries.systematicSample(spark, sf001)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("offset"),
          r.getAs[Long]("n_copies"))).toMap
    // independent prefix walk over the same weights, doc_id order
    val w = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"),
        graft.text.TextAnalysis.tokenCount(col("text")).cast("long").as("w"))
      .orderBy(col("doc_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val total = w.map(_._2).sum
    val stride = total / 100
    var cum = 0L
    var drawn = 0L
    w.foreach { case (id, wt) =>
      val copies = (cum + wt) / stride - cum / stride
      cum += wt
      if (copies > 0) {
        val (nt, off, c) = out.getOrElse(id, fail(s"doc $id missing"))
        assert(nt === wt); assert(off === cum - wt); assert(c === copies)
        drawn += c
      } else assert(!out.contains(id), s"doc $id should not be drawn")
    }
    assert(drawn === total / stride)
    // every doc at least one stride long is necessarily drawn
    w.foreach { case (id, wt) =>
      if (wt >= stride) assert(out.contains(id), s"doc $id spans a stride")
    }
  }

  test("stratified_neyman: every stratum delivers exactly its allocation " +
      "and allocations sum to ~200") {
    val rows = SamplingQueries.stratifiedNeyman(spark, sf001).collect()
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    var allocSum = 0L
    bySrc.foreach { case (src, rs) =>
      val alloc = rs.head.getAs[Long]("alloc")
      assert(rs.length === alloc, s"$src delivered ${rs.length} != $alloc")
      assert(rs.map(_.getAs[Long]("h_rank")).max === alloc)
      assert(rs.head.getAs[Double]("sigma") >= 0.0)
      allocSum += alloc
    }
    // each stratum rounds independently: off by at most 1 per stratum
    assert(math.abs(allocSum - 200L) <= bySrc.size.toLong)
  }

  test("ndcg_eval: ndcg in (0,1], idcg >= dcg, and ndcg = dcg/idcg") {
    val rows = SimilarityQueries.ndcgEval(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (d, i, n) = (r.getAs[Double]("dcg"), r.getAs[Double]("idcg"),
        r.getAs[Double]("ndcg"))
      assert(i > 0.0); assert(d >= 0.0); assert(d <= i + 1e-9)
      assert(n >= 0.0 && n <= 1.0 + 1e-9)
      assert(math.abs(n - d / i) < 2e-6)
    }
  }

  test("mrr_eval: mrr and hit_rate in [0,1], mrr never exceeds hit_rate") {
    val rows = SimilarityQueries.mrrEval(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (m, h) = (r.getAs[Double]("mrr"), r.getAs[Double]("hit_rate"))
      assert(m >= 0.0 && m <= 1.0); assert(h >= 0.0 && h <= 1.0)
      assert(m <= h + 1e-9, "each reciprocal rank is at most 1 per hit")
    }
  }

  test("pca_whiten_2d: both axes have ~unit variance and ~zero correlation") {
    val rows = SimilarityQueries.pcaWhiten2d(spark, sf001).collect()
    val w1 = rows.map(_.getAs[Double]("w1"))
    val w2 = rows.map(_.getAs[Double]("w2"))
    val n = rows.length.toDouble
    def meanOf(a: Array[Double]) = a.sum / n
    val (m1, m2) = (meanOf(w1), meanOf(w2))
    val v1 = w1.map(x => (x - m1) * (x - m1)).sum / n
    val v2 = w2.map(x => (x - m2) * (x - m2)).sum / n
    val cov = w1.zip(w2).map { case (a, b) => (a - m1) * (b - m2) }.sum / n
    // the synthetic corpus is near-isotropic (top eigenvalues 0.0275 vs
    // 0.0272 — convergence rate (λ₂/λ₁)^t ≈ 0.99^t), so 4 power rounds
    // whiten the VARIANCES well but leave residual cross-correlation;
    // numpy replay of the same iteration shows corr −0.166 at 4 rounds,
    // −0.035 even at 12 — the bound below is the data's, not a bug's
    assert(math.abs(v1 - 1.0) < 0.10, s"var(w1) = $v1")
    assert(math.abs(v2 - 1.0) < 0.10, s"var(w2) = $v2")
    assert(math.abs(cov / math.sqrt(v1 * v2)) < 0.25, s"corr = $cov")
  }

  test("mmr_rerank replays the greedy trajectory recomputed independently " +
      "from the pool and pairwise sims") {
    val picks = SimilarityQueries.mmrRerank(spark, sf001)
      .orderBy(col("pick_order")).collect()
    assert(picks.length === 8)
    assert(picks.map(_.getAs[Long]("vec_id")).distinct.length === 8)
    // independent greedy over the same quantized inputs
    val e = graft.Tables.embeddings(spark, sf001)
    val pool = graft.similarity.Similarity.knnBruteForceMulti(e, Seq(0L), 20)
      .select(col("vec_id"), col("cos_sim")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val vecs = e.filter(col("vec_id").isin(pool.keys.toSeq: _*))
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      q6(d / (na * nb))
    }
    var picked = List(pool.toSeq.map { case (id, rel) => (-rel, id) }.min._2)
    (2 to 8).foreach { _ =>
      val next = pool.keys.filterNot(picked.contains).map { c =>
        val maxsim = picked.map(p => cos(vecs(c), vecs(p))).max
        (c, 0.5 * pool(c) - 0.5 * maxsim)
      }.toSeq.map { case (id, sc) => (-sc, id) }.min._2
      picked = picked :+ next
    }
    assert(picks.map(_.getAs[Long]("vec_id")).toSeq === picked,
      "greedy pick sequence must match the independent recomputation")
  }
  test("kmv_overlap: estimates are sane against the exact reference " +
      "(union >= both audiences' sketch floors, jaccard in [0,1])") {
    val rows = RelationalQueries.kmvOverlap(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val j = r.getAs[Double]("jaccard_est")
      assert(j >= 0.0 && j <= 1.0)
      assert(r.getAs[Long]("h_k") > 0L)
      assert(r.getAs[Double]("union_est") > 0.0)
      // a KMV union estimate with k=64 has ~12% relative error; the
      // intersection estimate compounds the jaccard fraction - allow 3x
      val est = r.getAs[Double]("inter_est")
      val exact = r.getAs[Long]("exact_overlap").toDouble
      assert(est >= exact / 3.0 - 64.0 && est <= exact * 3.0 + 64.0,
        s"${r.getAs[String]("ta")}x${r.getAs[String]("tb")}: est $est vs exact $exact")
    }
  }

  test("quantile_normalize: qnorm is the per-type empirical quantile - " +
      "uniform ranks, bounds strictly inside (0,1), order-preserving") {
    val rows = FeatureQueries.quantileNormalize(spark, sf0001).collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (_, rs) =>
      val n = rs.length
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq === (1L to n.toLong))
      rs.foreach { r =>
        val q = r.getAs[Double]("qnorm")
        assert(q > 0.0 && q < 1.0)
        assert(math.abs(q - r.getAs[Long]("rank").toDouble / (n + 1)) < 1e-6)
      }
      // ranks follow the (value, event_id) order
      val sorted = rs.sortBy(r => (r.getAs[Double]("value"), r.getAs[Long]("event_id")))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq === (1L to n.toLong))
    }
  }
}
