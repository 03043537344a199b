package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Round-12 additions beyond the Eval reports: curriculum sharding,
  * deterministic random walks, hard-negative mining, PCA, and the
  * sorted-neighborhood ER / skew-profile relational pair. The oracle pins
  * cross-engine bit-parity; these pin the MATH — the invariants each
  * operator's definition promises, checked independently of DuckDB.
  */
class Round12OpsSpec extends SparkSpec {

  test("curriculum_shards: shard = exclusive-prefix // budget, quality-monotone") {
    val rows = CurationQueries.curriculumShards(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cum = r.getAs[Long]("cum_tokens")
      val n = r.getAs[Long]("n_tokens")
      val shard = r.getAs[Long]("shard")
      assert(shard === (cum - n) / 4096L,
        s"shard must be exact floor-division of the exclusive prefix: $r")
    }
    // walking shards in id order must walk quality non-increasing:
    // shard 0 is the best slice, by construction
    val byShard = rows.groupBy(_.getAs[Long]("shard")).toSeq.sortBy(_._1)
      .map { case (sh, rs) => sh -> rs.map(_.getAs[Double]("quality_score")) }
    byShard.sliding(2).foreach {
      case Seq((_, a), (_, b)) => assert(a.min >= b.max - 1e-9,
        "every doc in shard k must be at least as good as any in shard k+1")
      case _ =>
    }
    // shards are contiguous token slices: total tokens = last cum
    assert(rows.map(_.getAs[Long]("n_tokens")).sum ===
      rows.map(_.getAs[Long]("cum_tokens")).max)
  }

  test("graph_random_walks: every step follows a real edge, one walk per vertex") {
    val walks = RelationalQueries.graphRandomWalks(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("walk_id"), r.getAs[Long]("step"),
        r.getAs[Long]("node")))
    val byWalk = walks.groupBy(_._1)
    // steps are dense 0..4 and step 0 is the start vertex
    byWalk.foreach { case (wid, rows) =>
      assert(rows.map(_._2).sorted.toSeq === Seq(0L, 1L, 2L, 3L, 4L))
      assert(rows.find(_._2 == 0L).get._3 === wid)
    }
    // consecutive (node, next) pairs are edges of the bipartite trade graph
    val o = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_suppkey"))
    val edges = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), (-col("l_suppkey")).as("p"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edgeSet = edges.flatMap(e => Seq(e, e.swap)).toSet
    byWalk.foreach { case (_, rows) =>
      rows.sortBy(_._2).map(_._3).sliding(2).foreach {
        case Array(a, b) => assert(edgeSet.contains((a, b)),
          s"walk hop $a -> $b is not an edge")
        case _ =>
      }
    }
  }

  test("hard_negatives: cross-label only, top-3 per anchor, true cosine order") {
    val rows = SimilarityQueries.hardNegatives(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("anchor_label") !== r.getAs[Long]("neg_label"))
      val c = r.getAs[Double]("cos_sim")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
    rows.groupBy(_.getAs[Long]("anchor")).foreach { case (_, rs) =>
      val ranked = rs.sortBy(_.getAs[Long]("rank"))
      assert(ranked.map(_.getAs[Long]("rank")).toSeq ===
        (1L to ranked.length.toLong))
      assert(ranked.length <= 3)
      // rank order IS descending similarity
      val sims = ranked.map(_.getAs[Double]("cos_sim"))
      sims.sliding(2).foreach {
        case Array(a, b) => assert(a >= b)
        case _ =>
      }
    }
  }

  test("pca: covariance diagonal is the variance (non-negative), matrix upper-triangle") {
    val cov = graft.ml.PCA.covariance(Tables.embeddings(spark, sf0001)).collect()
    val d = cov.map(_.getAs[Long]("j")).max + 1
    assert(cov.length === (d * (d + 1) / 2))
    cov.foreach { r =>
      assert(r.getAs[Long]("i") <= r.getAs[Long]("j"))
      if (r.getAs[Long]("i") == r.getAs[Long]("j"))
        assert(r.getAs[Double]("cov") >= -1e-9, s"negative variance: $r")
    }
  }

  test("pca: power iteration returns a unit vector whose Rayleigh quotient is the eigenvalue") {
    val pc = graft.ml.PCA.powerIteration(
        graft.ml.PCA.covariance(Tables.embeddings(spark, sf0001)), iters = 4)
      .collect()
    val norm2 = pc.map(r => { val v = r.getAs[Double]("loading"); v * v }).sum
    assert(math.abs(norm2 - 1.0) < 1e-4, s"loading norm² $norm2 must be ~1")
    val ev = pc.head.getAs[Double]("eigenvalue")
    assert(ev > 0.0)
    // dominant eigenvalue of a PSD matrix is at least the largest diagonal
    // entry times (v's alignment) — sanity: it must be >= 0 and bounded by
    // the trace
    val trace = graft.ml.PCA.covariance(Tables.embeddings(spark, sf0001))
      .filter(col("i") === col("j"))
      .agg(sum(col("cov"))).first().getDouble(0)
    assert(ev <= trace + 1e-6, s"eigenvalue $ev cannot exceed the trace $trace")
  }

  test("er_sorted_neighborhood equals the naive windowed self-join") {
    val got = RelationalQueries.erSortedNeighborhood(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("custkey_a"), r.getAs[Long]("custkey_b"),
        r.getAs[Long]("dist"))).toSet
    // brute-force: global sort, all pairs within rank distance 3
    val cust = Tables.customer(spark, sf0001)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(t => (t._2, t._1))
    val expect = (for {
      i <- cust.indices
      j <- (i + 1) to math.min(i + 3, cust.length - 1)
      if cust(i)._3 == cust(j)._3
      d = levenshteinRef(cust(i)._2, cust(j)._2)
      if d <= 2
    } yield (cust(i)._1, cust(j)._1, d.toLong)).toSet
    assert(got === expect)
    assert(got.nonEmpty, "fixture must produce at least one candidate match")
  }

  /** Textbook DP Levenshtein, the independent reference. */
  private def levenshteinRef(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  test("chi2_features: dense per-lang top-10, non-negative, brute-force cell check") {
    val rows = TextQueries.chi2Features(spark, sf0001).collect()
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq ===
        (1L to rs.length.toLong))
      assert(rs.length <= 10)
    }
    rows.foreach(r => assert(r.getAs[Double]("chi2") >= 0.0,
      s"chi-square is a squared association, never negative: $r"))
    // brute-force one reported cell from raw presence counts
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val first = rows.minBy(r => (r.getAs[String]("lang"), r.getAs[Long]("rank")))
    val (lang, token) = (first.getAs[String]("lang"), first.getAs[String]("token"))
    def toks(t: String) = t.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
      .split(" ").filter(_.nonEmpty).toSet
    val n = docs.length.toDouble
    val a = docs.count(d => d._2 == lang && toks(d._3).contains(token)).toDouble
    val b = docs.count(d => d._2 == lang && !toks(d._3).contains(token)).toDouble
    val c = docs.count(d => d._2 != lang && toks(d._3).contains(token)).toDouble
    val dd = n - a - b - c
    val delta = a * dd - b * c
    val expect = ((n * delta) / ((a + b) * (c + dd))) * (delta / ((a + c) * (b + dd)))
    assert(math.abs(first.getAs[Double]("chi2") - expect) < 1e-5,
      s"engine chi2 ${first.getAs[Double]("chi2")} vs brute $expect for ($lang, $token)")
  }

  test("pmi_collocations: top-20 by the exact count-ratio identity") {
    val rows = TextQueries.pmiCollocations(spark, sf0001).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("cab") >= 5L))
    // ranking is strictly by (ratio desc, prev, cur)
    rows.sliding(2).foreach {
      case Array(x, y) =>
        val (px, py) = (x.getAs[Double]("pmi_ratio"), y.getAs[Double]("pmi_ratio"))
        assert(px > py || (px == py &&
          (x.getAs[String]("prev"), x.getAs[String]("cur")).toString <
            (y.getAs[String]("prev"), y.getAs[String]("cur")).toString))
      case _ =>
    }
  }

  test("winnow_fingerprints equals an independent winnowing implementation") {
    val got = TextQueries.winnowFingerprints(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("shared_fps"))).toSet
    // independent reimplementation (k=3-token grams, w=4 windows, the
    // engine's portable hash) on collected docs
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def fps(text: String): Set[Long] = {
      val ts = text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
        .split(" ").filter(_.nonEmpty)
      val grams = ts.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toArray
      val hs = grams.map(hash32Ref)
      if (hs.length < 4) Set.empty
      else hs.sliding(4).map(_.min).toSet
    }
    val all = docs.map { case (id, t) => id -> fps(t) }
    val expect = (for {
      (ida, fa) <- all; (idb, fb) <- all
      if ida < idb
      shared = (fa & fb).size
      if shared >= 2
    } yield (ida, idb, shared.toLong)).toSet
    assert(got === expect)
  }

  /** First 8 hex chars of md5 as a big-endian int — PortableHash.hash32's
    * contract, re-derived independently.
    */
  private def hash32Ref(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    java.lang.Long.parseLong(hex, 16)
  }

  test("join_size_estimate matches the materialized join exactly") {
    val o = Tables.orders(spark, sf0001)
    val l = Tables.lineitem(spark, sf0001)
    val c = Tables.customer(spark, sf0001)
    val got = RelationalQueries.joinSizeEstimate(spark, sf0001).collect()
      .map(r => r.getAs[String]("join_name") -> r.getAs[Long]("join_rows")).toMap
    assert(got("customer_orders") ===
      c.join(o, col("c_custkey") === col("o_custkey")).count())
    assert(got("orders_lineitem") ===
      o.join(l, col("o_orderkey") === col("l_orderkey")).count())
    assert(got("lineitem_lineitem_samesupp") ===
      l.select(col("l_suppkey")).as("a")
        .join(l.select(col("l_suppkey")).as("b"), "l_suppkey").count())
  }

  test("markov_transitions: rows sum to 1 per prev, counts match a brute-force lag") {
    val rows = RelationalQueries.markovTransitions(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("prev")).foreach { case (_, rs) =>
      val psum = rs.map(_.getAs[Double]("p")).sum
      // each p is 1e-6-rounded, so the row sum drifts at most |cur| ulps
      assert(math.abs(psum - 1.0) < 1e-5 * rs.length,
        s"transition probabilities must sum to 1 per prev state, got $psum")
    }
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getString(3)))
    val brute = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      es.sortBy(e => (e._2, e._3)).map(_._4).sliding(2).collect {
        case Array(a, b) => (a, b)
      }
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = rows.map(r => (r.getAs[String]("prev"), r.getAs[String]("cur")) ->
      r.getAs[Long]("cnt")).toMap
    assert(got === brute)
  }

  test("kappa_agreement: cells partition the corpus, kappa matches the closed form") {
    val r = CurationQueries.kappaAgreement(spark, sf0001).first()
    val (n, n11, n10, n01, n00) = (r.getAs[Long]("n"), r.getAs[Long]("n11"),
      r.getAs[Long]("n10"), r.getAs[Long]("n01"), r.getAs[Long]("n00"))
    assert(n11 + n10 + n01 + n00 === n)
    assert(n === Tables.documents(spark, sf0001).count())
    val po = (n11 + n00).toDouble / n
    val pe = ((n11 + n10).toDouble * (n11 + n01).toDouble +
      (n01 + n00).toDouble * (n10 + n00).toDouble) / (n.toDouble * n.toDouble)
    val kappa = (po - pe) / (1.0 - pe)
    assert(math.abs(r.getAs[Double]("kappa") - kappa) < 1e-6)
    assert(kappa >= -1.0 && kappa <= 1.0)
    // the two raters genuinely disagree somewhere, or the stat is vacuous
    assert(n10 + n01 > 0, "fixture must exercise disagreement")
  }

  test("mixture_waterfill: allocations exhaust the budget at the water level") {
    val rows = CurationQueries.mixtureWaterfill(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val level = rows.head.getAs[Double]("level")
    assert(rows.forall(_.getAs[Double]("level") == level))
    val totalAvail = rows.map(_.getAs[Long]("avail")).sum
    val budget = totalAvail / 2
    rows.foreach { r =>
      val alloc = r.getAs[Double]("alloc_tokens")
      assert(alloc <= r.getAs[Long]("avail").toDouble + 1e-6)
      assert(alloc <= level + 1e-6)
      // a source under the level is taken whole
      if (r.getAs[Long]("avail").toDouble < level)
        assert(alloc === r.getAs[Long]("avail").toDouble)
    }
    // sum(min(avail, level)) == budget, up to the 1e-6 edge rounding
    val spent = rows.map(_.getAs[Double]("alloc_tokens")).sum
    assert(math.abs(spent - budget.toDouble) < 1e-3 * rows.length,
      s"waterfill must exhaust the budget: spent $spent of $budget")
  }

  test("skew_profile: exact integer identities per key") {
    val li = Tables.lineitem(spark, sf0001)
    val total = li.count()
    val rows = RelationalQueries.skewProfile(spark, sf0001).collect()
    assert(rows.map(_.getAs[String]("key_name")).toSeq ===
      Seq("l_orderkey", "l_partkey", "l_suppkey"))
    rows.foreach { r =>
      assert(r.getAs[Long]("total_rows") === total)
      val nKeys = r.getAs[Long]("n_keys")
      val maxCnt = r.getAs[Long]("max_cnt")
      assert(maxCnt >= total / nKeys, "max multiplicity is at least the mean")
      assert(r.getAs[Double]("skew_ratio") >= 1.0 - 1e-6)
      val t10 = r.getAs[Double]("top10_share")
      assert(t10 > 0.0 && t10 <= 1.0)
      val hhi = r.getAs[Double]("hhi")
      // HHI of n equal keys is 1/n (the floor); 1.0 is one key owning all
      assert(hhi >= 1.0 / nKeys - 1e-6 && hhi <= 1.0)
    }
    // orderkey is the fine key: more distinct values than suppkey
    val byName = rows.map(r => r.getAs[String]("key_name") -> r.getAs[Long]("n_keys")).toMap
    assert(byName("l_orderkey") > byName("l_suppkey"))
  }
}
