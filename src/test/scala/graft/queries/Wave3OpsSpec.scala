package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Round-12 third wave: feature engineering (target encoding, k-fold,
  * time decay), statistical QA (Benford, Welch), and the analytics trio
  * (OLS trend, max drawdown, Simpson diversity, TextRank). The oracle
  * pins cross-engine bit-parity; these pin the MATH — each statistic
  * recomputed independently on the driver where feasible.
  */
class Wave3OpsSpec extends SparkSpec {

  test("target_encode: shrinkage lands strictly between category and global mean") {
    val enc = FeatureQueries.targetEncode(spark, sf0001).collect()
    assert(enc.nonEmpty)
    val ev = Tables.events(spark, sf0001)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("s")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val (ntot, stot) = (ev.values.map(_._1).sum, ev.values.map(_._2).sum)
    val gmean = stot / ntot
    enc.foreach { r =>
      val (n, s) = ev(r.getAs[String]("event_type"))
      val cmean = s / n
      val e = r.getAs[Double]("enc")
      val (lo, hi) = (math.min(cmean, gmean), math.max(cmean, gmean))
      assert(e >= lo - 1e-6 && e <= hi + 1e-6,
        s"shrunk encoding must sit between category mean $cmean and global $gmean: $e")
      // closed form, recomputed
      assert(math.abs(e - (s + 100.0 * gmean) / (n + 100.0)) < 1e-5)
    }
  }

  test("kfold_assign: folds are 0..4, counts cover every embedding exactly once") {
    val rows = FeatureQueries.kfoldAssign(spark, sf0001).collect()
    val folds = rows.map(_.getAs[Long]("fold")).distinct.sorted
    assert(folds.forall(f => f >= 0 && f < 5))
    assert(rows.map(_.getAs[Long]("n")).sum ===
      Tables.embeddings(spark, sf0001).count())
    // deterministic: the same query twice gives identical assignments
    val again = FeatureQueries.kfoldAssign(spark, sf0001).collect()
    assert(rows.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
  }

  test("decay_weighted: a convex combination — bounded by each user's value range") {
    val got = FeatureQueries.decayWeighted(spark, sf0001).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n"), r.getAs[Double]("decayed_mean"))).toMap
    val byUser = Tables.events(spark, sf0001)
      .select(col("user_id"), col("value")).collect()
      .groupBy(_.getLong(0)).map { case (u, rs) => u -> rs.map(_.getDouble(1)) }
    assert(got.keySet === byUser.keySet)
    byUser.foreach { case (u, vs) =>
      val (n, m) = got(u)
      assert(n === vs.length)
      assert(m >= vs.min - 1e-6 && m <= vs.max + 1e-6,
        s"weighted mean out of the value hull for user $u")
    }
  }

  test("benford_check: observed shares and the reference distribution both sum to 1") {
    val rows = DriftQueries.benfordCheck(spark, sf0001).collect()
    assert(rows.map(_.getAs[Long]("digit")).forall(d => d >= 1 && d <= 9))
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
    // the hardcoded Benford constants are log10(1+1/d) to 6 dp
    rows.foreach { r =>
      val d = r.getAs[Long]("digit").toDouble
      val exp = r.getAs[Double]("expected")
      assert(math.abs(exp - math.log10(1 + 1 / d)) < 5e-7)
    }
  }

  test("ab_welch_t: every pair once, Welch df within its classical bounds") {
    val rows = DriftQueries.abWelchT(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("type_a") < r.getAs[String]("type_b"))
      val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      val df = r.getAs[Double]("df")
      assert(df >= math.min(na, nb) - 1 - 1e-6 && df <= na + nb - 2 + 1e-6,
        s"Welch-Satterthwaite df $df outside [min(n)-1, n_a+n_b-2]")
    }
    val k = rows.flatMap(r => Seq(r.getString(0), r.getString(1))).distinct.length
    assert(rows.length === k * (k - 1) / 2, "one row per unordered pair")
  }

  test("ols_trend: slope/intercept equal the driver-side closed form") {
    val got = FeatureQueriesSpecHelp.olsBySymbol(spark, sf0001)
    val want = Tables.events(spark, sf0001)
      .select(col("event_type"), unix_micros(col("ts")), col("value")).collect()
      .groupBy(_.getString(0)).map { case (sym, rs) =>
        val ts = rs.map(_.getLong(1))
        val mn = ts.min
        // mirror the query's (us - mn) DIV 1000000 — differencing BEFORE
        // truncation; per-row second-casts would disagree on sub-second ticks
        val xs = ts.map(t => ((t - mn) / 1000000L).toDouble)
        val ys = rs.map(_.getDouble(2))
        val n = xs.length.toDouble
        val (sx, sy) = (xs.sum, ys.sum)
        val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
        val sxx = xs.map(a => a * a).sum
        val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        sym -> (slope * 1e9, (sy - slope * sx) / n)
      }
    assert(got.keySet === want.keySet)
    // the query's sums are exact-DECIMAL; this twin's are plain double
    // folds, so compare at relative precision, not absolute
    def relClose(a: Double, b: Double) =
      math.abs(a - b) <= 1e-6 * math.max(1.0, math.max(math.abs(a), math.abs(b)))
    got.foreach { case (sym, (sl, ic)) =>
      val (wsl, wic) = want(sym)
      assert(relClose(sl, wsl), s"$sym slope $sl vs $wsl")
      assert(relClose(ic, wic), s"$sym intercept $ic vs $wic")
    }
  }

  test("max_drawdown: equals the sequential peak-trough fold per symbol") {
    val got = MultiSymQueries.maxDrawdown(spark, sf0001).collect()
      .map(r => r.getAs[String]("symbol") ->
        (r.getAs[Long]("n_ticks"), r.getAs[Double]("max_drawdown"))).toMap
    val want = Tables.events(spark, sf0001)
      .select(col("event_type"), col("ts").cast("long"), col("event_id"),
        col("value")).collect()
      .groupBy(_.getString(0)).map { case (sym, rs) =>
        val ordered = rs.sortBy(r => (r.getLong(1), r.getLong(2))).map(_.getDouble(3))
        var peak = Double.MinValue
        var dd = 0.0
        ordered.foreach { v =>
          peak = math.max(peak, v)
          dd = math.min(dd, v / peak - 1.0)
        }
        sym -> (rs.length.toLong, dd)
      }
    assert(got.keySet === want.keySet)
    want.foreach { case (sym, (n, dd)) =>
      assert(got(sym)._1 === n)
      assert(math.abs(got(sym)._2 - dd) < 1e-6, s"$sym drawdown")
      assert(got(sym)._2 <= 0.0)
    }
  }

  test("token_simpson: equals 1 - sum(c^2)/n^2 of the driver-side token counts") {
    val got = TextQueries.tokenSimpson(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("simpson"))).toMap
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
    docs.foreach { r =>
      val toks = r.getString(1).toLowerCase.replaceAll("[^a-z0-9]+", " ")
        .trim.split(" ").filter(_.nonEmpty)
      if (toks.nonEmpty) {
        val (n, s) = got(r.getLong(0))
        assert(n === toks.length)
        val ssq = toks.groupBy(identity).values
          .map(g => g.length.toLong * g.length).sum
        val simpson = 1.0 - ssq.toDouble / (n * n).toDouble
        assert(math.abs(s - simpson) < 1e-6)
        assert(s >= 0.0 && s < 1.0)
      } else assert(!got.contains(r.getLong(0)))
    }
  }

  test("textrank_keywords: 15 corpus words, rank-descending, all ranks positive") {
    val rows = TextQueries.textrankKeywords(spark, sf0001).collect()
    assert(rows.length === 15)
    val ranks = rows.map(_.getAs[Double]("rank"))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b })
    assert(ranks.forall(_ > 0.0))
    val vocab = Tables.documents(spark, sf0001)
      .select(explode(split(
        trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")), " ")))
      .distinct().collect().map(_.getString(0)).toSet
    assert(rows.map(_.getAs[String]("word")).forall(vocab.contains))
  }
}

/** Driver-side twin of the ols_trend output for the spec. */
private object FeatureQueriesSpecHelp {
  def olsBySymbol(s: org.apache.spark.sql.SparkSession, dir: String)
      : Map[String, (Double, Double)] =
    MultiSymQueries.olsTrend(s, dir).collect()
      .map(r => r.getAs[String]("symbol") ->
        (r.getAs[Double]("slope_per_gs"), r.getAs[Double]("intercept"))).toMap
}
