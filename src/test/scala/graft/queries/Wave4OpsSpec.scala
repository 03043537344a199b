package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Round-12 fourth wave: directed containment, sketch self-audit, NB
  * language classification, activity inequality, churn labeling. Each
  * statistic is recomputed or bounded independently of the DuckDB gate.
  */
class Wave4OpsSpec extends SparkSpec {

  test("containment_pairs: jaccard is recoverable from the two containments") {
    val cont = DedupQueries.containmentPairs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Double]("contain_a_in_b"), r.getAs[Double]("contain_b_in_a"))).toMap
    val jac = DedupQueries.ngramJaccard(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard")).toMap
    assert(cont.keySet === jac.keySet)
    cont.foreach { case (k, (ca, cb)) =>
      assert(ca >= 0.0 && ca <= 1.0 && cb >= 0.0 && cb <= 1.0)
      val j = jac(k)
      if (j > 0.0) {
        // i/(|A|+|B|-i) == 1/(1/ca + 1/cb - 1) up to the 6-dp quantization
        val derived = 1.0 / (1.0 / ca + 1.0 / cb - 1.0)
        assert(math.abs(derived - j) < 1e-4, s"$k: jaccard $j vs derived $derived")
        assert(j <= math.min(ca, cb) + 1e-9, "jaccard can never exceed containment")
      } else assert(ca == 0.0 && cb == 0.0)
    }
  }

  test("minhash_est_eval: one audit row with coherent confusion counts") {
    val rows = DedupQueries.minhashEstEval(spark, sf0001).collect()
    assert(rows.length === 1)
    val r = rows.head
    val (n, tp, fp, fn) = (r.getAs[Long]("n_pairs"), r.getAs[Long]("tp"),
      r.getAs[Long]("fp"), r.getAs[Long]("fn"))
    assert(n > 0 && tp + fp + fn <= n)
    Seq("precision", "recall").foreach { c =>
      val v = r.getAs[Double](c)
      assert(v >= 0.0 && v <= 1.0, s"$c out of range: $v")
    }
    val mae = r.getAs[Double]("mae")
    assert(mae >= 0.0 && mae <= 1.0)
  }

  test("gini_activity: equals the sorted-rank closed form, inside [0, 1)") {
    val r = FeatureQueries.giniActivity(spark, sf0001).collect().head
    val counts = Tables.events(spark, sf0001)
      .groupBy(col("user_id")).agg(count(lit(1)).as("c")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).sortBy(x => (x._2, x._1)).map(_._2)
    val n = counts.length.toDouble
    val sc = counts.map(_.toDouble).sum
    val src = counts.zipWithIndex.map { case (c, i) => (i + 1) * c.toDouble }.sum
    val gini = (2.0 * src - (n + 1.0) * sc) / (n * sc)
    assert(r.getAs[Long]("n_users") === counts.length.toLong)
    assert(r.getAs[Long]("total_events") === counts.sum)
    assert(math.abs(r.getAs[Double]("gini") - gini) < 1e-6)
    assert(gini >= 0.0 && gini < 1.0)
  }

  test("churn_labels: label matches the 14-day holdout recomputed per user") {
    val got = FeatureQueries.churnLabels(spark, sf0001).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_before"), r.getAs[Long]("churned"))).toMap
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), to_date(col("ts")).as("d")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val cutoff = ev.map(_._2).max.minusDays(14)
    val byUser = ev.groupBy(_._1)
    byUser.foreach { case (u, rs) =>
      val before = rs.count(_._2.isBefore(cutoff)).toLong
      val after = rs.length - before
      if (before == 0) assert(!got.contains(u), s"user $u has no observation window")
      else {
        assert(got(u)._1 === before)
        assert(got(u)._2 === (if (after == 0) 1L else 0L), s"user $u label")
      }
    }
  }

  test("nb_lang_confusion: one prediction per scoreable doc, labels from the corpus") {
    val rows = TextQueries.nbLangConfusion(spark, sf0001).collect()
    val langs = Tables.documents(spark, sf0001)
      .select(col("lang")).distinct().collect().map(_.getString(0)).toSet
    rows.foreach { r =>
      assert(langs.contains(r.getAs[String]("actual_lang")))
      assert(langs.contains(r.getAs[String]("pred_lang")))
    }
    // ≥1 NORMALIZED token: split of "" still yields [""], so filter the
    // empties out before sizing (a doc of pure punctuation is unscoreable)
    val nScoreable = Tables.documents(spark, sf0001)
      .filter(size(expr(
        "filter(split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')), ' '), t -> t <> '')")) > 0)
      .count()
    assert(rows.map(_.getAs[Long]("n")).sum === nScoreable,
      "confusion matrix must cover every doc with at least one token")
    // the trained classifier must beat chance on its own training corpus:
    // diagonal mass > uniform 1/|langs|
    val diag = rows.filter(r => r.getString(0) == r.getString(1))
      .map(_.getAs[Long]("n")).sum.toDouble
    assert(diag / nScoreable > 1.0 / langs.size,
      s"NB accuracy ${diag / nScoreable} not above chance")
  }
}
