package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Eval reports (ROC-AUC, calibration) and the selection scorers
  * (bigram LM, DSIR): the oracle pins cross-engine bit-parity; these pin
  * the MATH — closed-form rank identities on hand-built frames, the
  * degenerate-class contract, and that the selection scores order the
  * corpus the way their definitions promise.
  */
class EvalSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  private def scoredFrame(rows: Seq[(Long, Double)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("y", "score")
  }

  test("rocAuc: perfect separation is 1.0, reversed ranking is 0.0") {
    val perfect = scoredFrame(Seq((1L, 0.9), (1L, 0.8), (0L, 0.2), (0L, 0.1)))
    assert(Eval.rocAuc(perfect).first().getAs[Double]("auc") === 1.0)
    val reversed = scoredFrame(Seq((0L, 0.9), (0L, 0.8), (1L, 0.2), (1L, 0.1)))
    assert(Eval.rocAuc(reversed).first().getAs[Double]("auc") === 0.0)
  }

  test("rocAuc: ties take their exact average rank (hand-computed 0.875)") {
    // pos at {0.9, 0.5}, neg at {0.5, 0.1}: ascending avg ranks are
    // 0.1→1, 0.5→2.5 (tie of two), 0.9→4; R_pos = 6.5,
    // AUC = (6.5 − 2·3/2) / (2·2) = 0.875
    val tied = scoredFrame(Seq((1L, 0.9), (1L, 0.5), (0L, 0.5), (0L, 0.1)))
    val row = Eval.rocAuc(tied).first()
    assert(row.getAs[Double]("auc") === 0.875)
    assert(row.getAs[Long]("n_scores") === 3L)
  }

  test("rocAuc: an EMPTY scored frame still reports the defined 0.5, not null") {
    val row = Eval.rocAuc(scoredFrame(Seq.empty)).first()
    assert(row.getAs[Long]("n_pos") === 0L)
    assert(row.getAs[Long]("n_neg") === 0L)
    assert(row.getAs[Long]("n_scores") === 0L)
    assert(row.getAs[Double]("auc") === 0.5)
  }

  test("rocAuc: a single-class corpus has no ranking to measure — 0.5") {
    val onlyPos = scoredFrame(Seq((1L, 0.9), (1L, 0.1)))
    assert(Eval.rocAuc(onlyPos).first().getAs[Double]("auc") === 0.5)
    val onlyNeg = scoredFrame(Seq((0L, 0.9), (0L, 0.1)))
    assert(Eval.rocAuc(onlyNeg).first().getAs[Double]("auc") === 0.5)
  }

  test("rocAuc on the trained model beats chance and matches per-row rank math") {
    val scored = LogReg.scoreAll(graft.Tables.embeddings(spark, sf0001))
    val auc = Eval.rocAuc(scored).first().getAs[Double]("auc")
    assert(auc > 0.5, s"trained classifier must rank above chance, got $auc")
    // independent per-row computation: average ranks via (rank + rank-of-
    // reversed) / 2 is overkill — use the probabilistic definition
    // directly on the collected rows (corpus is sf0.001-sized)
    val rows = scored.select(col("y"), col("score")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val pos = rows.filter(_._1 == 1L).map(_._2)
    val neg = rows.filter(_._1 == 0L).map(_._2)
    val pairs = for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0
    val brute = pairs.sum / pairs.length
    assert(math.abs(auc - brute) < 1e-6,
      s"rank-sum AUC $auc must equal pairwise AUC $brute")
  }

  test("calibrationBins partitions the corpus and keeps rates in range") {
    val scored = LogReg.scoreAll(graft.Tables.embeddings(spark, sf0001))
    val total = scored.count()
    val bins = Eval.calibrationBins(scored).collect()
    assert(bins.map(_.getAs[Long]("n")).sum === total)
    bins.foreach { b =>
      val frac = b.getAs[Double]("frac_pos")
      val mean = b.getAs[Double]("mean_score")
      val bin = b.getAs[Long]("bin")
      assert(frac >= 0.0 && frac <= 1.0)
      assert(bin >= 0L && bin <= 9L)
      // the bin's mean score must lie inside the bin's score range
      assert(mean >= bin / 10.0 - 1e-6 && mean <= (bin + 1) / 10.0 + 1e-6)
    }
  }

  test("lm_score_bigram: probabilities in (0,1], only multi-token docs") {
    val out = graft.queries.TextQueries.lmScoreBigram(spark, sf0001)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[Double]("mean_bigram_p")
      assert(p > 0.0 && p <= 1.0, s"mean bigram p out of range: $p")
      assert(r.getAs[Long]("n_bigrams") >= 1L)
    }
  }

  test("dsir_weights: target-language docs carry the highest mean weight") {
    val docs = graft.Tables.documents(spark, sf0001)
    val byLang = graft.queries.TextQueries.dsirWeights(spark, sf0001)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang")).agg(avg(col("weight")).as("mw"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byLang.contains("en"), s"corpus must have en docs: ${byLang.keys}")
    val others = byLang.filter(_._1 != "en").values
    assert(others.nonEmpty)
    assert(byLang("en") > others.max,
      s"en (the DSIR target) must out-weigh every other language: $byLang")
  }
}
