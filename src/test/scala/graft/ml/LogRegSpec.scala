package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** LogReg training: the oracle pins bit-parity of the weight vector; this
  * pins that the training actually LEARNS — scores must separate the
  * target class from the rest — and that iteration composes (more steps
  * move the weights, same direction).
  */
class LogRegSpec extends SparkSpec {

  test("3-step weights separate the target class on average") {
    val emb = graft.Tables.embeddings(spark, sf0001)
    val w = LogReg.trainedWeights(emb, targetLabel = 1L, iters = 3, lr = 0.5)
    assert(w.exists(_ != 0.0), "training must move the weights")
    val wCol = array(w.toIndexedSeq.map(lit): _*)
    val m = graft.functions.VectorExpressions.vecDot(
      expr("transform(embedding, x -> CAST(x AS DOUBLE))"), wCol)
    val scored = emb.select(col("label"), LogReg.squash(m).as("p"))
    val Array(pos, neg) = scored
      .groupBy((col("label") === 1).as("is_target"))
      .agg(avg(col("p")).as("mean_p"))
      .orderBy(col("is_target").desc)
      .collect().map(_.getDouble(1))
    assert(pos > neg,
      s"mean score of target class ($pos) must exceed the rest ($neg)")
  }

  test("precision@50 beats the base rate (the model retrieves, not guesses)") {
    val emb = graft.Tables.embeddings(spark, sf0001)
    val row = LogReg.evaluateAtK(emb, k = 50).first()
    val (nPos, tp) = (row.getAs[Long]("n_pos"), row.getAs[Long]("tp"))
    val total = emb.count()
    val baseRate = nPos.toDouble / total
    val precision = row.getAs[Double]("precision")
    assert(precision > baseRate,
      s"precision@50 $precision must beat the base rate $baseRate (tp=$tp)")
    assert(row.getAs[Double]("f1") > 0.0)
  }

  test("sparse trainer learns a text-derived label through the join shape") {
    // the gate label (lang) is drawn independently of the tokens in this
    // synthetic corpus, so it carries no lexical signal — train against a
    // label the text CAN predict instead: "document mentions 'spark'"
    val docs = graft.Tables.documents(spark, sf0001)
    val label = when(col("text").contains("spark"), 1.0).otherwise(0.0)
    val w = SparseLogReg.trainedWeightRelation(docs, label)
    assert(w.filter(col("w") =!= 0.0).count() > 0L, "weights must move")
    val scored = SparseLogReg.trainAndScore(docs, label, k = 10000)
    val classes = scored
      .groupBy(col("is_target")).agg(avg(col("score")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(classes.size === 2, s"need both classes in the corpus: $classes")
    assert(classes(1L) > classes(0L),
      s"mean score of mentioning docs (${classes(1L)}) must exceed the rest " +
        s"(${classes(0L)})")
    // determinism: retraining is bit-identical
    val again = SparseLogReg.train(docs, label).collect().map(_.toString).toSeq
    assert(again === SparseLogReg.train(docs, label).collect().map(_.toString).toSeq)
  }

  test("scores stay in (0,1) and top-k output is deterministic") {
    val emb = graft.Tables.embeddings(spark, sf0001)
    val a = LogReg.trainAndScore(emb).collect().map(_.toString).toSeq
    val b = LogReg.trainAndScore(emb).collect().map(_.toString).toSeq
    assert(a === b, "retraining on identical data must be bit-identical")
    val bad = LogReg.trainAndScore(emb, k = 1000)
      .filter(col("score") <= 0.0 || col("score") >= 1.0).count()
    assert(bad === 0L)
  }
}
