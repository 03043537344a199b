package graft.ml

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** In-engine logistic-regression training — the missing half of the
  * curation-classifier loop (`embedding_score` is the INFERENCE primitive;
  * this is where its weight vector comes from). Full-batch gradient
  * descent, every iteration ONE distributed pass over the corpus:
  *
  *   p_i   = 0.5 + 0.5 · m_i/(1+|m_i|)        (rational sigmoid, m = w·x)
  *   g_d   = Σ_i x_id·(y_i − p_i) / n          (exact quantized sum)
  *   w'_d  = w_d + lr · g_d
  *
  * Design for 100 TB:
  *  - The weight vector rides into each pass as a LITERAL array (64
  *    doubles baked into the plan — the broadcast-scalar pattern), so the
  *    margin is one codegen'd [[graft.functions.VectorExpressions.vecDot]]
  *    per row, no join.
  *  - The gradient is a posexplode → (dim)-keyed aggregate: 64 groups,
  *    map-side partials, the exchange carries 64 rows per task. The only
  *    driver materialization is the 64-row gradient per iteration — a
  *    bounded model artifact, same class as the IVF centroid collect.
  *  - Iteration count is fixed and small (a hyperparameter, not a
  *    convergence loop), so lineage stays shallow without scratch.
  *
  * Cross-engine determinism (the oracle replays every iteration in
  * DuckDB): the margin is the sequential-fold dot contract VecDot already
  * pins; the sigmoid is the RATIONAL form (abs/add/div/mul — single
  * correctly-rounded IEEE ops; exp() has no cross-engine bit contract);
  * and the cross-ROW gradient sum — the one order-dependent reduction —
  * quantizes each term at 1e7 and sums exact DECIMAL (association-free),
  * the PageRank/centroid quantization. Identical doubles in, identical
  * weights out, every iteration.
  */
object LogReg {

  val Dims = 64

  /** Rational sigmoid 0.5 + 0.5·m/(1+|m|) — same expression tree as the
    * DuckDB oracle's `0.5 + 0.5 * (m / (1 + abs(m)))`.
    */
  def squash(m: Column): Column =
    lit(0.5) + lit(0.5) * (m / (lit(1.0) + abs(m)))

  /** One-vs-rest training on the embeddings table: y = (label == target).
    * Returns the trained weights as (dim, weight) — the model artifact a
    * store would persist next to its vocabulary.
    */
  def trainedWeights(embeddings: DataFrame, targetLabel: Long,
      iters: Int, lr: Double): Array[Double] = {
    val corpus = embeddings.select(
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"),
      when(col("label") === targetLabel, lit(1.0)).otherwise(lit(0.0)).as("y"))
    val n = corpus.count()
    var w = Array.fill(Dims)(0.0)
    for (_ <- 1 to iters) {
      val wCol = array(w.toIndexedSeq.map(lit): _*)
      val m = graft.functions.VectorExpressions.vecDot(col("emb"), wCol)
      val err = col("y") - squash(m)
      val grads = corpus
        .select(col("y"), err.as("err"), posexplode(col("emb")).as(Seq("dim", "x")))
        .groupBy(col("dim"))
        .agg((sum(floor(col("x") * col("err") * lit(1e7) + lit(0.5))
            .cast("decimal(25,0)")).cast("double") / lit(1e7) / lit(n.toDouble))
          .as("g"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      w = w.zipWithIndex.map { case (wd, d) => wd + lr * grads(d) }
    }
    w
  }

  /** Gate-facing form: the weight relation (dim, weight). */
  def train(embeddings: DataFrame, targetLabel: Long = 1L,
      iters: Int = 3, lr: Double = 0.5): DataFrame = {
    val s = embeddings.sparkSession
    import s.implicits._
    trainedWeights(embeddings, targetLabel, iters, lr).zipWithIndex
      .map { case (wd, d) => (d.toLong, wd) }.toSeq
      .toDF("dim", "weight")
      .select(col("dim"), graft.Parity.pround(col("weight"), 8).as("weight"))
      .orderBy(col("dim"))
  }

  /** Retrieval-style evaluation of the trained model: precision@k /
    * recall@k / F1 over the top-k scored rows — the report a curation
    * classifier ships with when it gates a selection budget (a fixed
    * decision threshold is brittle: an unlucky model can predict zero
    * positives and NaN the ratios; a rank cut never can). The ranking is
    * engine-exact (prounded score, vec_id tie-break); the counts are
    * exact BIGINTs; F1 guards the tp=0 corner identically on both
    * engines. One corpus pass for scores, a WindowGroupLimit-style top-k,
    * one 1-row positives count crossed back in.
    */
  def evaluateAtK(embeddings: DataFrame, targetLabel: Long = 1L,
      iters: Int = 3, lr: Double = 0.5, k: Int = 50): DataFrame = {
    // one scoring pipeline shared with the Eval reports — the oracle
    // depends on every consumer quantizing the identical expression
    val top = scoreAll(embeddings, targetLabel, iters, lr)
      .orderBy(col("score").desc, col("vec_id")).limit(k)
      .agg(sum(col("y")).as("tp"))
    val npos = embeddings
      .agg(sum(when(col("label") === targetLabel, 1L).otherwise(0L)).as("n_pos"))
    val prec = col("tp").cast("double") / lit(k.toDouble)
    // n_pos = 0 (label absent from the corpus) would make recall 0/0 = NaN
    // — define recall as 0 there, identically to the oracle
    val rec = when(col("n_pos") === 0L, lit(0.0))
      .otherwise(col("tp").cast("double") / col("n_pos").cast("double"))
    top.crossJoin(npos).select(lit(k.toLong).as("k"), col("n_pos"), col("tp"),
      graft.Parity.pround(prec, 6).as("precision"),
      graft.Parity.pround(rec, 6).as("recall"),
      graft.Parity.pround(
        when(col("tp") === 0L, lit(0.0))
          .otherwise(lit(2.0) * prec * rec / (prec + rec)), 6).as("f1"))
  }

  /** Train, then SCORE the corpus with the trained model in the same
    * plan — the end-to-end loop (train → broadcast weights → map-only
    * inference) that `embedding_score` only showed the second half of.
    * Top-k by score, vec_id tie-break.
    */
  def trainAndScore(embeddings: DataFrame, targetLabel: Long = 1L,
      iters: Int = 3, lr: Double = 0.5, k: Int = 20): DataFrame = {
    val w = trainedWeights(embeddings, targetLabel, iters, lr)
    val wCol = array(w.toIndexedSeq.map(lit): _*)
    val m = graft.functions.VectorExpressions.vecDot(
      expr("transform(embedding, x -> CAST(x AS DOUBLE))"), wCol)
    embeddings.select(col("vec_id"), col("label").cast("long").as("label"),
        graft.Parity.pround(squash(m), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(k)
  }

  /** Train, then score the WHOLE corpus — the `(y, score)` frame the
    * [[Eval]] reports (ROC-AUC, calibration) consume. Map-only after
    * training (one codegen'd dot + rational sigmoid per row); score is
    * 1e-6-quantized, which is what bounds Eval.rocAuc's per-score
    * aggregate at 1e6+1 rows.
    */
  def scoreAll(embeddings: DataFrame, targetLabel: Long = 1L,
      iters: Int = 3, lr: Double = 0.5): DataFrame = {
    val w = trainedWeights(embeddings, targetLabel, iters, lr)
    val wCol = array(w.toIndexedSeq.map(lit): _*)
    val m = graft.functions.VectorExpressions.vecDot(
      expr("transform(embedding, x -> CAST(x AS DOUBLE))"), wCol)
    embeddings.select(col("vec_id"),
      when(col("label") === targetLabel, 1L).otherwise(0L).as("y"),
      graft.Parity.pround(squash(m), 6).as("score"))
  }
}
