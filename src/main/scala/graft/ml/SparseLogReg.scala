package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** SPARSE logistic regression over hashed text features — the LARGE-model
  * half of the training story. [[LogReg]] broadcasts its 64 dense weights
  * as literals; that pattern dies the moment the model outgrows a
  * broadcast (hashed vocab features at 2²⁰⁺ dims). Here the model is a
  * RELATION (feat, w) and every place it meets data is a KEY JOIN:
  *
  *   margin:   features ⋈ weights ON feat   (corpus-scale × model-scale)
  *   gradient: features ⋈ errors  ON doc_id, grouped by feat
  *   update:   weights  ⟗ gradients ON feat (full outer, co-partitioned)
  *
  * None of those joins carries a broadcast hint — at gate scale AQE
  * broadcasts the small side, at 100 TB with a 100M-row model the same
  * code plans co-partitioned shuffle joins; both aggregates are map-side
  * partial. The feature relation materializes ONCE (scratch) and feeds
  * every iteration; weights re-materialize per step so lineage stays
  * flat. Nothing model- or corpus-sized ever reaches the driver — unlike
  * dense [[LogReg]] there is NO driver collect at all; `train` returns
  * the weight relation as a DataFrame.
  *
  * Determinism: the feature hash is the engine-portable md5 parse
  * ([[PortableHash]]); the two cross-row sums (per-doc margin, per-feat
  * gradient) quantize each term at 1e7 into exact DECIMAL — the same
  * association-free contract as the dense trainer — and the sigmoid is
  * the rational form. The oracle replays both iterations join for join.
  */
object SparseLogReg {

  val DefaultDims = 256

  /** Per-term 1e7-quantized exact sum (association-free by construction). */
  private def quantSum(term: Column): Column =
    sum(floor(term * lit(1e7) + lit(0.5)).cast("decimal(25,0)"))
      .cast("double") / lit(1e7)

  /** The gate label: English-language docs. The synthetic corpus draws
    * tokens independently of `lang`, so this label has no lexical signal
    * — which is irrelevant to the ORACLE (bit-parity of the training
    * trajectory is the contract) but means behavior specs should train
    * against a text-derived label instead (LogRegSpec does).
    */
  val EnglishLabel: Column = when(col("lang") === "en", lit(1.0))
    .otherwise(lit(0.0))

  /** (doc_id, y, feat, cnt): hashed bag-of-words with term counts;
    * `label` must evaluate to 1.0/0.0 over the documents columns.
    */
  def features(docs: DataFrame, label: Column,
      dims: Int = DefaultDims): DataFrame =
    docs.select(col("doc_id"), label.as("y"),
        explode(split(col("text"), " ")).as("token"))
      .select(col("doc_id"), col("y"),
        pmod(PortableHash.hash32(col("token")), lit(dims.toLong)).as("feat"))
      .groupBy(col("doc_id"), col("y"), col("feat"))
      .agg(count(lit(1)).as("cnt"))

  /** Full-batch gradient descent; returns the weight RELATION (feat, w).
    * Weights start empty (w ≡ 0 via the left join's coalesce), so
    * iteration 1's margins are exactly 0 and p = 0.5 — the oracle mirrors
    * this with an empty w0 relation rather than special-casing step 1.
    */
  def trainedWeightRelation(docs: DataFrame, label: Column = EnglishLabel,
      iters: Int = 2, lr: Double = 0.5, dims: Int = DefaultDims): DataFrame =
    trainOnFeatures(
      graft.Scratch.table(features(docs, label, dims), "slr-feats"),
      docs.count(), iters, lr)

  /** The iteration loop over an ALREADY-materialized feature relation —
    * split out so trainAndScore reuses the same scratch table for the
    * scoring join instead of paying the tokenize+hash+aggregate corpus
    * pass twice.
    */
  private def trainOnFeatures(f: DataFrame, n: Long,
      iters: Int, lr: Double): DataFrame = {
    val s = f.sparkSession
    import s.implicits._
    var w: DataFrame = Seq.empty[(Long, Double)].toDF("feat", "w")
    for (it <- 1 to iters) {
      val m = f.join(w, Seq("feat"), "left")
        .groupBy(col("doc_id"), col("y"))
        .agg(quantSum(col("cnt") * coalesce(col("w"), lit(0.0))).as("m"))
      val err = m.select(col("doc_id"),
        (col("y") - LogReg.squash(col("m"))).as("err"))
      val g = f.join(err, "doc_id")
        .groupBy(col("feat"))
        .agg((quantSum(col("cnt") * col("err")) / lit(n.toDouble)).as("g"))
      w = graft.Scratch.table(
        w.join(g, Seq("feat"), "full_outer")
          .select(col("feat"),
            (coalesce(col("w"), lit(0.0)) +
              lit(lr) * coalesce(col("g"), lit(0.0))).as("w")),
        s"slr-w$it")
    }
    w
  }

  /** Gate form: the trained model relation, prounded. */
  def train(docs: DataFrame, label: Column = EnglishLabel,
      iters: Int = 2, lr: Double = 0.5, dims: Int = DefaultDims): DataFrame =
    trainedWeightRelation(docs, label, iters, lr, dims)
      .select(col("feat"), graft.Parity.pround(col("w"), 8).as("weight"))
      .orderBy(col("feat"))

  /** Inference through the SAME join shape (no broadcast of the model):
    * features ⋈ weights → per-doc quantized margin → rational sigmoid.
    * Top-k docs by score, doc_id tie-break.
    */
  def trainAndScore(docs: DataFrame, label: Column = EnglishLabel,
      iters: Int = 2, lr: Double = 0.5, dims: Int = DefaultDims,
      k: Int = 20): DataFrame = {
    val f = graft.Scratch.table(features(docs, label, dims), "slr-feats")
    val w = trainOnFeatures(f, docs.count(), iters, lr)
    f.join(w, Seq("feat"), "left")
      .groupBy(col("doc_id"), col("y"))
      .agg(quantSum(col("cnt") * coalesce(col("w"), lit(0.0))).as("m"))
      .select(col("doc_id"), col("y").cast("long").as("is_target"),
        graft.Parity.pround(LogReg.squash(col("m")), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
