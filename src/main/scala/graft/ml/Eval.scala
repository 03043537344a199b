package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Classifier-evaluation primitives over a scored corpus — the reports a
  * curation classifier ships beyond the precision@k cut in
  * [[LogReg.evaluateAtK]]: exact ROC-AUC and a reliability (calibration)
  * table. Both take a `(y: 0/1 BIGINT, score: DOUBLE)` frame whose score
  * is already quantized (`Parity.pround(_, 6)`), and both are pure
  * integer/rational arithmetic downstream of it, so the DuckDB oracle can
  * replay them bit-for-bit.
  *
  * Design for 100 TB:
  *  - AUC is the Mann–Whitney rank-sum, computed on the PER-SCORE
  *    aggregate, not per row: because scores are quantized to 1e-6 in
  *    [0, 1], that aggregate has AT MOST 1,000,001 rows no matter how
  *    large the corpus — the one global window this query runs is over a
  *    relation whose size is bounded by CONSTRUCTION, not by data. The
  *    corpus-scale work is a single hash aggregate with map-side partials.
  *  - Ties are exact: a score bucket of n rows holding np positives
  *    contributes its average rank in closed form (no per-row rank
  *    assignment, no dense_rank approximation).
  *  - All rank sums stay in BIGINT (overflow at ~3·10^9 corpus rows ×
  *    corpus rank — beyond 2^63 only past ~10^9.5 rows; switch the two
  *    sums to DECIMAL(38,0) if an eval split ever exceeds that).
  *  - Calibration bins by `floor(10·score)` into 10 fixed buckets — a
  *    10-group aggregate; the per-bin mean score sums exact DECIMAL(18,6)
  *    (lossless for 1e-6-quantized scores in [0,1]).
  */
object Eval {

  /** Exact ROC-AUC of `scored` (columns `y` ∈ {0,1} and quantized
    * `score`). One row: (n_pos, n_neg, n_scores, auc). Empty classes have
    * no ranking to measure — auc is defined 0.5 there, same as the oracle.
    *
    * Identity used (ascending average ranks R_i over all rows):
    *   AUC = (Σ_{i∈pos} R_i − n_pos(n_pos+1)/2) / (n_pos·n_neg)
    * where a score bucket of n rows starting after `cum` lower-scored rows
    * contributes np·(cum + (n+1)/2); both halves are doubled so the sums
    * stay integral until the final single division.
    */
  def rocAuc(scored: DataFrame): DataFrame = {
    val byScore = scored
      .groupBy(col("score"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("np"))
    // ≤ 1e6+1 rows by construction (quantized scores in [0,1]) — the
    // unpartitioned window is bounded regardless of corpus size
    val w = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val agg = byScore
      .withColumn("cum", coalesce(sum(col("n")).over(w), lit(0L)))
      .agg(
        // coalesce: an EMPTY scored frame sums to null, which would slip
        // past the `=== 0` guard below and null the promised 0.5
        coalesce(sum(col("np") * (lit(2L) * col("cum") + col("n") + lit(1L))),
          lit(0L)).as("num2"),
        coalesce(sum(col("np")), lit(0L)).as("n_pos"),
        coalesce(sum(col("n") - col("np")), lit(0L)).as("n_neg"),
        count(lit(1)).as("n_scores"))
    agg.select(col("n_pos"), col("n_neg"), col("n_scores"),
      graft.Parity.pround(
        when(col("n_pos") === 0L || col("n_neg") === 0L, lit(0.5))
          .otherwise(
            (col("num2") - col("n_pos") * (col("n_pos") + lit(1L))).cast("double") /
              (lit(2L) * col("n_pos") * col("n_neg")).cast("double")),
        6).as("auc"))
  }

  /** Reliability table: decile bins of the score (bin 9 absorbs score =
    * 1.0), per-bin row count, positive count, exact mean score, and
    * positive rate. A calibrated classifier has mean_score ≈ frac_pos per
    * bin. 10 output rows max; bins with no rows are absent (the oracle
    * agrees).
    */
  def calibrationBins(scored: DataFrame): DataFrame =
    scored
      .withColumn("bin", least(floor(col("score") * lit(10.0)).cast("long"), lit(9L)))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("y")).as("n_pos"),
        graft.Parity.pround(
          sum(col("score").cast(DecimalType(18, 6))).cast("double") /
            count(lit(1)).cast("double"), 6).as("mean_score"))
      .withColumn("frac_pos", graft.Parity.pround(
        col("n_pos").cast("double") / col("n").cast("double"), 6))
      .orderBy(col("bin"))

  /** Weighted isotonic (least-squares) fit of the per-bin positive rate —
    * the pool-adjacent-violators solution, computed in the MINIMAX closed
    * form fitted(i) = max_{j≤i} min_{k≥i} rate(j..k) over the BOUNDED bin
    * relation (`bins`: (bin, n, n_pos), ≤ bin-count rows by construction):
    * prefix sums over ≤10 rows, a segment self-join, bounded (i, j, k)
    * triples, two aggregates — never a corpus pass (the scoring/binning
    * upstream is the corpus-scale stage). Each segment rate is one IEEE
    * division of exact integer sums; min/max are selections, so the fit is
    * hash-exact cross-engine. EvalSpec drives it with violator bins
    * against a driver-side PAV reference.
    */
  def isotonicFit(bins: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = graft.Scratch.table(bins, "iso-bins")
    // unpartitioned window over the bounded bin relation (documented
    // bounded-relation exception, the sketch read-out shape)
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = graft.Scratch.table(
      b.withColumn("cn", sum(col("n")).over(w))
        .withColumn("cp", sum(col("n_pos")).over(w)),
      "iso-cum")
    val segs = cum.as("k").join(cum.as("j"), col("j.bin") <= col("k.bin"))
      .select(col("j.bin").as("j"), col("k.bin").as("k"),
        ((col("k.cp") - col("j.cp") + col("j.n_pos")).cast("double") /
          (col("k.cn") - col("j.cn") + col("j.n")).cast("double")).as("seg"))
    val fitted = b.select(col("bin").as("i"))
      .join(segs, col("j") <= col("i") && col("k") >= col("i"))
      .groupBy(col("i"), col("j")).agg(min(col("seg")).as("mn"))
      .groupBy(col("i")).agg(max(col("mn")).as("fit"))
    b.join(fitted, col("bin") === col("i"))
      .select(col("bin"), col("n"), col("n_pos"),
        graft.Parity.pround(
          col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("frac_pos"),
        graft.Parity.pround(col("fit"), 6).as("fitted"))
  }
}
