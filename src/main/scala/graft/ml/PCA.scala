package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** In-engine PCA over the embedding corpus — the whitening / compaction
  * step an embedding-quality pass runs before clustering or indexing:
  * the exact covariance matrix as a RELATION, and its top principal
  * component by power iteration over that relation. Together with
  * [[LogReg]] (supervised head) this closes the unsupervised half of the
  * in-engine training surface.
  *
  * Design for 100 TB:
  *  - The covariance is computed in ONE corpus pass over per-row centered
  *    outer products: each row expands to its d·(d+1)/2 upper-triangle
  *    products inside a single projection (nested `transform` HOFs — no
  *    join, no per-row shuffle), and the (i,j)-keyed aggregate is
  *    map-side combined, so the exchange carries d² partial rows per
  *    task, never the product stream. The d² blow-up is CPU inherent to
  *    covariance (every algorithm computes every product), not IO.
  *  - The means ride in as a LITERAL d-array (the [[LogReg
  *    .trainedWeights]] bounded-artifact pattern): one cheap pre-pass,
  *    d collected doubles, centering is then per-row arithmetic.
  *  - Power iteration treats the matrix as a RELATION (i, j, cov) and
  *    the vector as a d-row relation: each step is matrix⋈vector on j +
  *    a d-group aggregate — the shape that still works when d² outgrows
  *    a broadcast (sparse feature covariances), unlike a driver-side
  *    matrix. Iteration count is a fixed small hyperparameter.
  *
  * Cross-engine determinism (the DuckDB oracle replays everything): all
  * cross-ROW sums — component means, covariance cells, mat-vec products,
  * the squared norm — quantize each term (1e7; 1e12 for the norm, whose
  * terms are squares of already-small numbers) and sum exact DECIMAL
  * (association-free); per-row centering and products are single IEEE
  * ops; sqrt is correctly rounded by contract on both engines; the
  * normalized vector re-quantizes at 1e7 so each iteration starts from
  * identical doubles.
  */
object PCA {

  /** Per-dimension corpus means as a bounded d-element artifact (the
    * literal-array pattern): exact 1e7-quantized sums, one division each.
    */
  def dimMeans(embeddings: DataFrame): Array[Double] = {
    val perDim = embeddings
      .select(posexplode(expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .as(Seq("dim", "x")))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("x") * lit(1e7) + lit(0.5)).cast(DecimalType(25, 0)))
          .as("sq"))
      .select(col("dim"),
        (col("sq").cast("double") / lit(1e7) / col("n").cast("double")).as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    Array.tabulate(perDim.size)(perDim)
  }

  /** Upper-triangle population covariance as a relation: (i, j, cov) for
    * j >= i, cov = Σ(x_i − m_i)(x_j − m_j)/n, 1e6-rounded at the edge.
    */
  def covariance(embeddings: DataFrame): DataFrame =
    covariance(embeddings, dimMeans(embeddings))

  /** Same, reusing already-collected means — callers that also need the
    * means for centering (projection, whitening) pay the means
    * aggregation once, not once per consumer.
    */
  def covariance(embeddings: DataFrame, m: Array[Double]): DataFrame = {
    val mLit = array(m.toIndexedSeq.map(lit): _*)
    val centered = embeddings.select(
      transform(expr("transform(embedding, x -> CAST(x AS DOUBLE))"),
        (x, i) => x - element_at(mLit, i + lit(1))).as("cx"))
    val prods = centered
      .select(explode(filter(
        flatten(transform(col("cx"), (xi, i) =>
          transform(col("cx"), (xj, j) =>
            struct(i.as("i"), j.as("j"), (xi * xj).as("p"))))),
        st => st.getField("j") >= st.getField("i"))).as("s"))
      .select(col("s.i").as("i"), col("s.j").as("j"), col("s.p").as("p"))
    prods.groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("p") * lit(1e7) + lit(0.5)).cast(DecimalType(25, 0)))
          .as("sq"))
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        graft.Parity.pround(
          col("sq").cast("double") / lit(1e7) / col("n").cast("double"), 6)
          .as("cov"))
  }

  /** Top principal component by `iters` power-iteration rounds over the
    * (i, j, cov) upper-triangle relation. Returns (dim, loading,
    * eigenvalue): the final normalized vector plus the Rayleigh estimate
    * ‖Cv‖ (v is unit-norm, so the mat-vec norm IS the eigenvalue
    * estimate). Start vector is the exact constant 1/8 (unit norm for
    * d = 64); covariance is PSD so the iteration's sign is stable from a
    * positive start, and both engines replay identical arithmetic anyway.
    */
  def powerIteration(cov: DataFrame, iters: Int): DataFrame =
    iterate(symmetrize(cov), iters)

  /** Mirror the upper triangle to the full symmetric matrix, scratch-
    * materialized once (read per iteration round).
    */
  private def symmetrize(cov: DataFrame): DataFrame =
    graft.Scratch.table(
      cov.unionAll(cov.filter(col("i") < col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("cov"))),
      "pca-cov-full")

  /** The iteration loop over an already-full symmetric (i, j, cov)
    * relation — shared by the top component and the Gram–Schmidt second.
    * When `ortho` is set (a d-row (j, v1) relation), each round projects
    * the mat-vec product off that direction BEFORE normalizing:
    * z = y − (y·v1)·v1. The projection is a d-row broadcast join plus a
    * 1-row dot-product aggregate per round — bounded BY CONSTRUCTION by
    * the embedding dimensionality.
    */
  private def iterate(cf: DataFrame, iters: Int,
      ortho: Option[DataFrame] = None): DataFrame = {
    var v = cf.select(col("j")).distinct()
      .select(col("j"), lit(0.125).as("v"))
    var norm: DataFrame = null
    for (_ <- 1 to iters) {
      val y = cf.join(v, "j")
        .groupBy(col("i"))
        .agg((sum(floor(col("cov") * col("v") * lit(1e7) + lit(0.5))
            .cast(DecimalType(25, 0))).cast("double") / lit(1e7)).as("y"))
      val z = ortho match {
        case None => y
        case Some(v1) =>
          val yv = y.join(broadcast(v1.select(col("j").as("i"),
            col("v").as("v1"))), "i")
          val dot = yv.agg(
            (sum(floor(col("y") * col("v1") * lit(1e7) + lit(0.5))
              .cast(DecimalType(25, 0))).cast("double") / lit(1e7)).as("dt"))
          yv.crossJoin(broadcast(dot))
            .select(col("i"),
              graft.Parity.pround(
                col("y") - col("dt") * col("v1"), 7).as("y"))
      }
      norm = z.agg(
        sqrt(sum(floor(col("y") * col("y") * lit(1e12) + lit(0.5))
            .cast(DecimalType(38, 0))).cast("double") / lit(1e12)).as("nm"))
      // materialize each round's d-row vector: the round's dot/norm
      // BROADCAST subqueries are separate jobs that would otherwise
      // re-execute the whole chain prefix (quadratic re-evaluation across
      // rounds — pca_pc2 measured 43.6 s at sf0.1 dominated by exactly
      // this); a parquet round-trip of doubles is bit-exact, so values
      // are unchanged. d rows per write, bounded by construction.
      v = graft.Scratch.table(
        z.crossJoin(broadcast(norm))
          .select(col("i").as("j"),
            graft.Parity.pround(col("y") / col("nm"), 7).as("v")),
        "pca-v-round")
    }
    v.crossJoin(broadcast(norm))
      .select(col("j").as("dim"), col("v").as("loading"),
        graft.Parity.pround(col("nm"), 6).as("eigenvalue"))
  }

  /** Second principal component by per-round Gram–Schmidt against pc1:
    * power-iterate the SAME (i, j, cov) relation, projecting each
    * mat-vec product off the reported v₁ before normalizing. Unlike
    * one-shot Hotelling deflation (C − λ₁v₁v₁ᵀ), whose orthogonality
    * error inherits v₁'s own convergence residual (measured ≈0.15 dot at
    * 4 rounds on the test corpus), the projection makes v₂ ⊥ v₁ BY
    * CONSTRUCTION at every round — up to the 1e7 quantization — no
    * matter how converged v₁ is, and skips materializing a second d²
    * relation entirely (the projection is d-row work per round). With
    * pc1 the 1-D [[powerIteration]] projection becomes a real 2-D map.
    * Returns (dim, loading, eigenvalue) of the second component.
    */
  def secondComponent(cov: DataFrame, iters: Int): DataFrame =
    topTwo(cov, iters).filter(col("component") === 2)
      .drop("component")

  /** Both leading components in ONE pass over the shared symmetric
    * relation (pc1 is scratched once and reused as pc2's projection
    * direction — callers wanting both never pay the pc1 chain twice):
    * (component ∈ {1,2}, dim, loading, eigenvalue).
    */
  def topTwo(cov: DataFrame, iters: Int): DataFrame = {
    val cf = symmetrize(cov)
    val pc1 = graft.Scratch.table(iterate(cf, iters), "pca-pc1")
    val pc2 = iterate(cf, iters,
      ortho = Some(pc1.select(col("dim").as("j"), col("loading").as("v"))))
    pc1.withColumn("component", lit(1))
      .unionByName(pc2.withColumn("component", lit(2)))
  }
}
