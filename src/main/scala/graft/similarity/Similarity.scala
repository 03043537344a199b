package graft.similarity

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k (exact, one pass, broadcast query
  * vector — at scale this is a map-side scan, no shuffle until top-k).
  * Scale path: random-hyperplane LSH bucketing — candidates come from the
  * query's bucket instead of the full corpus, turning 100 TB ANN into a
  * bucket-pruned scan; recall is tunable via planes/probes.
  *
  * Dot products are strictly sequential left-folds over double-cast
  * elements (`aggregate(sequence(...))`) so the DuckDB oracle reproduces
  * them bit-for-bit.
  */
object Similarity {

  /** Sequential dot product of two float-array columns, in double.
    * Backed by the codegen'd VecDot expression — identical fold order and
    * arithmetic to the `aggregate(sequence(...))` HOF form and the DuckDB
    * oracle's `list_reduce`, but fused into whole-stage codegen.
    */
  def dot(a: String, b: String): Column =
    graft.functions.VectorExpressions.vecDot(col(a), col(b))

  def l2Norm(a: String): Column = sqrt(dot(a, a))

  def cosine(a: String, b: String): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Per-vector L2 norms. */
  def norms(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), col("label"),
      graft.Parity.pround(l2Norm("embedding"), 6).as("l2_norm"))

  /** Exact top-k neighbours of `queryVecId` by cosine (excluding itself).
    * The one-row query side is broadcast; the scan side computes one fused
    * projection per row — no shuffle before the global top-k.
    */
  def knnBruteForce(embeddings: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_embedding"),
        l2Norm("embedding").as("q_norm"))
    val cos = dot("embedding", "q_embedding") / (l2Norm("embedding") * col("q_norm"))
    embeddings.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        graft.Parity.pround(cos, 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Exact top-k per query for a SET of query vectors — the ground-truth
    * side of ANN recall evaluation. One corpus scan x broadcast query set
    * (evaluation query sets are small by construction), ranked per query
    * with the same rounded-cosine ordering the ANN paths use, so
    * recall@k is well-defined under ties.
    */
  def knnBruteForceMulti(embeddings: DataFrame, queryVecIds: Seq[Long], k: Int): DataFrame = {
    val q = embeddings.filter(col("vec_id").isin(queryVecIds: _*))
      .select(col("vec_id").as("query_vec_id"),
        col("embedding").as("q_embedding"), l2Norm("embedding").as("q_norm"))
    val cos = dot("embedding", "q_embedding") / (l2Norm("embedding") * col("q_norm"))
    val w = Window.partitionBy("query_vec_id")
      .orderBy(col("cos_sim").desc, col("vec_id"))
    embeddings.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_vec_id"))
      .select(col("query_vec_id"), col("vec_id"),
        graft.Parity.pround(cos, 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Near-duplicate vector pairs above `minCosine`, blocked by `label`
    * (metadata blocking keeps the pair space n²/|blocks|; LSH below is the
    * unblocked scale path).
    *
    * Norms are materialized per side BEFORE the join: otherwise Catalyst
    * folds the full cosine (three interpreted array-folds) into the join's
    * bound condition and evaluates it per candidate pair — observed ~100x
    * slowdown. With norms precomputed each pair costs one dot product.
    */
  def neardupPairs(embeddings: DataFrame, minCosine: Double): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("label"), col("embedding"),
      l2Norm("embedding").as("norm"))
    val l = e.as("l")
    val r = e.as("r")
    val cos = dot("l.embedding", "r.embedding") / (col("l.norm") * col("r.norm"))
    l.join(r, col("l.label") === col("r.label") && col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("vec_id_a"), col("r.vec_id").as("vec_id_b"),
        col("l.label").as("label"),
        graft.Parity.pround(cos, 6).as("cos_sim"))
      .filter(col("cos_sim") >= minCosine)
  }

  /** Cell-blocked embedding near-dup — the SemDeDup shape and the unblocked
    * scale path that [[neardupPairs]]' metadata blocking is not: assign
    * every vector to its `nAssign` nearest coarse cells (one corpus scan ×
    * broadcast centroids, same quantizer as [[annIvfTopK]]), then pair only
    * within a cell. Pair space is Σ_cell n_cell² — bounded by the largest
    * cell and shrinking with the centroid count (which scales with n at
    * 100 TB), never the n² all-pairs stream. nAssign > 1 is the standard
    * recall fix for near-boundary pairs split across cells; pairs found in
    * both shared cells collapse via `distinct` on the id pair BEFORE the
    * cosine join, so each surviving pair costs exactly one codegen'd dot.
    *
    * By construction this reports the within-cell SUBSET of ≥`minCosine`
    * pairs (the SemDeDup trade); the oracle computes the identical subset
    * because assignment is deterministic (cosine ties break to the smaller
    * cent_id on both engines).
    */
  def neardupIvf(embeddings: DataFrame, minCosine: Double,
      centroidVecIds: Seq[Long] = (100L until 116L),
      nAssign: Int = 2): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("embedding"),
      l2Norm("embedding").as("norm"))
    val cents = e.filter(col("vec_id").isin(centroidVecIds: _*))
      .select(col("vec_id").as("cent_id"), col("embedding").as("c_emb"),
        col("norm").as("c_norm"))
    val scored = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cent_id"),
        (dot("embedding", "c_emb") / (col("norm") * col("c_norm"))).as("c_cos"))
    val assign = scored
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("c_cos").desc, col("cent_id"))))
      .filter(col("rn") <= nAssign)
      .select(col("vec_id"), col("cent_id").as("cell"))
    val pairs = assign.as("a")
      .join(assign.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id_a"), col("b.vec_id").as("vec_id_b"))
      .distinct()
    val cos = dot("l.embedding", "r.embedding") / (col("l.norm") * col("r.norm"))
    pairs
      .join(e.as("l"), col("vec_id_a") === col("l.vec_id"))
      .join(e.as("r"), col("vec_id_b") === col("r.vec_id"))
      .select(col("vec_id_a"), col("vec_id_b"),
        graft.Parity.pround(cos, 6).as("cos_sim"))
      .filter(col("cos_sim") >= minCosine)
  }

  /** Cluster-balanced diversity subsample (the SemDeDup/DC-style curation
    * step AFTER near-dup removal): coarse-quantize every vector to its
    * nearest centroid cell, then keep at most `perCell` vectors per cell,
    * chosen by portable hash — dense clusters (over-represented content)
    * are capped while sparse clusters (rare content) survive intact, which
    * is the diversity-preserving property plain uniform sampling lacks.
    *
    * Scale shape: one corpus scan × broadcast centroids with a map-side
    * `max_by` for assignment (same as [[annIvfTopK]]); the per-cell cap is
    * a window partitioned BY CELL (parallel across cells; WindowGroupLimit
    * prunes to perCell rows per cell before the sort spills); cell sizes
    * are a K-row aggregate broadcast back. Selection is hash-of-key, never
    * rand(), so the sample is stable across runs, retries, and engines.
    */
  def clusterSample(embeddings: DataFrame, perCell: Int = 5,
      centroidVecIds: Seq[Long] = (100L until 116L)): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("embedding"),
      l2Norm("embedding").as("norm"))
    val cents = e.filter(col("vec_id").isin(centroidVecIds: _*))
      .select(col("vec_id").as("cent_id"), col("embedding").as("c_emb"),
        col("norm").as("c_norm"))
    val scored = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cent_id"),
        (dot("embedding", "c_emb") / (col("norm") * col("c_norm"))).as("c_cos"))
    val assign = scored.groupBy("vec_id")
      .agg(max_by(col("cent_id"),
        struct(col("c_cos"), (-col("cent_id")).as("tb"))).as("cell"))
    val sizes = assign.groupBy("cell").agg(count(lit(1)).as("cell_size"))
    assign
      .withColumn("h", graft.functions.PortableHash.hash32(col("vec_id")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("cell").orderBy(col("h"), col("vec_id"))))
      .filter(col("rank") <= perCell)
      .join(broadcast(sizes), "cell")
      .select(col("cell"), col("rank"), col("vec_id"), col("cell_size"))
  }

  /** Deterministic random-hyperplane set (seeded), as literal arrays.
    * Exposed within graft so the DuckDB oracle can embed the exact same
    * plane values as SQL literals.
    */
  private[graft] def planes(nPlanes: Int, dim: Int, seed: Long): Seq[Array[Double]] = {
    val rng = new Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-bucket id for an embedding against the hyperplane set. */
  private def bucketExpr(planeSet: Seq[Array[Double]]): Column =
    planeSet.zipWithIndex.map { case (p, i) =>
      val d = graft.functions.VectorExpressions.vecDot(
        col("embedding"), typedLit(p.toSeq))
      when(d >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** IVF-style ANN top-k: a sampled-centroid coarse quantizer (centroids =
    * the vectors at fixed `centroidVecIds` — the deterministic analog of
    * k-means init by sampling), every vector assigned to its nearest
    * centroid by cosine, and each query probing its `nProbe` nearest cells.
    *
    * Scale shape: assignment is a broadcast of ~nCentroids rows against a
    * single corpus scan with a map-side-combinable `max_by` (the shuffle
    * carries |V| assignment rows, not the |V| x nCentroids score stream);
    * the search scans only ~nProbe/nCentroids of the corpus via the cell
    * equi-join. Ties (equal cosine) break to the smaller cent_id on both
    * engines.
    */
  def annIvfTopK(
      embeddings: DataFrame, queryVecIds: Seq[Long], k: Int,
      centroidVecIds: Seq[Long] = (100L until 116L),
      nProbe: Int = 4): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("embedding"),
      l2Norm("embedding").as("norm"))
    val cents = e.filter(col("vec_id").isin(centroidVecIds: _*))
      .select(col("vec_id").as("cent_id"), col("embedding").as("c_emb"),
        col("norm").as("c_norm"))
    // coarse quantization scores: one corpus scan x broadcast centroids
    val scored = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("norm"), col("cent_id"),
        (dot("embedding", "c_emb") / (col("norm") * col("c_norm"))).as("c_cos"))
    val assign = scored.groupBy("vec_id")
      .agg(max_by(col("cent_id"),
        struct(col("c_cos"), (-col("cent_id")).as("tb"))).as("cell"))
    val withCell = e.join(assign, "vec_id")
    val qprobe = scored
      .filter(col("vec_id").isin(queryVecIds: _*))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("c_cos").desc, col("cent_id"))))
      .filter(col("rn") <= nProbe)
      .select(col("vec_id").as("query_vec_id"), col("embedding").as("q_emb"),
        col("norm").as("q_norm"), col("cent_id").as("cell"))
    val w = Window.partitionBy("query_vec_id")
      .orderBy(col("cos_sim").desc, col("vec_id"))
    val cos = dot("embedding", "q_emb") / (col("norm") * col("q_norm"))
    withCell
      .join(broadcast(qprobe), Seq("cell")) // cell-pruned candidates only
      .filter(col("vec_id") =!= col("query_vec_id"))
      .select(col("query_vec_id"), col("vec_id"),
        graft.Parity.pround(cos, 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF index as a PARTITIONED STORE with incremental append — the ANN
    * serving shape at 100 TB. Cell assignment under a FIXED coarse
    * quantizer is per-row, so daily embedding batches append their
    * assignment rows under `cell=<id>` partition directories without
    * touching history; a query probes its nProbe best cells and the
    * candidate scan reads ONLY those directories — the probe side joins
    * on the partition column, so partition pruning (dynamic, at runtime,
    * once the probe set is computed) is what bounds the read to
    * ~nProbe/K of the index. Shares `ann_ivf_topk`'s oracle: store-backed
    * incremental search ≡ the in-memory one-shot search.
    *
    * The quantizer (centroid vectors) and the query vectors come from the
    * base table — they are the FIXED artifacts shipped with the index;
    * the corpus assignment rows are the incremental part.
    */
  def annIvfStoreTopK(
      spark: org.apache.spark.sql.SparkSession,
      base: DataFrame, batches: Seq[DataFrame], storeDir: String,
      queryVecIds: Seq[Long], k: Int,
      centroidVecIds: Seq[Long] = (100L until 116L),
      nProbe: Int = 4): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(storeDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(root, true)
    val cents = base
      .filter(col("vec_id").isin(centroidVecIds: _*))
      .select(col("vec_id").as("cent_id"), col("embedding").as("c_emb"),
        l2Norm("embedding").as("c_norm"))
    def scoredOf(df: DataFrame): DataFrame =
      df.select(col("vec_id"), col("embedding"), l2Norm("embedding").as("norm"))
        .crossJoin(broadcast(cents))
        .select(col("vec_id"), col("embedding"), col("norm"), col("cent_id"),
          (dot("embedding", "c_emb") / (col("norm") * col("c_norm"))).as("c_cos"))
    batches.foreach { b =>
      val scored = scoredOf(b)
      val assign = scored.groupBy("vec_id")
        .agg(max_by(col("cent_id"),
          struct(col("c_cos"), (-col("cent_id")).as("tb"))).as("cell"))
      b.select(col("vec_id"), col("embedding"), l2Norm("embedding").as("norm"))
        .join(assign, "vec_id")
        .write.partitionBy("cell").mode("append").parquet(storeDir)
    }
    val qprobe = scoredOf(base.filter(col("vec_id").isin(queryVecIds: _*)))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("c_cos").desc, col("cent_id"))))
      .filter(col("rn") <= nProbe)
      .select(col("vec_id").as("query_vec_id"), col("embedding").as("q_emb"),
        col("norm").as("q_norm"), col("cent_id").as("cell"))
    val idx = spark.read.parquet(storeDir)
    val w = Window.partitionBy("query_vec_id")
      .orderBy(col("cos_sim").desc, col("vec_id"))
    val cos = dot("embedding", "q_emb") / (col("norm") * col("q_norm"))
    idx.join(broadcast(qprobe), Seq("cell"))
      .filter(col("vec_id") =!= col("query_vec_id"))
      .select(col("query_vec_id"), col("vec_id"),
        graft.Parity.pround(cos, 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic k-means (Lloyd) training for the IVF coarse quantizer:
    * init from the vectors at fixed `centroidVecIds` (sampling-by-key, the
    * deterministic analog of k-means++ seeding), then `iters` rounds of
    * assign (argmin squared-Euclidean, tie-break to the smaller cent_id)
    * and update (per-dimension mean). Returns the trained centroids with
    * their final assignment counts. Empty cells drop out (their seed was
    * beaten everywhere) — standard Lloyd behavior.
    *
    * Scale shape per iteration: assignment is one corpus scan x broadcast
    * centroids with a map-side-combinable `min_by` (the shuffle carries |V|
    * assignment rows, never the |V| x K distance stream; dist uses the
    * expanded form ||x||2 - 2x.c + ||c||2 so per-pair work is ONE fused
    * VecDot); the update posexplodes to (cell, dim) partial sums — map-side
    * combine makes the shuffle carry K x dim rows per partition. Everything
    * is bit-reproducible cross-engine: dot products are sequential folds,
    * means are exact-DECIMAL sums over a double division, so the DuckDB
    * oracle reproduces the whole training trajectory exactly.
    */
  def ivfTrain(
      embeddings: DataFrame,
      centroidVecIds: Seq[Long] = (100L until 116L),
      iters: Int = 2): DataFrame = {
    val e = embeddings
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
      .withColumn("xx", dot("emb", "emb"))
    val init = e.filter(col("vec_id").isin(centroidVecIds: _*))
      .select(col("vec_id").as("cent_id"), col("emb").as("c_emb"))
    def assign(cents: DataFrame): DataFrame = {
      val c = cents.withColumn("cc", dot("c_emb", "c_emb"))
      e.crossJoin(broadcast(c))
        .withColumn("dist",
          col("xx") - lit(2.0) * dot("emb", "c_emb") + col("cc"))
        .groupBy(col("vec_id"))
        .agg(
          min_by(col("cent_id"), struct(col("dist"), col("cent_id"))).as("cell"),
          // emb is constant across a vec_id's K scored rows, so first() is
          // deterministic here
          first(col("emb")).as("emb"))
    }
    // Pre-round each element with the engine-independent floor(v*1e10+0.5)
    // /1e10 BEFORE the decimal cast: a float32-sourced dyadic can land
    // exactly on the half boundary at scale 10 (e.g. -0.27392578125), where
    // Spark's double→decimal cast rounds HALF_UP but DuckDB's rounds
    // half-to-even — the pre-round resolves every tie identically in pure
    // IEEE double arithmetic, keeping the whole training trajectory
    // bit-reproducible cross-engine.
    def update(assigned: DataFrame): DataFrame = assigned
      .select(col("cell"), posexplode(col("emb")).as(Seq("pos", "v")))
      .groupBy(col("cell"), col("pos"))
      .agg((sum(graft.Parity.pround(col("v"), 10)
        .cast(org.apache.spark.sql.types.DecimalType(30, 10)))
        .cast("double") / count(lit(1)).cast("double")).as("m"))
      .groupBy(col("cell"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)")
        .as("c_emb"))
      .select(col("cell").as("cent_id"), col("c_emb"))
    var cents = init
    var lastAssign: DataFrame = init // placeholder, reassigned below
    for (_ <- 1 to math.max(iters, 1)) {
      lastAssign = assign(cents)
      cents = update(lastAssign)
    }
    val counts = lastAssign.groupBy(col("cell")).agg(count(lit(1)).as("n"))
    cents.join(counts, col("cent_id") === col("cell"))
      .select(col("cent_id"), col("n"), col("c_emb").as("centroid"))
      .orderBy(col("cent_id"))
  }

  /** Sequential squared-L2 distance between the `s`-th width-`w` subvectors
    * of two double arrays: a left fold starting at 0.0 over (a[i]-b[i])²,
    * term order fixed — the shape the DuckDB oracle reproduces bit-for-bit
    * with list_reduce(list_prepend(0.0, ...)).
    */
  private def subDist(a: String, b: String, s: String, w: Int): Column =
    expr(s"""aggregate(sequence(0, ${w - 1}), CAST(0 AS DOUBLE),
            |  (acc, i) -> acc + ($a[$s * $w + i] - $b[$s * $w + i])
            |                  * ($a[$s * $w + i] - $b[$s * $w + i]))""".stripMargin)

  /** Product-quantization assignments: each vector split into `nSub`
    * width-`subWidth` subvectors, each subvector coded as the argmin
    * squared-L2 codebook entry of its subspace (tie → smaller code).
    * Codebook = the subvectors of the vectors at `codebookVecIds` (the
    * deterministic sampled-codebook analog of per-subspace k-means — swap
    * ivfTrain in per subspace to train instead).
    *
    * Scale shape: one corpus scan exploded ×nSub, cross-joined against a
    * broadcast |codebook| rows, min_by-reduced with map-side combine — the
    * shuffle carries |V| × nSub assignment rows, never the distance
    * stream. Returns (vec_id, s, code, sdist).
    */
  private[graft] def pqAssignments(
      embeddings: DataFrame,
      codebookVecIds: Seq[Long] = (100L until 108L),
      nSub: Int = 8, subWidth: Int = 8): DataFrame = {
    val e = embeddings.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val codeOf = codebookVecIds.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, (id, j)) => when(col("vec_id") === id, lit(j)).otherwise(acc)
    }
    val cb = e.filter(col("vec_id").isin(codebookVecIds: _*))
      .select(codeOf.as("code"), col("emb").as("c_emb"))
    e.select(col("vec_id"), col("emb"),
        explode(sequence(lit(0), lit(nSub - 1))).as("s"))
      .crossJoin(broadcast(cb))
      .select(col("vec_id"), col("s"), col("code"),
        subDist("emb", "c_emb", "s", subWidth).as("d"))
      .groupBy(col("vec_id"), col("s"))
      .agg(
        // hash-aggregable argmin (r17): the struct-ordered min_by buffers
        // a struct and forces Sort + SortAggregate; LexMinLong keeps the
        // exact (d, code) lex-argmin with a flat mutable buffer so the
        // whole (vec × subspace × codebook) scoring stream stays in one
        // codegen HashAggregate with map-side partials. d is already
        // double; ties resolve on the exact long code.
        graft.functions.LexMinAggregate
          .argMinLong(col("d"), col("code").cast("long"))
          .cast("int").as("code"),
        min(col("d")).as("sdist"))
  }

  /** PQ codes per vector: the comma-joined per-subspace code string (the
    * compressed representation — nSub bytes instead of dim floats) plus the
    * total reconstruction error. The error is an ORDERED fold over the
    * per-subspace minima (collect → sort by s → sequential sum): a plain
    * SUM() over doubles is order-nondeterministic across engines and runs,
    * which would break the oracle's bit-parity.
    */
  def pqCodes(
      embeddings: DataFrame,
      codebookVecIds: Seq[Long] = (100L until 108L),
      nSub: Int = 8, subWidth: Int = 8): DataFrame =
    pqAssignments(embeddings, codebookVecIds, nSub, subWidth)
      .groupBy(col("vec_id"))
      .agg(
        expr("""array_join(transform(array_sort(collect_list(struct(s, code))),
               |  p -> CAST(p.code AS STRING)), ',')""".stripMargin).as("codes"),
        graft.Parity.pround(
          expr("""aggregate(transform(array_sort(collect_list(struct(s, sdist))),
                 |  p -> p.sdist), CAST(0 AS DOUBLE), (acc, x) -> acc + x)""".stripMargin), 6)
          .as("recon_err"))
      .orderBy(col("vec_id"))

  /** PQ ANN top-k via asymmetric distance computation (ADC): the query
    * stays full-precision, the corpus is its PQ codes, and each candidate's
    * distance is the sum over subspaces of the PRECOMPUTED query-to-
    * codebook-entry distance for the candidate's code — one lookup-table
    * probe per (candidate, subspace) instead of a dim-length float scan.
    *
    * Scale shape: the LUT is |queries| × nSub × |codebook| rows (tiny —
    * built from a broadcast codebook and broadcast again for the probe
    * join), so the corpus side streams its |V| × nSub code rows through a
    * broadcast-hash join and a map-side-combinable ordered-sum aggregate.
    * This is the memory-bandwidth shape that makes PQ indexes fast at
    * scale: candidates are scanned as bytes, never as floats.
    */
  def annPqTopK(
      embeddings: DataFrame, queryVecIds: Seq[Long], k: Int,
      codebookVecIds: Seq[Long] = (100L until 108L),
      nSub: Int = 8, subWidth: Int = 8): DataFrame = {
    val asg = pqAssignments(embeddings, codebookVecIds, nSub, subWidth)
    val e = embeddings.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val codeOf = codebookVecIds.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, (id, j)) => when(col("vec_id") === id, lit(j)).otherwise(acc)
    }
    val cb = e.filter(col("vec_id").isin(codebookVecIds: _*))
      .select(codeOf.as("code"), col("emb").as("c_emb"))
    val lut = e.filter(col("vec_id").isin(queryVecIds: _*))
      .select(col("vec_id").as("query_vec_id"), col("emb").as("q_emb"),
        explode(sequence(lit(0), lit(nSub - 1))).as("s"))
      .crossJoin(broadcast(cb))
      .select(col("query_vec_id"), col("s"), col("code"),
        subDist("q_emb", "c_emb", "s", subWidth).as("qd"))
    val w = Window.partitionBy("query_vec_id")
      .orderBy(col("adc_dist"), col("vec_id"))
    asg.join(broadcast(lut), Seq("s", "code"))
      .filter(col("vec_id") =!= col("query_vec_id"))
      .groupBy(col("query_vec_id"), col("vec_id"))
      .agg(graft.Parity.pround(
        expr("""aggregate(transform(array_sort(collect_list(struct(s, qd))),
               |  p -> p.qd), CAST(0 AS DOUBLE), (acc, x) -> acc + x)""".stripMargin), 6)
        .as("adc_dist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Int8 SCALAR quantization (the FAISS SQ8 / vector-DB "SQ" index): each
    * vector compresses to one byte per dimension against its OWN [min,max]
    * range — code_i = round((x_i − mn)/sc) with sc = (mx − mn)/255 —
    * 4× smaller than float32 with none of PQ's codebook training. The
    * per-vector summary carries everything scoring needs: codes, (mn, sc),
    * and the two INTEGER moments Σc and Σc² (exact BIGINTs), from which
    * the reconstructed norm ‖v̂‖² = d·mn² + 2·mn·sc·Σc + sc²·Σc² is one
    * closed-form double expression — no per-dimension float walk at query
    * time.
    *
    * Determinism: min/max/casts are exact; the quantization formula is a
    * fixed IEEE expression tree (both engines floor(x+0.5) the same
    * double); every cross-dimension reduction that feeds scoring is pure
    * INTEGER arithmetic, which is associative — the one reduction class
    * that needs no fold-order contract at all.
    */
  def sqStats(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
      .withColumn("mn", expr("array_min(emb)"))
      .withColumn("mx", expr("array_max(emb)"))
      .withColumn("sc", when(col("mx") === col("mn"), lit(0.0))
        .otherwise((col("mx") - col("mn")) / lit(255.0)))
      .withColumn("codes", expr(
        "transform(emb, x -> IF(sc = 0D, 0L, " +
          "least(255L, CAST(floor((x - mn) / sc + 0.5) AS BIGINT))))"))
      .withColumn("d", size(col("codes")).cast("long"))
      .withColumn("sum_c", expr("aggregate(codes, 0L, (acc, c) -> acc + c)"))
      .withColumn("dot_cc", expr("aggregate(codes, 0L, (acc, c) -> acc + c * c)"))
      .withColumn("nhat2",
        col("d") * col("mn") * col("mn") +
          lit(2.0) * col("mn") * col("sc") * col("sum_c") +
          col("sc") * col("sc") * col("dot_cc"))

  /** Per-vector SQ summary for the gate: codes as a comma string (the
    * driver comparator cannot sort ARRAY cells) plus the integer moments.
    */
  def sqCodes(embeddings: DataFrame): DataFrame =
    sqStats(embeddings).select(col("vec_id"),
      expr("array_join(transform(codes, c -> CAST(c AS STRING)), ',')").as("codes"),
      col("sum_c"), col("dot_cc"),
      graft.Parity.pround(col("nhat2"), 6).as("nhat2"))

  /** SQ ANN top-k with SYMMETRIC distance computation: queries quantize
    * through the same summary, and a candidate's score dequantizes in
    * closed form from ONE integer dot product of the two code arrays —
    *   v̂·q̂ = d·mnq·mnv + mnq·scv·Σcv + mnv·scq·Σcq + scq·scv·(cq·cv)
    * — then cosine against the reconstructed norms. The only per-pair
    * work that touches the arrays is cq·cv, and it is exact BIGINT
    * arithmetic: the scoring hot loop reads bytes and multiplies
    * integers, never floats (the memory-bandwidth property that makes SQ
    * indexes fast), and it is immune to fold-order nondeterminism by
    * construction.
    *
    * Scale shape: the query summaries are a ≤|queries|-row broadcast; the
    * corpus summary streams map-only through the scoring projection — no
    * shuffle before the per-query top-k (TakeOrdered semantics via the
    * rank filter). At 100 TB the summary relation IS the index: 64 bytes
    * + 4 scalars per vector, built once, scanned compressed.
    */
  def annSqTopK(
      embeddings: DataFrame, queryVecIds: Seq[Long], k: Int): DataFrame = {
    val n = sqStats(embeddings)
    val q = n.filter(col("vec_id").isin(queryVecIds: _*))
      .select(col("vec_id").as("query_vec_id"), col("mn").as("mnq"),
        col("sc").as("scq"), col("codes").as("qcodes"),
        col("sum_c").as("sum_cq"), col("nhat2").as("nhat2q"))
    // codegen'd exact integer dot (the HOF zip_with+aggregate form is
    // CodegenFallback and allocates the zipped array per candidate row)
    val idot = graft.functions.VectorExpressions.vecDotLong(
      col("codes"), col("qcodes"))
    val adot = col("d") * col("mnq") * col("mn") +
      col("mnq") * col("sc") * col("sum_c") +
      col("mn") * col("scq") * col("sum_cq") +
      col("scq") * col("sc") * idot
    val w = Window.partitionBy("query_vec_id")
      .orderBy(col("sq_cos").desc, col("vec_id"))
    n.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_vec_id"))
      .select(col("query_vec_id"), col("vec_id"),
        graft.Parity.pround(
          adot / sqrt(col("nhat2q") * col("nhat2")), 6).as("sq_cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF+PQ with exact rerank — the composed index shape production ANN
    * systems (FAISS IVFADC, ScaNN) run at billion-vector scale, built from
    * the two index structures this library already proves separately:
    * the IVF coarse quantizer prunes the CANDIDATE SET (only vectors in
    * the query's nProbe best cells are touched), PQ asymmetric-distance
    * scores those candidates as code bytes (never full floats), and only
    * the top `rerank` ADC survivors per query pay a full-precision cosine
    * for the final ranking — three stages, each cutting the work the next
    * stage sees by orders of magnitude.
    *
    * Scale shape: centroids, codebook, query LUT, and the rerank pool are
    * all genuinely tiny broadcasts (≤ |queries|·rerank rows); the two
    * corpus-scale relations — cell assignments and PQ code rows — meet in
    * ONE key-shuffle join on vec_id, and the ADC aggregate is map-side
    * combinable with O(1) group state. The rerank stage re-reads full
    * vectors for only |queries|·rerank ids (a broadcast semi probe into
    * the corpus scan), which is what makes the compressed index usable:
    * the full-precision column is touched ~rerank/|V| of the time.
    *
    * Determinism: ADC distances are ordered per-subspace folds (the
    * [[pqCodes]] argument), both rank keys round through
    * [[graft.Parity.pround]] with vec_id tie-breaks, and cell/probe
    * selection ties break toward the smaller centroid id — both engines
    * walk the identical three-stage trajectory.
    */
  def annIvfPqTopK(
      embeddings: DataFrame, queryVecIds: Seq[Long], k: Int,
      rerank: Int = 30,
      centroidVecIds: Seq[Long] = (100L until 116L), nProbe: Int = 4,
      codebookVecIds: Seq[Long] = (100L until 108L),
      nSub: Int = 8, subWidth: Int = 8): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("embedding"),
      l2Norm("embedding").as("norm"))
    val cents = e.filter(col("vec_id").isin(centroidVecIds: _*))
      .select(col("vec_id").as("cent_id"), col("embedding").as("c_emb"),
        col("norm").as("c_norm"))
    val scored = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("norm"), col("cent_id"),
        (dot("embedding", "c_emb") / (col("norm") * col("c_norm"))).as("c_cos"))
    val assign = scored.groupBy("vec_id")
      .agg(max_by(col("cent_id"),
        struct(col("c_cos"), (-col("cent_id")).as("tb"))).as("cell"))
    val qprobe = scored.filter(col("vec_id").isin(queryVecIds: _*))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("c_cos").desc, col("cent_id"))))
      .filter(col("rn") <= nProbe)
      .select(col("vec_id").as("query_vec_id"), col("cent_id").as("cell"))
    // cell-pruned (query, candidate) id pairs — grows with the corpus
    // (~nProbe/K of it per query), so NOT broadcast: it drives the one
    // corpus-scale shuffle join against the PQ code rows below
    val cand = assign.join(broadcast(qprobe), Seq("cell"))
      .filter(col("vec_id") =!= col("query_vec_id"))
      .select(col("query_vec_id"), col("vec_id"))
    val asg = pqAssignments(embeddings, codebookVecIds, nSub, subWidth)
    val eD = embeddings.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val codeOf = codebookVecIds.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, (id, j)) => when(col("vec_id") === id, lit(j)).otherwise(acc)
    }
    val cb = eD.filter(col("vec_id").isin(codebookVecIds: _*))
      .select(codeOf.as("code"), col("emb").as("c_emb"))
    val lut = eD.filter(col("vec_id").isin(queryVecIds: _*))
      .select(col("vec_id").as("query_vec_id"), col("emb").as("q_emb"),
        explode(sequence(lit(0), lit(nSub - 1))).as("s"))
      .crossJoin(broadcast(cb))
      .select(col("query_vec_id"), col("s"), col("code"),
        subDist("q_emb", "c_emb", "s", subWidth).as("qd"))
    val adc = asg.join(cand, Seq("vec_id"))
      .join(broadcast(lut), Seq("query_vec_id", "s", "code"))
      .groupBy(col("query_vec_id"), col("vec_id"))
      .agg(graft.Parity.pround(
        expr("""aggregate(transform(array_sort(collect_list(struct(s, qd))),
               |  p -> p.qd), CAST(0 AS DOUBLE), (acc, x) -> acc + x)""".stripMargin), 6)
        .as("adc_dist"))
    val pool = adc.withColumn("adc_rank", row_number().over(
        Window.partitionBy("query_vec_id").orderBy(col("adc_dist"), col("vec_id"))))
      .filter(col("adc_rank") <= rerank)
      .select(col("query_vec_id"), col("vec_id"), col("adc_dist"))
    val q = e.filter(col("vec_id").isin(queryVecIds: _*))
      .select(col("vec_id").as("query_vec_id"), col("embedding").as("q_emb"),
        col("norm").as("q_norm"))
    val w = Window.partitionBy("query_vec_id")
      .orderBy(col("cos_sim").desc, col("vec_id"))
    e.join(broadcast(pool), Seq("vec_id"))
      .join(broadcast(q), Seq("query_vec_id"))
      .select(col("query_vec_id"), col("vec_id"), col("adc_dist"),
        graft.Parity.pround(
          dot("embedding", "q_emb") / (col("norm") * col("q_norm")), 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** XOR masks for multi-probe at Hamming distance ≤ `hamming`: the zero
    * mask (home bucket) plus every ≤hamming-bit flip. Shared with the
    * DuckDB oracle so both engines probe the identical bucket set.
    */
  private[graft] def probeMasks(nPlanes: Int, hamming: Int): Seq[Long] =
    0L +: (1 to hamming).flatMap(h =>
      (0 until nPlanes).combinations(h).map(_.map(1L << _).sum).toSeq)

  /** LSH-bucketed ANN top-k with multi-probe: per query vector, rank
    * candidates in the query's sign-bucket AND every bucket within Hamming
    * distance `hamming` (probe buckets are exploded on the tiny broadcast
    * query side, so the candidate lookup stays a bucket equi-join — at
    * scale the big side is scanned once and pruned to Σ C(nPlanes,≤h)/2^nPlanes
    * of the corpus; the defaults probe 22/64 buckets). `nPlanes` and
    * `hamming` trade recall for candidate count — the measured floor is
    * pinned by AnnRecallSpec so a pruning regression fails `sbt test`.
    */
  def annLshTopK(
      embeddings: DataFrame, queryVecIds: Seq[Long], k: Int,
      nPlanes: Int = 6, seed: Long = 42L, hamming: Int = 2): DataFrame = {
    // bounded scalar collect (one int): the embedding dimension, needed
    // driver-side to build the hyperplane literals
    val dim = embeddings.select(size(col("embedding"))).first().getInt(0)
    val withBucket = embeddings
      .withColumn("bucket", bucketExpr(planes(nPlanes, dim, seed)))
    val probeBuckets = explode(array(
      probeMasks(nPlanes, hamming).map(m =>
        col("bucket").bitwiseXOR(lit(m))): _*)).as("bucket")
    val queries = withBucket
      .filter(col("vec_id").isin(queryVecIds: _*))
      .select(col("vec_id").as("query_vec_id"),
        col("embedding").as("q_embedding"),
        l2Norm("embedding").as("q_norm"), probeBuckets)
    val w = Window.partitionBy("query_vec_id")
      .orderBy(col("cos_sim").desc, col("vec_id"))
    val cos = dot("embedding", "q_embedding") / (l2Norm("embedding") * col("q_norm"))
    withBucket
      .join(broadcast(queries),
        Seq("bucket")) // bucket-pruned candidates only
      .filter(col("vec_id") =!= col("query_vec_id"))
      .select(col("query_vec_id"), col("vec_id"),
        graft.Parity.pround(cos, 6).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
