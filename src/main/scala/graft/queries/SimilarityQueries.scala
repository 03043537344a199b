package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.similarity.Similarity

/** Similarity-search driver queries over `embeddings` with DuckDB oracles.
  *
  * Dot products on both sides are strict sequential left-folds over
  * double-cast elements (Spark `aggregate`, DuckDB `list_reduce`), so
  * doubles match bit-for-bit; results are additionally rounded to 6.
  *
  * `neardup_embeddings` caps the pair space at vec_id < 1000 per side: the
  * capped query demonstrates (and oracle-checks) the pair computation, while
  * `ann_lsh_topk` is the uncapped scale path (bucket-pruned, rows-only
  * check).
  */
object SimilarityQueries {

  type Q = (SparkSession, String) => DataFrame

  /** DuckDB sequential dot product (left fold starting at 0.0, like Spark's
    * aggregate; 0.0 + x == x exactly so list_reduce over the transformed
    * products matches).
    */
  private[queries] def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |  list_transform(range(1, len($a) + 1),
       |    i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (x, y) -> x + y)""".stripMargin

  private[queries] def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)}) / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  val embeddingNorms: Q = (s, dir) =>
    Similarity.norms(Tables.embeddings(s, dir)).orderBy(col("vec_id"))

  val embeddingNormsSql: String =
    s"""SELECT vec_id, CAST(label AS BIGINT) AS label,
       |       floor(sqrt(${dotSql("embedding", "embedding")}) * 1e6 + 0.5) / 1e6 AS l2_norm
       |FROM embeddings ORDER BY vec_id""".stripMargin

  /** Per-class embedding centroid statistics — the class-balance /
    * centroid-magnitude diagnostic an embedding-quality pass runs before
    * clustering or per-class sampling. Cross-ROW float sums are the
    * parity trap (double addition is order-dependent), so the per-(label,
    * dim) sums use the PageRank quantization: each component quantizes to
    * an integer at 1e7 (floor of a pure double expression — identical on
    * both engines), sums exactly in DECIMAL (order-free), and only the
    * per-dim MEAN is a double again. The centroid's L2 norm then sums the
    * 64 squared means the same way (quantized at 1e12, exact DECIMAL sum)
    * — deterministic end to end, pround only at the edge.
    *
    * Scale shape: one explode feeding a (label, dim)-keyed hash aggregate
    * with map-side partials (the exchange carries |labels|·64 partial
    * rows per task, never the component stream), then a |labels|-sized
    * rollup. Nothing vector-sized moves after the scan.
    */
  val embeddingCentroids: Q = (s, dir) => {
    import org.apache.spark.sql.types.DecimalType
    val exploded = Tables.embeddings(s, dir)
      .select(col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("dim", "vf")))
    val perDim = exploded
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("vf").cast("double") * lit(1e7) + lit(0.5))
          .cast(DecimalType(20, 0))).as("sq"))
      .select(col("label"), col("n"),
        (col("sq").cast("double") / lit(1e7) / col("n").cast("double")).as("mean"))
    perDim.groupBy(col("label"))
      .agg(max(col("n")).as("n_vecs"),
        sum(floor(col("mean") * col("mean") * lit(1e12) + lit(0.5))
          .cast(DecimalType(38, 0))).as("m2q"))
      .select(col("label"), col("n_vecs"),
        graft.Parity.pround(
          sqrt(col("m2q").cast("double") / lit(1e12)), 6).as("centroid_l2"))
      .orderBy(col("label"))
  }

  val embeddingCentroidsSql: String =
    """WITH ex AS (
      |  SELECT CAST(label AS BIGINT) AS label,
      |         unnest(range(0, len(embedding))) AS dim,
      |         unnest(embedding) AS vf
      |  FROM embeddings),
      |pd AS (
      |  SELECT label, dim, count(*) AS n,
      |         CAST(sum(CAST(floor(CAST(vf AS DOUBLE) * 1e7 + 0.5)
      |                       AS DECIMAL(20,0))) AS DOUBLE) / 1e7 / count(*) AS mean
      |  FROM ex GROUP BY 1, 2),
      |ag AS (
      |  SELECT label, max(n) AS n_vecs,
      |         CAST(sum(CAST(floor(mean * mean * 1e12 + 0.5)
      |                       AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS m2
      |  FROM pd GROUP BY 1)
      |SELECT label, n_vecs,
      |       floor(sqrt(m2) * 1e6 + 0.5) / 1e6 AS centroid_l2
      |FROM ag ORDER BY label""".stripMargin

  val knnBruteForce: Q = (s, dir) =>
    Similarity.knnBruteForce(Tables.embeddings(s, dir), queryVecId = 0L, k = 10)

  val knnBruteForceSql: String =
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
       |SELECT e.vec_id, CAST(e.label AS BIGINT) AS label,
       |       floor((${cosineSql("e.embedding", "q.qe")}) * 1e6 + 0.5) / 1e6 AS cos_sim
       |FROM embeddings e, q
       |WHERE e.vec_id <> 0
       |ORDER BY cos_sim DESC, vec_id
       |LIMIT 10""".stripMargin

  val neardupEmbeddings: Q = (s, dir) =>
    Similarity.neardupPairs(
        Tables.embeddings(s, dir).filter(col("vec_id") < 1000), minCosine = 0.3)
      .orderBy(col("vec_id_a"), col("vec_id_b"))

  val neardupEmbeddingsSql: String =
    s"""WITH e AS (SELECT vec_id, label, embedding FROM embeddings WHERE vec_id < 1000)
       |SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b, CAST(a.label AS BIGINT) AS label,
       |       floor((${cosineSql("a.embedding", "b.embedding")}) * 1e6 + 0.5) / 1e6 AS cos_sim
       |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE floor((${cosineSql("a.embedding", "b.embedding")}) * 1e6 + 0.5) / 1e6 >= 0.3
       |ORDER BY vec_id_a, vec_id_b""".stripMargin

  /** Cell-blocked near-dup (SemDeDup shape): the unblocked scale path for
    * embedding-cosine dedup — coarse-quantize, pair within cells only.
    * Same centroid set as `ann_ivf_topk`; threshold matches
    * `neardup_embeddings` so the two variants' outputs are comparable.
    */
  val neardupIvfQ: Q = (s, dir) =>
    Similarity.neardupIvf(Tables.embeddings(s, dir), minCosine = 0.3)
      .orderBy(col("vec_id_a"), col("vec_id_b"))

  val neardupIvfSql: String =
    s"""WITH $neardupIvfCtesSql
       |SELECT vec_id_a, vec_id_b, cos_sim FROM cos
       |WHERE cos_sim >= 0.3 ORDER BY vec_id_a, vec_id_b""".stripMargin

  /** CTE chain through `cos(vec_id_a, vec_id_b, cos_sim)` — shared by
    * [[neardupIvfSql]] and [[semanticDedupSql]].
    */
  private def neardupIvfCtesSql: String = {
    val centIds = (100L until 116L).mkString(", ")
    s"""e AS (
       |  SELECT vec_id, embedding,
       |         sqrt(${dotSql("embedding", "embedding")}) AS norm
       |  FROM embeddings),
       |cents AS (
       |  SELECT vec_id AS cent_id, embedding AS c_emb, norm AS c_norm
       |  FROM e WHERE vec_id IN ($centIds)),
       |scored AS (
       |  SELECT e.vec_id, c.cent_id,
       |         (${dotSql("e.embedding", "c.c_emb")}) / (e.norm * c.c_norm) AS c_cos
       |  FROM e CROSS JOIN cents c),
       |assign AS (
       |  SELECT vec_id, cent_id AS cell FROM (
       |    SELECT vec_id, cent_id,
       |           row_number() OVER (PARTITION BY vec_id
       |                              ORDER BY c_cos DESC, cent_id) AS rn
       |    FROM scored) WHERE rn <= 2),
       |pairs AS (
       |  SELECT DISTINCT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
       |  FROM assign a JOIN assign b
       |    ON a.cell = b.cell AND a.vec_id < b.vec_id),
       |cos AS (
       |  SELECT p.vec_id_a, p.vec_id_b,
       |         floor(((${dotSql("l.embedding", "r.embedding")})
       |                / (l.norm * r.norm)) * 1e6 + 0.5) / 1e6 AS cos_sim
       |  FROM pairs p
       |  JOIN e l ON p.vec_id_a = l.vec_id
       |  JOIN e r ON p.vec_id_b = r.vec_id)""".stripMargin
  }

  /** SemDeDup end-to-end: embedding near-dup pairs from IVF-cell blocking
    * (same pairs as `neardup_ivf`), connected components over that graph,
    * and a canonical keep flag (cluster representative = min vec_id — the
    * label min-propagation already computes, so keep is `vec_id ==
    * cluster_id` with no extra pass). This is the semantic twin of the
    * MinHash curation chain: the cosine graph replaces the shingle graph,
    * everything downstream is the same bucketed machinery.
    *
    * Scale shape: pair space is bounded by IVF cells (never all-pairs),
    * CC is the per-round single-shuffle min-propagation, and the keep
    * flag is a projection — no window, no global sort except presentation.
    */
  val semanticDedup: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    val pairs = Similarity.neardupIvf(emb, minCosine = 0.3)
      .select(col("vec_id_a").as("a"), col("vec_id_b").as("b"))
    val labels = graft.dedup.Components
      .connectedComponents(emb.select(col("vec_id").as("v")), pairs)
      .select(col("v").as("vec_id"), col("label").as("cluster_id"))
    val sizes = labels.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "cluster_id")
      .select(col("vec_id"), col("cluster_id"), col("cluster_size"),
        (col("vec_id") === col("cluster_id")).as("keep"))
      .orderBy(col("vec_id"))
  }

  val semanticDedupSql: String =
    s"""WITH RECURSIVE $neardupIvfCtesSql,
       |sd AS (
       |  SELECT vec_id_a, vec_id_b FROM cos WHERE cos_sim >= 0.3),
       |cedges AS (
       |  SELECT vec_id_a AS s, vec_id_b AS d FROM sd
       |  UNION ALL
       |  SELECT vec_id_b AS s, vec_id_a AS d FROM sd),
       |reach AS (
       |  SELECT vec_id AS v, vec_id AS u FROM embeddings
       |  UNION
       |  SELECT r.v, ce.d FROM reach r JOIN cedges ce ON r.u = ce.s),
       |lbl AS (SELECT v AS vec_id, min(u) AS cluster_id FROM reach GROUP BY v),
       |sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM lbl GROUP BY 1)
       |SELECT l.vec_id, l.cluster_id, s.cluster_size,
       |       (l.vec_id = l.cluster_id) AS keep
       |FROM lbl l JOIN sizes s USING (cluster_id)
       |ORDER BY l.vec_id""".stripMargin

  /** Cluster-balanced diversity subsample over IVF cells
    * (Similarity.clusterSample): cap each cell at 5 vectors by portable
    * hash so dense clusters are trimmed and rare clusters survive.
    */
  val diversitySample: Q = (s, dir) =>
    Similarity.clusterSample(Tables.embeddings(s, dir), perCell = 5)
      .orderBy(col("cell"), col("rank"))

  val diversitySampleSql: String = {
    val centIds = (100L until 116L).mkString(", ")
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |         sqrt(${dotSql("embedding", "embedding")}) AS norm
       |  FROM embeddings),
       |cents AS (
       |  SELECT vec_id AS cent_id, embedding AS c_emb, norm AS c_norm
       |  FROM e WHERE vec_id IN ($centIds)),
       |scored AS (
       |  SELECT e.vec_id, c.cent_id,
       |         (${dotSql("e.embedding", "c.c_emb")}) / (e.norm * c.c_norm) AS c_cos
       |  FROM e CROSS JOIN cents c),
       |assign AS (
       |  SELECT vec_id, cent_id AS cell FROM (
       |    SELECT vec_id, cent_id,
       |           row_number() OVER (PARTITION BY vec_id
       |                              ORDER BY c_cos DESC, cent_id) AS rn
       |    FROM scored) WHERE rn = 1),
       |sizes AS (SELECT cell, count(*) AS cell_size FROM assign GROUP BY cell),
       |ranked AS (
       |  SELECT cell, vec_id,
       |         row_number() OVER (PARTITION BY cell
       |                            ORDER BY ${graft.functions.PortableHash.hash32Sql("vec_id")}, vec_id) AS rank
       |  FROM assign)
       |SELECT r.cell, CAST(r.rank AS BIGINT) AS rank, r.vec_id, s.cell_size
       |FROM ranked r JOIN sizes s USING (cell)
       |WHERE r.rank <= 5 ORDER BY r.cell, r.rank""".stripMargin
  }

  /** Scale-path ANN: LSH sign-buckets with multi-probe, candidates
    * restricted to the query's probe buckets. The seeded hyperplanes are
    * deterministic, so the oracle embeds the exact plane values as SQL
    * literals (dim is 64 in every driver dataset; the Spark side reads dim
    * from the data, so only the oracle pins it).
    */
  val annLshTopK: Q = (s, dir) =>
    Similarity.annLshTopK(
        Tables.embeddings(s, dir), queryVecIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10)
      .orderBy(col("query_vec_id"), col("rank"))

  private val AnnPlanes = 6
  private val AnnDim = 64
  private val AnnSeed = 42L

  val annLshTopKSql: String = {
    val planes = Similarity.planes(AnnPlanes, AnnDim, AnnSeed)
    // double literals via shortest-roundtrip toString: DuckDB parses back
    // to the bit-identical double
    def planeLit(p: Array[Double]): String =
      p.map(_.toString).mkString("[", ", ", "]")
    def planeDot(p: Array[Double]): String =
      s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |    list_transform(range(1, $AnnDim + 1),
         |      i -> CAST(embedding[i] AS DOUBLE) * (${planeLit(p)}::DOUBLE[])[i])), (x, y) -> x + y)""".stripMargin
    val bucketExpr = planes.zipWithIndex
      .map { case (p, i) => s"CASE WHEN (${planeDot(p)}) >= 0 THEN ${1L << i} ELSE 0 END" }
      .mkString("\n       + ")
    // identical Hamming-≤2 probe set as the Spark side (Similarity.probeMasks)
    val probeList = Similarity.probeMasks(AnnPlanes, 2)
      .map(m => if (m == 0L) "qb" else s"xor(qb, $m)")
      .mkString("[", ", ", "]")
    s"""WITH b AS (
       |  SELECT vec_id, embedding,
       |       $bucketExpr AS bucket
       |  FROM embeddings),
       |q AS (
       |  SELECT vec_id AS query_vec_id, embedding AS qe,
       |         sqrt(${dotSql("embedding", "embedding")}) AS qn, bucket AS qb
       |  FROM b WHERE vec_id IN (0, 1, 2, 3, 4)),
       |probes AS (
       |  SELECT query_vec_id, qe, qn, unnest($probeList) AS bucket FROM q),
       |cand AS (
       |  SELECT p.query_vec_id, b.vec_id,
       |         floor(((${dotSql("b.embedding", "p.qe")})
       |                / (sqrt(${dotSql("b.embedding", "b.embedding")}) * p.qn)) * 1e6 + 0.5) / 1e6 AS cos_sim
       |  FROM b JOIN probes p ON b.bucket = p.bucket
       |  WHERE b.vec_id <> p.query_vec_id),
       |ranked AS (
       |  SELECT query_vec_id, vec_id, cos_sim,
       |         CAST(row_number() OVER (PARTITION BY query_vec_id
       |                                 ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rank
       |  FROM cand)
       |SELECT query_vec_id, vec_id, cos_sim, rank FROM ranked
       |WHERE rank <= 10 ORDER BY query_vec_id, rank""".stripMargin
  }

  /** IVF-style ANN: sampled-centroid cells (centroids = vectors at fixed
    * vec_ids 100..115), nProbe=4 nearest cells searched per query. Fully
    * SQL-expressible: assignment is argmax-cosine with a cent_id tie-break,
    * identical on both engines because the dot-product folds are
    * bit-identical.
    */
  val annIvfTopK: Q = (s, dir) =>
    Similarity.annIvfTopK(
        Tables.embeddings(s, dir), queryVecIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10)
      .orderBy(col("query_vec_id"), col("rank"))

  /** Store-backed incremental IVF search at the gate: the corpus arrives
    * as two parity batches, each appending its cell-assignment rows under
    * `cell=` partitions ([[Similarity.annIvfStoreTopK]]); the search then
    * probes nProbe cells against the persisted index. Shares
    * `ann_ivf_topk`'s oracle — store-backed incremental ≡ in-memory
    * one-shot.
    */
  val annIvfStore: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    val target = StoreQueries.scratchPath(s, s"graft_store/ann_ivf_store")
    Similarity.annIvfStoreTopK(s, emb,
        Seq(emb.filter(col("vec_id") % 2 === 0), emb.filter(col("vec_id") % 2 === 1)),
        target, queryVecIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10)
      .orderBy(col("query_vec_id"), col("rank"))
  }

  val annIvfTopKSql: String = {
    val centIds = (100L until 116L).mkString(", ")
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |         sqrt(${dotSql("embedding", "embedding")}) AS norm
       |  FROM embeddings),
       |cents AS (
       |  SELECT vec_id AS cent_id, embedding AS c_emb, norm AS c_norm
       |  FROM e WHERE vec_id IN ($centIds)),
       |scored AS (
       |  SELECT e.vec_id, e.embedding, e.norm, c.cent_id,
       |         (${dotSql("e.embedding", "c.c_emb")}) / (e.norm * c.c_norm) AS c_cos
       |  FROM e CROSS JOIN cents c),
       |assign AS (
       |  SELECT vec_id, cent_id AS cell FROM (
       |    SELECT vec_id, cent_id,
       |           row_number() OVER (PARTITION BY vec_id
       |                              ORDER BY c_cos DESC, cent_id) AS rn
       |    FROM scored) WHERE rn = 1),
       |qprobe AS (
       |  SELECT vec_id AS query_vec_id, embedding AS q_emb, norm AS q_norm,
       |         cent_id AS cell FROM (
       |    SELECT vec_id, embedding, norm, cent_id,
       |           row_number() OVER (PARTITION BY vec_id
       |                              ORDER BY c_cos DESC, cent_id) AS rn
       |    FROM scored WHERE vec_id IN (0, 1, 2, 3, 4)) WHERE rn <= 4),
       |cand AS (
       |  SELECT q.query_vec_id, v.vec_id,
       |         floor(((${dotSql("v.embedding", "q.q_emb")})
       |                / (v.norm * q.q_norm)) * 1e6 + 0.5) / 1e6 AS cos_sim
       |  FROM e v JOIN assign a ON v.vec_id = a.vec_id
       |  JOIN qprobe q ON a.cell = q.cell
       |  WHERE v.vec_id <> q.query_vec_id),
       |ranked AS (
       |  SELECT query_vec_id, vec_id, cos_sim,
       |         CAST(row_number() OVER (PARTITION BY query_vec_id
       |                                 ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rank
       |  FROM cand)
       |SELECT query_vec_id, vec_id, cos_sim, rank FROM ranked
       |WHERE rank <= 10 ORDER BY query_vec_id, rank""".stripMargin
  }

  /** ANN index quality, made checkable: recall@10 of each ANN path (LSH
    * multi-probe, IVF nProbe=4) against the exact brute-force top-10 on
    * the same 5 query vectors. This is the metric that justifies calling
    * the ANN paths an index rather than merely a deterministic query —
    * and the oracle hash-checks it, so a silent recall regression (e.g. a
    * bucketing change that prunes too hard) turns a green row red.
    * Denominator is k, the standard recall@k; ties are well-defined
    * because both sides rank by the same rounded cosine + vec_id order.
    */
  val annRecall: Q = (s, dir) => {
    val e = Tables.embeddings(s, dir)
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val exact = Similarity.knnBruteForceMulti(e, qids, 10)
      .select(col("query_vec_id"), col("vec_id"), lit(1L).as("hit"))
    def side(name: String, df: DataFrame) =
      df.select(lit(name).as("method"), col("query_vec_id"), col("vec_id"))
    side("lsh", Similarity.annLshTopK(e, qids, 10))
      .unionByName(side("ivf", Similarity.annIvfTopK(e, qids, 10)))
      .join(exact, Seq("query_vec_id", "vec_id"), "left")
      .groupBy(col("method"), col("query_vec_id"))
      .agg((sum(coalesce(col("hit"), lit(0L))).cast("double") / 10.0).as("recall_at_10"))
      .orderBy(col("method"), col("query_vec_id"))
  }

  val annRecallSql: String =
    s"""WITH lsh AS ($annLshTopKSql),
       |ivf AS ($annIvfTopKSql),
       |en AS (SELECT vec_id, embedding, sqrt(${dotSql("embedding", "embedding")}) AS norm
       |       FROM embeddings),
       |q AS (SELECT vec_id AS query_vec_id, embedding AS qe, norm AS qn
       |      FROM en WHERE vec_id IN (0, 1, 2, 3, 4)),
       |exact AS (
       |  SELECT query_vec_id, vec_id FROM (
       |    SELECT q.query_vec_id, e.vec_id,
       |           row_number() OVER (PARTITION BY q.query_vec_id
       |             ORDER BY floor(((${dotSql("e.embedding", "q.qe")}) / (e.norm * q.qn)) * 1e6 + 0.5) / 1e6 DESC,
       |                      e.vec_id) AS rn
       |    FROM en e CROSS JOIN q
       |    WHERE e.vec_id <> q.query_vec_id) WHERE rn <= 10),
       |m AS (
       |  SELECT 'lsh' AS method, query_vec_id, vec_id FROM lsh
       |  UNION ALL
       |  SELECT 'ivf' AS method, query_vec_id, vec_id FROM ivf)
       |SELECT m.method, m.query_vec_id,
       |       CAST(sum(CASE WHEN x.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / 10.0 AS recall_at_10
       |FROM m LEFT JOIN exact x
       |  ON m.query_vec_id = x.query_vec_id AND m.vec_id = x.vec_id
       |GROUP BY m.method, m.query_vec_id
       |ORDER BY m.method, m.query_vec_id""".stripMargin

  /** 1/log2(i+1) for ranks 1..10, pre-rounded to 9 dp and shared by
    * both engines as literals (no runtime log2 in the bit contract).
    */
  private val NdcgDiscounts = Seq(
    "CAST(1.000000000 AS DOUBLE)", "CAST(0.630929754 AS DOUBLE)",
    "CAST(0.500000000 AS DOUBLE)", "CAST(0.430676558 AS DOUBLE)",
    "CAST(0.386852807 AS DOUBLE)", "CAST(0.356207187 AS DOUBLE)",
    "CAST(0.333333333 AS DOUBLE)", "CAST(0.315464877 AS DOUBLE)",
    "CAST(0.301029996 AS DOUBLE)", "CAST(0.289064826 AS DOUBLE)")


  /** Graded ranking quality of the ANN paths — nDCG@10 of each index's
    * ranking against the EXACT cosine ranking on the same queries, with
    * relevance grades derived from the exact ranks (true-top-1 → 3,
    * 2..5 → 2, 6..20 → 1, else 0): no external labels, just "how much of
    * the true neighborhood ordering does the approximate index preserve,
    * weighted toward the top". The log2 discounts ride as PRE-ROUNDED
    * shared 9-dp literals (the hardcoded-log-constant house pattern — no
    * runtime ln() bit contract), gains are the exact ints 2^g−1, and the
    * per-list sums quantize 1e7 + DECIMAL (association-free). IDCG is
    * computed from each query's own grade multiset (grades re-ranked by
    * grade desc), so ndcg = dcg/idcg is self-normalizing.
    *
    * Scale shape: everything downstream of the ANN/exact rankings is
    * per-(method, query) aggregation over ≤10-row lists — the eval cost
    * IS the ranking cost, and those are the indexed paths.
    */
  val ndcgEval: Q = (s, dir) => {
    val e = Tables.embeddings(s, dir)
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    // two consumers (per-method DCG join + the ideal re-ranking) — the
    // brute-force ground truth materializes once
    val grades = graft.Scratch.table(
      Similarity.knnBruteForceMulti(e, qids, 20)
        .select(col("query_vec_id"), col("vec_id"),
          when(col("rank") === 1, 3L).when(col("rank") <= 5, 2L)
            .otherwise(1L).as("grade")), "ndcg-grades")
    val disc = expr(s"array(${NdcgDiscounts.mkString(", ")})")
    def dcgOf(rankCol: String): org.apache.spark.sql.Column =
      (sum(floor(expr("CAST(CASE grade WHEN 3 THEN 7 WHEN 2 THEN 3 WHEN 1 THEN 1 ELSE 0 END AS DOUBLE)")
          * element_at(disc, col(rankCol).cast("int")) * lit(1e7) + lit(0.5))
        .cast(org.apache.spark.sql.types.DecimalType(25, 0))).cast("double") / lit(1e7))
    val ann = Similarity.annLshTopK(e, qids, 10)
        .select(lit("lsh").as("method"), col("query_vec_id"), col("vec_id"),
          col("rank").cast("long").as("rank"))
      .unionByName(Similarity.annIvfTopK(e, qids, 10)
        .select(lit("ivf").as("method"), col("query_vec_id"), col("vec_id"),
          col("rank").cast("long").as("rank")))
    val dcg = ann.join(grades, Seq("query_vec_id", "vec_id"), "left")
      .withColumn("grade", coalesce(col("grade"), lit(0L)))
      .groupBy(col("method"), col("query_vec_id"))
      .agg(dcgOf("rank").as("dcg"))
    val ideal = grades
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_vec_id")
          .orderBy(col("grade").desc, col("vec_id"))).cast("long"))
      .filter(col("pos") <= 10)
      .groupBy(col("query_vec_id"))
      .agg(dcgOf("pos").as("idcg"))
    dcg.join(ideal, "query_vec_id")
      .select(col("method"), col("query_vec_id"),
        graft.Parity.pround(col("dcg"), 6).as("dcg"),
        graft.Parity.pround(col("idcg"), 6).as("idcg"),
        graft.Parity.pround(col("dcg") / col("idcg"), 6).as("ndcg"))
      .orderBy(col("method"), col("query_vec_id"))
  }

  val ndcgEvalSql: String =
    s"""WITH lsh AS ($annLshTopKSql),
       |ivf AS ($annIvfTopKSql),
       |en AS (SELECT vec_id, embedding, sqrt(${dotSql("embedding", "embedding")}) AS norm
       |       FROM embeddings),
       |q AS (SELECT vec_id AS query_vec_id, embedding AS qe, norm AS qn
       |      FROM en WHERE vec_id IN (0, 1, 2, 3, 4)),
       |grades AS (
       |  SELECT query_vec_id, vec_id,
       |         CASE WHEN rn = 1 THEN 3 WHEN rn <= 5 THEN 2 ELSE 1 END AS grade
       |  FROM (
       |    SELECT q.query_vec_id, e.vec_id,
       |           row_number() OVER (PARTITION BY q.query_vec_id
       |             ORDER BY floor(((${dotSql("e.embedding", "q.qe")}) / (e.norm * q.qn)) * 1e6 + 0.5) / 1e6 DESC,
       |                      e.vec_id) AS rn
       |    FROM en e CROSS JOIN q
       |    WHERE e.vec_id <> q.query_vec_id) WHERE rn <= 20),
       |m AS (
       |  SELECT 'lsh' AS method, query_vec_id, vec_id, rank FROM lsh
       |  UNION ALL
       |  SELECT 'ivf' AS method, query_vec_id, vec_id, rank FROM ivf),
       |dcg AS (
       |  SELECT m.method, m.query_vec_id,
       |         CAST(sum(CAST(floor(
       |           CAST(CASE coalesce(g.grade, 0) WHEN 3 THEN 7 WHEN 2 THEN 3 WHEN 1 THEN 1 ELSE 0 END AS DOUBLE)
       |             * ([${NdcgDiscounts.mkString(", ")}])[m.rank] * 1e7 + 0.5)
       |           AS DECIMAL(25,0))) AS DOUBLE) / 1e7 AS dcg
       |  FROM m LEFT JOIN grades g
       |    ON m.query_vec_id = g.query_vec_id AND m.vec_id = g.vec_id
       |  GROUP BY 1, 2),
       |ideal AS (
       |  SELECT query_vec_id,
       |         CAST(sum(CAST(floor(
       |           CAST(CASE grade WHEN 3 THEN 7 WHEN 2 THEN 3 WHEN 1 THEN 1 ELSE 0 END AS DOUBLE)
       |             * ([${NdcgDiscounts.mkString(", ")}])[pos] * 1e7 + 0.5)
       |           AS DECIMAL(25,0))) AS DOUBLE) / 1e7 AS idcg
       |  FROM (
       |    SELECT query_vec_id, grade,
       |           CAST(row_number() OVER (PARTITION BY query_vec_id
       |             ORDER BY grade DESC, vec_id) AS BIGINT) AS pos
       |    FROM grades) WHERE pos <= 10
       |  GROUP BY 1)
       |SELECT d.method, d.query_vec_id,
       |       ${graft.Parity.proundSql("d.dcg", 6)} AS dcg,
       |       ${graft.Parity.proundSql("i.idcg", 6)} AS idcg,
       |       ${graft.Parity.proundSql("d.dcg / i.idcg", 6)} AS ndcg
       |FROM dcg d JOIN ideal i USING (query_vec_id)
       |ORDER BY d.method, d.query_vec_id""".stripMargin

  /** Mean reciprocal rank + hit rate of the true nearest neighbor in each
    * ANN path's top-10 (the "did the index surface THE answer, and how
    * high" metric beside [[ndcgEval]]'s graded view). Reciprocals are
    * exact integers (1e7 DIV rank) summed as such — no float sum order.
    */
  val mrrEval: Q = (s, dir) => {
    val e = Tables.embeddings(s, dir)
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val true1 = Similarity.knnBruteForceMulti(e, qids, 1)
      .select(col("query_vec_id"), col("vec_id"))
    val ann = Similarity.annLshTopK(e, qids, 10)
        .select(lit("lsh").as("method"), col("query_vec_id"), col("vec_id"),
          col("rank").cast("long").as("rank"))
      .unionByName(Similarity.annIvfTopK(e, qids, 10)
        .select(lit("ivf").as("method"), col("query_vec_id"), col("vec_id"),
          col("rank").cast("long").as("rank")))
    // aggregate FROM the method roster, not from the hit rows: a method
    // whose top-10 never contains the true neighbor must report
    // mrr = hit_rate = 0, not vanish from the eval table
    val hits = ann.join(true1, Seq("query_vec_id", "vec_id"))
      .groupBy(col("method"), col("query_vec_id"))
      .agg(min(col("rank")).as("rank")) // at most one row per query anyway
      .groupBy(col("method"))
      .agg(count(lit(1)).as("hits"),
        sum(expr("10000000L DIV rank")).as("qrr"))
    ann.select(col("method")).distinct()
      .join(hits, Seq("method"), "left")
      .select(col("method"),
        graft.Parity.pround(
          coalesce(col("qrr"), lit(0L)).cast("double") / lit(5.0) / lit(1e7), 6).as("mrr"),
        graft.Parity.pround(
          coalesce(col("hits"), lit(0L)).cast("double") / lit(5.0), 6).as("hit_rate"))
      .orderBy(col("method"))
  }

  val mrrEvalSql: String =
    s"""WITH lsh AS ($annLshTopKSql),
       |ivf AS ($annIvfTopKSql),
       |en AS (SELECT vec_id, embedding, sqrt(${dotSql("embedding", "embedding")}) AS norm
       |       FROM embeddings),
       |q AS (SELECT vec_id AS query_vec_id, embedding AS qe, norm AS qn
       |      FROM en WHERE vec_id IN (0, 1, 2, 3, 4)),
       |true1 AS (
       |  SELECT query_vec_id, vec_id FROM (
       |    SELECT q.query_vec_id, e.vec_id,
       |           row_number() OVER (PARTITION BY q.query_vec_id
       |             ORDER BY floor(((${dotSql("e.embedding", "q.qe")}) / (e.norm * q.qn)) * 1e6 + 0.5) / 1e6 DESC,
       |                      e.vec_id) AS rn
       |    FROM en e CROSS JOIN q
       |    WHERE e.vec_id <> q.query_vec_id) WHERE rn = 1),
       |m AS (
       |  SELECT 'lsh' AS method, query_vec_id, vec_id, rank FROM lsh
       |  UNION ALL
       |  SELECT 'ivf' AS method, query_vec_id, vec_id, rank FROM ivf),
       |rr AS (
       |  SELECT m.method, m.query_vec_id, min(m.rank) AS rank
       |  FROM m JOIN true1 t
       |    ON m.query_vec_id = t.query_vec_id AND m.vec_id = t.vec_id
       |  GROUP BY 1, 2),
       |hs AS (
       |  SELECT method, count(*) AS hits, sum(10000000 // rank) AS qrr
       |  FROM rr GROUP BY 1)
       |SELECT md.method,
       |       ${graft.Parity.proundSql("CAST(coalesce(h.qrr, 0) AS DOUBLE) / 5.0 / 1e7", 6)} AS mrr,
       |       ${graft.Parity.proundSql("CAST(coalesce(h.hits, 0) AS DOUBLE) / 5.0", 6)} AS hit_rate
       |FROM (SELECT DISTINCT method FROM m) md LEFT JOIN hs h USING (method)
       |ORDER BY md.method""".stripMargin


  /** k-means TRAINING at the oracle gate: two full Lloyd iterations
    * (seeded init → assign → mean-update → assign → mean-update) must
    * reproduce bit-for-bit in DuckDB — dot products are sequential folds,
    * distances use the expanded ||x||2 - 2x.c + ||c||2 form with identical
    * parenthesization, and per-dimension means are exact-DECIMAL sums over
    * a double division, so the entire training trajectory (not just one
    * step) is engine-independent.
    *
    * Output is exploded to one row per (cent_id, pos) dimension — the
    * driver's pandas-based comparator cannot sort rows containing
    * top-level ARRAY cells (unhashable ndarray), so the trained centroid
    * vectors are emitted as (cent_id, n, pos, val) scalar rows instead.
    * The library API (`Similarity.ivfTrain`) still returns array-valued
    * centroids.
    */
  val ivfTrain: Q = (s, dir) =>
    Similarity.ivfTrain(Tables.embeddings(s, dir))
      .select(col("cent_id"), col("n"), posexplode(col("centroid")))
      .select(col("cent_id"), col("n"),
        col("pos").cast("long").as("pos"), col("col").as("val"))
      .orderBy(col("cent_id"), col("pos"))

  val ivfTrainSql: String = {
    val centIds = (100L until 116L).mkString(", ")
    def assignSql(cents: String, name: String): String =
      s"""$name AS (SELECT vec_id, emb, cent_id AS cell FROM (
         |    SELECT en.vec_id, en.emb, c.cent_id,
         |           row_number() OVER (PARTITION BY en.vec_id
         |                              ORDER BY en.xx - 2 * (${dotSql("en.emb", "c.c_emb")}) + c.cc ASC, c.cent_id) AS rn
         |    FROM en CROSS JOIN $cents c) WHERE rn = 1)""".stripMargin
    def updateSql(asg: String, uname: String, cname: String): String =
      s"""$uname AS (SELECT cell, pos, CAST(sum(CAST(floor(v * 1e10 + 0.5) / 1e10 AS DECIMAL(30,10))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS m
         |    FROM (SELECT cell, unnest(range(1, len(emb) + 1)) AS pos, unnest(emb) AS v FROM $asg) x
         |    GROUP BY cell, pos),
         |$cname AS (SELECT cell AS cent_id, list(m ORDER BY pos) AS c_emb FROM $uname GROUP BY cell)""".stripMargin
    s"""WITH e0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
       |en AS (SELECT vec_id, emb, ${dotSql("emb", "emb")} AS xx FROM e0),
       |c0 AS (SELECT vec_id AS cent_id, emb AS c_emb FROM e0 WHERE vec_id IN ($centIds)),
       |c0n AS (SELECT cent_id, c_emb, ${dotSql("c_emb", "c_emb")} AS cc FROM c0),
       |${assignSql("c0n", "a1")},
       |${updateSql("a1", "u1", "c1")},
       |c1n AS (SELECT cent_id, c_emb, ${dotSql("c_emb", "c_emb")} AS cc FROM c1),
       |${assignSql("c1n", "a2")},
       |${updateSql("a2", "u2", "c2")},
       |n2 AS (SELECT cell, count(*) AS n FROM a2 GROUP BY cell)
       |SELECT u2.cell AS cent_id, n2.n, CAST(u2.pos - 1 AS BIGINT) AS pos, u2.m AS val
       |FROM u2 JOIN n2 ON u2.cell = n2.cell
       |ORDER BY cent_id, pos""".stripMargin
  }

  /** Per-vector scalar quantization (uint8-style): affine-map each
    * embedding to integer codes in [0, 255] with its own (qmin, qscale) —
    * the embedding-compression step before shipping vectors to an ANN
    * index or training shard (4x smaller than float32 at ~1e-2 recall
    * cost). Pure per-row array math: no shuffle, embarrassingly parallel,
    * and the dequantization constants travel with the row. floor(x + 0.5)
    * is the engine-independent HALF_UP (plain round() disagrees across
    * engines at half-boundaries).
    *
    * `codes` is serialized to a comma-joined STRING (BIGINT→string is
    * identical on both engines) because the driver's pandas comparator
    * cannot sort top-level ARRAY cells.
    */
  val embedQuantize: Q = (s, dir) =>
    Tables.embeddings(s, dir)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
      .select(col("vec_id"), col("emb"),
        array_min(col("emb")).as("qmin"),
        ((array_max(col("emb")) - array_min(col("emb"))) / 255.0).as("qscale"))
      .select(col("vec_id"), col("qmin"), col("qscale"),
        when(col("qscale") === 0.0,
          expr("transform(emb, x -> CAST(0 AS BIGINT))"))
          .otherwise(
            expr("transform(emb, x -> CAST(floor((x - qmin) / qscale + 0.5) AS BIGINT))"))
          .as("codes_arr"))
      .select(col("vec_id"), col("qmin"), col("qscale"),
        expr("array_join(transform(codes_arr, x -> CAST(x AS STRING)), ',')").as("codes"))
      .orderBy(col("vec_id"))

  val embedQuantizeSql: String =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      |  FROM embeddings),
      |s AS (
      |  SELECT vec_id, emb, list_min(emb) AS qmin,
      |         (list_max(emb) - list_min(emb)) / 255.0 AS qscale
      |  FROM e)
      |SELECT vec_id, qmin, qscale,
      |       array_to_string(
      |         CASE WHEN qscale = 0 THEN list_transform(emb, x -> CAST(0 AS BIGINT))
      |              ELSE list_transform(emb, x -> CAST(floor((x - qmin) / qscale + 0.5) AS BIGINT))
      |         END, ',') AS codes
      |FROM s ORDER BY vec_id""".stripMargin

  // ------------------------------------------------------ product quantization

  /** Shared oracle CTE chain for the PQ family: double-cast embeddings,
    * the sampled codebook (vec_ids 100..107 → codes 0..7), per-(vector,
    * subspace) argmin assignments over 8 subspaces × 8 dims. Sub-distances
    * are the same prepend-0 sequential folds as dotSql, at subvector
    * offsets (DuckDB 1-based `s*8+i`, i∈[1,8] ≡ Spark 0-based `s*8+i`,
    * i∈[0,7]).
    */
  private def pqSubDistSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |  list_transform(range(1, 9),
       |    i -> ($a[r.s * 8 + i] - $b[r.s * 8 + i]) * ($a[r.s * 8 + i] - $b[r.s * 8 + i]))), (x, y) -> x + y)""".stripMargin

  private val pqBaseSql: String =
    s"""e0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
       |cb AS (SELECT vec_id - 100 AS code, emb AS c_emb FROM e0 WHERE vec_id BETWEEN 100 AND 107),
       |r AS (SELECT unnest(range(0, 8)) AS s),
       |scored AS (
       |  SELECT e.vec_id, r.s, cb.code,
       |         ${pqSubDistSql("e.emb", "cb.c_emb")} AS d
       |  FROM e0 e CROSS JOIN r CROSS JOIN cb),
       |asg AS (
       |  SELECT vec_id, s, code, d FROM (
       |    SELECT vec_id, s, code, d,
       |           row_number() OVER (PARTITION BY vec_id, s ORDER BY d, code) AS rn
       |    FROM scored) WHERE rn = 1)""".stripMargin

  /** Product quantization codes: 8 subspaces × 8 dims over the 64-dim
    * embeddings, sampled codebook (the vectors at vec_ids 100..107), codes
    * comma-joined to a string (the driver's comparator cannot sort ARRAY
    * cells) plus the total reconstruction error as an ordered sequential
    * fold — order-fixed because a plain double SUM is not associative.
    */
  val pqCodesQ: Q = (s, dir) =>
    Similarity.pqCodes(Tables.embeddings(s, dir)).orderBy(col("vec_id"))

  val pqCodesSql: String =
    s"""WITH $pqBaseSql
       |SELECT vec_id,
       |       array_to_string(list(CAST(code AS VARCHAR) ORDER BY s), ',') AS codes,
       |       floor(list_reduce(list_prepend(CAST(0 AS DOUBLE), list(d ORDER BY s)),
       |             (x, y) -> x + y) * 1e6 + 0.5) / 1e6 AS recon_err
       |FROM asg GROUP BY vec_id ORDER BY vec_id""".stripMargin

  /** PQ ANN via asymmetric distance computation: full-precision queries
    * (vec_ids 0..4) probe a 5×8×8 query-to-codebook LUT; each candidate's
    * distance is the ordered per-subspace LUT sum for its codes. Ranked
    * ascending with vec_id tie-break; top-10 per query, self excluded.
    */
  val annPqTopK: Q = (s, dir) =>
    Similarity.annPqTopK(
        Tables.embeddings(s, dir), queryVecIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10)
      .orderBy(col("query_vec_id"), col("rank"))

  val annPqTopKSql: String =
    s"""WITH $pqBaseSql,
       |q AS (SELECT vec_id AS query_vec_id, emb AS q_emb FROM e0 WHERE vec_id IN (0, 1, 2, 3, 4)),
       |lut AS (
       |  SELECT q.query_vec_id, r.s, cb.code,
       |         ${pqSubDistSql("q.q_emb", "cb.c_emb")} AS qd
       |  FROM q CROSS JOIN r CROSS JOIN cb),
       |adc AS (
       |  SELECT l.query_vec_id, a.vec_id,
       |         floor(list_reduce(list_prepend(CAST(0 AS DOUBLE), list(l.qd ORDER BY a.s)),
       |               (x, y) -> x + y) * 1e6 + 0.5) / 1e6 AS adc_dist
       |  FROM asg a JOIN lut l ON a.s = l.s AND a.code = l.code
       |  WHERE a.vec_id <> l.query_vec_id
       |  GROUP BY l.query_vec_id, a.vec_id),
       |ranked AS (
       |  SELECT query_vec_id, vec_id, adc_dist,
       |         CAST(row_number() OVER (PARTITION BY query_vec_id
       |                                 ORDER BY adc_dist, vec_id) AS BIGINT) AS rank
       |  FROM adc)
       |SELECT query_vec_id, vec_id, adc_dist, rank FROM ranked
       |WHERE rank <= 10 ORDER BY query_vec_id, rank""".stripMargin

  /** Shared SQ-summary CTE chain: int8 scalar quantization against each
    * vector's own [min,max] — codes, (mn, sc), and the exact BIGINT
    * moments Σc / Σc², from which the reconstructed norm is one
    * closed-form double. Mirrors [[Similarity.sqStats]] expression by
    * expression (same IEEE tree, same integer reductions).
    */
  private val sqBaseSql: String =
    s"""e0 AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
       |mm AS (SELECT vec_id, emb, list_min(emb) AS mn, list_max(emb) AS mx FROM e0),
       |sp AS (SELECT vec_id, emb, mn,
       |              CASE WHEN mx = mn THEN 0.0 ELSE (mx - mn) / 255.0 END AS sc
       |       FROM mm),
       |cd AS (SELECT vec_id, mn, sc,
       |              list_transform(emb, x -> CASE WHEN sc = 0.0 THEN CAST(0 AS BIGINT)
       |                ELSE least(CAST(255 AS BIGINT), CAST(floor((x - mn) / sc + 0.5) AS BIGINT)) END) AS codes
       |       FROM sp),
       |sq AS (SELECT vec_id, mn, sc, codes, CAST(len(codes) AS BIGINT) AS d,
       |              list_reduce(list_prepend(CAST(0 AS BIGINT), codes), (a, c) -> a + c) AS sum_c,
       |              list_reduce(list_prepend(CAST(0 AS BIGINT),
       |                list_transform(codes, c -> c * c)), (a, c) -> a + c) AS dot_cc
       |       FROM cd),
       |sqn AS (SELECT *, d * mn * mn + 2.0 * mn * sc * sum_c + sc * sc * dot_cc AS nhat2 FROM sq)""".stripMargin

  /** Int8 scalar-quantization summary ([[Similarity.sqCodes]]): the
    * 4×-compressed per-vector index record — codes against the vector's
    * own [min,max], exact integer moments, reconstructed norm. The code
    * arrays and BIGINT reductions must match bit-for-bit; nhat2 is the
    * one closed-form double, pround at the edge.
    */
  val sqCodesQ: Q = (s, dir) =>
    Similarity.sqCodes(Tables.embeddings(s, dir)).orderBy(col("vec_id"))

  val sqCodesSql: String =
    s"""WITH $sqBaseSql
       |SELECT vec_id,
       |       array_to_string(list_transform(codes, c -> CAST(c AS VARCHAR)), ',') AS codes,
       |       sum_c, dot_cc,
       |       ${graft.Parity.proundSql("nhat2", 6)} AS nhat2
       |FROM sqn ORDER BY vec_id""".stripMargin

  /** SQ ANN with symmetric distance ([[Similarity.annSqTopK]]): both
    * sides quantized, per-pair score = closed-form dequantized cosine
    * whose only array-walk is an EXACT integer dot product of code
    * arrays — the scoring loop reads bytes and multiplies BIGINTs, so the
    * only engine-contract surface is the final one-expression double.
    * Top-10 per query (vec_ids 0..4), self excluded, vec_id tie-break.
    */
  val annSqTopK: Q = (s, dir) =>
    Similarity.annSqTopK(
        Tables.embeddings(s, dir), queryVecIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10)
      .orderBy(col("query_vec_id"), col("rank"))

  val annSqTopKSql: String =
    s"""WITH $sqBaseSql,
       |q AS (SELECT vec_id AS query_vec_id, mn AS mnq, sc AS scq, codes AS qcodes,
       |             sum_c AS sum_cq, nhat2 AS nhat2q
       |      FROM sqn WHERE vec_id IN (0, 1, 2, 3, 4)),
       |pair AS (
       |  SELECT q.query_vec_id, v.vec_id,
       |         v.d * q.mnq * v.mn + q.mnq * v.sc * v.sum_c
       |           + v.mn * q.scq * q.sum_cq
       |           + q.scq * v.sc * (list_reduce(list_prepend(CAST(0 AS BIGINT),
       |               list_transform(range(1, len(v.codes) + 1),
       |                 i -> v.codes[i] * q.qcodes[i])), (x, y) -> x + y)) AS adot,
       |         v.nhat2 AS nhat2v, q.nhat2q
       |  FROM sqn v CROSS JOIN q WHERE v.vec_id <> q.query_vec_id),
       |ranked AS (
       |  SELECT query_vec_id, vec_id,
       |         ${graft.Parity.proundSql("adot / sqrt(nhat2q * nhat2v)", 6)} AS sq_cos
       |  FROM pair),
       |rk AS (
       |  SELECT query_vec_id, vec_id, sq_cos,
       |         CAST(row_number() OVER (PARTITION BY query_vec_id
       |                                 ORDER BY sq_cos DESC, vec_id) AS BIGINT) AS rank
       |  FROM ranked)
       |SELECT query_vec_id, vec_id, sq_cos, rank FROM rk
       |WHERE rank <= 10 ORDER BY query_vec_id, rank""".stripMargin

  /** Shared CTE chain replaying [[graft.ml.LogReg]] training in DuckDB:
    * w0 = 0, then `iters` unrolled gradient steps (the pagerankSql
    * pattern). Every cross-row reduction inside is either the sequential
    * dot fold or the 1e7-quantized exact-DECIMAL gradient sum, so the
    * weight vector is bit-identical to Spark's after every iteration.
    */
  private def logregBaseSql(iters: Int, lr: String = "0.5"): String = {
    def step(i: Int): String =
      s"""m$i AS (SELECT y, emb, ${dotSql("emb", "w.wl")} AS m
         |        FROM c CROSS JOIN w${i - 1} w),
         |g$i AS (SELECT dim,
         |               CAST(sum(CAST(floor(x * err * 1e7 + 0.5) AS DECIMAL(25,0)))
         |                    AS DOUBLE) / 1e7 / (SELECT n FROM nn) AS g
         |        FROM (SELECT y - (0.5 + 0.5 * (m / (1 + abs(m)))) AS err,
         |                     unnest(range(0, len(emb))) AS dim,
         |                     unnest(emb) AS x
         |              FROM m$i)
         |        GROUP BY dim),
         |w$i AS (SELECT list(w.wl[g.dim + 1] + $lr * g.g ORDER BY g.dim) AS wl
         |        FROM g$i g CROSS JOIN w${i - 1} w)""".stripMargin
    s"""c AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
       |             CASE WHEN label = 1 THEN 1.0 ELSE 0.0 END AS y
       |      FROM embeddings),
       |nn AS (SELECT count(*) AS n FROM c),
       |w0 AS (SELECT list_transform(range(0, 64), i -> CAST(0 AS DOUBLE)) AS wl),
       |${(1 to iters).map(step).mkString(",\n")}""".stripMargin
  }

  /** In-engine classifier TRAINING ([[graft.ml.LogReg.train]]): 3
    * full-batch gradient iterations, one distributed corpus pass each —
    * weights ride as literal arrays (codegen'd VecDot margin, no join),
    * gradients are 64-group map-side-partial aggregates with the
    * 1e7-quantized exact sum, and the only driver materialization is the
    * 64-row gradient per step (a bounded model artifact). The oracle
    * REPLAYS all three iterations CTE by CTE; a single misordered IEEE op
    * anywhere in the loop diverges the weight hash.
    */
  val logregTrain: Q = (s, dir) =>
    graft.ml.LogReg.train(Tables.embeddings(s, dir))

  val logregTrainSql: String =
    s"""WITH ${logregBaseSql(3)}
       |SELECT unnest(range(0, 64)) AS dim,
       |       unnest(list_transform(wl, w -> floor(w * 1e8 + 0.5) / 1e8)) AS weight
       |FROM w3 ORDER BY dim""".stripMargin

  /** Train → broadcast → score, end to end ([[graft.ml.LogReg
    * .trainAndScore]]): the trained weights from the same 3-step loop
    * score the whole corpus map-only (one codegen'd dot + the rational
    * sigmoid per row), top-20 by score. Closes the loop `embedding_score`
    * only showed the inference half of — and the oracle re-derives the
    * model INSIDE the query, so train and score must both match.
    */
  val logregScore: Q = (s, dir) =>
    graft.ml.LogReg.trainAndScore(Tables.embeddings(s, dir))

  val logregScoreSql: String =
    s"""WITH ${logregBaseSql(3)},
       |sc AS (SELECT e.vec_id, CAST(e.label AS BIGINT) AS label,
       |              ${dotSql("list_transform(e.embedding, x -> CAST(x AS DOUBLE))", "w.wl")} AS m
       |       FROM embeddings e CROSS JOIN w3 w)
       |SELECT vec_id, label,
       |       ${graft.Parity.proundSql("0.5 + 0.5 * (m / (1 + abs(m)))", 6)} AS score
       |FROM sc ORDER BY score DESC, vec_id LIMIT 20""".stripMargin

  /** Retrieval evaluation of the trained classifier
    * ([[graft.ml.LogReg.evaluateAtK]]): precision/recall/F1 at a top-50
    * rank cut — the selection-budget report (a fixed threshold can NaN on
    * zero predicted positives; a rank cut cannot). Exact BIGINT counts,
    * prounded ratios, F1's tp=0 corner guarded identically on both
    * engines; the oracle re-derives the model through the same 3
    * unrolled iterations.
    */
  val logregEval: Q = (s, dir) =>
    graft.ml.LogReg.evaluateAtK(Tables.embeddings(s, dir))

  val logregEvalSql: String =
    s"""WITH ${logregBaseSql(3)},
       |sc AS (SELECT e.vec_id, CASE WHEN e.label = 1 THEN 1 ELSE 0 END AS y,
       |              ${graft.Parity.proundSql(
                  s"0.5 + 0.5 * (m0 / (1 + abs(m0)))", 6)} AS score
       |       FROM (SELECT e.vec_id, e.label,
       |                    ${dotSql(
                  "list_transform(e.embedding, x -> CAST(x AS DOUBLE))",
                  "w.wl")} AS m0
       |             FROM embeddings e CROSS JOIN w3 w) e),
       |top AS (SELECT y FROM (
       |          SELECT y, row_number() OVER (ORDER BY score DESC, vec_id) AS rn
       |          FROM sc) WHERE rn <= 50),
       |agg AS (SELECT CAST(sum(y) AS BIGINT) AS tp FROM top),
       |np AS (SELECT CAST(count(*) FILTER (WHERE label = 1) AS BIGINT) AS n_pos
       |       FROM embeddings)
       |SELECT CAST(50 AS BIGINT) AS k, n_pos, tp,
       |       ${graft.Parity.proundSql("CAST(tp AS DOUBLE) / 50.0", 6)} AS precision,
       |       ${graft.Parity.proundSql(
                  "CASE WHEN n_pos = 0 THEN 0.0 " +
                    "ELSE CAST(tp AS DOUBLE) / CAST(n_pos AS DOUBLE) END", 6)} AS recall,
       |       ${graft.Parity.proundSql(
                  "CASE WHEN tp = 0 THEN 0.0 ELSE " +
                    "2.0 * (CAST(tp AS DOUBLE) / 50.0) * (CAST(tp AS DOUBLE) / CAST(n_pos AS DOUBLE)) " +
                    "/ ((CAST(tp AS DOUBLE) / 50.0) + (CAST(tp AS DOUBLE) / CAST(n_pos AS DOUBLE))) END",
                  6)} AS f1
       |FROM agg CROSS JOIN np""".stripMargin

  /** Shared oracle CTE: the 3-iteration replayed model scoring the WHOLE
    * corpus (`sc(vec_id, y, score)`) — the frame [[graft.ml.LogReg
    * .scoreAll]] produces and both Eval reports consume.
    */
  private def logregScoredAllSql: String =
    s"""${logregBaseSql(3)},
       |sc AS (SELECT e.vec_id,
       |              CAST(CASE WHEN e.label = 1 THEN 1 ELSE 0 END AS BIGINT) AS y,
       |              ${graft.Parity.proundSql(
                  "0.5 + 0.5 * (m0 / (1 + abs(m0)))", 6)} AS score
       |       FROM (SELECT e.vec_id, e.label,
       |                    ${dotSql(
                  "list_transform(e.embedding, x -> CAST(x AS DOUBLE))",
                  "w.wl")} AS m0
       |             FROM embeddings e CROSS JOIN w3 w) e)""".stripMargin

  /** Exact ROC-AUC of the trained classifier ([[graft.ml.Eval.rocAuc]]):
    * the threshold-free companion to [[logregEval]]'s precision@k. The
    * Mann–Whitney rank-sum runs on the PER-SCORE aggregate — 1e-6
    * quantization bounds that relation at 1e6+1 rows no matter the corpus
    * size, so the one global window is bounded by construction; ties get
    * their exact average rank in closed form; everything is BIGINT until
    * the final single division. The oracle re-derives the model through
    * the same 3 unrolled iterations and the same rank identity.
    */
  val rocAucQ: Q = (s, dir) =>
    graft.ml.Eval.rocAuc(graft.ml.LogReg.scoreAll(Tables.embeddings(s, dir)))

  val rocAucSql: String =
    s"""WITH $logregScoredAllSql,
       |bys AS (SELECT score, CAST(count(*) AS BIGINT) AS n,
       |               CAST(sum(y) AS BIGINT) AS np
       |        FROM sc GROUP BY 1),
       |rk AS (SELECT n, np,
       |              COALESCE(CAST(sum(n) OVER (ORDER BY score
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |                AS BIGINT), 0) AS cum
       |       FROM bys),
       |agg AS (SELECT CAST(sum(np * (2 * cum + n + 1)) AS BIGINT) AS num2,
       |               CAST(sum(np) AS BIGINT) AS n_pos,
       |               CAST(sum(n - np) AS BIGINT) AS n_neg,
       |               CAST(count(*) AS BIGINT) AS n_scores
       |        FROM rk)
       |SELECT n_pos, n_neg, n_scores,
       |       ${graft.Parity.proundSql(
                  "CASE WHEN n_pos = 0 OR n_neg = 0 THEN 0.5 " +
                    "ELSE CAST(num2 - n_pos * (n_pos + 1) AS DOUBLE) " +
                    "/ CAST(2 * n_pos * n_neg AS DOUBLE) END", 6)} AS auc
       |FROM agg""".stripMargin

  /** Brier score of the trained classifier — mean squared error of the
    * predicted probability against the outcome, the strictly proper
    * scoring rule that [[calibrationBinsQ]] eyeballs and this number
    * summarizes. Scores are 6-dp quantized, so (score−y)² is an EXACT
    * 12-dp rational and DECIMAL(30,12) sums it losslessly — the statistic
    * has zero float-association exposure end to end. One aggregate row.
    */
  val brierScore: Q = (s, dir) => {
    import org.apache.spark.sql.types.DecimalType
    graft.ml.LogReg.scoreAll(Tables.embeddings(s, dir))
      .select(((col("score") - col("y").cast("double")) *
        (col("score") - col("y").cast("double"))).as("se"))
      .agg(count(lit(1)).as("n"),
        sum(col("se").cast(DecimalType(30, 12))).as("sse"))
      .select(col("n"),
        graft.Parity.pround(
          col("sse").cast("double") / col("n").cast("double"), 6).as("brier"))
  }

  val brierScoreSql: String =
    s"""WITH $logregScoredAllSql,
       |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |             sum(CAST((score - CAST(y AS DOUBLE)) * (score - CAST(y AS DOUBLE))
       |                      AS DECIMAL(30,12))) AS sse
       |      FROM sc)
       |SELECT n, ${graft.Parity.proundSql(
                 "CAST(sse AS DOUBLE) / CAST(n AS DOUBLE)", 6)} AS brier
       |FROM g""".stripMargin

  /** Cumulative-gains / lift table at deciles — "how much better than
    * random is the model's top k%": corpus ranked by score descending,
    * split into ten equal-count slices by EXACT integer rank arithmetic,
    * each slice's positive rate compared to the base rate cumulatively.
    * The rank comes from [[graft.relational.GlobalIndex]] (the scored
    * relation is corpus-sized — a global `row_number() OVER (ORDER BY
    * score)` would be the single-task anti-pattern); the decile rollup
    * and its 10-row cumulative window are bounded by construction.
    */
  val liftDeciles: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val scored = graft.ml.LogReg.scoreAll(Tables.embeddings(s, dir))
      .withColumn("neg", -col("score"))
    val idxed = graft.relational.GlobalIndex.withGlobalIndex(
      scored, Seq("neg", "vec_id"))
    val tot = idxed.agg(count(lit(1)).as("c"),
      sum(col("y")).as("p"))
    val byDecile = idxed.crossJoin(broadcast(tot))
      .withColumn("decile", expr("((idx - 1) * 10) DIV c"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("positives"),
        min(col("c")).as("c"), min(col("p")).as("p"))
    val w = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDecile
      .withColumn("cum_n", sum(col("n")).over(w))
      .withColumn("cum_positives", sum(col("positives")).over(w))
      .select(col("decile"), col("n"), col("positives"), col("cum_positives"),
        graft.Parity.pround(
          (col("cum_positives").cast("double") / col("cum_n").cast("double")) /
            (col("p").cast("double") / col("c").cast("double")), 6).as("lift"))
      .orderBy(col("decile"))
  }

  val liftDecilesSql: String =
    s"""WITH $logregScoredAllSql,
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS c, CAST(sum(y) AS BIGINT) AS p FROM sc),
       |r AS (SELECT y, CAST(row_number() OVER (ORDER BY score DESC, vec_id) AS BIGINT) AS idx
       |      FROM sc),
       |d AS (SELECT ((idx - 1) * 10) // c AS decile, y FROM r CROSS JOIN tot),
       |g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n,
       |             CAST(sum(y) AS BIGINT) AS positives
       |      FROM d GROUP BY 1),
       |cum AS (
       |  SELECT decile, n, positives,
       |         CAST(sum(n) OVER (ORDER BY decile
       |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
       |         CAST(sum(positives) OVER (ORDER BY decile
       |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_positives
       |  FROM g)
       |SELECT decile, n, positives, cum_positives,
       |       ${graft.Parity.proundSql(
                 "(CAST(cum_positives AS DOUBLE) / CAST(cum_n AS DOUBLE)) / (CAST(p AS DOUBLE) / CAST(c AS DOUBLE))",
                 6)} AS lift
       |FROM cum CROSS JOIN tot ORDER BY decile""".stripMargin

  /** Calibration / reliability table ([[graft.ml.Eval.calibrationBins]]):
    * decile score bins × (count, positives, exact mean score, positive
    * rate) — the report that says whether the classifier's probabilities
    * MEAN anything before a pipeline thresholds on them. A 10-group hash
    * aggregate over the scored corpus; the mean sums exact DECIMAL(18,6)
    * (lossless for quantized scores), the rates are single divisions.
    */
  val calibrationBinsQ: Q = (s, dir) =>
    graft.ml.Eval.calibrationBins(
      graft.ml.LogReg.scoreAll(Tables.embeddings(s, dir)))

  /** Shared CTE chain ending in `agg(bin, n, n_pos, ssum)` — the decile
    * reliability bins both [[calibrationBinsSql]] and
    * [[isotonicCalibrationSql]] read.
    */
  private val calibBinsCteSql: String =
    s"""$logregScoredAllSql,
       |b AS (SELECT least(CAST(floor(score * 10.0) AS BIGINT), 9) AS bin,
       |             y, score
       |      FROM sc),
       |agg AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
       |               CAST(sum(y) AS BIGINT) AS n_pos,
       |               CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE) AS ssum
       |        FROM b GROUP BY 1)""".stripMargin

  val calibrationBinsSql: String =
    s"""WITH $calibBinsCteSql
       |SELECT bin, n, n_pos,
       |       ${graft.Parity.proundSql("ssum / CAST(n AS DOUBLE)", 6)} AS mean_score,
       |       ${graft.Parity.proundSql(
                  "CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)", 6)} AS frac_pos
       |FROM agg ORDER BY bin""".stripMargin

  /** Isotonic (PAV) calibration of the reliability bins — the monotone
    * regression a score-calibration pass fits before serving probabilities
    * (Platt/temperature need exp; isotonic is the distribution-free,
    * libm-free standard). Computed in the MINIMAX closed form
    * fitted(i) = max_{j≤i} min_{k≥i} rate(j..k) — exactly the
    * pool-adjacent-violators solution — entirely over the BOUNDED bin
    * relation: prefix sums over ≤10 rows, a ≤55-row segment self-join,
    * ≤220 (i, j, k) triples, two bounded aggregates (the mmr_rerank
    * bounded-relation discipline; the corpus-scale work is the scoring +
    * binning aggregate upstream). Every segment rate is ONE IEEE division
    * of exact integer sums, and min/max are selections — hash-exact
    * cross-engine with no quantize step until the output rounding.
    */
  val isotonicCalibration: Q = (s, dir) =>
    graft.ml.Eval.isotonicFit(
        graft.ml.Eval.calibrationBins(
            graft.ml.LogReg.scoreAll(Tables.embeddings(s, dir)))
          .select(col("bin"), col("n"), col("n_pos")))
      .orderBy(col("bin"))

  /** Shared CTE chain ending in `ft(i, fit)` — the PAV minimax solution
    * both [[isotonicCalibrationSql]] and [[isotonicApplySql]] read.
    */
  private val isotonicFitCteSql: String =
    s"""cum AS (
       |  SELECT bin, n, n_pos,
       |         sum(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cn,
       |         sum(n_pos) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cp
       |  FROM agg),
       |segs AS (
       |  SELECT j.bin AS j, k.bin AS k,
       |         CAST(k.cp - j.cp + j.n_pos AS DOUBLE)
       |           / CAST(k.cn - j.cn + j.n AS DOUBLE) AS seg
       |  FROM cum j JOIN cum k ON j.bin <= k.bin),
       |mn AS (
       |  SELECT i.bin AS i, s.j, min(s.seg) AS mn
       |  FROM agg i JOIN segs s ON s.j <= i.bin AND s.k >= i.bin
       |  GROUP BY 1, 2),
       |ft AS (SELECT i, max(mn) AS fit FROM mn GROUP BY 1)""".stripMargin

  val isotonicCalibrationSql: String =
    s"""WITH $calibBinsCteSql,
       |$isotonicFitCteSql
       |SELECT a.bin, a.n, a.n_pos,
       |       ${graft.Parity.proundSql(
                 "CAST(a.n_pos AS DOUBLE) / CAST(a.n AS DOUBLE)", 6)} AS frac_pos,
       |       ${graft.Parity.proundSql("f.fit", 6)} AS fitted
       |FROM agg a JOIN ft f ON f.i = a.bin
       |ORDER BY a.bin""".stripMargin

  /** SERVE the isotonic fit: a calibrated probability PER SCORED ROW — the
    * consumer that turns [[isotonicCalibration]]'s report into an operator
    * (a pipeline thresholds on `p_cal`, not on the raw score). The fitted
    * bins are a ≤10-row relation broadcast against the scored corpus and
    * equi-joined on the bin ordinal — the bin id IS the range key (deciles
    * are closed-form), so the asof/range-join shape collapses to a
    * broadcast hash join: one corpus pass for scoring, zero shuffles for
    * calibration. `p_cal` is monotone in `score` by the PAV guarantee.
    */
  val isotonicApply: Q = (s, dir) => {
    val scored = graft.ml.LogReg.scoreAll(Tables.embeddings(s, dir))
    val fit = graft.ml.Eval.isotonicFit(
        graft.ml.Eval.calibrationBins(scored)
          .select(col("bin"), col("n"), col("n_pos")))
      .select(col("bin"), col("fitted").as("p_cal")) // pround(…,6) already
    scored
      .withColumn("bin",
        least(floor(col("score") * lit(10.0)).cast("long"), lit(9L)))
      .join(broadcast(fit), "bin")
      .select(col("vec_id"), col("y"), col("score"), col("bin"),
        col("p_cal"))
      .orderBy(col("vec_id"))
  }

  val isotonicApplySql: String =
    s"""WITH $calibBinsCteSql,
       |$isotonicFitCteSql
       |SELECT sc.vec_id, sc.y, sc.score,
       |       least(CAST(floor(sc.score * 10.0) AS BIGINT), 9) AS bin,
       |       ${graft.Parity.proundSql("f.fit", 6)} AS p_cal
       |FROM sc JOIN ft f
       |  ON f.i = least(CAST(floor(sc.score * 10.0) AS BIGINT), 9)
       |ORDER BY sc.vec_id""".stripMargin

  /** Shared CTE chain replaying [[graft.ml.SparseLogReg]] training in
    * DuckDB: hashed bag-of-words features (the PortableHash md5 parse,
    * mod 256), an EMPTY w0 relation (so iteration 1's margins are exactly
    * 0 with no special-casing), then `iters` unrolled steps each made of
    * the same three joins the Spark side plans — margin (features ⋈
    * weights), gradient (features ⋈ errors), update (weights ⟗
    * gradients). Both cross-row sums quantize per-term at 1e7 into exact
    * DECIMAL.
    */
  private def sparseLogregBaseSql(iters: Int, lr: String = "0.5"): String = {
    def step(i: Int): String =
      s"""m$i AS (SELECT f.doc_id, f.y,
         |               CAST(sum(CAST(floor(f.cnt * COALESCE(w.w, 0.0) * 1e7 + 0.5)
         |                    AS DECIMAL(25,0))) AS DOUBLE) / 1e7 AS m
         |        FROM f LEFT JOIN w${i - 1} w USING (feat) GROUP BY 1, 2),
         |e$i AS (SELECT doc_id, y - (0.5 + 0.5 * (m / (1 + abs(m)))) AS err FROM m$i),
         |g$i AS (SELECT f.feat,
         |               CAST(sum(CAST(floor(f.cnt * e.err * 1e7 + 0.5)
         |                    AS DECIMAL(25,0))) AS DOUBLE) / 1e7 / (SELECT n FROM nn) AS g
         |        FROM f JOIN e$i e USING (doc_id) GROUP BY 1),
         |w$i AS (SELECT COALESCE(w.feat, g.feat) AS feat,
         |               COALESCE(w.w, 0.0) + $lr * COALESCE(g.g, 0.0) AS w
         |        FROM w${i - 1} w FULL JOIN g$i g ON w.feat = g.feat)""".stripMargin
    s"""tok AS (
       |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
       |         unnest(string_split(text, ' ')) AS token
       |  FROM documents),
       |f AS (
       |  SELECT doc_id, y, (${graft.functions.PortableHash.hash32Sql("token")}) % 256 AS feat,
       |         count(*) AS cnt
       |  FROM tok GROUP BY 1, 2, 3),
       |nn AS (SELECT count(*) AS n FROM documents),
       |w0 AS (SELECT CAST(NULL AS BIGINT) AS feat, CAST(NULL AS DOUBLE) AS w
       |       WHERE 1 = 0),
       |${(1 to iters).map(step).mkString(",\n")}""".stripMargin
  }

  /** SPARSE classifier training ([[graft.ml.SparseLogReg.train]]): the
    * weights are a RELATION met only through key joins (margin, gradient,
    * update — none broadcast-hinted, nothing model-sized on the driver),
    * i.e. the shape that still works when the model outgrows a broadcast.
    * The oracle replays both iterations join for join; 256 hashed dims
    * keep it readable while exercising every join the 2²⁰-dim version
    * would plan.
    */
  val logregSparseTrain: Q = (s, dir) =>
    graft.ml.SparseLogReg.train(Tables.documents(s, dir))

  val logregSparseTrainSql: String =
    s"""WITH ${sparseLogregBaseSql(2)}
       |SELECT feat, ${graft.Parity.proundSql("w", 8)} AS weight
       |FROM w2 ORDER BY feat""".stripMargin

  /** Sparse train → score through the SAME join shape (no model
    * broadcast): per-doc quantized margin over features ⋈ weights, the
    * rational sigmoid, top-20 docs.
    */
  val logregSparseScore: Q = (s, dir) =>
    graft.ml.SparseLogReg.trainAndScore(Tables.documents(s, dir))

  val logregSparseScoreSql: String =
    s"""WITH ${sparseLogregBaseSql(2)},
       |ms AS (SELECT f.doc_id, f.y,
       |              CAST(sum(CAST(floor(f.cnt * COALESCE(w.w, 0.0) * 1e7 + 0.5)
       |                   AS DECIMAL(25,0))) AS DOUBLE) / 1e7 AS m
       |       FROM f LEFT JOIN w2 w USING (feat) GROUP BY 1, 2)
       |SELECT doc_id, CAST(y AS BIGINT) AS is_target,
       |       ${graft.Parity.proundSql("0.5 + 0.5 * (m / (1 + abs(m)))", 6)} AS score
       |FROM ms ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  /** IVF+PQ with exact rerank ([[Similarity.annIvfPqTopK]]): coarse cells
    * prune candidates, ADC scores them as code bytes, and only the top-30
    * ADC survivors per query pay a full-precision cosine. Same quantizer as
    * `ann_ivf_topk` (cells 100..115, nProbe 4) and same codebook as
    * `ann_pq_topk` (codes 100..107, 8×8) — the oracle walks the identical
    * three-stage trajectory CTE by CTE.
    */
  val annIvfPqTopK: Q = (s, dir) =>
    Similarity.annIvfPqTopK(
        Tables.embeddings(s, dir), queryVecIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10)
      .orderBy(col("query_vec_id"), col("rank"))

  val annIvfPqTopKSql: String = {
    val centIds = (100L until 116L).mkString(", ")
    s"""WITH $pqBaseSql,
       |en AS (
       |  SELECT vec_id, embedding,
       |         sqrt(${dotSql("embedding", "embedding")}) AS norm
       |  FROM embeddings),
       |cents AS (
       |  SELECT vec_id AS cent_id, embedding AS c_emb, norm AS c_norm
       |  FROM en WHERE vec_id IN ($centIds)),
       |cscored AS (
       |  SELECT e.vec_id, c.cent_id,
       |         (${dotSql("e.embedding", "c.c_emb")}) / (e.norm * c.c_norm) AS c_cos
       |  FROM en e CROSS JOIN cents c),
       |assign AS (
       |  SELECT vec_id, cent_id AS cell FROM (
       |    SELECT vec_id, cent_id,
       |           row_number() OVER (PARTITION BY vec_id
       |                              ORDER BY c_cos DESC, cent_id) AS rn
       |    FROM cscored) WHERE rn = 1),
       |qprobe AS (
       |  SELECT vec_id AS query_vec_id, cent_id AS cell FROM (
       |    SELECT vec_id, cent_id,
       |           row_number() OVER (PARTITION BY vec_id
       |                              ORDER BY c_cos DESC, cent_id) AS rn
       |    FROM cscored WHERE vec_id IN (0, 1, 2, 3, 4)) WHERE rn <= 4),
       |cand AS (
       |  SELECT q.query_vec_id, a.vec_id
       |  FROM assign a JOIN qprobe q ON a.cell = q.cell
       |  WHERE a.vec_id <> q.query_vec_id),
       |q0 AS (SELECT vec_id AS query_vec_id, emb AS q_emb FROM e0 WHERE vec_id IN (0, 1, 2, 3, 4)),
       |lut AS (
       |  SELECT q.query_vec_id, r.s, cb.code,
       |         ${pqSubDistSql("q.q_emb", "cb.c_emb")} AS qd
       |  FROM q0 q CROSS JOIN r CROSS JOIN cb),
       |adc AS (
       |  SELECT c.query_vec_id, c.vec_id,
       |         floor(list_reduce(list_prepend(CAST(0 AS DOUBLE), list(l.qd ORDER BY a.s)),
       |               (x, y) -> x + y) * 1e6 + 0.5) / 1e6 AS adc_dist
       |  FROM cand c
       |  JOIN asg a ON a.vec_id = c.vec_id
       |  JOIN lut l ON l.query_vec_id = c.query_vec_id
       |            AND l.s = a.s AND l.code = a.code
       |  GROUP BY c.query_vec_id, c.vec_id),
       |pool AS (
       |  SELECT query_vec_id, vec_id, adc_dist FROM (
       |    SELECT query_vec_id, vec_id, adc_dist,
       |           row_number() OVER (PARTITION BY query_vec_id
       |                              ORDER BY adc_dist, vec_id) AS adc_rank
       |    FROM adc) WHERE adc_rank <= 30),
       |qn AS (
       |  SELECT vec_id AS query_vec_id, embedding AS q_emb, norm AS q_norm
       |  FROM en WHERE vec_id IN (0, 1, 2, 3, 4)),
       |rer AS (
       |  SELECT p.query_vec_id, p.vec_id, p.adc_dist,
       |         floor(((${dotSql("v.embedding", "q.q_emb")})
       |                / (v.norm * q.q_norm)) * 1e6 + 0.5) / 1e6 AS cos_sim
       |  FROM pool p
       |  JOIN en v ON v.vec_id = p.vec_id
       |  JOIN qn q ON q.query_vec_id = p.query_vec_id),
       |ranked AS (
       |  SELECT query_vec_id, vec_id, adc_dist, cos_sim,
       |         CAST(row_number() OVER (PARTITION BY query_vec_id
       |                                 ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rank
       |  FROM rer)
       |SELECT query_vec_id, vec_id, adc_dist, cos_sim, rank FROM ranked
       |WHERE rank <= 10 ORDER BY query_vec_id, rank""".stripMargin
  }

  /** Broadcast linear-model scoring — the inference primitive every
    * curation pipeline runs after training a quality/toxicity classifier:
    * score = squash(w · x) per corpus row, weights broadcast once. The
    * weight vector here is a corpus row itself (vec_id 42 — deterministic,
    * no training dependency); the squash is the RATIONAL sigmoid
    * d/(1+|d|), chosen over the logistic exp form deliberately: division
    * and abs are single correctly-rounded IEEE ops on both engines, while
    * exp() is a libm call with no cross-engine bit contract. The plan is
    * one corpus scan × one broadcast row — the codegen'd VecDot shape, no
    * shuffle until the bounded top-k (TakeOrdered). At 100 TB this is the
    * map-only job it should be.
    */
  val embeddingScore: Q = (s, dir) => {
    import graft.similarity.Similarity.dot
    val e = Tables.embeddings(s, dir)
    val wts = e.filter(col("vec_id") === 42L).select(col("embedding").as("w"))
    val raw = dot("embedding", "w")
    e.crossJoin(broadcast(wts))
      .filter(col("vec_id") =!= 42L)
      .select(col("vec_id"),
        graft.Parity.pround(raw / (lit(1.0) + abs(raw)), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id"))
      .limit(20)
  }

  val embeddingScoreSql: String = {
    val raw = dotSql("e.embedding", "wt.w")
    s"""WITH wt AS (SELECT embedding AS w FROM embeddings WHERE vec_id = 42)
       |SELECT e.vec_id,
       |       floor((($raw) / (1.0 + abs($raw))) * 1e6 + 0.5) / 1e6 AS score
       |FROM embeddings e CROSS JOIN wt
       |WHERE e.vec_id <> 42
       |ORDER BY score DESC, e.vec_id
       |LIMIT 20""".stripMargin
  }

  /** Shared oracle CTE chain through `cv(i, j, n, covr)` — the exact
    * upper-triangle covariance [[graft.ml.PCA.covariance]] computes
    * (pre-rounding): per-dim means from 1e7-exact sums, per-row centering,
    * and (i ≤ j)-keyed 1e7-exact product sums. The oracle pairs via a
    * vec_id self-join (corpus fits one node); the engine's one-pass
    * nested-transform expansion is the scale path.
    */
  private val covCtesSql: String =
    """ex AS (
      |  SELECT vec_id,
      |         unnest(range(0, len(embedding))) AS i,
      |         unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS x
      |  FROM embeddings),
      |mn AS (
      |  SELECT i, CAST(sum(CAST(floor(x * 1e7 + 0.5) AS DECIMAL(25,0)))
      |              AS DOUBLE) / 1e7 / count(*) AS m
      |  FROM ex GROUP BY 1),
      |cx AS (SELECT e.vec_id, e.i, e.x - mn.m AS c FROM ex e JOIN mn USING (i)),
      |cv AS (
      |  SELECT a.i, b.i AS j, count(*) AS n,
      |         CAST(sum(CAST(floor(a.c * b.c * 1e7 + 0.5) AS DECIMAL(25,0)))
      |           AS DOUBLE) / 1e7 / count(*) AS covr
      |  FROM cx a JOIN cx b ON a.vec_id = b.vec_id AND b.i >= a.i
      |  GROUP BY 1, 2)""".stripMargin

  /** Per-sfDir cached corpus means — the bounded d-element artifact every
    * PCA-family consumer centers with. One collect per (JVM, dir).
    */
  private val pcaMeansCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Double]]()
  private def pcaMeans(s: SparkSession, dir: String): Array[Double] =
    pcaMeansCache.computeIfAbsent(dir,
      d => graft.ml.PCA.dimMeans(Tables.embeddings(s, d)))

  /** The d² covariance relation as a SHARED fixture: all five PCA-family
    * queries consume the identical derivation, so it is computed once per
    * (JVM, dir) and served from scratch parquet thereafter — the
    * materialized-covariance-table pattern a 100 TB shop runs (VERDICT r13
    * next-round #1; previously each query re-ran the corpus pass).
    */
  private def covFixture(s: SparkSession, dir: String): DataFrame =
    graft.Scratch.fixture(s, s"pca-cov|$dir")(
      graft.ml.PCA.covariance(Tables.embeddings(s, dir), pcaMeans(s, dir)))

  /** Both leading components as a shared fixture (component, dim, loading,
    * eigenvalue): pc1's four power rounds and pc2's Gram–Schmidt rounds run
    * once per (JVM, dir); [[pcaPowerIter]]/[[pcaProject]] read component 1,
    * [[pcaPc2]] component 2, [[pcaWhiten2d]] both. topTwo's pc1 arm is
    * arithmetic-identical to [[graft.ml.PCA.powerIteration]] (same iterate
    * loop over the same symmetrized relation), so serving pc1 from the
    * topTwo fixture is value-identical to the per-query chain it replaces.
    */
  private def pcsFixture(s: SparkSession, dir: String): DataFrame =
    graft.Scratch.fixture(s, s"pca-top2-i4|$dir")(
      graft.ml.PCA.topTwo(covFixture(s, dir), iters = 4))

  /** Exact embedding covariance matrix as a relation ([[graft.ml.PCA
    * .covariance]]): the d·(d+1)/2 upper-triangle cells from ONE corpus
    * pass of per-row centered outer products (nested HOFs, no join), with
    * the means riding in as a literal d-array. 2,080 rows at d = 64.
    */
  val embeddingCovariance: Q = (s, dir) =>
    covFixture(s, dir).orderBy(col("i"), col("j"))

  val embeddingCovarianceSql: String =
    s"""WITH $covCtesSql
       |SELECT i, j, ${graft.Parity.proundSql("covr", 6)} AS cov
       |FROM cv ORDER BY i, j""".stripMargin

  /** Top principal component by 4 power-iteration rounds over the
    * covariance RELATION ([[graft.ml.PCA.powerIteration]]): matrix⋈vector
    * joins and exact quantized sums, never a driver-side matrix — the
    * shape that survives d² outgrowing a broadcast. The oracle unrolls
    * all four rounds CTE by CTE (the pagerank pattern).
    */
  val pcaPowerIter: Q = (s, dir) =>
    pcsFixture(s, dir).filter(col("component") === 1)
      .drop("component").orderBy(col("dim"))

  /** Shared oracle CTE chain through `v4`/`n4` — the four unrolled power
    * rounds over the symmetrized covariance, used by [[pcaPowerIterSql]]
    * (loadings out) and [[pcaProjectSql]] (loadings applied back to the
    * centered rows).
    */
  /** Unrolled power-iteration CTE rounds over symmetric matrix CTE `mat`
    * (step arithmetic identical to [[graft.ml.PCA]].iterate); `pfx`
    * namespaces the y/n/v chain so the Gram–Schmidt second-component run
    * can share the builder. `ortho` names a (j, v) CTE to project each
    * mat-vec product off before normalizing (PCA.iterate's ortho arm).
    */
  private def powerChainSql(mat: String, pfx: String, iters: Int,
      ortho: Option[String] = None): String = {
    // MATERIALIZED throughout: every y step references mat and the previous
    // v, and v references y twice — inlined, DuckDB re-evaluates the whole
    // prefix per reference (exponential in iters; the deflated pc2 chain
    // exhausted file handles on the embeddings scan), materialized each
    // round runs once, as Spark's checkpointed iterate does
    def step(t: Int): String = {
      // the post-projection relation the norm/normalize stages read:
      // with ortho, z subtracts the (y·v1)-scaled v1 per row first
      val zed = ortho match {
        case None => s"y$pfx$t"
        case Some(_) => s"z$pfx$t"
      }
      val proj = ortho.fold("") { o =>
        s"""
           |d$pfx$t AS MATERIALIZED (
           |  SELECT CAST(sum(CAST(floor(y.y * o.v * 1e7 + 0.5)
           |                AS DECIMAL(25,0))) AS DOUBLE) / 1e7 AS dt
           |  FROM y$pfx$t y JOIN $o o ON o.j = y.i),
           |z$pfx$t AS MATERIALIZED (
           |  SELECT y.i, floor((y.y - d.dt * o.v) * 1e7 + 0.5) / 1e7 AS y
           |  FROM y$pfx$t y JOIN $o o ON o.j = y.i CROSS JOIN d$pfx$t d),""".stripMargin
      }
      s"""y$pfx$t AS MATERIALIZED (
         |  SELECT m.i, CAST(sum(CAST(floor(m.cov * v.v * 1e7 + 0.5)
         |                AS DECIMAL(25,0))) AS DOUBLE) / 1e7 AS y
         |  FROM $mat m JOIN v$pfx${t - 1} v ON m.j = v.j GROUP BY 1),$proj
         |n$pfx$t AS MATERIALIZED (
         |  SELECT sqrt(CAST(sum(CAST(floor(y * y * 1e12 + 0.5)
         |                AS DECIMAL(38,0))) AS DOUBLE) / 1e12) AS nm
         |  FROM $zed),
         |v$pfx$t AS MATERIALIZED (
         |  SELECT y.i AS j, floor(y.y / n.nm * 1e7 + 0.5) / 1e7 AS v
         |  FROM $zed y CROSS JOIN n$pfx$t n)""".stripMargin
    }
    s"""v${pfx}0 AS MATERIALIZED (SELECT DISTINCT j, CAST(0.125 AS DOUBLE) AS v FROM $mat),
       |${(1 to iters).map(step).mkString(",\n")}""".stripMargin
  }

  private val pcaChainSql: String =
    s"""$covCtesSql,
       |cvr AS MATERIALIZED (SELECT i, j, ${graft.Parity.proundSql("covr", 6)} AS cov FROM cv),
       |cf AS MATERIALIZED (SELECT i, j, cov FROM cvr
       |       UNION ALL
       |       SELECT j AS i, i AS j, cov FROM cvr WHERE i < j),
       |${powerChainSql("cf", "", 4)}""".stripMargin

  val pcaPowerIterSql: String =
    s"""WITH $pcaChainSql
       |SELECT v.j AS dim, v.v AS loading,
       |       ${graft.Parity.proundSql("n.nm", 6)} AS eigenvalue
       |FROM v4 v CROSS JOIN n4 n ORDER BY dim""".stripMargin

  /** Second principal component by per-round Gram–Schmidt against pc1
    * ([[graft.ml.PCA.secondComponent]]): four more power rounds over the
    * SAME symmetric (i, j, cov) relation, each mat-vec product projected
    * off the reported v₁ (a d-row bounded relation joining in per round —
    * never a driver matrix, and no second d² deflated-matrix relation)
    * before normalizing. Orthogonality to pc1 holds BY CONSTRUCTION —
    * one-shot Hotelling deflation inherits v₁'s convergence residual
    * (≈0.15 dot at 4 rounds on this corpus) — and with pc1 this makes
    * pca_project a real 2-D projection surface.
    */
  val pcaPc2: Q = (s, dir) =>
    pcsFixture(s, dir).filter(col("component") === 2)
      .drop("component").orderBy(col("dim"))

  val pcaPc2Sql: String =
    s"""WITH $pcaChainSql,
       |${powerChainSql("cf", "b", 4, ortho = Some("v4"))}
       |SELECT v.j AS dim, v.v AS loading,
       |       ${graft.Parity.proundSql("n.nm", 6)} AS eigenvalue
       |FROM vb4 v CROSS JOIN nb4 n ORDER BY dim""".stripMargin

  /** Project every embedding onto the learned top principal component —
    * the TRANSFORM arm of the PCA pipeline ([[pcaPowerIter]] is the fit):
    * the 1-D representation used for curriculum ordering, coarse binning,
    * or drift monitoring along the dominant variance axis. The loading
    * vector is a d-row relation — bounded BY CONSTRUCTION by the embedding
    * dimensionality, so it broadcasts where the covariance itself may not;
    * the projection is one posexplode ⋈ loadings join and a per-vec
    * quantized-exact sum (the [[graft.ml.PCA.powerIteration]] y-step
    * applied to rows instead of the matrix). Centering reuses the same
    * 1e7-exact per-dim means the covariance was built from.
    */
  val pcaProject: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    val m = pcaMeans(s, dir)
    val pc = pcsFixture(s, dir).filter(col("component") === 1)
      .select(col("dim"), col("loading"))
    val mLit = array(m.toIndexedSeq.map(lit): _*)
    emb.select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("vec_id"), col("label"), col("dim"),
        (col("x").cast("double") - element_at(mLit, col("dim") + 1)).as("c"))
      .join(broadcast(pc), "dim")
      .groupBy(col("vec_id"), col("label"))
      .agg((sum(floor(col("c") * col("loading") * lit(1e7) + lit(0.5))
        .cast(org.apache.spark.sql.types.DecimalType(25, 0)))
        .cast("double") / lit(1e7)).as("p0"))
      .select(col("vec_id"), col("label").cast("long").as("label"),
        graft.Parity.pround(col("p0"), 6).as("projection"))
      .orderBy(col("vec_id"))
  }

  val pcaProjectSql: String =
    s"""WITH $pcaChainSql,
       |proj AS (
       |  SELECT cx.vec_id,
       |         CAST(sum(CAST(floor(cx.c * v.v * 1e7 + 0.5)
       |               AS DECIMAL(25,0))) AS DOUBLE) / 1e7 AS p0
       |  FROM cx JOIN v4 v ON cx.i = v.j GROUP BY 1)
       |SELECT p.vec_id, CAST(e.label AS BIGINT) AS label,
       |       ${graft.Parity.proundSql("p.p0", 6)} AS projection
       |FROM proj p JOIN embeddings e USING (vec_id)
       |ORDER BY vec_id""".stripMargin


  /** Whitened 2-D embedding map — the centered corpus projected onto the
    * two leading principal components, each axis scaled by 1/√λ so both
    * directions carry unit variance (the representation drift monitors
    * and diversity plots want: distances comparable across axes). Both
    * components come from ONE [[graft.ml.PCA.topTwo]] pass (pc1 scratched
    * and reused as pc2's projection direction, never two chains), the
    * projection is the one-corpus-scan quantized-dot shape of
    * [[pcaProject]] but against a 2·d-row loading relation, and the
    * √λ scale divides by the 6-dp-rounded eigenvalue BOTH engines agree
    * on by construction.
    */
  val pcaWhiten2d: Q = (s, dir) => {
    val emb = Tables.embeddings(s, dir)
    val m = pcaMeans(s, dir)
    val pcs = pcsFixture(s, dir)
    val mLit = array(m.toIndexedSeq.map(lit): _*)
    val dec = org.apache.spark.sql.types.DecimalType(25, 0)
    emb.select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("vec_id"), col("dim"),
        (col("x").cast("double") - element_at(mLit, col("dim") + 1)).as("c"))
      .join(broadcast(pcs), "dim")
      .groupBy(col("vec_id"), col("component"), col("eigenvalue"))
      .agg((sum(floor(col("c") * col("loading") * lit(1e7) + lit(0.5)).cast(dec))
        .cast("double") / lit(1e7)).as("p"))
      .withColumn("w", graft.Parity.pround(col("p") / sqrt(col("eigenvalue")), 6))
      .groupBy(col("vec_id"))
      .agg(max(when(col("component") === 1, col("w"))).as("w1"),
        max(when(col("component") === 2, col("w"))).as("w2"))
      .orderBy(col("vec_id"))
  }

  val pcaWhiten2dSql: String =
    s"""WITH $pcaChainSql,
       |${powerChainSql("cf", "b", 4, ortho = Some("v4"))},
       |pcs AS (
       |  SELECT 1 AS component, v.j AS dim, v.v AS loading,
       |         ${graft.Parity.proundSql("n.nm", 6)} AS eigenvalue
       |  FROM v4 v CROSS JOIN n4 n
       |  UNION ALL
       |  SELECT 2 AS component, v.j AS dim, v.v AS loading,
       |         ${graft.Parity.proundSql("n.nm", 6)} AS eigenvalue
       |  FROM vb4 v CROSS JOIN nb4 n),
       |proj AS (
       |  SELECT cx.vec_id, p.component, p.eigenvalue,
       |         CAST(sum(CAST(floor(cx.c * p.loading * 1e7 + 0.5)
       |               AS DECIMAL(25,0))) AS DOUBLE) / 1e7 AS p
       |  FROM cx JOIN pcs p ON cx.i = p.dim GROUP BY 1, 2, 3)
       |SELECT vec_id,
       |       max(CASE WHEN component = 1 THEN ${graft.Parity.proundSql("p / sqrt(eigenvalue)", 6)} END) AS w1,
       |       max(CASE WHEN component = 2 THEN ${graft.Parity.proundSql("p / sqrt(eigenvalue)", 6)} END) AS w2
       |FROM proj GROUP BY 1 ORDER BY vec_id""".stripMargin

  /** Embedding-space quality diagnostics — the isotropy/variance report an
    * embedding-quality monitor alarms on (a collapsing representation shows
    * up as anisotropy λ₁/λ₂ blowing up and explained-variance concentrating
    * in one axis; a drifting mean shows up in ‖μ‖): one row of
    * (n_dims, trace, λ₁, λ₂, λ₁/λ₂, λ₁/trace, λ₂/trace, ‖μ‖), computed
    * ENTIRELY from the shared fixtures — the covariance diagonal, the
    * top-two components, and the cached d-element means; the corpus is
    * never rescanned (this is the cross-family payoff of the materialized
    * derivation tables: a new diagnostic is fixture reads + arithmetic).
    *
    * Parity: trace is a quantized-exact sum of the 6dp-rounded diagonal
    * (floor(cov·1e6+0.5) recovers the exact integers); λs are the fixture's
    * already-rounded eigenvalues; ratios are single IEEE divisions of
    * agreed doubles; ‖μ‖ sums the 64 floor(m²·1e12+0.5) integers (≤6.4e13,
    * exact in double) and takes one sqrt — the identical arithmetic the
    * oracle's mn CTE replays, so it rides in as a bounded driver literal.
    */
  val embeddingIsotropy: Q = (s, dir) => {
    val dec = org.apache.spark.sql.types.DecimalType(25, 0)
    val trace = covFixture(s, dir).filter(col("i") === col("j"))
      .agg(count(lit(1)).as("n_dims"),
        (sum(floor(col("cov") * lit(1e6) + lit(0.5)).cast(dec))
          .cast("double") / lit(1e6)).as("trace"))
    val pcs = pcsFixture(s, dir)
    val l1 = pcs.filter(col("component") === 1)
      .agg(max(col("eigenvalue")).as("lambda1"))
    val l2 = pcs.filter(col("component") === 2)
      .agg(max(col("eigenvalue")).as("lambda2"))
    val m = pcaMeans(s, dir)
    val meanNorm = math.sqrt(
      m.map(x => math.floor(x * x * 1e12 + 0.5)).sum / 1e12)
    trace.crossJoin(broadcast(l1)).crossJoin(broadcast(l2))
      .select(col("n_dims"), col("trace"), col("lambda1"), col("lambda2"),
        graft.Parity.pround(col("lambda1") / col("lambda2"), 6).as("anisotropy"),
        graft.Parity.pround(col("lambda1") / col("trace"), 6).as("explained1"),
        graft.Parity.pround(col("lambda2") / col("trace"), 6).as("explained2"),
        graft.Parity.pround(lit(meanNorm), 6).as("mean_norm"))
  }

  val embeddingIsotropySql: String =
    s"""WITH $pcaChainSql,
       |${powerChainSql("cf", "b", 4, ortho = Some("v4"))},
       |tr AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_dims,
       |         CAST(sum(CAST(floor(cov * 1e6 + 0.5) AS DECIMAL(25,0)))
       |           AS DOUBLE) / 1e6 AS trace
       |  FROM cvr WHERE i = j),
       |l1 AS (SELECT ${graft.Parity.proundSql("nm", 6)} AS lambda1 FROM n4),
       |l2 AS (SELECT ${graft.Parity.proundSql("nm", 6)} AS lambda2 FROM nb4),
       |mu AS (
       |  SELECT sqrt(CAST(sum(CAST(floor(m * m * 1e12 + 0.5) AS DECIMAL(38,0)))
       |           AS DOUBLE) / 1e12) AS mean_norm
       |  FROM mn)
       |SELECT n_dims, trace, lambda1, lambda2,
       |       ${graft.Parity.proundSql("lambda1 / lambda2", 6)} AS anisotropy,
       |       ${graft.Parity.proundSql("lambda1 / trace", 6)} AS explained1,
       |       ${graft.Parity.proundSql("lambda2 / trace", 6)} AS explained2,
       |       ${graft.Parity.proundSql("mean_norm", 6)} AS mean_norm
       |FROM tr CROSS JOIN l1 CROSS JOIN l2 CROSS JOIN mu""".stripMargin

  /** MERGEABLE covariance — the dense-moments member of the
    * per-partition-then-merge family ([[graft.queries.KllQueries]] merges
    * sketches, hll_merge_days merges registers; this merges SECOND
    * MOMENTS): each shard (standing in for a day's ingest job; vec_id % 8
    * here) emits exact partial statistics (n, Σxᵢ, Σxᵢxⱼ as 1e7-quantized
    * DECIMAL integers), and the global covariance assembles from summed
    * partials in the uncentered closed form
    * cov = Σxy/n − (Σx/n)(Σy/n) — each ROW of the corpus is touched
    * exactly once by its own shard's pass; the merge handles only
    * |shards|·d² partial rows. This is how a 100 TB shop maintains a
    * covariance table incrementally: append a day's partials, re-merge,
    * never re-scan history. (The one-shot [[embeddingCovariance]] centers
    * per row instead — a numerically different but equally pinned
    * arithmetic, so this query carries its OWN oracle in the same
    * uncentered form rather than sharing that one.)
    *
    * Parity: partial sums are exact DECIMAL (association-free across
    * shards by construction — that is WHAT mergeability means); the
    * closed form is evaluated left-to-right identically in both engines
    * on exactly-representable summed integers (< 2⁵³).
    */
  val covMergeShards: Q = (s, dir) => {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    // spread (r17): embeddings is one small file = one scan split, so the
    // d²/2-per-vector product explode — the query's dominant cost — ran
    // on one core; order-free aggregate consumers, spread is value-safe
    val x = Tables.spread(Tables.embeddings(s, dir))
      .select((col("vec_id") % 8).as("shard"),
        expr("transform(embedding, v -> CAST(v AS DOUBLE))").as("x"))
    val prods = x.select(col("shard"),
        explode(filter(
          flatten(transform(col("x"), (xi, i) =>
            transform(col("x"), (xj, j) =>
              struct(i.as("i"), j.as("j"), (xi * xj).as("p"))))),
          st => st.getField("j") >= st.getField("i"))).as("s"))
      .select(col("shard"), col("s.i").as("i"), col("s.j").as("j"),
        col("s.p").as("p"))
    // per-shard partials — what each day's job would persist
    val partial = prods.groupBy(col("shard"), col("i"), col("j"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("p") * lit(1e7) + lit(0.5)).cast(dec)).as("psum"))
    val sums = x
      .select(col("shard"), posexplode(col("x")).as(Seq("d", "v")))
      .groupBy(col("shard"), col("d"))
      .agg(sum(floor(col("v") * lit(1e7) + lit(0.5)).cast(dec)).as("ssum"))
    // the MERGE: partial rows only, no row data
    val mp = partial.groupBy(col("i"), col("j"))
      .agg(sum(col("n")).as("n"), sum(col("psum")).as("p"))
    val ms = sums.groupBy(col("d")).agg(sum(col("ssum")).as("sm"))
    mp.join(ms.select(col("d").as("i"), col("sm").as("si")), "i")
      .join(ms.select(col("d").as("j"), col("sm").as("sj")), "j")
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        col("n"),
        graft.Parity.pround(
          col("p").cast("double") / lit(1e7) / col("n").cast("double") -
            (col("si").cast("double") / lit(1e7) / col("n").cast("double")) *
              (col("sj").cast("double") / lit(1e7) / col("n").cast("double")),
          6).as("cov"))
      .orderBy(col("i"), col("j"))
  }

  val covMergeShardsSql: String =
    s"""WITH ex AS (
       |  SELECT vec_id % 8 AS shard, vec_id,
       |         unnest(range(0, len(embedding))) AS i,
       |         unnest(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS x
       |  FROM embeddings),
       |pr AS (
       |  SELECT a.shard, a.i AS i, b.i AS j, a.x * b.x AS p
       |  FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND b.i >= a.i),
       |part AS (
       |  SELECT shard, i, j, count(*) AS n,
       |         sum(CAST(floor(p * 1e7 + 0.5) AS DECIMAL(38,0))) AS psum
       |  FROM pr GROUP BY 1, 2, 3),
       |sm AS (
       |  SELECT shard, i AS d,
       |         sum(CAST(floor(x * 1e7 + 0.5) AS DECIMAL(38,0))) AS ssum
       |  FROM ex GROUP BY 1, 2),
       |mp AS (SELECT i, j, CAST(sum(n) AS BIGINT) AS n, sum(psum) AS p
       |       FROM part GROUP BY 1, 2),
       |ms AS (SELECT d, sum(ssum) AS s FROM sm GROUP BY 1)
       |SELECT mp.i, mp.j, mp.n,
       |       ${graft.Parity.proundSql(
                 "CAST(mp.p AS DOUBLE) / 1e7 / mp.n - " +
                   "(CAST(sa.s AS DOUBLE) / 1e7 / mp.n) * " +
                   "(CAST(sb.s AS DOUBLE) / 1e7 / mp.n)", 6)} AS cov
       |FROM mp JOIN ms sa ON sa.d = mp.i
       |        JOIN ms sb ON sb.d = mp.j
       |ORDER BY mp.i, mp.j""".stripMargin


  /** Maximal-marginal-relevance reranking of a retrieval pool — the
    * diversity-aware top-k a RAG/context-window assembler wants instead
    * of raw top-k (raw top-k returns 8 near-copies of the best hit; MMR
    * trades relevance against redundancy): greedily pick
    * argmax[ λ·rel(c) − (1−λ)·max_{p∈picked} sim(c,p) ], λ = 0.5, k = 8,
    * from the brute-force top-20 pool for query vector 0.
    *
    * Scale shape: the DISTRIBUTED work is the pool retrieval (the
    * indexed ANN/knn path); everything after runs on relations bounded
    * BY CONSTRUCTION — a 20-row pool, its 20×20 pairwise cosines, and
    * k tiny argmax rounds (greedy MMR is inherently sequential in k, so
    * the rounds are the algorithm, not a scaling accident; each round is
    * one bounded aggregate, never a corpus pass). Scores are
    * arithmetic over 1e-6-quantized cosines with pinned IEEE order, so
    * the greedy trajectory — and therefore the PICK SET — is replayed
    * decision-for-decision by the oracle's unrolled rounds.
    */
  val mmrRerank: Q = (s, dir) => {
    val e = Tables.embeddings(s, dir)
    val pool = graft.Scratch.table(
      Similarity.knnBruteForceMulti(e, Seq(0L), 20)
        .select(col("vec_id"), col("cos_sim").as("rel")), "mmr-pool")
    val pe = pool.join(e.select(col("vec_id"), col("embedding")), "vec_id")
      .select(col("vec_id"), col("embedding"),
        Similarity.l2Norm("embedding").as("norm"))
    val sims = graft.Scratch.table(
      pe.as("x").join(pe.as("y"), col("x.vec_id") =!= col("y.vec_id"))
        .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
          graft.Parity.pround(
            Similarity.dot("x.embedding", "y.embedding") /
              (col("x.norm") * col("y.norm")), 6).as("sim")), "mmr-sims")
    // The greedy runs CLIENT-SIDE over the retrieved pool (r17): MMR
    // reranks a k-bounded retrieval result (k = 20 BY CONSTRUCTION), so
    // its whole state — the pool and its O(k²) pairwise similarities —
    // is a bounded artifact (≤ 20 + 380 rows), the same class as the
    // bpe merge table or a watermark scalar. The old form ran 7
    // sequential argmax ACTIONS (one per pick), each a full job over the
    // same two scratch tables: ~2.1 s of job overhead to move 8 rows.
    // One bounded collect + an exact driver-side greedy (same IEEE
    // double arithmetic, same (mmr_score desc, vec_id) tie-break — the
    // shared recursive-SQL oracle pins the values) serves every pick.
    val poolRows = pool.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val simRows = sims.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val first = poolRows.toSeq.maxBy { case (id, rel) => (rel, -id) }
    var picked = Vector((first._1, first._2, 1L, first._2))
    for (t <- 2 to 8) {
      val pickedIds = picked.map(_._1).toSet
      val next = poolRows.toSeq
        .filter { case (id, _) => !pickedIds.contains(id) }
        .map { case (id, rel) =>
          val maxsim = pickedIds.iterator
            .flatMap(b => simRows.get((id, b))).max
          (id, rel, 0.5 * rel - 0.5 * maxsim)
        }
        // + 0.0 folds a possible -0.0 into 0.0 so the tuple tie-break
        // matches SQL ordering (which treats them equal, then vec_id)
        .minBy { case (id, _, score) => (-score + 0.0, id) }
      picked :+= ((next._1, next._2, t.toLong, next._3))
    }
    import s.implicits._
    picked.toDF("vec_id", "rel", "pick_order", "mmr_score")
      .select(col("pick_order"), col("vec_id"),
        graft.Parity.pround(col("rel"), 6).as("rel"),
        graft.Parity.pround(col("mmr_score"), 6).as("mmr_score"))
      .orderBy(col("pick_order"))
  }

  val mmrRerankSql: String = {
    def round(t: Int): String =
      s"""c$t AS (
         |  SELECT po.vec_id, po.rel, max(s.sim) AS maxsim
         |  FROM pool po
         |  JOIN sims s ON s.a = po.vec_id
         |  JOIN p${t - 1} p ON s.b = p.vec_id
         |  WHERE po.vec_id NOT IN (SELECT vec_id FROM p${t - 1})
         |  GROUP BY 1, 2),
         |n$t AS (
         |  SELECT vec_id, rel, CAST($t AS BIGINT) AS pick_order,
         |         CAST(0.5 AS DOUBLE) * rel - CAST(0.5 AS DOUBLE) * maxsim AS mmr_score
         |  FROM c$t ORDER BY mmr_score DESC, vec_id LIMIT 1),
         |p$t AS (SELECT * FROM p${t - 1} UNION ALL SELECT * FROM n$t)""".stripMargin
    s"""WITH en AS (SELECT vec_id, embedding, sqrt(${dotSql("embedding", "embedding")}) AS norm
       |            FROM embeddings),
       |q AS (SELECT vec_id AS query_vec_id, embedding AS qe, norm AS qn
       |      FROM en WHERE vec_id = 0),
       |pool AS MATERIALIZED (
       |  SELECT vec_id, rel FROM (
       |    SELECT e.vec_id,
       |           floor(((${dotSql("e.embedding", "q.qe")}) / (e.norm * q.qn)) * 1e6 + 0.5) / 1e6 AS rel,
       |           row_number() OVER (ORDER BY floor(((${dotSql("e.embedding", "q.qe")}) / (e.norm * q.qn)) * 1e6 + 0.5) / 1e6 DESC,
       |                              e.vec_id) AS rn
       |    FROM en e CROSS JOIN q
       |    WHERE e.vec_id <> q.query_vec_id) WHERE rn <= 20),
       |pe AS MATERIALIZED (
       |  SELECT p.vec_id, e.embedding, e.norm FROM pool p JOIN en e USING (vec_id)),
       |sims AS MATERIALIZED (
       |  SELECT x.vec_id AS a, y.vec_id AS b,
       |         floor(((${dotSql("x.embedding", "y.embedding")}) / (x.norm * y.norm)) * 1e6 + 0.5) / 1e6 AS sim
       |  FROM pe x JOIN pe y ON x.vec_id <> y.vec_id),
       |p1 AS (
       |  SELECT vec_id, rel, CAST(1 AS BIGINT) AS pick_order, rel AS mmr_score
       |  FROM pool ORDER BY rel DESC, vec_id LIMIT 1),
       |${(2 to 8).map(round).mkString(",\n")}
       |SELECT pick_order, vec_id,
       |       ${graft.Parity.proundSql("rel", 6)} AS rel,
       |       ${graft.Parity.proundSql("mmr_score", 6)} AS mmr_score
       |FROM p8 ORDER BY pick_order""".stripMargin
  }


  /** Active-learning batch selection: the 50 corpus rows the trained
    * classifier is LEAST SURE about (smallest |score − ½| margin) — the
    * uncertainty-sampling acquisition a labeling loop sends for human
    * annotation next. Margin arithmetic is exact on the quantized score;
    * the top-k is an `ORDER BY … LIMIT` (TakeOrdered per partition + a
    * k-row driver merge), never a global sort.
    */
  val uncertaintySample: Q = (s, dir) =>
    graft.ml.LogReg.scoreAll(Tables.embeddings(s, dir))
      .select(col("vec_id"), col("y"), col("score"),
        abs(col("score") - lit(0.5)).as("margin"))
      .orderBy(col("margin"), col("vec_id"))
      .limit(50)

  val uncertaintySampleSql: String =
    s"""WITH $logregScoredAllSql
       |SELECT vec_id, y, score, abs(score - 0.5) AS margin
       |FROM sc ORDER BY margin, vec_id LIMIT 50""".stripMargin

  /** Hard-negative mining for contrastive training: for every anchor, the
    * 3 most-cosine-similar vectors with a DIFFERENT label — the pairs a
    * metric-learning loss learns most from. Pair space is blocked by IVF
    * cell (the [[Similarity.clusterSample]] single-cell assignment —
    * map-side `max_by` against broadcast centroids), so candidates are
    * cell-cohabitants, never the n² all-pairs. The per-anchor top-3 is a
    * rank window WindowGroupLimit prunes to 3 rows per anchor before any
    * sort spills; cell size bounds the candidate list, and a denser
    * centroid set tightens it at scale.
    */
  val hardNegatives: Q = (s, dir) => {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        col("embedding"), Similarity.l2Norm("embedding").as("norm"))
    val cents = e.filter(col("vec_id").isin((100L until 116L): _*))
      .select(col("vec_id").as("cent_id"), col("embedding").as("c_emb"),
        col("norm").as("c_norm"))
    val assign = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cent_id"),
        (Similarity.dot("embedding", "c_emb") /
          (col("norm") * col("c_norm"))).as("c_cos"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cent_id"),
        struct(col("c_cos"), (-col("cent_id")).as("tb"))).as("cell"))
    val cellVecs = assign.join(e, "vec_id")
    val pairs = cellVecs.as("a").join(cellVecs.as("b"),
        col("a.cell") === col("b.cell") && col("a.label") =!= col("b.label"))
      .select(col("a.vec_id").as("anchor"), col("a.label").as("anchor_label"),
        col("b.vec_id").as("negative"), col("b.label").as("neg_label"),
        graft.Parity.pround(
          Similarity.dot("a.embedding", "b.embedding") /
            (col("a.norm") * col("b.norm")), 6).as("cos_sim"))
    pairs
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("anchor"))
          .orderBy(col("cos_sim").desc, col("negative"))).cast("long"))
      .filter(col("rank") <= 3)
      .orderBy(col("anchor"), col("rank"))
  }

  val hardNegativesSql: String = {
    val centIds = (100L until 116L).mkString(", ")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(label AS BIGINT) AS label, embedding,
       |         sqrt(${dotSql("embedding", "embedding")}) AS norm
       |  FROM embeddings),
       |cents AS (
       |  SELECT vec_id AS cent_id, embedding AS c_emb, norm AS c_norm
       |  FROM e WHERE vec_id IN ($centIds)),
       |scored AS (
       |  SELECT e.vec_id, c.cent_id,
       |         (${dotSql("e.embedding", "c.c_emb")}) / (e.norm * c.c_norm) AS c_cos
       |  FROM e CROSS JOIN cents c),
       |assign AS (
       |  SELECT vec_id, cent_id AS cell FROM (
       |    SELECT vec_id, cent_id,
       |           row_number() OVER (PARTITION BY vec_id
       |                              ORDER BY c_cos DESC, cent_id) AS rn
       |    FROM scored) WHERE rn = 1),
       |cvx AS (SELECT a.vec_id, a.cell, e.label, e.embedding, e.norm
       |        FROM assign a JOIN e ON a.vec_id = e.vec_id),
       |pr AS (
       |  SELECT a.vec_id AS anchor, a.label AS anchor_label,
       |         b.vec_id AS negative, b.label AS neg_label,
       |         floor(((${dotSql("a.embedding", "b.embedding")})
       |                / (a.norm * b.norm)) * 1e6 + 0.5) / 1e6 AS cos_sim
       |  FROM cvx a JOIN cvx b
       |    ON a.cell = b.cell AND a.label <> b.label)
       |SELECT anchor, anchor_label, negative, neg_label, cos_sim, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY anchor
       |                               ORDER BY cos_sim DESC, negative) AS rank
       |  FROM pr)
       |WHERE rank <= 3 ORDER BY anchor, rank""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "pq_codes" -> pqCodesQ,
    "ann_pq_topk" -> annPqTopK,
    "sq_codes" -> sqCodesQ,
    "ann_sq_topk" -> annSqTopK,
    "logreg_train" -> logregTrain,
    "logreg_score" -> logregScore,
    "logreg_eval" -> logregEval,
    "roc_auc" -> rocAucQ,
    "calibration_bins" -> calibrationBinsQ,
    "isotonic_calibration" -> isotonicCalibration,
    "isotonic_apply" -> isotonicApply,
    "brier_score" -> brierScore,
    "lift_deciles" -> liftDeciles,
    "embedding_covariance" -> embeddingCovariance,
    "pca_power_iter" -> pcaPowerIter,
    "pca_pc2" -> pcaPc2,
    "pca_project" -> pcaProject,
    "pca_whiten_2d" -> pcaWhiten2d,
    "embedding_isotropy" -> embeddingIsotropy,
    "cov_merge_shards" -> covMergeShards,
    "uncertainty_sample" -> uncertaintySample,
    "hard_negatives" -> hardNegatives,
    "logreg_sparse_train" -> logregSparseTrain,
    "logreg_sparse_score" -> logregSparseScore,
    "ann_ivfpq_topk" -> annIvfPqTopK,
    "embedding_score" -> embeddingScore,
    "embedding_norms" -> embeddingNorms,
    "embedding_centroids" -> embeddingCentroids,
    "knn_bruteforce" -> knnBruteForce,
    "neardup_embeddings" -> neardupEmbeddings,
    "neardup_ivf" -> neardupIvfQ,
    "semantic_dedup" -> semanticDedup,
    "ann_lsh_topk" -> annLshTopK,
    "ann_ivf_topk" -> annIvfTopK,
    "ann_ivf_store" -> annIvfStore,
    "ann_recall" -> annRecall,
    "ndcg_eval" -> ndcgEval,
    "mmr_rerank" -> mmrRerank,
    "mrr_eval" -> mrrEval,
    "ivf_train" -> ivfTrain,
    "diversity_sample" -> diversitySample,
    "embed_quantize" -> embedQuantize)

  // lazy: annIvfTopKSql is declared above but initialization order still
  // matters if this file is reordered — match the DedupQueries convention
  lazy val annIvfStoreSql: String = annIvfTopKSql

  val oracleSql: Map[String, String] = Map(
    "pq_codes" -> pqCodesSql,
    "ann_pq_topk" -> annPqTopKSql,
    "sq_codes" -> sqCodesSql,
    "ann_sq_topk" -> annSqTopKSql,
    "logreg_train" -> logregTrainSql,
    "logreg_score" -> logregScoreSql,
    "logreg_eval" -> logregEvalSql,
    "roc_auc" -> rocAucSql,
    "calibration_bins" -> calibrationBinsSql,
    "isotonic_calibration" -> isotonicCalibrationSql,
    "isotonic_apply" -> isotonicApplySql,
    "brier_score" -> brierScoreSql,
    "lift_deciles" -> liftDecilesSql,
    "embedding_covariance" -> embeddingCovarianceSql,
    "pca_power_iter" -> pcaPowerIterSql,
    "pca_pc2" -> pcaPc2Sql,
    "pca_project" -> pcaProjectSql,
    "pca_whiten_2d" -> pcaWhiten2dSql,
    "embedding_isotropy" -> embeddingIsotropySql,
    "cov_merge_shards" -> covMergeShardsSql,
    "uncertainty_sample" -> uncertaintySampleSql,
    "hard_negatives" -> hardNegativesSql,
    "logreg_sparse_train" -> logregSparseTrainSql,
    "logreg_sparse_score" -> logregSparseScoreSql,
    "ann_ivfpq_topk" -> annIvfPqTopKSql,
    "embedding_score" -> embeddingScoreSql,
    "ivf_train" -> ivfTrainSql,
    "embedding_norms" -> embeddingNormsSql,
    "embedding_centroids" -> embeddingCentroidsSql,
    "knn_bruteforce" -> knnBruteForceSql,
    "neardup_embeddings" -> neardupEmbeddingsSql,
    "neardup_ivf" -> neardupIvfSql,
    "semantic_dedup" -> semanticDedupSql,
    "ann_lsh_topk" -> annLshTopKSql,
    "ann_ivf_topk" -> annIvfTopKSql,
    "ann_ivf_store" -> annIvfStoreSql,
    "ann_recall" -> annRecallSql,
    "ndcg_eval" -> ndcgEvalSql,
    "mmr_rerank" -> mmrRerankSql,
    "mrr_eval" -> mrrEvalSql,
    "diversity_sample" -> diversitySampleSql,
    "embed_quantize" -> embedQuantizeSql)
}
