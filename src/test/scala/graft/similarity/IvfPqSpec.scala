package graft.similarity

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** ann_ivfpq_topk internal-consistency properties the oracle cannot state
  * (it only re-walks the same three-stage trajectory):
  *
  * - rerank-everything degenerates to plain IVF: with the rerank pool set
  *   past the corpus size, every ADC-scored candidate pays the exact
  *   cosine, so the final ranking must equal [[Similarity.annIvfTopK]]'s
  *   (same cells, same probes, same rounding, same tie-breaks) — the ADC
  *   stage can only ever REORDER the pool boundary, never the exact stage.
  * - the compressed path still finds neighbors: recall@10 against brute
  *   force within one step of the pure-IVF floor (the PQ pool can drop a
  *   true neighbor only when its ADC estimate is off by more than the
  *   pool margin).
  */
class IvfPqSpec extends SparkSpec {

  private val qids = Seq(0L, 1L, 2L, 3L, 4L)

  test("rerank >= corpus makes ann_ivfpq identical to ann_ivf (exact stage dominates)") {
    val e = Tables.embeddings(spark, sf001)
    def key(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.select(col("query_vec_id"), col("vec_id"), col("rank").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = key(Similarity.annIvfPqTopK(e, qids, k = 10, rerank = 1000000))
    val ivf = key(Similarity.annIvfTopK(e, qids, k = 10))
    assert(full === ivf)
  }

  test("IVF+PQ rerank=30 recall@10 floor: mean >= 0.15 (measured 0.2 on the fixture)") {
    // The fixture is ADVERSARIAL for PQ: 500 near-uniform random 64-dim
    // vectors quantized by an 8-entry SAMPLED codebook — maximal
    // reconstruction error, so the ADC pool drops true neighbors that a
    // clustered real-embedding corpus would keep (there the codebook
    // entries sit near the data). Measured mean recall is 0.2 with one
    // query at 0.0; the floor is mean-only, one step below measured, and
    // exists to catch a WIRING regression (wrong cells probed, LUT keyed
    // wrong), not to certify retrieval quality on noise.
    val e = Tables.embeddings(spark, sf001)
    val exact = Similarity.knnBruteForceMulti(e, qids, 10)
      .select(col("query_vec_id"), col("vec_id"), lit(1L).as("hit"))
    val r = Similarity.annIvfPqTopK(e, qids, k = 10)
      .select(col("query_vec_id"), col("vec_id"))
      .join(exact, Seq("query_vec_id", "vec_id"), "left")
      .groupBy(col("query_vec_id"))
      .agg((sum(coalesce(col("hit"), lit(0L))).cast("double") / 10.0).as("r"))
      .collect().map(_.getAs[Double]("r")).toSeq
    assert(r.length === 5)
    assert(r.sum / r.length >= 0.15, s"mean recall ${r.sum / r.length} (per-query $r)")
  }

  test("adc_dist is nonnegative and the output is k-bounded per query") {
    val rows = Similarity.annIvfPqTopK(
      Tables.embeddings(spark, sf001), qids, k = 10).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("adc_dist") >= 0.0)
      assert(r.getAs[Int]("rank") >= 1 && r.getAs[Int]("rank") <= 10)
    }
    val perQuery = rows.groupBy(_.getAs[Long]("query_vec_id")).view.mapValues(_.length)
    assert(perQuery.values.forall(_ <= 10))
  }
}
