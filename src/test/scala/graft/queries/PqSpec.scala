package graft.queries

import graft.{SparkSpec, Tables}
import graft.similarity.Similarity

/** Product-quantization invariants (the oracle asserts cross-engine
  * bit-parity; these assert the index semantics).
  */
class PqSpec extends SparkSpec {

  test("pq_codes: 8 codes in [0,7] per vector; codebook vectors reconstruct exactly") {
    val rows = Similarity.pqCodes(Tables.embeddings(spark, sf0001)).collect()
    assert(rows.length === Tables.embeddings(spark, sf0001).count())
    rows.foreach { r =>
      val codes = r.getAs[String]("codes").split(',').map(_.toInt)
      assert(codes.length === 8)
      assert(codes.forall(c => c >= 0 && c <= 7))
      assert(r.getAs[Double]("recon_err") >= 0.0)
    }
    // the codebook is the subvectors of vec_ids 100..107: vector 100+j is
    // its own nearest entry (code j) in EVERY subspace, with zero error
    val byId = rows.map(r => r.getAs[Long]("vec_id") -> r).toMap
    (0 until 8).foreach { j =>
      val r = byId(100L + j)
      assert(r.getAs[String]("codes") === Array.fill(8)(j).mkString(","),
        s"codebook vector ${100 + j} not self-coded")
      assert(r.getAs[Double]("recon_err") === 0.0)
    }
  }

  test("ann_pq_topk: dense ranks, ADC distance non-decreasing, self excluded") {
    val rows = Similarity.annPqTopK(
      Tables.embeddings(spark, sf0001), Seq(0L, 1L, 2L, 3L, 4L), 10).collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_vec_id"))
    assert(byQuery.keySet === Set(0L, 1L, 2L, 3L, 4L))
    byQuery.foreach { case (q, rs) =>
      val byRank = rs.sortBy(_.getAs[Number]("rank").longValue)
      assert(byRank.map(_.getAs[Number]("rank").longValue).toSeq === (1L to 10L))
      val dists = byRank.map(_.getAs[Double]("adc_dist")).toSeq
      assert(dists === dists.sorted, s"query $q ADC distances not non-decreasing")
      assert(rs.forall(_.getAs[Long]("vec_id") != q), s"query $q returned itself")
    }
  }
}
