package graft.similarity

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** ANN index-quality floors, ASSERTED (VERDICT r4 item #4): ann_recall
  * already emits recall@10 and the oracle hash-checks the arithmetic, but
  * only a spec bound makes a silent parameter regression (harder pruning,
  * fewer probes, bad plane seed) fail `sbt test` instead of shipping.
  *
  * Floors are set from measured values on the driver fixture (500 near-
  * random 64-dim embeddings — an adversarially unclustered corpus; real
  * embedding corpora cluster and recall is higher): LSH Hamming-≤2
  * multi-probe measures mean 0.52 / min 0.2, IVF nProbe=4 measures mean
  * 0.44 / min 0.2. Floors sit one query-vector step (0.1) below measured.
  */
class AnnRecallSpec extends SparkSpec {

  private lazy val recalls: Map[String, Seq[Double]] = {
    val e = Tables.embeddings(spark, sf001)
    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val exact = Similarity.knnBruteForceMulti(e, qids, 10)
      .select(col("query_vec_id"), col("vec_id"), lit(1L).as("hit"))
    def recallOf(df: org.apache.spark.sql.DataFrame): Seq[Double] =
      df.select(col("query_vec_id"), col("vec_id"))
        .join(exact, Seq("query_vec_id", "vec_id"), "left")
        .groupBy(col("query_vec_id"))
        .agg((sum(coalesce(col("hit"), lit(0L))).cast("double") / 10.0).as("r"))
        .collect().map(_.getAs[Double]("r")).toSeq
    Map(
      "lsh" -> recallOf(Similarity.annLshTopK(e, qids, 10)),
      "ivf" -> recallOf(Similarity.annIvfTopK(e, qids, 10)))
  }

  test("LSH multi-probe recall@10 floor: mean >= 0.4, every query >= 0.1") {
    val r = recalls("lsh")
    assert(r.length === 5)
    assert(r.sum / r.length >= 0.4, s"mean recall ${r.sum / r.length} (per-query $r)")
    assert(r.forall(_ >= 0.1), s"per-query floor broken: $r")
  }

  test("IVF nProbe=4 recall@10 floor: mean >= 0.35, every query >= 0.1") {
    val r = recalls("ivf")
    assert(r.length === 5)
    assert(r.sum / r.length >= 0.35, s"mean recall ${r.sum / r.length} (per-query $r)")
    assert(r.forall(_ >= 0.1), s"per-query floor broken: $r")
  }

  test("cell-blocked near-dup: exact subset of brute-force pairs, recall floor") {
    val e = Tables.embeddings(spark, sf001)
    val en = e.select(col("vec_id"), col("embedding"),
      Similarity.l2Norm("embedding").as("norm"))
    val cos = Similarity.dot("l.embedding", "r.embedding") /
      (col("l.norm") * col("r.norm"))
    val brute = en.as("l")
      .join(en.as("r"), col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("vec_id_a"), col("r.vec_id").as("vec_id_b"),
        graft.Parity.pround(cos, 6).as("cos_sim"))
      .filter(col("cos_sim") >= 0.3)
    val blocked = Similarity.neardupIvf(e, minCosine = 0.3)
    val nTrue = brute.count()
    val nGot = blocked.count()
    // precision 1.0 by construction: every reported pair is a true pair
    // (identical cosine arithmetic), so the anti join must be empty
    assert(blocked.join(brute, Seq("vec_id_a", "vec_id_b"), "left_anti").count() === 0L)
    // measured 0.494 on the near-random fixture (the worst case for any
    // cluster-blocked method; real embedding corpora cluster); floor well
    // below so only a real quantizer regression trips it
    assert(nGot.toDouble / nTrue >= 0.35,
      s"cell-blocked recall ${nGot.toDouble / nTrue} ($nGot of $nTrue pairs)")
  }

  test("both indexes beat random-candidate chance on their scan fraction") {
    // LSH probes 22/64 buckets (~34% of corpus), IVF 4/16 cells (~25%):
    // a random candidate set of that size would recall ~f on average.
    assert(recalls("lsh").sum / 5 > 22.0 / 64.0)
    assert(recalls("ivf").sum / 5 > 4.0 / 16.0)
  }
}
