package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Int8 scalar quantization: the invariants the oracle's value-hash can't
  * state — codes live in [0,255] with the range endpoints EXACTLY hit,
  * per-dimension reconstruction error is bounded by half a step, and the
  * symmetric-distance ranking tracks exact cosine closely on real data
  * (SQ8 is near-lossless by construction; a broken formula would crater
  * this overlap long before it perturbed the hash).
  */
class SqSpec extends SparkSpec {

  test("codes span [0,255], endpoints exact, reconstruction within sc/2") {
    val st = Similarity.sqStats(graft.Tables.embeddings(spark, sf0001))
    val checked = st.select(
      expr("aggregate(codes, 0L, (a, c) -> a + IF(c < 0L OR c > 255L, 1L, 0L))")
        .as("out_of_range"),
      // min/max of the ORIGINAL vector must quantize to the endpoints
      expr("array_min(codes)").as("cmin"), expr("array_max(codes)").as("cmax"),
      expr("""aggregate(zip_with(emb, codes, (x, c) ->
             |  abs(x - (mn + c * sc)) > sc * 0.5 + 1e-12), 0L,
             |  (a, bad) -> a + IF(bad, 1L, 0L))""".stripMargin).as("err_violations"))
      .agg(sum(col("out_of_range")).as("oor"),
        min(col("cmin")).as("gmin"), max(col("cmax")).as("gmax"),
        sum(col("err_violations")).as("viol"))
      .first()
    assert(checked.getLong(0) === 0L, "codes outside [0,255]")
    assert(checked.getLong(1) === 0L && checked.getLong(2) === 255L,
      "range endpoints must map to code 0 and 255")
    assert(checked.getLong(3) === 0L, "per-dim reconstruction error > sc/2")
  }

  test("VecDotLong (codegen'd) equals the HOF zip_with+aggregate fold") {
    val st = Similarity.sqStats(graft.Tables.embeddings(spark, sf0001))
      .select(col("vec_id"), col("codes"))
    val paired = st.crossJoin(
      broadcast(st.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("codes").as("qcodes"))))
    val both = paired.select(
      graft.functions.VectorExpressions.vecDotLong(col("codes"), col("qcodes"))
        .as("native"),
      expr("aggregate(zip_with(codes, qcodes, (a, b) -> a * b), 0L, " +
        "(acc, x) -> acc + x)").as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0L)
    assert(both.count() > 0L)
  }

  test("symmetric SQ ranking closely tracks exact cosine top-10") {
    val emb = graft.Tables.embeddings(spark, sf0001)
    val sq = Similarity.annSqTopK(emb, Seq(0L, 1L, 2L, 3L, 4L), 10)
      .select(col("query_vec_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.knnBruteForceMulti(emb, Seq(0L, 1L, 2L, 3L, 4L), 10)
      .select(col("query_vec_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = sq.intersect(exact).size.toDouble / exact.size
    assert(overlap >= 0.8, s"SQ8 recall@10 vs exact cosine was $overlap")
  }
}
