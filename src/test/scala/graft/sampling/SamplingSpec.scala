package graft.sampling

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SamplingSpec extends SparkSpec {

  lazy val docs = Tables.documents(spark, sf0001)

  test("split is deterministic, total, and near the requested proportions") {
    val s1 = docs.select(col("doc_id"),
      Sampling.split(col("doc_id"), Seq("train" -> 80, "val" -> 10, "test" -> 10)).as("split"))
    val s2 = docs.select(col("doc_id"),
      Sampling.split(col("doc_id"), Seq("train" -> 80, "val" -> 10, "test" -> 10)).as("split"))
    // deterministic: two evaluations agree exactly
    assert(s1.exceptAll(s2).count() === 0)
    val byName = s1.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName.keySet === Set("train", "val", "test"))
    val n = docs.count().toDouble
    assert(byName("train") / n > 0.7 && byName("train") / n < 0.9)
    // total: every doc assigned
    assert(byName.values.sum === n.toLong)
  }

  test("sampleByKey keeps a stable subset of roughly the right size") {
    val a = Sampling.sampleByKey(docs, col("doc_id"), 0.2)
    val b = Sampling.sampleByKey(docs, col("doc_id"), 0.2)
    assert(a.select("doc_id").exceptAll(b.select("doc_id")).count() === 0)
    val frac = a.count().toDouble / docs.count()
    assert(frac > 0.1 && frac < 0.3, s"got $frac")
    // monotone: 20% sample is a subset of 50% sample (prefix property)
    val big = Sampling.sampleByKey(docs, col("doc_id"), 0.5)
    assert(a.select("doc_id").exceptAll(big.select("doc_id")).count() === 0)
  }
}
