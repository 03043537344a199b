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

  test("mixtureSample: per-source rates honored, monotone under re-weighting") {
    val low = Sampling.mixtureSample(docs, col("doc_id"), col("source"),
      Map("src0" -> 1.0, "src1" -> 0.2), defaultRate = 0.1)
    val high = Sampling.mixtureSample(docs, col("doc_id"), col("source"),
      Map("src0" -> 1.0, "src1" -> 0.8), defaultRate = 0.1)
    // rate-1.0 source keeps everything
    val src0Total = docs.filter(col("source") === "src0").count()
    assert(low.filter(col("source") === "src0").count() === src0Total)
    // raising src1's rate only ADDS docs (monotone prefix) and leaves
    // every other source's selection untouched
    assert(low.select("doc_id").exceptAll(high.select("doc_id")).count() === 0)
    assert(low.filter(col("source") =!= "src1").select("doc_id").exceptAll(
      high.filter(col("source") =!= "src1").select("doc_id")).count() === 0)
    assert(high.filter(col("source") === "src1").count() >
      low.filter(col("source") === "src1").count())
  }

  test("packSequences: gapless concat-and-chunk coordinates per shard") {
    import graft.text.TextAnalysis
    val L = 512L
    val t = docs.select(col("doc_id"), col("source"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    val packed = Sampling.packSequences(t, "doc_id", "n_tokens", L, Seq("source"))
      .select("doc_id", "source", "n_tokens", "cum_before",
        "seq_id", "seq_offset", "end_seq_id")
      .collect()
      .groupBy(_.getAs[String]("source"))
    assert(packed.size > 1, "fixture must have multiple sources")
    packed.foreach { case (src, rows) =>
      val ordered = rows.sortBy(_.getAs[Long]("doc_id"))
      // gapless: each doc starts exactly where the previous one ended —
      // zero padding waste anywhere in the token stream
      ordered.foldLeft(0L) { (expect, r) =>
        assert(r.getAs[Long]("cum_before") === expect,
          s"$src doc ${r.getAs[Long]("doc_id")} starts at " +
            s"${r.getAs[Long]("cum_before")}, expected $expect")
        expect + r.getAs[Long]("n_tokens")
      }
      ordered.foreach { r =>
        val (cum, n) = (r.getAs[Long]("cum_before"), r.getAs[Long]("n_tokens"))
        assert(r.getAs[Long]("seq_id") === cum / L)
        assert(r.getAs[Long]("seq_offset") === cum % L)
        assert(r.getAs[Long]("end_seq_id") === (cum + math.max(n, 1) - 1) / L)
      }
      // every sequence index up to the last is occupied (chunking leaves
      // no empty training sequence)
      val lastSeq = ordered.map(_.getAs[Long]("end_seq_id")).max
      val covered = ordered.flatMap(r =>
        r.getAs[Long]("seq_id") to r.getAs[Long]("end_seq_id")).toSet
      assert(covered === (0L to lastSeq).toSet, s"$src has empty sequences")
    }
  }
}
