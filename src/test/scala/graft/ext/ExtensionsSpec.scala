package graft.ext

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.dedup.DocDedup
import graft.multimodal.Multimodal
import graft.similarity.Similarity
import graft.text.TextAnalysis

/** Behavior tests for the training-data extension operators (hash parity
  * with DuckDB is covered by the driver oracle; these check semantics).
  */
class ExtensionsSpec extends SparkSpec {

  lazy val docs = Tables.documents(spark, sf0001).cache()
  lazy val embs = Tables.embeddings(spark, sf0001).cache()

  test("exact dedup finds itself: duplicating a doc collapses to one fp group") {
    val doubled = docs.union(docs.limit(5))
    val groups = DocDedup.exactDuplicates(doubled)
    assert(groups.filter(col("n_docs") >= 2).count() >= 5)
    // and on clean input every doc is its own group
    assert(DocDedup.exactDuplicates(docs).count() === docs.count())
  }

  test("minhash: identical docs share full signature; LSH finds planted near-dups") {
    // plant a near-duplicate: doc 0's text with one word changed
    val planted = docs.limit(1)
      .select(lit(9999L).as("doc_id"),
        concat(col("text"), lit(" extraword")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    val corpus = docs.unionByName(planted)
    val pairs = DocDedup.lshCandidatePairs(corpus).collect()
    assert(pairs.exists(r => r.getLong(0) === 0L && r.getLong(1) === 9999L),
      s"planted near-dup not found; pairs=${pairs.take(5).mkString(",")}")
    val est = DocDedup.estimatedJaccardPairs(corpus)
      .filter(col("doc_id_a") === 0 && col("doc_id_b") === 9999)
      .select("est_jaccard").first().getDouble(0)
    assert(est >= 0.5, s"estimated jaccard $est too low for near-identical docs")
  }

  test("exact jaccard of planted near-dup is high, and <= 1") {
    val planted = docs.limit(1)
      .select(lit(9999L).as("doc_id"), concat(col("text"), lit(" x")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    val corpus = docs.unionByName(planted)
    val j = DocDedup.exactJaccardPairs(corpus)
      .filter(col("doc_id_a") === 0 && col("doc_id_b") === 9999)
      .select("jaccard").first().getDouble(0)
    assert(j > 0.8 && j <= 1.0)
  }

  test("simhash: identical docs get identical sketches; hamming to self is 0") {
    val sigs = DocDedup.simhashSignatures(docs.union(docs))
    // union duplicates every doc: signature per doc_id must still be unique-valued
    assert(sigs.groupBy("doc_id").count().filter(col("count") > 1).count() === 0)
  }

  test("text stats: word_count and ratios are consistent") {
    val st = TextAnalysis.textStats(docs)
    assert(st.filter(col("word_count") <= 0).count() === 0)
    assert(st.filter(col("stopword_ratio") < 0 || col("stopword_ratio") > 1).count() === 0)
    assert(st.filter(col("stopword_count") > col("word_count")).count() === 0)
  }

  test("language-ID assigns a language to every doc") {
    val l = TextAnalysis.langId(docs)
    assert(l.filter(col("lang_pred").isNull).count() === 0)
    val langs = l.groupBy("lang_pred").count().collect().map(_.getString(0)).toSet
    assert(langs.nonEmpty)
  }

  test("knn brute force: self-similarity excluded, scores in [-1,1], k respected") {
    val k = Similarity.knnBruteForce(embs, 0L, 10)
    val rows = k.collect()
    assert(rows.length === 10)
    assert(rows.forall(r => r.getDouble(2) <= 1.000001 && r.getDouble(2) >= -1.000001))
    assert(!rows.exists(_.getLong(0) === 0L))
  }

  test("ann lsh: bucket-pruned candidates overlap brute-force top-k") {
    val brute = Similarity.knnBruteForce(embs, 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val ann = Similarity.annLshTopK(embs, Seq(0L), k = 10, nPlanes = 4)
      .filter(col("query_vec_id") === 0)
      .collect().map(_.getLong(1)).toSet
    val recall = (brute intersect ann).size.toDouble / brute.size
    assert(recall >= 0.2, s"ANN recall $recall too low (ann=${ann.size} candidates)")
  }

  test("VecDot is bitwise-identical to the HOF fold and stays in codegen") {
    import org.apache.spark.sql.functions._
    val hof = expr("aggregate(sequence(1, size(embedding)), CAST(0 AS DOUBLE), " +
      "(acc, i) -> acc + CAST(element_at(embedding, i) AS DOUBLE) * CAST(element_at(embedding, i) AS DOUBLE))")
    val vd = graft.functions.VectorExpressions.vecDot(col("embedding"), col("embedding"))
    val diffs = embs.select((hof - vd).as("d")).filter(col("d") =!= 0.0).count()
    assert(diffs === 0)
    val plan = embs.select(vd.as("x")).queryExecution.executedPlan.toString
    assert(plan.contains("vecdot") && plan.contains("*(1)"),
      s"VecDot not codegen'd: ${plan.take(200)}")
  }

  test("multimodal: decode stub emits features for every payload; frames sample videos") {
    val media = Multimodal.fromDocuments(docs)
    val feats = Multimodal.decodeStub(media)
    assert(feats.count() === docs.count())
    val f = feats.filter(col("kind") === "image").head()
    assert(f.n_bytes > 0 && f.sha.length === 32 && f.width >= 64)
    val frames = Multimodal.sampleFrames(feats, 500L)
    val perVideo = frames.groupBy("media_id").count()
    assert(perVideo.filter(col("count") < 1).count() === 0)
  }
}
