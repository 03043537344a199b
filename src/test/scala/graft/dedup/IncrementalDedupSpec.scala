package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental near-dup: the gate proves two-batch ≡ one-shot via the
  * shared oracle; this pins the properties the oracle cannot see — the
  * identity holds for ANY batch count/split, the band store really is
  * the persisted state (it accumulates every batch's bands), and a batch
  * with no colliding docs appends state without emitting pairs.
  */
class IncrementalDedupSpec extends SparkSpec {

  private def docs() = graft.Tables.documents(spark, sf0001)

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_id_a", "doc_id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("any split: 2-batch and 3-batch incremental equal the one-shot pair set") {
    val oneShot = pairSet(DocDedup.lshCandidatePairs(docs()))
    assert(oneShot.nonEmpty, "fixture must contain LSH collisions")

    val two = DocDedup.incrementalCandidatePairs(spark,
      Seq(docs().filter(col("doc_id") % 2 === 0),
        docs().filter(col("doc_id") % 2 === 1)),
      s"${sys.props("java.io.tmpdir")}/graft_store/inc_dedup_spec2")
    assert(pairSet(two) === oneShot)

    val three = DocDedup.incrementalCandidatePairs(spark,
      (0 to 2).map(i => docs().filter(col("doc_id") % 3 === i)),
      s"${sys.props("java.io.tmpdir")}/graft_store/inc_dedup_spec3")
    assert(pairSet(three) === oneShot)
  }

  test("exact-dedup fold: any batch count merges to the one-shot fingerprint aggregate") {
    val oneShot = DocDedup.exactDuplicates(docs())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val three = DocDedup.incrementalExactDuplicates(spark,
      (0 to 2).map(i => docs().filter(col("doc_id") % 3 === i)),
      s"${sys.props("java.io.tmpdir")}/graft_store/inc_exact_spec3")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(three === oneShot)
  }

  test("exact-dedup fold: cross-batch duplicate groups sum counts and keep the global min") {
    // the real fixture has no EXACT duplicates (only near-dups), so the
    // count-sum/min-merge arithmetic needs a synthetic corpus where a
    // group genuinely spans batches
    import spark.implicits._
    // alpha group {1,2,4} spans batches (evens 2,4 / odd 1); zeta group
    // {5,6} spans too; delta {3} is a singleton
    val corpus = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "delta epsilon"), (4L, "alpha beta gamma"),
      (5L, "zeta eta theta"), (6L, "zeta eta theta"))
      .toDF("doc_id", "text")
    val oneShot = DocDedup.exactDuplicates(corpus)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val inc = DocDedup.incrementalExactDuplicates(spark,
      Seq(corpus.filter(col("doc_id") % 2 === 0), corpus.filter(col("doc_id") % 2 === 1)),
      s"${sys.props("java.io.tmpdir")}/graft_store/inc_exact_spec_syn")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc === oneShot)
    // alpha: n_docs summed to 3 across the fold, keeper is the GLOBAL
    // min (1 lives in the second-applied batch — the min must cross the
    // fold, not just survive it)
    assert(inc.exists { case (_, n, keep) => n == 3L && keep == 1L })
    // zeta: the two-way spanning group merges to (2, keep=5)
    assert(inc.exists { case (_, n, keep) => n == 2L && keep == 5L })
  }

  test("incremental CC: contracted-graph labels equal full-graph labels (2 and 3 batches)") {
    // one-shot reference, built exactly like dedup_clusters does
    val edges = DocDedup.estimatedJaccardPairs(docs())
      .filter(col("est_jaccard") >= 0.5)
      .select(col("doc_id_a").as("a"), col("doc_id_b").as("b"))
    val oneShot = Components.connectedComponents(
        docs().select(col("doc_id").as("v")), edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val two = DocDedup.incrementalClusterLabels(spark,
      Seq(docs().filter(col("doc_id") % 2 === 0),
        docs().filter(col("doc_id") % 2 === 1)),
      s"${sys.props("java.io.tmpdir")}/graft_store/inc_cc_spec2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(two === oneShot)

    val three = DocDedup.incrementalClusterLabels(spark,
      (0 to 2).map(i => docs().filter(col("doc_id") % 3 === i)),
      s"${sys.props("java.io.tmpdir")}/graft_store/inc_cc_spec3")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(three === oneShot)
  }

  test("incremental CC: a new batch joins historical components via the star edges") {
    import spark.implicits._
    // batch 0 (evens): docs 2 and 4, distinct texts → two singleton
    // components. batch 1 (odds): 5 duplicates 2's text, 7 duplicates
    // 4's, 9 is unrelated → 5 and 7 must land in the HISTORICAL
    // components (labels 2 and 4), which only happens if the stored
    // labeling's star edges carry history into the new CC run.
    val corpus = Seq(
      (2L, "alpha beta gamma delta epsilon"),
      (4L, "one two three four five"),
      (5L, "alpha beta gamma delta epsilon"),
      (7L, "one two three four five"),
      (9L, "unrelated content entirely different"))
      .toDF("doc_id", "text")
    val got = DocDedup.incrementalClusterLabels(spark,
      Seq(corpus.filter(col("doc_id") % 2 === 0),
        corpus.filter(col("doc_id") % 2 === 1)),
      s"${sys.props("java.io.tmpdir")}/graft_store/inc_cc_bridge")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(2L -> 2L, 4L -> 4L, 5L -> 2L, 7L -> 4L, 9L -> 9L))
  }

  test("the band store is the persisted state: it accumulates every batch's bands") {
    val target = s"${sys.props("java.io.tmpdir")}/graft_store/inc_dedup_state"
    DocDedup.incrementalCandidatePairs(spark,
      Seq(docs().filter(col("doc_id") % 2 === 0),
        docs().filter(col("doc_id") % 2 === 1)),
      target)
    val stored = spark.read.parquet(s"$target/bands")
    // every signed doc carries all 4 bands, split across the two appends
    val perDoc = stored.groupBy("doc_id").count()
      .select(max("count"), min("count")).head()
    assert(perDoc.getLong(0) === 4L && perDoc.getLong(1) === 4L)
    // the store holds exactly the full corpus's bands: nothing written
    // twice, nothing dropped (appends are disjoint by batch)
    val sigDocs = DocDedup.minhashSignatures(docs()).count()
    assert(stored.count() === 4L * sigDocs)
    assert(stored.select("doc_id").distinct().count() === sigDocs)
  }

  test("a batch with no collisions appends state but no pairs; pair rows are unique") {
    val target = s"${sys.props("java.io.tmpdir")}/graft_store/inc_dedup_unique"
    val out = DocDedup.incrementalCandidatePairs(spark,
      Seq(docs().filter(col("doc_id") % 2 === 0),
        docs().filter(col("doc_id") % 2 === 1)),
      target)
    val n = out.count()
    assert(out.distinct().count() === n,
      "cross-batch duplicate discovery would double-count pairs")
    assert(out.filter(col("doc_id_a") >= col("doc_id_b")).count() === 0L,
      "pairs are normalized a < b regardless of which batch held which side")
  }
}
