package graft.queries

import graft.SparkSpec

/** Operator-level invariants for the curation text queries (the oracle
  * asserts cross-engine bit-parity; these assert the semantics a user
  * relies on).
  */
class TextOpsSpec extends SparkSpec {

  test("tfidf_topk: dense ranks from 1, tfidf non-increasing within a doc") {
    // raw query output (rank is pre-normalization INT here; the driver
    // surface widens it via SparkEntry.normalizeOutputs)
    val rows = TextQueries.tfidfTopK(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (doc, rs) =>
      val byRank = rs.sortBy(_.getAs[Number]("rank").longValue)
      assert(byRank.map(_.getAs[Number]("rank").longValue).toSeq === (1L to byRank.length),
        s"doc $doc ranks not dense")
      val scores = byRank.map(_.getAs[Double]("tfidf")).toSeq
      assert(scores === scores.sorted.reverse, s"doc $doc tfidf not non-increasing")
      assert(byRank.length <= 5)
    }
  }

  test("gopher_filters: keep is exactly the flag conjunction; every flag varies") {
    // sf0.01 — the oracle-gate scale the thresholds are calibrated against
    // (the tiny sf0.001 corpus has no repetitive doc, so flag_rep is
    // constant there)
    val rows = TextQueries.gopherFilters(spark, sf001).collect()
    rows.foreach { r =>
      val expect = r.getAs[Boolean]("flag_words") && r.getAs[Boolean]("flag_avg_len") &&
        r.getAs[Boolean]("flag_stop") && r.getAs[Boolean]("flag_rep")
      assert(r.getAs[Boolean]("keep") === expect)
    }
    for (f <- Seq("flag_words", "flag_avg_len", "flag_stop", "flag_rep", "keep")) {
      val vals = rows.map(_.getAs[Boolean](f)).toSet
      assert(vals === Set(true, false), s"$f never varies — gate verifies nothing")
    }
  }

  test("pii_scrub: redacted fingerprint changes exactly on sensitive-term hits") {
    val scrub = TextQueries.piiScrub(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_sensitive"), r.getAs[String]("fp_redacted"))).toMap
    val raw = TextQueries.docFingerprint(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fp")).toMap
    assert(scrub.keySet === raw.keySet)
    assert(scrub.values.exists(_._1 > 0), "fixture should contain sensitive-term hits")
    scrub.foreach { case (doc, (nSensitive, fpRed)) =>
      if (nSensitive > 0) assert(fpRed !== raw(doc), s"doc $doc redaction was a no-op")
      else assert(fpRed === raw(doc), s"doc $doc redacted with zero hits")
    }
  }
}
