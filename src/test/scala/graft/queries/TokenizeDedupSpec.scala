package graft.queries

import graft.SparkSpec

/** bpe_encode + substring_dedup: semantic invariants the bit-parity oracle
  * cannot state (monotonicity in merge count; span-exact removal on a
  * fixture whose ground truth is hand-computable).
  */
class TokenizeDedupSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("bpe_encode: token counts sit between word and char counts, every doc") {
    val rows = TextQueries.bpeEncode(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, nt, nc) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_tokens"), r.getAs[Long]("n_chars"))
      assert(nt >= nw, s"every word is at least one token (doc ${r.getAs[Long]("doc_id")})")
      assert(nt <= nc, s"every token is at least one char (doc ${r.getAs[Long]("doc_id")})")
      if (nt > 0) {
        val ratio = r.getAs[Double]("chars_per_token")
        assert(ratio >= 1.0 - 1e-9 && ratio <= nc.toDouble)
      }
    }
  }

  test("bpe_encode: more merges never increase the corpus token count; 0 merges = chars") {
    def total(rounds: Int): (Long, Long) = {
      val rows = TextQueries.bpeEncodeRounds(spark, sf0001, rounds).collect()
      (rows.map(_.getAs[Long]("n_tokens")).sum, rows.map(_.getAs[Long]("n_chars")).sum)
    }
    val (t0, c0) = total(0)
    assert(t0 === c0, "unmerged encoding is one token per char")
    val (t1, _) = total(1)
    val (t5, _) = total(5)
    assert(t1 < t0, "the first merge must fire somewhere")
    assert(t5 <= t1, "merge application is monotonically compressive")
  }

  test("bpe_encode: vocab-decomposed encoding equals direct per-doc encoding") {
    // the oracle applies the same vocab decomposition, so the decomposition
    // itself (encode distinct words once, join back) is pinned HERE against
    // a direct in-memory re-encode of every document
    val merges = TextQueries.bpeTrainRounds(spark, sf0001, rounds = 5).collect()
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b")))
    def encodeWord(w: String): Int = {
      var syms: Seq[String] = w.map(_.toString)
      merges.foreach { case (a, b) =>
        val buf = scala.collection.mutable.ArrayBuffer[String]()
        syms.foreach { t =>
          if (buf.nonEmpty && buf.last == a && t == b) buf(buf.length - 1) = a + b
          else buf += t
        }
        syms = buf.toSeq
      }
      syms.length
    }
    val expected = graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "text").collect().map { r =>
        val words = r.getAs[String]("text").toLowerCase
          .replaceAll("[^a-z0-9]+", " ").trim.split(" ").filter(_.nonEmpty)
        r.getAs[Long]("doc_id") ->
          (words.length.toLong, words.map(encodeWord).sum.toLong, words.map(_.length).sum.toLong)
      }.toMap
    val got = TextQueries.bpeEncode(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert((r.getAs[Long]("n_words"), r.getAs[Long]("n_tokens"), r.getAs[Long]("n_chars"))
        === expected(id), s"doc $id")
    }
  }

  private lazy val fixtureDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ssdedup_fix").toString
    // doc 1 is an exact copy of doc 0; doc 2 shares exactly ONE 5-word
    // span with doc 0 (positions 3..7); doc 3 overlaps nothing.
    Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "web", 0L),
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "web", 0L),
      (2L, "unique words here alpha beta gamma delta epsilon tail one two", "en", "web", 0L),
      (3L, "totally different content with no overlap at all whatsoever", "en", "web", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("substring_dedup: keeper keeps, exact copy drains, partial overlap is span-exact") {
    val out = TextQueries.substringDedup(spark, fixtureDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size === 4)
    // keeper (min doc_id) of every shared shingle: untouched
    assert(out(0L).getAs[Long]("n_dup") === 0L)
    assert(out(0L).getAs[String]("clean_md5") ===
      md5hex("alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    // exact copy: every position covered, cleaned text empty
    assert(out(1L).getAs[Double]("dup_ratio") === 1.0)
    assert(out(1L).getAs[String]("clean_md5") === md5hex(""))
    // partial overlap: exactly the 5 shared positions (3..7) removed
    assert(out(2L).getAs[Long]("n_words") === 11L)
    assert(out(2L).getAs[Long]("n_dup") === 5L)
    assert(out(2L).getAs[String]("clean_md5") === md5hex("unique words here tail one two"))
    // disjoint doc: untouched
    assert(out(3L).getAs[Long]("n_dup") === 0L)
  }

  test("substring_dedup: on real data, cleaned docs with no dups hash to their normed text") {
    val docs = graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')) AS norm")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("norm")).toMap
    val rows = TextQueries.substringDedup(spark, sf0001).collect()
    assert(rows.exists(_.getAs[Long]("n_dup") > 0L), "sf0.001 seeds duplicate docs")
    rows.filter(_.getAs[Long]("n_dup") == 0L).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("clean_md5") === md5hex(docs(id)),
        s"doc $id reported clean but cleaned hash differs from its normed text")
    }
  }
}
