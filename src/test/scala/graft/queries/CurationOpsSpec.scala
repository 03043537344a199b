package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property checks for the retrieval/curation/layout operators added with
  * bm25_topk, snapshot_diff, diversity_sample, and zorder_layout — the
  * oracle gate pins exact values; these pin the SEMANTIC invariants that
  * must hold at any scale factor.
  */
class CurationOpsSpec extends SparkSpec {

  test("bm25: scores positive, ranked descending, k bounded") {
    val rows = TextQueries.bm25TopK(spark, sf001).collect()
    assert(rows.length === 10)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.forall(_ > 0.0), "BM25 of matched docs must be positive")
    assert(scores.sameElements(scores.sortBy(-_)), "top-k must be sorted desc")
    assert(rows.forall(_.getAs[Long]("n_terms") <= 4), "at most 4 query terms")
  }

  test("hybrid_rrf: fusion score is exactly the rank formula; legs dedup") {
    val rows = TextQueries.hybridRrf(spark, sf001).collect()
    // each leg contributes at most 20 docs; the union at least 20
    assert(rows.length >= 20 && rows.length <= 40)
    def ranks(c: String) = rows.flatMap(r => Option(r.getAs[Long](c)))
    Seq("lex_rank", "sem_rank").foreach { c =>
      val rs = ranks(c)
      assert(rs.length === 20, s"$c leg must rank exactly 20 docs")
      assert(rs.sorted.toSeq === (1L to 20L), s"$c must be a permutation of 1..20")
    }
    // rrf_score is a pure function of the two ranks — recompute exactly
    rows.foreach { r =>
      val exp = Seq("lex_rank", "sem_rank")
        .flatMap(c => Option(r.getAs[Long](c)))
        .map(rk => 1.0 / (60.0 + rk.toDouble)).sum
      assert(r.getAs[Double]("rrf_score") === math.floor(exp * 1e6 + 0.5) / 1e6,
        s"doc ${r.getAs[Long]("doc_id")}: rrf must equal the rank formula")
    }
    // docs surfacing in both legs must outrank a same-rank single-leg doc
    val both = rows.filter(r => !r.isNullAt(r.fieldIndex("lex_rank")) &&
      !r.isNullAt(r.fieldIndex("sem_rank")))
    assert(both.nonEmpty, "fixture must have overlap between the two legs")
  }

  test("snapshot_diff: statuses partition the keys and deltas are consistent") {
    val rows = RelationalQueries.snapshotDiff(spark, sf001).collect()
    val byStatus = rows.groupBy(_.getAs[String]("status"))
    // sparse day-snapshots must exercise appearance and disappearance
    assert(byStatus.contains("added") && byStatus.contains("removed") &&
      byStatus.contains("changed"))
    byStatus.getOrElse("added", Array()).foreach { r =>
      assert(r.isNullAt(r.fieldIndex("a_n")) && !r.isNullAt(r.fieldIndex("b_n")))
      assert(r.getAs[Double]("delta") === r.getAs[Double]("b_total"))
    }
    byStatus.getOrElse("removed", Array()).foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("a_n")) && r.isNullAt(r.fieldIndex("b_n")))
      assert(r.getAs[Double]("delta") === -r.getAs[Double]("a_total"))
    }
    byStatus.getOrElse("changed", Array()).foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("a_n")) && !r.isNullAt(r.fieldIndex("b_n")))
    }
  }

  test("diversity_sample: per-cell cap enforced, sparse cells kept whole") {
    val rows = graft.similarity.Similarity
      .clusterSample(graft.Tables.embeddings(spark, sf001), perCell = 5)
      .collect()
    val perCell = rows.groupBy(_.getAs[Long]("cell"))
    assert(perCell.values.forall(_.length <= 5), "cap must bound every cell")
    perCell.foreach { case (_, rs) =>
      val size = rs.head.getAs[Long]("cell_size")
      if (size <= 5)
        assert(rs.length === size, "cells within the cap must survive intact")
      else assert(rs.length === 5)
    }
  }

  test("boilerplate_ngrams: ratio bounded, both gate outcomes, nulls impossible") {
    val rows = TextQueries.boilerplateNgrams(spark, sf001).collect()
    assert(rows.length === 500, "one row per input doc, short docs included")
    rows.foreach { r =>
      val ratio = r.getAs[Double]("boiler_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0)
      assert(r.getAs[Long]("n_boiler") <= r.getAs[Long]("n_shingles"))
      assert(r.getAs[Boolean]("keep") === (ratio <= 0.5))
    }
    val kept = rows.count(_.getAs[Boolean]("keep"))
    assert(kept > 0 && kept < rows.length,
      "threshold must exercise both outcomes on the fixture")
  }

  test("doc_chunks: stride-prefixes reconstruct every doc exactly") {
    val chunks = TextQueries.docChunks(spark, sf001).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val docs = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"),
        filter(graft.text.TextAnalysis.words(col("text")), w => length(w) > 0))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    docs.filter(_._2.nonEmpty).foreach { case (docId, words) =>
      val cs = chunks(docId).sortBy(_.getAs[Long]("chunk_id"))
      cs.zipWithIndex.foreach { case (c, i) =>
        assert(c.getAs[Long]("chunk_id") === i.toLong, "gapless ordinals")
        assert(c.getAs[Long]("chunk_start") === i.toLong * 24)
        assert(c.getAs[Long]("n_words") <= 32)
      }
      // all but the last chunk contribute their first 24 words (the stride);
      // the last contributes all — concatenation must equal the original
      val rebuilt = cs.init.flatMap(_.getAs[String]("chunk_text").split(" ").take(24)) ++
        cs.last.getAs[String]("chunk_text").split(" ")
      assert(rebuilt.toSeq === words,
        s"doc $docId: chunk windows must tile the document")
    }
    assert(chunks.keySet === docs.filter(_._2.nonEmpty).keySet,
      "every non-empty doc chunks; empty docs do not")
  }

  test("zorder_layout: skipped files provably lose no probe rows") {
    val files = StoreQueries.zorderLayout(spark, sf001).collect()
    assert(files.map(_.getAs[Long]("n_rows")).sum === 15000L)
    val touched = files.count(_.getAs[Boolean]("touched"))
    assert(touched > 0 && touched.toDouble / files.length < 0.25,
      s"probe touched $touched/${files.length} files — z-order should prune")
    // INDEPENDENT row-level reimplementation (plain Scala bit math, not the
    // query's SQL expressions): recompute every order's file assignment and
    // assert each probe-box row landed in a file the query marks touched —
    // the actual correctness property of min/max skipping. A bug in the
    // interleave or the touch test makes the two sides disagree here.
    val rows = graft.Tables.orders(spark, sf001)
      .select(col("o_custkey"),
        datediff(to_date(col("o_orderdate")),
          lit(java.sql.Date.valueOf("1970-01-01"))).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (ckLo, ckHi) = (rows.map(_._1).min, rows.map(_._1).max)
    val (dLo, dHi) = (rows.map(_._2).min, rows.map(_._2).max)
    def fileId(ck: Long, day: Long): Long = {
      val bx = (ck - ckLo) * 256 / (ckHi - ckLo + 1)
      val by = (day - dLo) * 256 / (dHi - dLo + 1)
      val z = (0 until 8).map { i =>
        (((bx >> i) & 1L) << (2 * i)) | (((by >> i) & 1L) << (2 * i + 1))
      }.sum
      z / 1024
    }
    val touchedIds = files.filter(_.getAs[Boolean]("touched"))
      .map(_.getAs[Long]("file_id")).toSet
    val probeRows = rows.filter { case (ck, day) =>
      ck >= 300 && ck < 600 && day >= 9862 && day < 10592
    }
    assert(probeRows.nonEmpty, "probe box must select real rows")
    probeRows.foreach { case (ck, day) =>
      assert(touchedIds.contains(fileId(ck, day)),
        s"probe row (ck=$ck, day=$day) lives in an untouched file — skipping would lose it")
    }
  }
}
