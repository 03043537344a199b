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

  test("zorder_layout: boxes cover the probe answer exactly where touched") {
    val files = StoreQueries.zorderLayout(spark, sf001).collect()
    assert(files.map(_.getAs[Long]("n_rows")).sum === 15000L)
    // every row of the probe-box answer must live in a touched file:
    // skipping untouched files loses nothing (the correctness property of
    // min/max pruning), and touching under ~1/4 of files is the layout win
    val touched = files.count(_.getAs[Boolean]("touched"))
    assert(touched > 0 && touched.toDouble / files.length < 0.25,
      s"probe touched $touched/${files.length} files — z-order should prune")
    files.filterNot(_.getAs[Boolean]("touched")).foreach { f =>
      val disjoint =
        f.getAs[Long]("max_ck") < 300 || f.getAs[Long]("min_ck") >= 600 ||
          f.getAs[Long]("max_day") < 9862 || f.getAs[Long]("min_day") >= 10592
      assert(disjoint, "an untouched file must be disjoint from the probe box")
    }
  }
}
