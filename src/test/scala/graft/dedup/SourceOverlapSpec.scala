package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.DedupQueries

/** source_overlap: internal consistency against the pair relation it rolls
  * up — properties the oracle (which restates the same SQL) cannot add.
  */
class SourceOverlapSpec extends SparkSpec {

  test("matrix rolls up exactly the thresholded near-dup pairs; sources ordered") {
    val matrix = DedupQueries.sourceOverlap(spark, sf001).collect()
    assert(matrix.nonEmpty, "fixture must contain near-dup pairs")
    matrix.foreach { r =>
      assert(r.getString(0) <= r.getString(1), "unordered pair must be normalized")
      assert(r.getLong(2) > 0L)
    }
    // total pairs in the matrix == count of est_jaccard >= 0.5 pairs
    val nPairs = DocDedup.estimatedJaccardPairs(
        graft.Tables.documents(spark, sf001))
      .filter(col("est_jaccard") >= 0.5).count()
    assert(matrix.map(_.getLong(2)).sum === nPairs)
    // and some overlap crosses a source boundary (the diagnostic's point)
    assert(matrix.exists(r => r.getString(0) != r.getString(1)),
      "expected at least one cross-source near-dup pair")
  }
}
