package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Semantics checks for the curation-analytics operators added alongside
  * the oracle gate: exact percentiles, the CUBE lattice, and scalar
  * quantization. The oracle asserts cross-engine bit-parity; these assert
  * the operator-level invariants a user relies on.
  */
class AnalyticsOpsSpec extends SparkSpec {

  test("token_quantiles: ordered percentiles, doc counts partition the corpus") {
    val out = TextQueries.tokenQuantiles(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (p50, p90, p99) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val mx = r.getLong(5)
      assert(p50 <= p90 && p90 <= p99 && p99 <= mx.toDouble,
        s"percentiles out of order for lang ${r.getString(0)}")
    }
    val total = Tables.documents(spark, sf0001).count()
    assert(out.map(_.getLong(1)).sum === total)
  }

  test("events_cube: lattice counts reconcile across grouping sets") {
    val out = RelationalQueries.eventsCube(spark, sf0001)
    val byGid = out.collect().groupBy(_.getAs[Long]("gid"))
    assert(byGid.keySet === Set(0L, 1L, 2L, 3L))
    val total = Tables.events(spark, sf0001).count()
    // every slice of the lattice counts the same fact rows
    byGid.values.foreach(rows => assert(rows.map(_.getAs[Long]("n")).sum === total))
    // the grand-total row (both dims rolled up) is a single all-null row
    val grand = byGid(3L)
    assert(grand.length === 1 && grand.head.isNullAt(0) && grand.head.isNullAt(1))
    // gid bit semantics: gid=1 rolls up the LAST cube column (day) only
    assert(byGid(1L).forall(r => !r.isNullAt(0) && r.isNullAt(1)))
    assert(byGid(2L).forall(r => r.isNullAt(0) && !r.isNullAt(1)))
  }

  test("ivf_train: every vector assigned, centroids have the data's dim") {
    // query output is exploded to (cent_id, n, pos, val) rows for the
    // driver's pandas comparator; regroup per centroid here
    val out = SimilarityQueries.ivfTrain(spark, sf0001).collect()
    val byCent = out.groupBy(_.getAs[Long]("cent_id"))
    assert(byCent.nonEmpty && byCent.size <= 16)
    val total = Tables.embeddings(spark, sf0001).count()
    assert(byCent.values.map(_.head.getAs[Long]("n")).sum === total)
    val dim = Tables.embeddings(spark, sf0001)
      .select(org.apache.spark.sql.functions.size(col("embedding"))).first().getInt(0)
    byCent.values.foreach { rows =>
      assert(rows.length === dim)
      assert(rows.map(_.getAs[Long]("pos")).sorted.toSeq === (0L until dim.toLong))
      rows.map(_.getAs[Double]("val")).foreach(v =>
        assert(!v.isNaN && !v.isInfinite))
    }
  }

  test("embed_quantize: codes in [0,255], dequantization error <= qscale/2") {
    val out = SimilarityQueries.embedQuantize(spark, sf0001)
    val joined = out.join(
      Tables.embeddings(spark, sf0001).select(col("vec_id"), col("embedding")),
      "vec_id")
    val rows = joined.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val qmin = r.getAs[Double]("qmin")
      val qscale = r.getAs[Double]("qscale")
      // codes travel as a comma-joined string (driver-comparable shape)
      val codes = r.getAs[String]("codes").split(',').toSeq.map(_.toLong)
      val orig = r.getAs[scala.collection.Seq[Float]]("embedding")
      assert(codes.forall(c => c >= 0L && c <= 255L))
      codes.zip(orig).foreach { case (c, x) =>
        val deq = c * qscale + qmin
        assert(math.abs(deq - x.toDouble) <= qscale / 2 + 1e-12,
          s"vec ${r.getAs[Long]("vec_id")}: |$deq - $x| > ${qscale / 2}")
      }
    }
  }
}
