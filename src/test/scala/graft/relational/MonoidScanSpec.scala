package graft.relational

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec

/** MonoidScan invariants, pinned on the exact (Long, +) monoid so the
  * hierarchical association is provably lossless: integer addition is
  * fully associative, so base case (≤fanout rows) and any recursion depth
  * must produce IDENTICAL results — which isolates the scan plumbing
  * (grouping, ord-sorted composition, seed threading) from float
  * reassociation concerns (those are TechIndicatorsSpec's 150-chunk case).
  */
class MonoidScanSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", StringType),
    StructField("ord", LongType),
    StructField("v", LongType)))

  private def totals(rows: Seq[(String, Long, Long)]) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.map { case (k, o, v) => Row(k, o, v) }.asJava, schema)
  }

  private def seeds(rows: Seq[(String, Long)]) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.map { case (k, s) => Row(k, s) }.asJava,
      StructType(Seq(StructField("k", StringType), StructField("seed", LongType))))
  }

  private def scan(t: Seq[(String, Long, Long)], s: Seq[(String, Long)],
      fanout: Int): Map[(String, Long), Long] =
    MonoidScan.scanIncoming(
        totals(t), Seq("k"), "ord", "v", seeds(s), "seed",
        "(acc, f) -> acc + f", "(acc, f) -> acc + f",
        fanout = fanout, outName = "sin")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("seeded exclusive prefix sums: deep recursion equals the flat fold exactly") {
    // 300 ords per key at fanout 4 -> depth ceil(log4 300) = 5 levels
    val rows = for (k <- Seq("a", "b"); o <- 0L until 300L)
      yield (k, o, (o * 7 + k.hashCode.abs % 13) % 101)
    val sd = Seq("a" -> 1000L, "b" -> 5000L)
    val deep = scan(rows, sd, fanout = 4)
    val flat = scan(rows, sd, fanout = 1024) // base case: single seeded fold
    assert(deep.size === 600)
    assert(deep === flat)
    // driver-side reference: exclusive prefix + seed
    for (k <- Seq("a", "b")) {
      val vs = rows.filter(_._1 == k).sortBy(_._2).map(_._3)
      val seed = sd.toMap.apply(k)
      val exp = vs.scanLeft(seed)(_ + _).init
      vs.indices.foreach(i => assert(deep((k, i.toLong)) === exp(i), s"$k ord $i"))
    }
  }

  test("sparse ords and gaps: grid grouping keys on ord values, not row positions") {
    // ords spaced 64 apart defeat one DIV level (count unchanged) — the
    // recursion must still terminate by shrinking ord magnitude
    val rows = (0L until 200L).map(i => ("x", i * 64, i % 17))
    val got = scan(rows, Seq("x" -> 0L), fanout = 64)
    val exp = rows.map(_._3).scanLeft(0L)(_ + _).init
    rows.zipWithIndex.foreach { case ((_, o, _), i) =>
      assert(got(("x", o)) === exp(i), s"ord $o")
    }
  }

  test("empty and single-element inputs return the seed") {
    assert(scan(Nil, Seq("a" -> 9L), fanout = 4).isEmpty)
    val one = scan(Seq(("a", 0L, 42L)), Seq("a" -> 9L), fanout = 4)
    assert(one === Map(("a", 0L) -> 9L)) // exclusive: own value not included
  }
}
