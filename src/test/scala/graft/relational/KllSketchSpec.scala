package graft.relational

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

import graft.SparkSpec

/** KllSketch invariants: weight conservation, the rank-error bound
  * (measured against exact ranks — the VERDICT r12 acceptance), merge
  * equivalence of the item algebra, and partitioning-independence (every
  * compaction decision is a pure function of the data).
  */
class KllSketchSpec extends SparkSpec {

  private def values(n: Int, g: String = "x") = {
    import scala.jdk.CollectionConverters._
    // deterministic non-monotone, heavy-ish tail
    val rows = (0 until n).map { i =>
      Row(g, i.toLong, 1.0 * ((i * 7919) % 1000) + (if (i % 37 == 0) 5000.0 + i else 0.0))
    }
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("g", StringType), StructField("id", LongType),
      StructField("v", DoubleType))))
  }

  test("weight is conserved and the top level holds ~n/2^R items") {
    val n = 4000
    val rounds = 6
    val sk = KllSketch.sketch(values(n), Seq("g"), col("v"), col("id"), rounds)
      .collect()
    assert(sk.map(_.getAs[Long]("w")).sum === n.toLong)
    val top = sk.count(_.getAs[Int]("level") == rounds)
    assert(top >= n / (1 << rounds) - rounds && top <= n / (1 << rounds) + rounds)
    // ≤1 leftover per level below the top
    (0 until rounds).foreach { r =>
      assert(sk.count(_.getAs[Int]("level") == r) <= 1, s"level $r")
    }
  }

  test("rank error vs exact ranks is within the 2^R compaction bound") {
    val n = 5000
    val rounds = 6
    val df = values(n)
    val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val sk = KllSketch.sketch(df, Seq("g"), col("v"), col("id"), rounds)
    val est = KllSketch.quantiles(sk, Seq("g"), qs).collect().head
    val sorted = df.orderBy(col("v"), col("id")).collect().map(_.getDouble(2))
    qs.foreach { q =>
      val v = est.getAs[Double](s"p${(q * 100).round}")
      val target = math.ceil(q * n).toLong
      // true rank range of the estimate value (ties possible)
      val lo = sorted.indexWhere(_ >= v) + 1
      val hi = sorted.lastIndexWhere(_ <= v) + 1
      val err = if (target < lo) lo - target else if (target > hi) target - hi else 0L
      assert(err <= (1L << rounds),
        s"q=$q est=$v rank window [$lo,$hi] target $target err $err")
    }
  }

  test("merge of per-part sketches conserves weight and keeps the bound") {
    val n = 3000
    val df = values(n).withColumn("part", col("id") % 3)
    val parts = KllSketch.sketch(df, Seq("g", "part"), col("v"), col("id"), 4)
    val merged = KllSketch.compact(
      parts.select(col("g"), col("level"), col("value"), col("tid"), col("w")),
      Seq("g"), 0, 8)
    val items = merged.collect()
    assert(items.map(_.getAs[Long]("w")).sum === n.toLong)
    val est = KllSketch.quantiles(merged, Seq("g"), Seq(0.5)).collect().head
    assert(est.getAs[Long]("n_rows") === n.toLong)
    val sorted = values(n).orderBy(col("v"), col("id")).collect().map(_.getDouble(2))
    val v = est.getAs[Double]("p50")
    val target = math.ceil(0.5 * n).toLong
    val lo = sorted.indexWhere(_ >= v) + 1
    val hi = sorted.lastIndexWhere(_ <= v) + 1
    val err = if (target < lo) lo - target else if (target > hi) target - hi else 0L
    // per-part rounds (4) + merge cascade (to level 8): Σ 2^r < 2^9
    assert(err <= (1L << 9), s"merged p50 err $err")
  }

  test("compactFused is bit-identical to the round-by-round cascade") {
    // merge-shaped input: per-(g, part) day sketches, day key dropped —
    // levels 0..4 populated with leftovers, exactly what compactAuto fuses
    val n = 3000
    val df = values(n).withColumn("part", col("id") % 7)
    val items = KllSketch
      .sketch(df, Seq("g", "part"), col("v"), col("id"), 4)
      .select(col("g"), col("level"), col("value"), col("tid"), col("w"))
    def key(r: Row) = (r.getAs[String]("g"), r.getAs[Int]("level"),
      r.getAs[Double]("value"), r.getAs[Long]("tid"), r.getAs[Long]("w"))
    val slow = KllSketch.compact(items, Seq("g"), 0, 9)
      .collect().map(key).sortBy(t => (t._1, t._2, t._3, t._4))
    val fused = KllSketch.compactFused(items, Seq("g"), 0, 9)
      .collect().map(key).sortBy(t => (t._1, t._2, t._3, t._4))
    assert(fused.toSeq === slow.toSeq)
    assert(fused.map(_._5).sum === n.toLong)
    // and the read-out built on either path matches
    val qSlow = KllSketch.quantiles(KllSketch.compact(items, Seq("g"), 0, 9),
      Seq("g"), Seq(0.5, 0.9)).collect().head
    val qFused = KllSketch.quantiles(
      KllSketch.compactAuto(items, Seq("g"), 0, 9),
      Seq("g"), Seq(0.5, 0.9)).collect().head
    assert(qFused.toSeq === qSlow.toSeq)
  }

  test("compactAuto falls back to the cascade above the fuse threshold") {
    val items = KllSketch.items0(values(600), Seq("g"), col("v"), col("id"))
    def key(r: Row) = (r.getAs[Int]("level"), r.getAs[Double]("value"),
      r.getAs[Long]("tid"), r.getAs[Long]("w"))
    val viaCascade = KllSketch
      .compactAuto(items, Seq("g"), 0, 5, fuseMaxRows = 10L)
      .collect().map(key).sortBy(t => (t._1, t._2, t._3))
    val viaFused = KllSketch
      .compactAuto(items, Seq("g"), 0, 5, fuseMaxRows = 1000000L)
      .collect().map(key).sortBy(t => (t._1, t._2, t._3))
    assert(viaCascade.toSeq === viaFused.toSeq)
  }

  test("sketch items are identical under different input partitioning") {
    val df = values(2000)
    def run(parts: Int) =
      KllSketch.sketch(df.repartition(parts), Seq("g"), col("v"), col("id"), 5)
        .collect()
        .map(r => (r.getAs[Int]("level"), r.getAs[Double]("value"),
          r.getAs[Long]("tid"), r.getAs[Long]("w"))).sortBy(t => (t._1, t._2, t._3))
    assert(run(2).toSeq === run(23).toSeq)
  }
}
