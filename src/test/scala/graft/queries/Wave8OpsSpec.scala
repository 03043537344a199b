package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Round-12 eighth wave: hourly autocorrelation, Heaps'-law vocabulary
  * growth, Fellegi–Sunter field weights. */
class Wave8OpsSpec extends SparkSpec {

  test("acf_hourly: bounded correlations, lag-1 recomputed from the hourly series") {
    val rows = MultiSymQueries.acfHourly(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(Set(1L, 2L, 3L).contains(r.getAs[Long]("lag")))
      val a = r.getAs[Double]("acf")
      assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9, s"acf out of range: $a")
    }
    // recompute one lag-1 row on the driver (pick one the query emitted —
    // a constant series is legitimately dropped by the variance guard)
    val lag1 = rows.find(_.getAs[Long]("lag") == 1L)
    assert(lag1.isDefined, "at least one symbol must have a lag-1 correlation")
    val sym = lag1.get.getAs[String]("symbol")
    val hourly = Tables.events(spark, sf0001)
      .filter(col("event_type") === sym)
      .select(expr("unix_micros(ts) DIV 3600000000").as("hr"), col("value"))
      .groupBy(col("hr")).agg(avg(col("value")).as("x"))
      .orderBy(col("hr")).collect().map(_.getDouble(1))
      .map(x => math.floor(x * 1e6 + 0.5) / 1e6) // the query's quantization
    val pairs = hourly.zip(hourly.tail)
    val n = pairs.length.toDouble
    val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
    val sxy = pairs.map(p => p._1 * p._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val want = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(math.abs(lag1.get.getAs[Double]("acf") - want) < 1e-4,
      s"$sym lag-1 acf vs $want")
  }

  test("vocab_growth: monotone cumulative curve ending at the exact totals") {
    val rows = TextQueries.vocabGrowth(spark, sf0001).collect()
    assert(rows.map(_.getAs[Long]("decile")).toSeq === (0L to 9L))
    val toks = rows.map(_.getAs[Long]("tokens_cum"))
    val voc = rows.map(_.getAs[Long]("vocab_cum"))
    assert(toks.zip(toks.tail).forall { case (a, b) => b >= a })
    assert(voc.zip(voc.tail).forall { case (a, b) => b >= a })
    assert(voc.zip(toks).forall { case (v, t) => v <= t },
      "types can never exceed occurrences")
    val allToks = Tables.documents(spark, sf0001)
      .select(explode(split(trim(regexp_replace(lower(col("text")),
        "[^a-z0-9]+", " ")), " ")).as("t")).filter(col("t") =!= "")
    assert(toks.last === allToks.count())
    assert(voc.last === allToks.distinct().count())
    assert(rows.map(_.getAs[Long]("n_docs")).sum ===
      Tables.documents(spark, sf0001).count())
  }

  test("fs_field_weights: exact count ratios over the labeled candidate space") {
    val rows = DedupQueries.fsFieldWeights(spark, sf0001).collect()
    assert(rows.map(_.getAs[String]("field")).sorted.toSeq ===
      Seq("lang", "length", "source"))
    val nm = rows.map(r => (r.getAs[Long]("n_matched"), r.getAs[Long]("n_unmatched")))
    assert(nm.distinct.length === 1, "every field sees the same candidate pairs")
    // the label must match the engine's own near-dup decision pair count
    val wantMatched = DedupQueries.neardupMinhash(spark, sf0001).collect()
      .count(_.getAs[Double]("est_jaccard") >= 0.5).toLong
    assert(nm.head._1 === wantMatched)
    rows.foreach { r =>
      val (m, u) = (r.getAs[Double]("m"), r.getAs[Double]("u"))
      assert(m >= 0.0 && m <= 1.0 && u >= 0.0 && u <= 1.0)
      val wt = r.getAs[Double]("weight")
      if (u > 0.0) assert(math.abs(wt - math.floor(m / u * 1e6 + 0.5) / 1e6) < 1e-9)
      else assert(wt === 0.0)
    }
  }
}
