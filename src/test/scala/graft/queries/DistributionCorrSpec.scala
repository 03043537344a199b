package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** price_correlation + window_distribution: statistical/definitional
  * invariants beyond the oracle's bit-parity.
  */
class DistributionCorrSpec extends SparkSpec {

  test("price_correlation: r in [-1,1], n_hours is the exact hour intersection") {
    val rows = MultiSymQueries.queries("price_correlation")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[Double]("corr")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"corr out of range: $c")
      assert(r.getAs[Long]("n_hours") > 0L)
    }
    // n_hours for one pair == |hours(a) ∩ hours(b)| recomputed independently
    val first = rows.head
    val (sa, sb) = (first.getAs[String]("symbol_a"), first.getAs[String]("symbol_b"))
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("event_type").as("symbol"),
        expr("to_timestamp(floor(unix_micros(CAST(ts AS TIMESTAMP)) / 3600000000) * 3600)")
          .as("h"))
      .distinct()
    val ha = ev.filter(col("symbol") === sa).select(col("h"))
    val hb = ev.filter(col("symbol") === sb).select(col("h"))
    val common = ha.intersect(hb).count()
    assert(first.getAs[Long]("n_hours") === common)
  }

  test("price_correlation: matches a driver-side Pearson recompute within 1e-9") {
    import spark.implicits._
    val candles = graft.Tables.events(spark, sf0001)
      .groupBy(col("event_type").as("symbol"),
        expr("floor(unix_micros(CAST(ts AS TIMESTAMP)) / 3600000000)").as("h"))
      .agg(expr("max_by(value, struct(ts, event_id))").as("close"))
      .as[(String, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(c => c._2 -> c._3).toMap).toMap
    val got = MultiSymQueries.queries("price_correlation")(spark, sf0001).collect()
    got.foreach { r =>
      val (a, b) = (r.getAs[String]("symbol_a"), r.getAs[String]("symbol_b"))
      val common = candles(a).keySet.intersect(candles(b).keySet).toSeq.sorted
      val xs = common.map(candles(a)); val ys = common.map(candles(b))
      val n = common.size.toDouble
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val (sxx, syy) = (xs.map(x => x * x).sum, ys.map(y => y * y).sum)
      val expect = (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
      // the query prounds at 1e-6 and the driver-side sums reassociate, so
      // the budget is half the pround grain plus fold noise
      assert(math.abs(r.getAs[Double]("corr") - expect) < 6e-7,
        s"pair ($a,$b): ${r.getAs[Double]("corr")} vs $expect")
    }
  }

  test("window_distribution: quartiles balanced, pct_rank/cume_dist hit definitional bounds") {
    val rows = RelationalQueries.windowDistribution(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // raw query output: ntile is INT pre-normalization, so read via Number
    def quart(r: org.apache.spark.sql.Row): Long =
      r.getAs[Number]("price_quartile").longValue
    rows.groupBy(_.getAs[String]("o_orderpriority")).foreach { case (prio, rs) =>
      val n = rs.length
      val sizes = rs.groupBy(quart).view.mapValues(_.length)
      assert(sizes.keySet.toSet.subsetOf(Set(1L, 2L, 3L, 4L)))
      assert(sizes.values.max - sizes.values.min <= 1, s"$prio quartiles unbalanced")
      val sorted = rs.sortBy(r => (r.getAs[Double]("o_totalprice"), r.getAs[Long]("o_orderkey")))
      val pr = sorted.map(_.getAs[Double]("pct_rank"))
      assert(pr.head === 0.0)
      assert(pr === pr.sorted, s"$prio pct_rank not monotone in the window order")
      val cd = sorted.map(_.getAs[Double]("cum_dist"))
      assert(cd.last === 1.0)
      assert(cd.forall(v => v > 0.0 && v <= 1.0))
      assert(sorted.map(quart).toSeq === sorted.map(quart).toSeq.sorted,
        s"$prio ntile not monotone")
      assert(n === rs.map(_.getAs[Long]("o_orderkey")).distinct.length)
    }
  }
}
