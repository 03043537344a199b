package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Round-12 sixth wave: proper scoring, cumulative gains, calendar
  * seasonality, shingle novelty. */
class Wave6OpsSpec extends SparkSpec {

  test("brier_score: equals the driver-side mean squared probability error") {
    val r = SimilarityQueries.brierScore(spark, sf0001).collect().head
    val scored = graft.ml.LogReg.scoreAll(Tables.embeddings(spark, sf0001))
      .collect().map(x => (x.getAs[Double]("score"), x.getAs[Long]("y")))
    val want = scored.map { case (s, y) => (s - y) * (s - y) }.sum / scored.length
    assert(r.getAs[Long]("n") === scored.length.toLong)
    assert(math.abs(r.getAs[Double]("brier") - want) < 1e-6)
    assert(r.getAs[Double]("brier") >= 0.0 && r.getAs[Double]("brier") <= 1.0)
  }

  test("lift_deciles: ten exhaustive slices, cumulative lift ends at exactly 1") {
    val rows = SimilarityQueries.liftDeciles(spark, sf0001).collect()
    assert(rows.map(_.getAs[Long]("decile")).toSeq === (0L to 9L))
    val total = Tables.embeddings(spark, sf0001).count()
    assert(rows.map(_.getAs[Long]("n")).sum === total)
    // the last cumulative slice IS the whole corpus: its positive rate is
    // the base rate, so lift = 1.0 exactly (integer-ratio identity)
    assert(rows.last.getAs[Double]("lift") === 1.0)
    // cum_positives is non-decreasing
    val cums = rows.map(_.getAs[Long]("cum_positives"))
    assert(cums.zip(cums.tail).forall { case (a, b) => b >= a })
  }

  test("seasonality_profile: ISO calendar cells, exhaustive, one cell recomputed") {
    val rows = FeatureQueries.seasonalityProfile(spark, sf0001).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("isodow") >= 1 && r.getAs[Long]("isodow") <= 7)
      assert(r.getAs[Long]("hod") >= 0 && r.getAs[Long]("hod") <= 23)
    }
    val ev = Tables.events(spark, sf0001)
    assert(rows.map(_.getAs[Long]("n")).sum === ev.count())
    // recompute the first cell independently (java.time ISO weekday)
    val h = rows.head
    val cell = ev.select(col("event_type"), col("ts"), col("value")).collect()
      .filter { x =>
        val t = x.getTimestamp(1).toLocalDateTime
        x.getString(0) == h.getAs[String]("event_type") &&
          t.getDayOfWeek.getValue.toLong == h.getAs[Long]("isodow") &&
          t.getHour.toLong == h.getAs[Long]("hod")
      }
    assert(cell.length.toLong === h.getAs[Long]("n"))
    val mean = cell.map(_.getDouble(2)).sum / cell.length
    assert(math.abs(h.getAs[Double]("mean_value") - mean) < 1e-5)
  }

  test("golden_records: field rules recomputed against the cluster labeling") {
    val golden = DedupQueries.goldenRecords(spark, sf0001).collect()
      .map(r => r.getAs[Long]("cluster_id") -> r).toMap
    val members = DedupQueries.dedupClusters(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("doc_id")))
      .groupBy(_._1).map { case (c, rs) => c -> rs.map(_._2).toSet }
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(golden.keySet === members.keySet)
    members.foreach { case (c, ids) =>
      val g = golden(c)
      assert(g.getAs[Long]("n_members") === ids.size.toLong)
      assert(g.getAs[Long]("canonical_doc_id") === ids.min)
      assert(g.getAs[Long]("max_chars") === ids.map(docs(_)._2).max)
      val votes = ids.toSeq.map(docs(_)._1).groupBy(identity)
        .map { case (l, vs) => (l, vs.size) }
      val want = votes.toSeq.sortBy { case (l, n) => (-n, l) }.head._1
      assert(g.getAs[String]("majority_lang") === want, s"cluster $c majority")
    }
  }

  test("top_paths: counts match a driver-side sliding fold, descending") {
    val rows = RelationalQueries.topPaths(spark, sf0001).collect()
    assert(rows.length === 10)
    val cnts = rows.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
    val want = Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts").cast("long"), col("event_id"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1).toSeq
      .flatMap { case (_, es) =>
        es.sortBy(e => (e._2, e._3)).map(_._4).sliding(3).filter(_.length == 3)
          .map(s => (s(0), s(1), s(2))).toSeq
      }
      .groupBy(identity).map { case (p, os) => (p, os.size.toLong) }
    rows.foreach { r =>
      val key = (r.getString(0), r.getString(1), r.getString(2))
      assert(want(key) === r.getAs[Long]("cnt"), s"path $key")
    }
    // the emitted ten ARE the global maxima
    val floor = cnts.min
    assert(want.values.count(_ > floor) < 10)
  }

  test("shingle_novelty: first doc is fully novel, ratios match a driver fold") {
    val got = DedupQueries.shingleNovelty(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Double]("novelty"))).toMap
    def shingles(text: String): Set[String] = {
      val ws = text.toLowerCase.replaceAll("[^a-z0-9]+", " ")
        .trim.split(" ").filter(_.nonEmpty)
      if (ws.length < 3) Set.empty
      else ws.sliding(3).map(_.mkString(" ")).toSet
    }
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), shingles(r.getString(1))))
      .filter(_._2.nonEmpty).sortBy(_._1)
    assert(got.keySet === docs.map(_._1).toSet)
    var seen = Set.empty[String]
    docs.foreach { case (id, sh) =>
      val novel = sh.count(!seen.contains(_))
      val (n, nov) = got(id)
      assert(n === sh.size.toLong, s"doc $id shingle count")
      assert(math.abs(nov - novel.toDouble / sh.size) < 1e-6, s"doc $id novelty")
      seen ++= sh
    }
    assert(got(docs.head._1)._2 === 1.0, "the earliest doc has nothing to repeat")
  }
}
