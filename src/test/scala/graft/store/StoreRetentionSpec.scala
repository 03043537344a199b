package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** store_retention: the oracle proves dropped-dirs == logical filter; this
  * pins the PHYSICAL contract — surviving files are untouched (same paths,
  * same bytes, same mtimes: retention is a metadata operation, never a
  * rewrite), the sweep is idempotent, and foreign directory names fail
  * loudly instead of silently surviving a malformed layout.
  */
class StoreRetentionSpec extends SparkSpec {

  private def fsOf(target: String) = new org.apache.hadoop.fs.Path(target)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def buildStore(target: String): Unit = {
    val fs = fsOf(target)
    fs.delete(new org.apache.hadoop.fs.Path(target), true)
    val silver = graft.forex.ForexPipeline.silverFrom(spark, sf0001)
    IncrementalStore.upsertByKey(silver, target, "observed_at", Seq("observed_at"))
  }

  private def fileIndex(target: String): Map[String, (Long, Long)] = {
    val fs = fsOf(target)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(target), true)
    val b = Map.newBuilder[String, (Long, Long)]
    while (it.hasNext) {
      val st = it.next()
      b += st.getPath.toString -> ((st.getLen, st.getModificationTime))
    }
    b.result()
  }

  test("surviving files are byte- and mtime-identical; sweep is idempotent") {
    val target = s"${sys.props("java.io.tmpdir")}/graft_store/retention_spec"
    buildStore(target)
    val cutoff = java.time.LocalDate.parse("2024-01-15")
    val before = fileIndex(target)
    assert(before.nonEmpty)
    val expectSurvive = before.view.filterKeys { k =>
      !k.contains("/p_date=") ||
        !java.time.LocalDate.parse(
          k.split("/p_date=")(1).split("/")(0)).isBefore(cutoff)
    }.toMap

    val dropped = IncrementalStore.retainDays(spark, target, cutoff)
    assert(dropped.nonEmpty, "fixture must span the cutoff")
    assert(dropped === dropped.sorted)
    assert(fileIndex(target) === expectSurvive,
      "retention must not touch a surviving file (no rewrite, no mtime bump)")

    assert(IncrementalStore.retainDays(spark, target, cutoff) === Nil)
    // and the table still reads: every surviving row is >= cutoff
    val minDay = IncrementalStore.readTable(spark, target)
      .agg(min(col("p_date"))).first().getDate(0)
    assert(!minDay.toLocalDate.isBefore(cutoff))
  }

  test("a malformed p_date directory fails loudly; foreign dirs are ignored") {
    val target = s"${sys.props("java.io.tmpdir")}/graft_store/retention_spec_bad"
    buildStore(target)
    val fs = fsOf(target)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$target/_scratch_foreign"))
    // a non-p_date directory must simply be ignored
    assert(IncrementalStore.retainDays(spark, target,
      java.time.LocalDate.parse("2024-01-01")) === Nil)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$target/p_date=not-a-date"))
    intercept[java.time.format.DateTimeParseException] {
      IncrementalStore.retainDays(spark, target,
        java.time.LocalDate.parse("2024-01-01"))
    }
  }

  test("the null-day partition is skipped, never parsed, never dropped") {
    // upsertByKey itself creates p_date=__HIVE_DEFAULT_PARTITION__ when
    // tsCol is null; one such row must not wedge every future sweep
    val target = s"${sys.props("java.io.tmpdir")}/graft_store/retention_spec_null"
    buildStore(target)
    val fs = fsOf(target)
    val nullDir = new org.apache.hadoop.fs.Path(
      s"$target/p_date=__HIVE_DEFAULT_PARTITION__")
    fs.mkdirs(nullDir)
    val dropped = IncrementalStore.retainDays(spark, target,
      java.time.LocalDate.parse("2099-01-01"))
    assert(!dropped.exists(_.contains("__HIVE_DEFAULT_PARTITION__")))
    assert(fs.exists(nullDir), "null-day partition must survive the sweep")
    assert(dropped.nonEmpty, "dated partitions before the cutoff still drop")
  }
}
