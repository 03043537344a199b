package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** upsertByKey's operation metrics (the Delta operationMetrics / Iceberg
  * snapshot-summary analog): observed DURING the write job via
  * Dataset.observe — the spec recounts the written table independently and
  * the two must agree exactly, on both the initial-insert and the merge
  * path.
  */
class MergeMetricsSpec extends SparkSpec {

  private def freshDir(tag: String): String = {
    val d = s"${sys.props("java.io.tmpdir")}/graft_merge_metrics/$tag"
    val p = new org.apache.hadoop.fs.Path(d)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    d
  }

  private def batch(ids: Range) = {
    import spark.implicits._
    ids.map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-02-0${1 + i % 3}%d 00:00:${i % 60}%02d"),
        i * 1.5)
    }.toDF("k", "ts", "v")
  }

  test("initial insert: observed metrics equal an independent recount") {
    val dir = freshDir("insert")
    val m = IncrementalStore.upsertByKey(batch(0 until 100), dir, "ts", Seq("k"))
    assert(m("rows_written") === 100L)
    val check = spark.read.parquet(dir)
      .agg(count(lit(1)), min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .first()
    assert(m("rows_written") === check.getLong(0))
    assert(m("min_ts_us") === check.getLong(1))
    assert(m("max_ts_us") === check.getLong(2))
  }

  test("merge path: rows_written counts the merged day slice, not the batch") {
    val dir = freshDir("merge")
    IncrementalStore.upsertByKey(batch(0 until 100), dir, "ts", Seq("k"))
    // overlapping keys 50..149: merged slice = anti-join survivors + batch
    val m = IncrementalStore.upsertByKey(batch(50 until 150), dir, "ts", Seq("k"))
    assert(m("rows_written") === 150L,
      "100 old rows, 50 replaced + 100 new batch rows = 150 in the slice")
    assert(spark.read.parquet(dir).count() === 150L)
  }
}
