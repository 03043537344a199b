package graft.sources

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** GraftSink commit-protocol corners the gate queries can't isolate:
  * task-level abort, duplicate-attempt deduplication, overwrite atomicity,
  * and staged-file invisibility before job commit.
  */
class GraftSinkSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", DoubleType)))

  // the session's Hadoop conf, as the write path captures it on the driver
  private def hconf = new GraftHadoopConf(spark.sessionState.newHadoopConf())

  private def freshDir(tag: String): String = {
    val d = s"${sys.props("java.io.tmpdir")}/graft_sink_spec/$tag"
    val p = new HPath(d)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    d
  }

  private def readBack(dir: String) =
    spark.read.schema(schema).option("pathGlobFilter", "part-*.csv").csv(dir)

  test("connector read path: schema inferred from _schema.json, staged " +
      "files invisible, nulls round-trip") {
    import spark.implicits._
    val dir = freshDir("readpath")
    val df = Seq((1L, Some(0.5)), (2L, None), (3L, Some(1.5)))
      .toDF("id", "v")
    df.write.format("graft-sink").mode("append").save(dir)
    // plant a staged leftover that a naive glob would pick up
    val fs = new HPath(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = new HPath(s"$dir/_staging-bogus", "part-bogus-00000-a9.csv")
    fs.mkdirs(staged.getParent)
    val out = fs.create(staged, true); out.write("99,9.9\n".getBytes); out.close()
    val got = spark.read.format("graft-sink").load(dir)
    assert(got.schema.fieldNames.toSeq === Seq("id", "v"))
    val rows = got.collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else java.lang.Double.valueOf(r.getDouble(1))))
      .toMap
    assert(rows === Map(1L -> 0.5, 2L -> null, 3L -> 1.5),
      "staged file must be invisible; '' must read back as NULL")
    // column pruning: a single-column projection still resolves correctly
    assert(spark.read.format("graft-sink").load(dir)
      .select(col("id")).collect().map(_.getLong(0)).sorted === Array(1L, 2L, 3L))
  }

  test("append with a mismatched schema is rejected at commit") {
    import spark.implicits._
    val dir = freshDir("schema_mismatch")
    Seq((1L, 0.5)).toDF("id", "v")
      .write.format("graft-sink").mode("append").save(dir)
    val e = intercept[Exception] {
      // same types, swapped column order: cells would silently transpose
      Seq((0.7, 2L)).toDF("v", "id")
        .write.format("graft-sink").mode("append").save(dir)
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("schema mismatch")), msgs(e).mkString("|"))
    // a truncate write with the new schema IS allowed and replaces metadata
    Seq((0.7, 2L)).toDF("v", "id")
      .write.format("graft-sink").mode("overwrite").save(dir)
    assert(spark.read.format("graft-sink").load(dir)
      .schema.fieldNames.toSeq === Seq("v", "id"))
  }

  test("connector read before any commit fails with the no-schema message") {
    val dir = freshDir("readpath_empty")
    val e = intercept[Exception] {
      spark.read.format("graft-sink").load(dir).collect()
    }
    assert(e.getMessage.contains("_schema.json"), e.getMessage)
  }

  test("batch round-trip: committed files hold exactly the written rows") {
    import spark.implicits._
    val dir = freshDir("roundtrip")
    val df = (1L to 100L).map(i => (i, i * 0.5)).toDF("id", "v").repartition(4)
    df.write.format("graft-sink").mode("append").save(dir)
    val got = readBack(dir).collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got === (1L to 100L).map(i => (i, i * 0.5)).toSet)
    // no staging residue after commit
    val fs = new HPath(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.listStatus(new HPath(dir)).exists(_.getPath.getName.startsWith("_staging")))
  }

  test("overwrite truncates the previous generation inside the commit") {
    import spark.implicits._
    val dir = freshDir("overwrite")
    (1L to 50L).map(i => (i, 1.0)).toDF("id", "v").repartition(3)
      .write.format("graft-sink").mode("append").save(dir)
    (100L to 120L).map(i => (i, 2.0)).toDF("id", "v").repartition(2)
      .write.format("graft-sink").mode("overwrite").save(dir)
    val ids = readBack(dir).select(col("id")).collect().map(_.getLong(0)).toSet
    assert(ids === (100L to 120L).toSet, "old generation fully gone, new fully present")
  }

  test("append keeps prior committed files") {
    import spark.implicits._
    val dir = freshDir("append")
    (1L to 10L).map(i => (i, 1.0)).toDF("id", "v").coalesce(1)
      .write.format("graft-sink").mode("append").save(dir)
    (11L to 20L).map(i => (i, 1.0)).toDF("id", "v").coalesce(1)
      .write.format("graft-sink").mode("append").save(dir)
    assert(readBack(dir).count() === 20L)
  }

  test("task abort deletes its staged file and leaves the destination untouched") {
    val dir = freshDir("abort")
    val factory = new GraftSinkWriterFactory(dir, schema, "qid-abort", hconf)
    val w = factory.createWriter(0, 7L)
    w.write(org.apache.spark.sql.catalyst.InternalRow(1L, 2.0))
    w.abort()
    val fs = new HPath(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = GraftSinkIO.stagingDir(dir, "qid-abort")
    assert(!fs.exists(staging) || fs.listStatus(staging).isEmpty)
  }

  test("duplicate attempts: only the committed attempt's file is published") {
    val dir = freshDir("dup")
    val qid = "qid-dup"
    val factory = new GraftSinkWriterFactory(dir, schema, qid, hconf)
    // two attempts of partition 0 run concurrently (speculation); both
    // finish at task level, but the driver commits only attempt 3's message
    val w1 = factory.createWriter(0, 3L)
    val w2 = factory.createWriter(0, 9L)
    w1.write(org.apache.spark.sql.catalyst.InternalRow(1L, 1.0))
    w2.write(org.apache.spark.sql.catalyst.InternalRow(1L, 1.0))
    val m1 = w1.commit()
    w2.commit() // the losing attempt also reached task commit — still unpublished
    new GraftSinkBatchWrite(dir, schema, qid, truncate = false, hconf)
      .commit(Array(m1))
    val rows = readBack(dir).count()
    assert(rows === 1L, "exactly one copy published despite two finished attempts")
    val fs = new HPath(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(GraftSinkIO.stagingDir(dir, qid)),
      "losing attempt vanished with the staging dir")
  }

  test("staged files are invisible to readers before job commit") {
    val dir = freshDir("invisible")
    val qid = "qid-inv"
    val factory = new GraftSinkWriterFactory(dir, schema, qid, hconf)
    val w = factory.createWriter(0, 1L)
    w.write(org.apache.spark.sql.catalyst.InternalRow(1L, 1.0))
    val m = w.commit() // task-committed, job NOT committed
    assert(readBack(dir).count() === 0L, "glob-scoped readers see nothing yet")
    new GraftSinkBatchWrite(dir, schema, qid, truncate = false, hconf)
      .commit(Array(m))
    assert(readBack(dir).count() === 1L)
  }

  test("clusterBy: the sink's required distribution puts each key wholly in one file") {
    import spark.implicits._
    val dir = freshDir("cluster")
    val kSchema = StructType(Seq(
      StructField("k", StringType), StructField("id", LongType)))
    (1L to 300L).map(i => (s"key${i % 5}", i)).toDF("k", "id")
      .repartition(6) // scattered input; the SINK requests the clustering
      .write.format("graft-sink").option("clusterBy", "k")
      .mode("append").save(dir)
    val fs = new HPath(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new HPath(dir))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".csv"))
      .map(_.getPath.toString)
    val keySets = files.map { f =>
      spark.read.schema(kSchema).csv(f).select(col("k"))
        .distinct().collect().map(_.getString(0)).toSet
    }.filter(_.nonEmpty)
    val all = keySets.flatten
    assert(all.toSet.size === 5)
    assert(all.length === all.toSet.size,
      s"a key appeared in two files: ${keySets.mkString(";")}")
  }

  test("exactly-once end to end: stop mid-stream, restart from checkpoint, no dup no gap") {
    val dir = freshDir("restart")
    val ckpt = freshDir("restart_ckpt")
    val tickSchema = StructType(Seq(
      StructField("tick_id", LongType), StructField("price", DoubleType)))
    def start(trigger: org.apache.spark.sql.streaming.Trigger) =
      spark.readStream.format("graft-ticks")
        .option("rows", "4000").option("pages", "4")
        .option("maxTicksPerTrigger", "1000").load()
        .select(col("tick_id"), col("price"))
        .writeStream.format("graft-sink")
        .option("path", dir).option("checkpointLocation", ckpt)
        .trigger(trigger)
        .start()
    // phase 1: run a couple of micro-batches, then stop MID-STREAM
    val q1 = start(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50L))
    try {
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (q1.recentProgress.count(_.numInputRows > 0L) < 2 &&
        System.nanoTime() < deadline) Thread.sleep(100L)
      assert(q1.recentProgress.exists(_.numInputRows > 0L), "no progress in 60s")
    } finally q1.stop()
    // phase 2: restart from the SAME checkpoint; AvailableNow drains the rest
    val q2 = start(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    try assert(q2.awaitTermination(120000), "drain must finish")
    finally q2.stop()
    val ids = spark.read.schema(tickSchema)
      .option("pathGlobFilter", "epoch-*.csv").csv(dir)
      .select(col("tick_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(ids === (0L until 4000L).toSeq,
      s"restart must resume the offset log exactly: got ${ids.length} rows, " +
        s"dups=${ids.length - ids.distinct.length}")
  }

  test("replayed streaming epoch commit is idempotent (same final names)") {
    val dir = freshDir("epoch")
    val qid = "qid-epoch"
    val factory = new GraftSinkWriterFactory(dir, schema, qid, hconf)
    val sw = new GraftSinkStreamingWrite(dir, schema, qid, hconf)
    def runEpoch(attempt: Long): Unit = {
      val w = factory.createWriter(0, attempt, 5L)
      w.write(org.apache.spark.sql.catalyst.InternalRow(42L, 1.0))
      sw.commit(5L, Array(w.commit()))
    }
    runEpoch(1L)
    runEpoch(2L) // failover replay of epoch 5
    val n = spark.read.schema(schema)
      .option("pathGlobFilter", "epoch-*.csv").csv(dir).count()
    assert(n === 1L, "replay overwrote, not duplicated")
  }

  test("re-delivered commit with staged files already published is a no-op") {
    // failover corner the rename-result fix exists for: the SAME commit
    // message arrives twice, and by the second delivery the staged file is
    // gone (published, staging dropped). The old delete-then-rename would
    // delete the committed final file and silently "succeed" over lost
    // data; the fixed publish sees source-gone + dest-present and skips.
    val dir = freshDir("redeliver")
    val qid = "qid-redeliver"
    val factory = new GraftSinkWriterFactory(dir, schema, qid, hconf)
    val sw = new GraftSinkStreamingWrite(dir, schema, qid, hconf)
    val w = factory.createWriter(0, 1L, 7L)
    w.write(org.apache.spark.sql.catalyst.InternalRow(7L, 7.0))
    val msgs = Array(w.commit())
    sw.commit(7L, msgs)
    sw.commit(7L, msgs) // re-delivery of the SAME already-applied commit
    val rows = spark.read.schema(schema)
      .option("pathGlobFilter", "epoch-*.csv").csv(dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows === Seq((7L, 7.0)), "committed data survived the replay")
  }

  test("commit with staged file and final file both missing throws (data loss)") {
    val dir = freshDir("lost")
    val qid = "qid-lost"
    val sw = new GraftSinkStreamingWrite(dir, schema, qid, hconf)
    val ghost = GraftStaged("epoch-9-part-00000-a1.csv",
      "epoch-9-part-00000.csv", 1L)
    val e = intercept[java.io.IOException] {
      sw.commit(9L, Array[org.apache.spark.sql.connector.write.WriterCommitMessage](ghost))
    }
    assert(e.getMessage.contains("lost"))
  }

  test("committing epoch N leaves epoch N+1's in-flight staged files intact") {
    val dir = freshDir("epochs")
    val qid = "qid-epochs"
    val factory = new GraftSinkWriterFactory(dir, schema, qid, hconf)
    val sw = new GraftSinkStreamingWrite(dir, schema, qid, hconf)
    // epoch 11 is mid-flight (task-committed, job commit not yet delivered)
    val w11 = factory.createWriter(0, 1L, 11L)
    w11.write(org.apache.spark.sql.catalyst.InternalRow(11L, 1.0))
    val m11 = w11.commit()
    // epoch 10 commits fully — with per-epoch staging this cannot touch 11
    val w10 = factory.createWriter(0, 1L, 10L)
    w10.write(org.apache.spark.sql.catalyst.InternalRow(10L, 1.0))
    sw.commit(10L, Array(w10.commit()))
    // epoch 11's commit must still find its staged file
    sw.commit(11L, Array(m11))
    val ids = spark.read.schema(schema)
      .option("pathGlobFilter", "epoch-*.csv").csv(dir)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(ids === Set(10L, 11L))
  }
}
