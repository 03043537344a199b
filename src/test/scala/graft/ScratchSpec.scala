package graft

import org.apache.spark.sql.functions._

/** Scratch materialization: the shared-root conf must redirect scratch
  * writes (the cluster contract — executors must be able to read what the
  * driver-side plan wrote), and the default temp-dir path must keep
  * working for local mode.
  */
class ScratchSpec extends SparkSpec {

  test("default path: scratch table round-trips the relation") {
    import spark.implicits._
    val df = (1L to 100L).toDF("x").withColumn("y", col("x") * 2)
    val got = Scratch.table(df, "spec-default")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === (1L to 100L).map(i => (i, i * 2)).toSet)
  }

  test("spark.graft.scratch.dir redirects scratch tables under the shared root") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_scratch_root")
    spark.conf.set(Scratch.ScratchDirConf, root.toString)
    try {
      val df = (1L to 50L).toDF("x")
      val got = Scratch.table(df, "spec-root")
        .collect().map(_.getLong(0)).toSet
      assert(got === (1L to 50L).toSet)
      // the table landed under the configured root, tagged and unique
      val children = java.nio.file.Files.list(root).iterator()
      val names = new scala.collection.mutable.ArrayBuffer[String]
      while (children.hasNext) names += children.next().getFileName.toString
      assert(names.exists(_.startsWith("graft-spec-root-")), names.toString)
    } finally spark.conf.unset(Scratch.ScratchDirConf)
  }

  test("fixture: derives ONCE per key, later calls serve from the files") {
    import spark.implicits._
    var derivations = 0
    def build() = Scratch.fixture(spark, "spec-fixture|reuse") {
      derivations += 1
      (1L to 25L).toDF("x")
    }
    val first = build().collect().map(_.getLong(0)).toSet
    val second = build().collect().map(_.getLong(0)).toSet
    assert(derivations === 1, "second call must not re-derive")
    assert(first === (1L to 25L).toSet)
    assert(second === first)
  }

  test("fixture: keys isolate — per-sfDir fixtures never bleed") {
    import spark.implicits._
    val a = Scratch.fixture(spark, "spec-fixture|dirA")((1L to 3L).toDF("x"))
    val b = Scratch.fixture(spark, "spec-fixture|dirB")((4L to 6L).toDF("x"))
    assert(a.collect().map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
    assert(b.collect().map(_.getLong(0)).toSet === Set(4L, 5L, 6L))
  }

  test("fixture: honors spark.graft.scratch.dir — cluster runs materialize " +
      "under the shared root") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_fix_root")
    spark.conf.set(Scratch.ScratchDirConf, root.toString)
    try {
      val got = Scratch.fixture(spark, "spec-fixture|shared-root")(
        (1L to 7L).toDF("x")).collect().map(_.getLong(0)).toSet
      assert(got === (1L to 7L).toSet)
      val children = java.nio.file.Files.list(root).iterator()
      val names = new scala.collection.mutable.ArrayBuffer[String]
      while (children.hasNext) names += children.next().getFileName.toString
      assert(names.exists(_.startsWith("graft-fix-")), names.toString)
    } finally spark.conf.unset(Scratch.ScratchDirConf)
  }

  test("fixture: an externally deleted fixture dir is rebuilt, not a dangling read") {
    import spark.implicits._
    var derivations = 0
    def build() = Scratch.fixture(spark, "spec-fixture|rebuild") {
      derivations += 1
      (1L to 5L).toDF("x")
    }
    val path = {
      build()
      // recover the materialized location via the plan's file index
      val df = build()
      df.inputFiles.head.stripSuffix("/" + df.inputFiles.head.split('/').last)
    }
    assert(derivations === 1)
    val dir = new java.io.File(new java.net.URI(path).getPath)
    dir.listFiles().foreach(_.delete())
    dir.delete()
    val again = build().collect().map(_.getLong(0)).toSet
    assert(derivations === 2, "deleted fixture must re-derive")
    assert(again === (1L to 5L).toSet)
  }

  test("fixture: a PARTIALLY deleted dir (no _SUCCESS) rebuilds — commit " +
      "marker, not bare existence, gates the cache (ADVICE r14)") {
    import spark.implicits._
    var derivations = 0
    def build() = Scratch.fixture(spark, "spec-fixture|partial") {
      derivations += 1
      (1L to 7L).toDF("x")
    }
    val path = {
      build()
      val df = build()
      df.inputFiles.head.stripSuffix("/" + df.inputFiles.head.split('/').last)
    }
    assert(derivations === 1)
    // simulate a half-deleted fixture: data files remain, commit marker gone
    val dir = new java.io.File(new java.net.URI(path).getPath)
    val marker = new java.io.File(dir, "_SUCCESS")
    assert(marker.exists(), "parquet write must leave a _SUCCESS marker")
    assert(marker.delete())
    val again = build().collect().map(_.getLong(0)).toSet
    assert(derivations === 2, "uncommitted fixture dir must re-derive")
    assert(again === (1L to 7L).toSet)
  }

  test("fixture: distinct keys build without serializing behind each " +
      "other (per-key locks, ADVICE r14)") {
    import spark.implicits._
    val gate = new java.util.concurrent.CountDownLatch(1)
    val slowEntered = new java.util.concurrent.CountDownLatch(1)
    val slow = new Thread(() => {
      Scratch.fixture(spark, "spec-fixture|slow-key") {
        slowEntered.countDown()
        gate.await(30, java.util.concurrent.TimeUnit.SECONDS)
        (1L to 3L).toDF("x")
      }
    })
    slow.start()
    assert(slowEntered.await(30, java.util.concurrent.TimeUnit.SECONDS))
    // while the slow key's derivation holds ITS lock, another key must
    // both build and serve — under the old global lock this deadlocks
    // (the slow build holds the registry for its whole derivation)
    val other = Scratch.fixture(spark, "spec-fixture|fast-key") {
      (1L to 4L).toDF("x")
    }.collect().map(_.getLong(0)).toSet
    assert(other === (1L to 4L).toSet)
    gate.countDown()
    slow.join(30000)
    assert(!slow.isAlive)
  }
}
