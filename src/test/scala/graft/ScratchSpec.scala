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
}
