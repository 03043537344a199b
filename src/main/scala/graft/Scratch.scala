package graft

import org.apache.spark.sql.DataFrame

/** Materialize a derived relation to per-invocation scratch parquet and
  * read it back: one eager compute + cheap columnar scans per downstream
  * reference, with ZERO block-manager involvement (`persist` in long
  * constrained-heap JVMs showed multi-second nondeterministic eviction
  * storms). This is the literal 100 TB pattern — write a derived table
  * once, read it per consumer job — applied at bench scale. The write is
  * part of the calling query's execution, so benchmarks still pay the full
  * derivation on every run; only intra-query recompute multiplication goes
  * away. Scratch dirs are temp dirs, removed on JVM exit.
  */
object Scratch {

  // ONE shutdown hook draining a shared dir list — a hook per table() call
  // would spawn a JVM thread per scratch table at exit (a long bench run
  // creates thousands of scratch tables in one JVM)
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]
  private lazy val hook: Unit = {
    sys.addShutdownHook {
      import scala.jdk.CollectionConverters._
      dirs.iterator().asScala.foreach { dir =>
        if (java.nio.file.Files.exists(dir))
          java.nio.file.Files.walk(dir).iterator().asScala.toSeq
            .sortBy(-_.getNameCount)
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
    ()
  }

  def table(df: DataFrame, tag: String): DataFrame = {
    val spark = df.sparkSession
    val dir = java.nio.file.Files.createTempDirectory(s"graft-$tag-")
    hook
    dirs.add(dir)
    val path = dir.resolve("data").toString
    df.write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }
}
