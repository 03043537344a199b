package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.store.IncrementalStore

/** S9 materialization modes: staging-as-view must produce the identical
  * gold table as the persisted-staging path (dbt_project.yml:38-48 —
  * staging=view, marts=table).
  */
class PipelineSpec extends SparkSpec {

  private def tmp(): String = Files.createTempDirectory("graft_pl").toString

  private def goldRows(wh: String): Seq[String] = {
    val df = IncrementalStore.readTable(spark, s"$wh/fct_timeframes")
    val cols = df.columns.filterNot(Seq("dbt_updated_at", "p_date").contains).sorted
    df.select(cols.map(col).toIndexedSeq: _*)
      .collect().map(_.mkString("|")).sorted.toSeq
  }

  test("--staging-view gold equals table-materialized gold") {
    val (whTable, whView) = (tmp(), tmp())
    PipelineRunner.runOnce(spark, sf0001, whTable)
    PipelineRunner.runOnce(spark, sf0001, whView, stagingView = true)
    val (a, b) = (goldRows(whTable), goldRows(whView))
    assert(a === b)
    assert(a.nonEmpty)
    // and view mode wrote no staging table
    assert(!new java.io.File(s"$whView/stg_ticks").exists())
  }
}
