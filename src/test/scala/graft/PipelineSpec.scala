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

  test("--full-refresh rebuilds from source, discarding drifted store state") {
    import org.apache.spark.sql.functions._
    val (wh, fresh) = (tmp(), tmp())
    PipelineRunner.runOnce(spark, sf0001, wh)
    // fabricate drift: a silver tick 100 days past anything the source
    // backs — an incremental run can never remove it (merges only upsert)
    val silverDir = s"$wh/stg_ticks"
    val fake = IncrementalStore.readTable(spark, silverDir)
      .orderBy(col("observed_at").desc).limit(1)
      .drop(IncrementalStore.PartitionCol)
      .withColumn("observed_at", col("observed_at") + expr("INTERVAL 100 DAYS"))
    val fakeTs = fake.first().getAs[java.sql.Timestamp]("observed_at")
    IncrementalStore.upsertByKey(fake, silverDir,
      tsCol = "observed_at", keyCols = Seq("observed_at"))
    PipelineRunner.runOnce(spark, sf0001, wh) // incremental: drift survives
    assert(IncrementalStore.readTable(spark, silverDir)
      .filter(col("observed_at") === fakeTs).count() === 1L)
    // dbt --full-refresh semantics: drop and rebuild from source alone
    PipelineRunner.runOnce(spark, sf0001, wh, fullRefresh = true)
    assert(IncrementalStore.readTable(spark, silverDir)
      .filter(col("observed_at") === fakeTs).count() === 0L)
    PipelineRunner.runOnce(spark, sf0001, fresh)
    assert(goldRows(wh) === goldRows(fresh))
  }
}
