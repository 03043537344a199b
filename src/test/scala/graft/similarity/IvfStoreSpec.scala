package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ann_ivf_store: the gate proves store-backed == one-shot via the shared
  * oracle; this pins the PHYSICAL index claims — cell-partitioned layout
  * on disk, append batches never rewrite each other's files, and the
  * probe scan is partition-pruned to the probed cells.
  */
class IvfStoreSpec extends SparkSpec {

  private val target = s"${sys.props("java.io.tmpdir")}/graft_store/ivf_store_spec"

  private def run() = {
    val emb = graft.Tables.embeddings(spark, sf001)
    Similarity.annIvfStoreTopK(spark, emb,
      Seq(emb.filter(col("vec_id") % 2 === 0), emb.filter(col("vec_id") % 2 === 1)),
      target, queryVecIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10)
  }

  test("store-backed search equals the in-memory one-shot; index is cell-partitioned") {
    val got = run().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val oneShot = Similarity.annIvfTopK(
        graft.Tables.embeddings(spark, sf001),
        queryVecIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(got === oneShot)

    val fs = new org.apache.hadoop.fs.Path(target)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cellDirs = fs.listStatus(new org.apache.hadoop.fs.Path(target))
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("cell="))
    assert(cellDirs.length > 4, "index must spread over more cells than nProbe")
    // each batch appended its own files: some cell holds >= 2 files
    val multiFile = cellDirs.exists(d =>
      fs.listStatus(d.getPath).count(_.getPath.getName.endsWith(".parquet")) >= 2)
    assert(multiFile, "append batches must coexist inside a cell directory")
  }

  test("the probe scan is partition-pruned on cell (dynamic pruning in the plan)") {
    val df = run()
    val plan = df.queryExecution.executedPlan.toString
    // the index scan must carry a real partition filter on cell: the
    // static INSET (constraint propagation bounds cell to the centroid
    // ids) plus runtime DPP from the probe side
    assert(plan.contains("dynamicpruning"),
      plan.linesIterator.filter(_.contains("FileScan")).take(5).mkString("\n"))
    assert(plan.contains("PartitionFilters: [cell") ||
      plan.contains("PartitionFilters: [isnotnull(cell"),
      plan.linesIterator.filter(_.contains("PartitionFilters")).take(5).mkString("\n"))
  }
}
