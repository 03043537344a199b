package graft.relational

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** GlobalIndex: the two-phase distributed row numbering must be exactly
  * the single-partition `row_number() OVER (ORDER BY …)` — for any
  * partition count, including degenerate ones — and its plan must never
  * contain the single-task global sort the naive form plans.
  */
class GlobalIndexSpec extends SparkSpec {

  private def naive(n: Int) = {
    val orders = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_orderdate"))
    orders.withColumn("idx",
      row_number().over(
        Window.orderBy(col("o_orderdate"), col("o_orderkey"))).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("idx")).toMap
  }

  test("two-phase index equals the naive global row_number (8 partitions)") {
    val got = GlobalIndex.withGlobalIndex(
        Tables.orders(spark, sf0001).select(col("o_orderkey"), col("o_orderdate")),
        Seq("o_orderdate", "o_orderkey"), numPartitions = 8)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("idx")).toMap
    assert(got === naive(8))
  }

  test("partition count does not change the index (1 vs 8 vs 32 vs 64 vs derived)") {
    val orders = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_orderdate"))
    def run(n: Int) = GlobalIndex.withGlobalIndex(
        orders, Seq("o_orderdate", "o_orderkey"), numPartitions = n)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("idx")).toMap
    val base = run(1)
    assert(base === run(8))
    assert(base === run(32))
    assert(base === run(64))
    // the default derives from defaultParallelism — same index either way
    assert(base === run(0))
  }

  test("index is a dense 1..N permutation") {
    val idxs = GlobalIndex.withGlobalIndex(
        Tables.orders(spark, sf0001).select(col("o_orderkey"), col("o_orderdate")),
        Seq("o_orderdate", "o_orderkey"))
      .select(col("idx")).collect().map(_.getLong(0)).sorted
    assert(idxs.head === 1L)
    assert(idxs.last === idxs.length.toLong)
    assert(idxs.distinct.length === idxs.length)
  }

  test("the local-number window partitions by partition id, never empty (plan check)") {
    // the whole point: no `Window [...] ORDER BY` with an EMPTY partition
    // spec over the full relation — that is the single-task funnel
    val plan = GlobalIndex.withGlobalIndex(
        Tables.orders(spark, sf0001).select(col("o_orderkey"), col("o_orderdate")),
        Seq("o_orderdate", "o_orderkey"))
      .queryExecution.executedPlan.toString
    val windowLines = plan.linesIterator.filter(_.contains("Window")).toSeq
    // two windows exist: the per-partition local one (partitioned by __pid)
    // and the offsets prefix-sum (over <=numPartitions count rows). The
    // corpus-sized one must carry the __pid partition spec.
    assert(windowLines.exists(_.contains("__pid")), plan)
  }

  private def naivePrefix = {
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("q"))
    li.withColumn("cum",
        sum(col("q")).over(
          Window.orderBy(col("l_orderkey"), col("l_linenumber"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getAs[Long]("cum")).toMap
  }

  test("withPrefixSum equals the naive global running sum, for any partition count") {
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("q"))
    def run(n: Int) = GlobalIndex.withPrefixSum(
        li, Seq("l_orderkey", "l_linenumber"), "q", numPartitions = n)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getAs[Long]("cum")).toMap
    val expect = naivePrefix
    assert(run(1) === expect)
    assert(run(8) === expect)
    assert(run(64) === expect)
    assert(run(0) === expect)
  }

  test("withPrefixSum's corpus-sized window is partitioned, never the global funnel") {
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("q"))
    val plan = GlobalIndex.withPrefixSum(li, Seq("l_orderkey", "l_linenumber"), "q")
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("Window") && l.contains("__pid")),
      plan)
  }
}
