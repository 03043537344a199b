package graft.store

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class BucketingSpec extends SparkSpec {

  test("co-bucketed tables join without exchange or sort") {
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sf0001), "li_bucketed", "l_orderkey", 4)
    Bucketing.writeBucketed(
      Tables.orders(spark, sf0001).withColumnRenamed("o_orderkey", "l_orderkey"),
      "ord_bucketed", "l_orderkey", 4)

    // tiny test tables would broadcast; disable it to surface the
    // co-located merge path the layout exists for (at real fact-fact scale
    // broadcast is off the table anyway)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${plan.take(500)}")
      assert(plan.contains("SortMergeJoin"))
      assert(plan.contains("Bucketed: true"), "scan did not use bucketing")
      // correctness unchanged vs plain join
      val plain = Tables.lineitem(spark, sf0001).join(
        Tables.orders(spark, sf0001),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }
}
