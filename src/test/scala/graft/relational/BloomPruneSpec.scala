package graft.relational

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class BloomPruneSpec extends SparkSpec {

  test("bloom prune has no false negatives: semiJoin equals plain semi join") {
    val urgent = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority") === "1-URGENT")
    val pruned = BloomPrune.semiJoin(
        Tables.lineitem(spark, sf0001), "l_orderkey", urgent, "o_orderkey",
        expectedItems = 10000L)
      .select("l_orderkey", "l_linenumber")
      .collect().map(_.mkString("|")).sorted
    val plain = Tables.lineitem(spark, sf0001)
      .join(urgent.select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber")
      .collect().map(_.mkString("|")).sorted
    assert(pruned.toSeq === plain.toSeq)
    assert(pruned.nonEmpty)
  }

  test("bloom filter alone passes every build key (false positives allowed)") {
    val build = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority") === "1-URGENT")
    val bloom = BloomPrune.buildBloom(build, col("o_orderkey"), 10000L)
    // every true key must pass its own sketch
    val missed = build
      .filter(!BloomPrune.mightContain(bloom, col("o_orderkey"))).count()
    assert(missed === 0L)
    // and the sketch must actually prune: most non-matching lineitems drop
    val li = Tables.lineitem(spark, sf0001)
    val kept = li.filter(BloomPrune.mightContain(bloom, col("l_orderkey"))).count()
    assert(kept < li.count(), "sketch pruned nothing")
  }
}
