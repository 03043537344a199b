package graft.relational

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Explicit runtime bloom-filter pruning for selective joins — the manual
  * form of Catalyst's InjectRuntimeFilter, exposed as an operator so a
  * pipeline can prune a huge probe side BEFORE the shuffle whenever the
  * build side is selective but too large (or too late) for broadcast.
  *
  * Shape at 100 TB: the build side aggregates into one bloom sketch
  * (BloomFilterAggregate — distributed, map-side combined; the driver
  * receives only the sketch bytes, never rows), the sketch ships to every
  * probe task as a literal, and `might_contain(xxhash64(key))` filters
  * probe rows at scan speed. Blooms have NO false negatives, so
  * prune + exact-confirm ≡ exact semi join; false positives only cost
  * shuffle bytes (rate set by `expectedItems`). The confirm join then
  * shuffles the survivors — pct-of-probe instead of all of it.
  */
object BloomPrune {

  /** Distributed bloom build over `key`; driver-side result is the sketch
    * bytes only (size O(expectedItems · bits/item), independent of rows).
    */
  def buildBloom(build: DataFrame, key: Column, expectedItems: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(GraftSqlBridge.expression(key))),
      Literal(expectedItems))
    build
      .select(GraftSqlBridge.column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]]("bf")
  }

  /** Probe-side predicate: true iff `key` MIGHT be in the sketch. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftSqlBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(GraftSqlBridge.expression(key)))))

  /** Exact semi join with bloom pre-pruning: bloom-filter the probe side,
    * then confirm with a real LEFT SEMI join (kills false positives).
    * Result is EXACTLY `probe SEMI JOIN build` — the sketch only reduces
    * what reaches the shuffle.
    */
  def semiJoin(probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String,
      expectedItems: Long = 1000000L): DataFrame = {
    val bloom = buildBloom(build, col(buildKey), expectedItems)
    // build key aliased to a reserved name so probeKey == buildKey is not
    // an ambiguous-column AnalysisException (ADVICE r4)
    val buildKeys = build.select(col(buildKey).as("__bloom_bk")).distinct()
    probe
      .filter(mightContain(bloom, col(probeKey)))
      .join(buildKeys, col(probeKey) === col("__bloom_bk"), "left_semi")
  }
}
