package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for 100 TB-class keyed operations.
  *
  * AQE's skew-join splitting (enabled in GraftSession) handles join-side
  * skew at runtime; these helpers cover the aggregation-side hot-key case
  * AQE does not: a handful of keys holding most rows make one reducer the
  * straggler. Two-phase salted aggregation spreads each key over `buckets`
  * partial groups, then merges — classic map-side salting, expressed
  * declaratively so Catalyst still plans hash aggregates with partial
  * combine on both phases.
  */
object Skew {

  /** Deterministic salt in [0, buckets) derived from stable row content
    * (never rand(): re-computation under task retry must agree).
    */
  def salt(saltSource: Column, buckets: Int): Column =
    pmod(hash(saltSource), lit(buckets))

  /** Two-phase salted count: equivalent to groupBy(keys).count() but the
    * first shuffle spreads every key over `buckets` groups.
    */
  def saltedCount(df: DataFrame, keys: Seq[Column], saltSource: Column,
      buckets: Int = 16): DataFrame = {
    val partial = df
      .groupBy(keys :+ salt(saltSource, buckets).as("__salt"): _*)
      .agg(count(lit(1)).as("__partial"))
    partial.groupBy(keys: _*).agg(sum("__partial").as("n"))
  }

  /** Two-phase salted sum over a double expression, exact via DECIMAL
    * partials (association-independent, so salting cannot change the
    * result by a single bit).
    */
  def saltedSumExact(df: DataFrame, keys: Seq[Column], value: Column,
      saltSource: Column, buckets: Int = 16): DataFrame = {
    val dec = value.cast(org.apache.spark.sql.types.DecimalType(30, 10))
    val partial = df
      .groupBy(keys :+ salt(saltSource, buckets).as("__salt"): _*)
      .agg(sum(dec).as("__partial"))
    partial.groupBy(keys: _*)
      .agg(sum("__partial").cast("double").as("sum_value"))
  }

  /** Salted broadcast-side replication join for a skewed big side against a
    * small dimension: the big side gets a content-derived salt, the small
    * side is exploded `buckets`× — the join key becomes (key, salt), so one
    * hot key spreads across `buckets` tasks. Only sensible when `small` is
    * broadcastable; for big-big skew use AQE skew join.
    */
  def saltedJoinSmall(big: DataFrame, small: DataFrame, key: String,
      saltSource: Column, buckets: Int = 16): DataFrame = {
    val bigSalted = big.withColumn("__salt", salt(saltSource, buckets))
    val smallExploded = small.withColumn(
      "__salt", explode(sequence(lit(0), lit(buckets - 1))))
    bigSalted.join(broadcast(smallExploded), Seq(key, "__salt"))
      .drop("__salt")
  }
}
