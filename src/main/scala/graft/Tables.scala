package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver testdata tables (`/root/testdata/sf*`).
  *
  * All readers are pure `(spark, sfDir) => DataFrame` and normalize types so
  * downstream operators and the DuckDB oracle agree:
  *  - `events.ts` is parquet TIMESTAMP(NANOS), which Spark cannot represent
  *    (µs-native). We read it as a long (`spark.sql.legacy.parquet.nanosAsLong`)
  *    and floor-divide to µs — identical to DuckDB's `CAST(ts AS TIMESTAMP)`
  *    ns→µs truncation for positive epochs.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events with `ts` converted ns→µs TimestampType. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Runtime-settable legacy conf; also set in Verify/Bench/test sessions.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** events restricted to one UTC day, with the range predicate applied to
    * the RAW nanos long BEFORE the ns→µs conversion — a predicate on the
    * converted column is a DataFilter evaluated after the read, but a plain
    * long comparison on the stored column reaches parquet as a pushed
    * filter and prunes row groups by their ts min/max stats. On a
    * time-partitioned 100 TB events table this is the difference between
    * scanning one day and scanning everything.
    */
  def eventsDay(spark: SparkSession, dir: String, day: java.time.LocalDate): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val startNs = day.atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000000L
    val endNs = startNs + 86400L * 1000000000L
    read(spark, dir, "events")
      .filter(col("ts") >= startNs && col("ts") < endNs)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** events strictly before a UTC day, raw-nanos predicate for pushdown —
    * same rationale as [[eventsDay]].
    */
  def eventsBefore(spark: SparkSession, dir: String, day: java.time.LocalDate): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val startNs = day.atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000000L
    read(spark, dir, "events")
      .filter(col("ts") < startNs)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
}
