package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{SparkSpec, Tables}

/** Stream-stream attribution join semantics: replaying the sources across
  * MANY micro-batches (maxFilesPerTrigger=1 over time-unordered files)
  * must emit exactly the batch join's pairs — nothing duplicated across
  * batches, nothing lost, with a lateness horizon generous enough that no
  * state is evicted mid-replay (the gate query's single-batch run covers
  * the tight-lateness case).
  */
class StreamJoinSpec extends SparkSpec {

  private val pSchema = StructType(Seq(
    StructField("purchase_id", LongType), StructField("p_ts", TimestampType),
    StructField("user_id", LongType)))
  private val cSchema = StructType(Seq(
    StructField("click_id", LongType), StructField("c_ts", TimestampType),
    StructField("c_user_id", LongType)))

  test("multi-batch replay equals the batch join, each pair exactly once") {
    val base = Files.createTempDirectory("graft_sjoin").toString
    val ev = Tables.events(spark, sf001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"), col("user_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("c_ts"),
        col("user_id").as("c_user_id"))
    // 3 time-unordered files per side → 3+ micro-batches at 1 file/trigger
    purchases.repartition(3).write.parquet(s"$base/p")
    clicks.repartition(3).write.parquet(s"$base/c")

    val expected = graft.streaming.StreamJoin.attribution(purchases, clicks)
      .collect().map(_.mkString("|")).sorted.toSeq // batch execution of the same plan

    val q = StreamJoin.attribution(
        spark.readStream.schema(pSchema).option("maxFilesPerTrigger", 1).parquet(s"$base/p"),
        spark.readStream.schema(cSchema).option("maxFilesPerTrigger", 1).parquet(s"$base/c"),
        lateness = "60 days") // no eviction during the unordered replay
      .writeStream.format("memory").queryName("sjoin_spec")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(300000), "stream did not finish")
    val got = spark.table("sjoin_spec")
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(got === expected)
    assert(got.nonEmpty)
  }
}
