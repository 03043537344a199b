package graft.quality

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.forex.ForexPipeline

class ChecksSpec extends SparkSpec {

  test("gold model passes the reference's schema-test suite in one pass") {
    val gold = ForexPipeline.goldFrom(spark, sf0001)
    val rep = Checks.report(gold, Checks.goldChecks)
    val bad = rep.filter(col("violations") > 0).collect()
    assert(bad.isEmpty, bad.mkString(","))
    assert(rep.count() === 5)
    Checks.enforce(gold, Checks.goldChecks) // must not throw
  }

  test("checks detect planted violations") {
    import spark.implicits._
    val df = Seq(
      ("a", "5m", 1.0, 2.0),
      ("a", "5m", 1.0, 2.0),     // dup id
      ("b", "99x", 3.0, 1.0),    // bad timeframe + high<low bound breach
      (null.asInstanceOf[String], "1h", 1.0, 2.0) // null id
    ).toDF("unique_id", "timeframe", "low_price", "high_price")
      .withColumn("open_price", col("low_price"))
      .withColumn("close_price", col("high_price"))
      .withColumn("candle_start", current_timestamp())
    val rep = Checks.report(df, Checks.goldChecks)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep("unique(unique_id)") >= 1L)
    assert(rep("not_null(unique_id)") === 1L)
    assert(rep("accepted_values(timeframe)") === 1L)
    assert(rep("candle_bounds") === 1L)
    intercept[IllegalStateException] {
      Checks.enforce(df, Checks.goldChecks)
    }
  }
}
