package graft.ingest

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IngestSpec extends SparkSpec {

  test("fromApiJson parses the API response shape into typed ticks") {
    val dir = Files.createTempDirectory("graft_api").toString
    val json =
      """{"meta":{"symbol":"EUR/USD","interval":"5min"},
        |"values":[
        | {"datetime":"2024-01-01 00:00:00","open":"1.1040","high":"1.1050","low":"1.1030","close":"1.1045"},
        | {"datetime":"2024-01-01 00:05:00","open":"1.1045","high":"1.1060","low":"1.1040","close":"1.1055"}],
        |"status":"ok"}""".stripMargin.replace("\n", "")
    Files.writeString(java.nio.file.Path.of(s"$dir/resp.json"), json)
    val ticks = Ingest.fromApiJson(spark, dir)
    assert(ticks.count() === 2)
    val r = ticks.orderBy("datetime").first()
    assert(r.getAs[Double]("open") === 1.1040)
    assert(r.getAs[String]("symbol") === "EUR/USD")
    assert(r.getAs[java.sql.Timestamp]("datetime").toString.startsWith("2024-01-01 00:00:00"))
  }

  test("fetchDays: one request per day, each capped at outputsize (newest rows win)") {
    import spark.implicits._
    val d1 = java.time.LocalDate.of(2024, 1, 1)
    val d2 = java.time.LocalDate.of(2024, 1, 2)
    def ticksFor(d: java.time.LocalDate, n: Int) = {
      val base = java.sql.Timestamp.valueOf(d.atStartOfDay())
      (0 until n).map(i => (new Timestamp(base.getTime + i * 60000L), 1.0 + i))
        .toDF("datetime", "close")
    }
    // day 1 exceeds the cap, day 2 does not
    val fetched = Ingest.fetchDays(Seq(d1, d2),
      d => ticksFor(d, if (d == d1) 1000 else 300), outputsize = 800)
    val byDay = fetched
      .withColumn("d", to_date(col("datetime")))
      .groupBy("d").count().collect()
      .map(r => r.getAs[java.sql.Date]("d").toString -> r.getAs[Long]("count")).toMap
    assert(byDay === Map("2024-01-01" -> 800L, "2024-01-02" -> 300L))
    // server truncation keeps the NEWEST bars: minutes 200..999 survive
    val day1Min = fetched.filter(to_date(col("datetime")) === "2024-01-01")
      .agg(min(col("datetime"))).first().getTimestamp(0)
    assert(day1Min.toString.startsWith("2024-01-01 03:20:00")) // minute 200
  }

  test("validateAndPrepare dedups, sorts, stamps; writeBronze lays out year=/month=") {
    import spark.implicits._
    val t0 = new Timestamp(1704067200000L) // 2024-01-01 00:00:00 UTC
    val t1 = new Timestamp(1706745600000L) // 2024-02-01
    val raw = Seq(
      (t1, 1.1, 1.2, 1.0, 1.15),
      (t0, 1.0, 1.1, 0.9, 1.05),
      (t0, 1.0, 1.1, 0.9, 1.05) // exact dup
    ).toDF("datetime", "open", "high", "low", "close")

    val prepared = Ingest.validateAndPrepare(raw, "EUR/USD", new Timestamp(0L))
    assert(prepared.count() === 2)
    assert(prepared.select("symbol").distinct().first().getString(0) === "EUR/USD")

    val dir = Files.createTempDirectory("graft_bronze").toString
    Ingest.writeBronze(prepared, dir)
    val dirs = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("year=")).toSet
    assert(dirs === Set("year=2024"))
    val months = new java.io.File(s"$dir/year=2024").listFiles().map(_.getName).toSet
    assert(months === Set("month=1", "month=2"))

    // hive partition discovery reconstructs the partition columns on read
    val back = spark.read.parquet(dir)
    assert(back.count() === 2)
    assert(back.select("year", "month").distinct().count() === 2)
    assert(back.filter(col("month") === 1).count() === 1)
  }
}
