package graft

import java.nio.file.Files
import java.time.Instant

import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.types.TimestampType

/** The LongType arm of Tables' dual-schema contract, exercised end-to-end:
  * WRITE a genuine parquet TIMESTAMP(NANOS) file (parquet-java example API —
  * Spark itself cannot produce one, which is exactly why this layout needs a
  * synthetic writer) and round-trip it through `Tables.events` /
  * `Tables.eventsDay` / `Tables.eventsBefore`. Until this spec, the ns-long
  * dispatch arm was exercised by zero tests — writer-side drift to the ns
  * layout would have surfaced as a red ROUND, not a red test (the r7 outage
  * mode, inverted).
  */
class TablesNanosSpec extends SparkSpec {

  private def writeNanosEvents(dir: String, rows: Seq[(Long, Long)]): Unit = {
    val schema = Types.buildMessage()
      .required(PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(
          true, LogicalTypeAnnotation.TimeUnit.NANOS))
        .named("ts")
      .required(PrimitiveTypeName.INT64).named("event_id")
      .named("events")
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$dir/events.parquet"))
      .withType(schema)
      .build()
    val gf = new SimpleGroupFactory(schema)
    try rows.foreach { case (ns, id) =>
      val g = gf.newGroup()
      g.append("ts", ns)
      g.append("event_id", id)
      writer.write(g)
    } finally writer.close()
  }

  private def ns(iso: String): Long = {
    val i = Instant.parse(iso)
    i.getEpochSecond * 1000000000L + i.getNano
  }

  test("TIMESTAMP(NANOS) events round-trip through the ns-long dispatch arm") {
    val dir = Files.createTempDirectory("graft_nanos").toString
    writeNanosEvents(dir, Seq(
      (ns("2024-01-15T00:00:00.123456789Z"), 1L), // sub-µs residue truncates
      (ns("2024-01-15T23:59:59.999999999Z"), 2L), // last instant of the day
      (ns("2024-01-16T00:00:00.000000001Z"), 3L)  // first instant of the next
    ))

    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType === TimestampType)
    val got = ev.orderBy("event_id")
      .collect().map(r => r.getTimestamp(0).toInstant).toSeq
    assert(got === Seq(
      Instant.parse("2024-01-15T00:00:00.123456Z"),
      Instant.parse("2024-01-15T23:59:59.999999Z"),
      Instant.parse("2024-01-16T00:00:00Z"))) // ns 1 floors away

    // raw-column pushed predicates prune on the ns long correctly at both
    // day boundaries
    val day = java.time.LocalDate.parse("2024-01-15")
    assert(Tables.eventsDay(spark, dir, day)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    assert(Tables.eventsBefore(spark, dir, day.plusDays(1))
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
  }
}
