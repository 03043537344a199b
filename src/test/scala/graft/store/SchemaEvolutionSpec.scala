package graft.store

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.StoreQueries

/** schema_evolution: the oracle proves merged-read == logical-union; this
  * pins the PHYSICAL claim the gate cannot see — the two generations
  * really are different parquet schemas on disk (the old files were never
  * rewritten), and the schema union surfaces NULL exactly on the v1 rows.
  */
class SchemaEvolutionSpec extends SparkSpec {

  test("generations keep distinct physical schemas; nulls land exactly on v1 rows") {
    val out = StoreQueries.schemaEvolution(spark, sf001)
    val rows = out.collect()
    assert(rows.nonEmpty)

    val target = s"${sys.props("java.io.tmpdir")}/graft_store/schema_evolution"
    val g1 = spark.read.parquet(s"$target/gen=1")
    val g2 = spark.read.parquet(s"$target/gen=2")
    assert(!g1.schema.fieldNames.contains("quality"),
      "adding the column must not rewrite the old generation's files")
    assert(g2.schema.fieldNames.contains("quality"))

    val g1Ids = g1.select("event_id").collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      val isV1 = g1Ids.contains(r.getLong(0))
      assert(r.isNullAt(4) === isV1,
        s"quality null iff the row predates the column (event ${r.getLong(0)})")
    }
    assert(rows.length === g1Ids.size + g2.count())
  }

  test("widening: narrow physical types persist on disk; the widened read is lossless") {
    import org.apache.spark.sql.types._
    val out = StoreQueries.schemaWidening(spark, sf001)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(out.schema("counter").dataType === LongType)
    assert(out.schema("ratio").dataType === DoubleType)

    // the physical claim: gen-1 files still carry INT32/FLOAT — widening
    // never rewrote them
    val target = s"${sys.props("java.io.tmpdir")}/graft_store/schema_widening"
    val g1 = spark.read.parquet(s"$target/gen=1")
    val g2 = spark.read.parquet(s"$target/gen=2")
    assert(g1.schema("counter").dataType === IntegerType)
    assert(g1.schema("ratio").dataType === FloatType)
    assert(g2.schema("counter").dataType === LongType)
    assert(g2.schema("ratio").dataType === DoubleType)

    // losslessness: the widened read equals the per-generation reads
    // upcast row-for-row
    val widened = rows.map(r =>
      (r.getLong(0), r.getLong(3), r.getDouble(4))).toSet
    val manual =
      g1.select(col("event_id"), col("counter").cast("long"),
          col("ratio").cast("double"))
        .unionAll(g2.select(col("event_id"), col("counter"), col("ratio")))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(widened === manual)
    // gen-2 values genuinely need the wide types
    assert(rows.exists(_.getLong(3) > Int.MaxValue.toLong))
  }

  test("rename: the old generation keeps the old physical name; mapping is read-side") {
    val out = StoreQueries.schemaRename(spark, sf001)
    assert(out.collect().nonEmpty)
    assert(out.schema.fieldNames.contains("amount"))
    val target = s"${sys.props("java.io.tmpdir")}/graft_store/schema_rename"
    val g1 = spark.read.parquet(s"$target/gen=1")
    assert(g1.schema.fieldNames.contains("amount_usd") &&
      !g1.schema.fieldNames.contains("amount"),
      "renaming must not rewrite the old generation's files")
    val g2 = spark.read.parquet(s"$target/gen=2")
    assert(g2.schema.fieldNames.contains("amount"))
  }

  test("time travel: as-of gen 2 hides gen 3 and lets gen 2 shadow gen 1") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.StoreQueries.storeTimeTravel(spark, sf001).collect()
    assert(out.nonEmpty)
    // nothing from the future commit
    assert(out.forall(_.getAs[Long]("src_gen") <= 2L))
    // users present in BOTH gen1 and gen2 must surface with src_gen 2
    val target = s"${sys.props("java.io.tmpdir")}/graft_store/store_time_travel"
    val g1 = spark.read.parquet(s"$target/gen=1")
      .select(col("user_id")).collect().map(_.getLong(0)).toSet
    val g2 = spark.read.parquet(s"$target/gen=2")
      .select(col("user_id")).collect().map(_.getLong(0)).toSet
    val both = g1 intersect g2
    assert(both.nonEmpty, "fixture has overlapping users across gens")
    out.filter(r => both.contains(r.getAs[Long]("user_id")))
      .foreach(r => assert(r.getAs[Long]("src_gen") === 2L))
    // gen-1-only users survive untouched
    val only1 = g1 -- g2
    assert(out.count(r => only1.contains(r.getAs[Long]("user_id"))) === only1.size)
  }
}
