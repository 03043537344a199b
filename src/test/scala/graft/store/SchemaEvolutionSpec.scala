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
}
