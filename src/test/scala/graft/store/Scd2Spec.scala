package graft.store

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SCD2 snapshot invariants beyond the oracle's two-batch history: re-apply
  * idempotence, hard-delete pass-through, and the one-current-row-per-key
  * contract.
  */
class Scd2Spec extends SparkSpec {

  private val keys = Seq("k")
  private val track = Seq("v")
  private def t(n: Long) = new Timestamp(n * 86400000L)

  private def src(rows: (String, Double)*) = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  test("re-applying an identical batch is a no-op") {
    val b = src("a" -> 1.0, "b" -> 2.0)
    val s1 = Scd2.snapshot(None, b, keys, track, t(0))
    val s2 = Scd2.snapshot(Some(s1), b, keys, track, t(1))
    val rows = s2.collect().map(_.mkString("|")).sorted
    assert(rows === s1.collect().map(_.mkString("|")).sorted)
  }

  test("passenger columns (non-key, non-tracked) come from the batch on opened rows") {
    import spark.implicits._
    val b1 = Seq(("a", 1.0, "sys1"), ("b", 2.0, "sys1")).toDF("k", "v", "src")
    val b2 = Seq(("a", 9.0, "sys2"), ("c", 3.0, "sys2")).toDF("k", "v", "src")
    val s1 = Scd2.snapshot(None, b1, keys, track, t(0))
    val s2 = Scd2.snapshot(Some(s1), b2, keys, track, t(1))
    val aCur = s2.filter(col("k") === "a" && col("is_current")).collect().head
    assert(aCur.getAs[String]("src") === "sys2") // new version = full new source row
    val aOld = s2.filter(col("k") === "a" && !col("is_current")).collect().head
    assert(aOld.getAs[String]("src") === "sys1") // closed version keeps its own
    val cNew = s2.filter(col("k") === "c").collect().head
    assert(cNew.getAs[String]("src") === "sys2") // brand-new key: never null
  }

  test("change closes the old version and opens a new current one") {
    val s1 = Scd2.snapshot(None, src("a" -> 1.0, "b" -> 2.0), keys, track, t(0))
    val s2 = Scd2.snapshot(Some(s1), src("a" -> 9.0, "c" -> 3.0), keys, track, t(1))
    val a = s2.filter(col("k") === "a").orderBy(col("valid_from")).collect()
    assert(a.length === 2)
    assert(a(0).getAs[Double]("v") === 1.0 && !a(0).getAs[Boolean]("is_current")
      && a(0).getAs[Timestamp]("valid_to") === t(1))
    assert(a(1).getAs[Double]("v") === 9.0 && a(1).getAs[Boolean]("is_current")
      && a(1).isNullAt(a(1).fieldIndex("valid_to")))
    // deleted key b stays current (dbt default); new key c opens at t1
    val b = s2.filter(col("k") === "b").collect()
    assert(b.length === 1 && b(0).getAs[Boolean]("is_current"))
    val c = s2.filter(col("k") === "c").collect()
    assert(c.length === 1 && c(0).getAs[Boolean]("is_current")
      && c(0).getAs[Timestamp]("valid_from") === t(1))
    // exactly one current row per key, always
    val cur = s2.filter(col("is_current")).groupBy(col("k")).count().collect()
    assert(cur.forall(_.getLong(1) === 1L))
  }

  test("duplicate keys in a batch fail fast (dbt snapshot uniqueness contract)") {
    val dup = src("a" -> 1.0, "a" -> 2.0, "b" -> 3.0)
    val e = intercept[IllegalArgumentException] {
      Scd2.snapshot(None, dup, keys, track, t(0))
    }
    assert(e.getMessage.contains("duplicate key"))
    // and against an existing snapshot too — the join would fan out
    val s1 = Scd2.snapshot(None, src("a" -> 1.0), keys, track, t(0))
    intercept[IllegalArgumentException] {
      Scd2.snapshot(Some(s1), dup, keys, track, t(1))
    }
  }
}
