package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** LexMinLong (r17): the hash-aggregable replacement for
  * `min_by(k2, struct(k1, k2))`. The oracle proves the four call sites'
  * values; this pins (a) exact equivalence with the built-in on adversarial
  * synthetic data — ties in k1, negative keys, NaN ordering, singleton and
  * empty groups, cross-partition merge — and (b) the PLAN claim: a
  * HashAggregate with a partial phase and NO sort, which is the entire
  * point of the aggregate (the struct-ordered built-in plans as
  * Sort + SortAggregate over the full input stream).
  */
class LexMinAggregateSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def syntheticRows(n: Int): org.apache.spark.sql.DataFrame = {
    // deterministic pseudo-random rows with FEW distinct (g, k1) pairs so
    // k1 ties (resolved by k2) are common, negative k2 included
    val rows = (0 until n).map { i =>
      val g = i % 7
      val k1 = ((i * 2654435761L) % 5).toDouble
      val k2 = ((i * 40503L) % 101) - 50L
      org.apache.spark.sql.Row(g.toLong, k1, k2)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("g",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("k1",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("k2",
        org.apache.spark.sql.types.LongType)))
    spark.createDataFrame(rows.asJava, schema).repartition(5)
  }

  test("equals min_by(k2, struct(k1, k2)) on tie-heavy multi-partition data") {
    val df = syntheticRows(5000)
    val viaBuiltin = df.groupBy("g")
      .agg(min_by(col("k2"), struct(col("k1"), col("k2"))).as("m"))
      .orderBy("g").collect().map(_.toSeq).toSeq
    val viaLex = df.groupBy("g")
      .agg(LexMinAggregate.argMinLong(col("k1"), col("k2")).as("m"))
      .orderBy("g").collect().map(_.toSeq).toSeq
    assert(viaLex === viaBuiltin)
  }

  test("argmax form: -k1 reproduces max_by over struct(k1, -k2 tiebreak)") {
    val df = syntheticRows(3000)
    val viaBuiltin = df.groupBy("g")
      .agg(max_by(col("k2"), struct(col("k1"), (-col("k2")).as("nl"))).as("m"))
      .orderBy("g").collect().map(_.toSeq).toSeq
    val viaLex = df.groupBy("g")
      .agg(LexMinAggregate.argMinLong(-col("k1"), col("k2")).as("m"))
      .orderBy("g").collect().map(_.toSeq).toSeq
    assert(viaLex === viaBuiltin)
  }

  test("NaN k1 orders largest (matches struct ordering); singleton groups; empty -> null") {
    val sq = spark
    import sq.implicits._
    val rows = Seq(
      (1L, Double.NaN, 5L), (1L, 2.0, 9L),   // NaN loses to any number
      (2L, Double.NaN, 7L),                  // NaN-only group still answers
      (3L, 0.5, -4L)                         // singleton
    ).toDF("g", "k1", "k2")
    val got = rows.groupBy("g")
      .agg(LexMinAggregate.argMinLong(col("k1"), col("k2")).as("m"))
      .orderBy("g").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 9L), (2L, 7L), (3L, -4L)))
    val empty = rows.filter(col("g") > 100).agg(
      LexMinAggregate.argMinLong(col("k1"), col("k2")).as("m")).collect()
    assert(empty.head.isNullAt(0))
  }

  test("plan: HashAggregate partial+final, no Sort (the struct min_by falls back to SortAggregate)") {
    val df = syntheticRows(1000)
    val lexPlan = df.groupBy("g")
      .agg(LexMinAggregate.argMinLong(col("k1"), col("k2")).as("m"))
      .queryExecution.executedPlan.toString
    assert(lexPlan.contains("HashAggregate") && !lexPlan.contains("SortAggregate"),
      lexPlan.linesIterator.take(10).mkString("\n"))
    assert(lexPlan.contains("partial_lexminlong"),
      "map-side partial argmin missing:\n" +
        lexPlan.linesIterator.take(10).mkString("\n"))
    val builtinPlan = df.groupBy("g")
      .agg(min_by(col("k2"), struct(col("k1"), col("k2"))).as("m"))
      .queryExecution.executedPlan.toString
    assert(builtinPlan.contains("SortAggregate"),
      "baseline claim broken: the struct-ordered built-in no longer sorts — " +
        "revisit whether LexMinLong is still needed:\n" + builtinPlan)
  }
}
