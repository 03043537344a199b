package graft.relational

import java.sql.Timestamp

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("backward as-of: latest right row at or before left ts, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, ts(100), "a"), // before any right row -> null
      (2L, ts(200), "a"), // exactly at right ts 200 -> inclusive match
      (3L, ts(250), "a"), // between 200 and 300 -> 200
      (4L, ts(350), "a"), // after 300 -> 300
      (5L, ts(250), "b")  // other key -> b's own 240
    ).toDF("id", "t", "k")
    val right = Seq(
      (ts(200), "a", 20.0),
      (ts(300), "a", 30.0),
      (ts(240), "b", 24.0)
    ).toDF("rt", "k", "v")

    val out = AsOfJoin.backward(left, right, "t", "rt", Seq("k"), Seq("v"))
      .orderBy("id").collect()

    assert(out.map(r => r.getLong(0) -> Option(r.get(3))).toSeq === Seq(
      1L -> None, 2L -> Some(20.0), 3L -> Some(20.0),
      4L -> Some(30.0), 5L -> Some(24.0)))
  }

  test("forward: nearest STRICT successor per key; equal timestamps excluded") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val left = Seq(
      (1L, ts(100), "a"), // successor 200
      (2L, ts(200), "a"), // 200 itself must NOT match (strict) -> 300
      (3L, ts(301), "a"), // nothing after -> null
      (4L, ts(100), "b")  // successor 240
    ).toDF("id", "t", "k")
    val right = Seq(
      (ts(200), "a"), (ts(300), "a"), (ts(240), "b")
    ).toDF("rt", "k")
    val out = AsOfJoin.forwardWithTs(
        left, right, "t", "rt", Seq("k"), Seq.empty, "next_t")
      .orderBy("id").collect()
    def sec(x: Any): Option[Long] =
      Option(x).map(_.asInstanceOf[java.sql.Timestamp].getTime / 1000L)
    assert(out.map(r => r.getLong(0) -> sec(r.get(3))).toSeq === Seq(
      1L -> Some(200L), 2L -> Some(300L), 3L -> None, 4L -> Some(240L)))
  }
}
