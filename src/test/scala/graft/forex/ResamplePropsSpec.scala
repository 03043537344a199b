package graft.forex

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** ScalaCheck-generated properties of the bucket function (SURVEY §5 item 3),
  * checked through the same Column expression the pipeline uses (evaluated
  * via a local DataFrame, not a reimplementation).
  */
class ResamplePropsSpec extends SparkSpec {

  import org.apache.spark.sql.functions._

  // 2020..2030 epoch-µs range, µs precision; fixed seed for determinism
  private val tsGen: Gen[Long] =
    Gen.choose(1577836800000000L, 1893456000000000L)

  private def sample(n: Int): Seq[Long] =
    Gen.listOfN(n, tsGen).apply(Gen.Parameters.default, Seed(42L)).get

  private def bucketOf(usList: Seq[Long], tf: Resample.Timeframe): Seq[Long] = {
    import spark.implicits._
    usList.toDF("us")
      .select(unix_micros(Resample.bucket(timestamp_micros(col("us")), tf)).as("b"))
      .collect().map(_.getLong(0)).toSeq
  }

  for (tf <- Resample.timeframes) {
    test(s"bucket(${tf.name}): idempotent, aligned, floors within width") {
      val usList = sample(200)
      val buckets = bucketOf(usList, tf)
      val again = bucketOf(buckets, tf)
      usList.lazyZip(buckets).lazyZip(again).foreach { (t, b, b2) =>
        assert(b2 === b, s"not idempotent at $t")
        assert(b <= t && t - b < tf.widthUs, s"not a floor at $t: $b")
        assert((b + tf.shiftUs) % tf.widthUs === 0, s"off-grid at $t: $b")
      }
    }
  }

  test("fanout produces exactly 7 tags per input row") {
    import spark.implicits._
    val silver = Seq(
      (new Timestamp(1700000000000L), 1.0, 1.0, 1.0, 1.0),
      (new Timestamp(1700000300000L), 2.0, 2.0, 2.0, 2.0))
      .toDF("observed_at", "open_price", "high_price", "low_price", "close_price")
    val fanned = Resample.fanout(silver)
    assert(fanned.count() === 14)
    assert(fanned.select("timeframe").distinct().count() === 7)
  }
}
