package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.Multimodal

/** GRFT container corners the oracle gate can't isolate: the parser must
  * be a real parser — reject corrupt magic and unknown kind codes — and
  * the packed roundtrip must slice the body at the exact header boundary.
  */
class MultimodalSpec extends SparkSpec {

  test("pack → decode roundtrip: body digest equals md5 of the source text") {
    val docs = graft.Tables.documents(spark, sf0001).limit(50)
    val decoded = Multimodal.decodePacked(Multimodal.packMedia(docs))
      .toDF().select(col("media_id"), col("body_md5"))
    val expect = docs.select(col("doc_id").as("media_id"),
      md5(encode(col("text"), "UTF-8")).as("expect_md5"))
    val joined = decoded.join(expect, "media_id")
    assert(joined.count() === 50L)
    assert(joined.filter(col("body_md5") =!= col("expect_md5")).count() === 0L,
      "body slice starts exactly at header end")
  }

  test("decode rejects a payload with corrupt magic") {
    import spark.implicits._
    val bogus = Seq(
      Multimodal.PackedMedia(1L, Array.fill[Byte](32)(0x41))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodePacked(bogus).collect()
    }
    assert(e.getMessage.contains("GRFT") ||
      Option(e.getCause).exists(_.getMessage.contains("GRFT")))
  }

  test("frame slices tile the body exactly (contiguous, lengths sum to blen)") {
    val docs = graft.Tables.documents(spark, sf0001)
    val frames = Multimodal.extractFrames(Multimodal.packMedia(docs)).toDF()
    val bad = frames.groupBy(col("media_id"))
      .agg(sum(col("frame_len")).as("total"),
        min(col("frame_off")).as("first_off"),
        max(col("frame_off") + col("frame_len")).as("last_end"),
        count(lit(1)).as("n"))
      .join(docs.select(col("doc_id").as("media_id"),
        length(encode(col("text"), "UTF-8")).cast("long").as("blen")), "media_id")
      .filter(col("total") =!= col("blen") || col("first_off") =!= 0L ||
        col("last_end") =!= col("blen") || col("n") =!= 8L)
    assert(bad.count() === 0L, "slices must tile the body with no gap/overlap")
    // only video payloads produce frames
    assert(frames.filter(col("media_id") % 3 =!= 2).count() === 0L)
    assert(frames.count() > 0L)
  }

  test("decoded header fields are the generation formulas (independent recount)") {
    val docs = graft.Tables.documents(spark, sf0001)
    val got = Multimodal.decodePacked(Multimodal.packMedia(docs))
      .toDF()
      .select(col("media_id"), col("kind"), col("width"), col("height"),
        col("duration_ms"), col("n_frames"))
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    val src = docs.select(col("doc_id"),
      length(encode(col("text"), "UTF-8")).cast("long").as("blen"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(src.nonEmpty)
    src.foreach { case (id, blen) =>
      val dur = 1000L + (blen % 1000L) * 40L
      val expect = (id % 3) match {
        case 0 => ("image", 64L + (id % 97) * 4, 48L + (id % 89) * 4, 0L, 1L)
        case 1 => ("audio", 0L, 0L, dur, dur / 40L)
        case _ => ("video", 320L + (id % 33) * 8, 240L + (id % 25) * 8, dur, dur / 40L)
      }
      assert(got(id) === expect, s"media_id=$id")
    }
  }
}
