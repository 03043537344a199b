package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads travel as opaque `binary`
  * columns with typed metadata; decode/feature-extract run per-partition in
  * batches (the Scala analog of arrow-batched Python UDFs).
  *
  * The actual codec step is a clearly marked STUB (no image/audio libs in
  * this environment): `decodeStub` derives deterministic fake metadata from
  * the payload bytes. Everything around it — schema, binary transport,
  * partition-batched execution, frame-sampling explode — is real and tested,
  * so a real decoder drops into `decodeBytes` without touching the topology.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long, sha: String,
      width: Int, height: Int, duration_ms: Long)

  /** Manufacture a media table from documents (payload = utf-8 bytes).
    * In production this column comes straight from parquet `binary`.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      // deterministic kind assignment for the demo corpus
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB decoder: deterministic pseudo-metadata from payload bytes.
    * Replace with a real codec (e.g. javax.imageio / ffmpeg bindings) —
    * signature and batching stay identical.
    */
  private def decodeBytes(kind: String, payload: Array[Byte]): (Int, Int, Long) = {
    val b0 = if (payload.nonEmpty) payload(0) & 0xff else 0
    val b1 = if (payload.length > 1) payload(1) & 0xff else 0
    kind match {
      case "image" => (64 + b0 * 4, 64 + b1 * 4, 0L)
      case "audio" => (0, 0, 1000L + (b0.toLong << 4))
      case "video" => (320 + b0, 240 + b1, 5000L + (b1.toLong << 5))
      case _ => (0, 0, 0L)
    }
  }

  /** Partition-batched decode: one JVM-side pass per partition (codec state
    * amortized across the batch, like a pandas-UDF batch), emitting typed
    * features.
    */
  def decodeStub(media: DataFrame): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    implicit val inEnc = Encoders.product[MediaRow]
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition "codec init" would go here
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        md.reset()
        val digest = md.digest(r.payload).map("%02x".format(_)).mkString
        val (w, h, d) = decodeBytes(r.kind, r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, digest, w, h, d)
      }
    }
  }

  /** Frame sampling for video rows: one output row per sampled frame offset
    * (explode over a generated sequence — the distributed shape of
    * frame-extraction jobs; the pixel decode itself is the stub above).
    */
  def sampleFrames(features: Dataset[MediaFeatures], everyMs: Long): DataFrame =
    features.toDF()
      .filter(col("kind") === "video")
      .select(col("media_id"), col("sha"),
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs)))
          .as("frame_offset_ms"))
}
