package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads travel as opaque `binary`
  * columns with typed metadata; decode/feature-extract run per-partition in
  * batches (the Scala analog of arrow-batched Python UDFs).
  *
  * Two decode tiers:
  *  - `decodeStub` — clearly marked STUB (no image/audio codec libs in this
  *    environment): deterministic fake metadata from payload bytes;
  *  - `packMedia`/`decodePacked` — a REAL fixed-layout binary container
  *    (GRFT: magic + big-endian header + body) with a real positional
  *    parser, so the mapPartitions decode path is load-bearing: magic
  *    validation, endian-correct field reads, body slicing, digests.
  * Everything around them — schema, binary transport, partition-batched
  * execution, frame-sampling explode — is shared, so a codec decoder drops
  * in without touching the topology.
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

  // ---------------------------------------------------------------------
  // GRFT container: a real fixed-layout binary format, parsed for real.
  //
  // The decode STUB above derives fake metadata from raw bytes; this pair
  // makes the mapPartitions decode path LOAD-BEARING: `packMedia` writes a
  // 17-byte big-endian header (magic 'GRFT', kind code, u16 width, u16
  // height, u32 duration_ms, u32 n_frames) followed by the body bytes, and
  // `decodePacked` parses it back — offsets, endianness, magic validation,
  // body slicing all for real, exactly what a codec header reader
  // (PNG IHDR / WAV fmt / MP4 mvhd) does. The header VALUES are generated
  // by deterministic arithmetic on (doc_id, body length) so the DuckDB
  // oracle can recompute them independently: encoder and decoder are two
  // separate code paths meeting at the oracle — a misread offset or
  // endianness flip fails the gate.
  //
  //   offset  size  field
  //   0       4     magic 'G','R','F','T'
  //   4       1     kind code (1=image, 2=audio, 3=video)
  //   5       2     width  (u16, big-endian)
  //   7       2     height (u16, big-endian)
  //   9       4     duration_ms (u32, big-endian)
  //   13      4     n_frames    (u32, big-endian)
  //   17      …     body (payload bytes)
  // ---------------------------------------------------------------------

  final case class PackedMedia(media_id: Long, payload: Array[Byte])
  final case class PackedFeatures(media_id: Long, kind: String, n_bytes: Long,
      width: Long, height: Long, duration_ms: Long, n_frames: Long,
      body_md5: String)

  private val HeaderLen = 17

  /** Metadata formulas, shared with the oracle (all values fit their
    * header field widths by construction):
    * image: 64+(id%97)·4 × 48+(id%89)·4, 0 ms, 1 frame;
    * audio: 0×0, 1000+(len%1000)·40 ms;
    * video: 320+(id%33)·8 × 240+(id%25)·8, same duration;
    * n_frames = duration/40 for timed media.
    */
  private def meta(id: Long, bodyLen: Long): (Int, Int, Int, Long, Long) = {
    val kc = (id % 3).toInt // 0 image, 1 audio, 2 video (fromDocuments order)
    val dur = 1000L + (bodyLen % 1000L) * 40L
    kc match {
      case 0 => (1, (64 + (id % 97) * 4).toInt, (48 + (id % 89) * 4).toInt, 0L, 1L)
      case 1 => (2, 0, 0, dur, dur / 40L)
      case _ => (3, (320 + (id % 33) * 8).toInt, (240 + (id % 25) * 8).toInt,
        dur, dur / 40L)
    }
  }

  /** ENCODE: documents → GRFT containers (header + UTF-8 body). */
  def packMedia(docs: DataFrame): Dataset[PackedMedia] = {
    implicit val enc = Encoders.product[PackedMedia]
    implicit val inEnc =
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (id, text) =>
        val body = text.getBytes("UTF-8")
        val (kindCode, w, h, dur, frames) = meta(id, body.length.toLong)
        val buf = java.nio.ByteBuffer.allocate(HeaderLen + body.length) // BE
        buf.put('G'.toByte).put('R'.toByte).put('F'.toByte).put('T'.toByte)
        buf.put(kindCode.toByte)
        buf.putShort(w.toShort).putShort(h.toShort)
        buf.putInt(dur.toInt).putInt(frames.toInt)
        buf.put(body)
        PackedMedia(id, buf.array())
    }
  }

  /** DECODE: parse the GRFT header from the payload bytes — a REAL parser
    * (magic check, positional big-endian reads, body slice + digest), in
    * the same partition-batched shape a codec decode runs in.
    */
  def decodePacked(packed: Dataset[PackedMedia]): Dataset[PackedFeatures] = {
    implicit val enc = Encoders.product[PackedFeatures]
    packed.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val p = r.payload
        require(p.length >= HeaderLen && p(0) == 'G' && p(1) == 'R' &&
          p(2) == 'F' && p(3) == 'T',
          s"not a GRFT container (media_id=${r.media_id})")
        val buf = java.nio.ByteBuffer.wrap(p) // big-endian by default
        buf.position(4)
        val kindCode = buf.get() & 0xff
        val w = (buf.getShort() & 0xffff).toLong
        val h = (buf.getShort() & 0xffff).toLong
        val dur = buf.getInt().toLong & 0xffffffffL
        val frames = buf.getInt().toLong & 0xffffffffL
        val kind = kindCode match {
          case 1 => "image"
          case 2 => "audio"
          case 3 => "video"
          case other => throw new IllegalArgumentException(
            s"unknown GRFT kind code $other (media_id=${r.media_id})")
        }
        md.reset()
        val digest = md.digest(
          java.util.Arrays.copyOfRange(p, HeaderLen, p.length))
          .map("%02x".format(_)).mkString
        PackedFeatures(r.media_id, kind, p.length.toLong, w, h, dur, frames,
          digest)
      }
    }
  }

  final case class FrameSlice(media_id: Long, frame_idx: Long,
      frame_off: Long, frame_len: Long, frame_md5: String)

  /** REAL frame extraction from GRFT video containers: the body divides
    * into `nSamples` evenly-spaced byte ranges (slice j =
    * [⌊j·blen/n⌋, ⌊(j+1)·blen/n⌋) — the I-frame-sampling access pattern)
    * and each slice is cut from the payload at its actual header-relative
    * byte offset and digested. This replaces [[sampleFrames]]'s
    * offset-arithmetic stub with genuine positional byte work: a
    * miscomputed header length, an off-by-one in the slice bounds, or a
    * wrong integer-division order shifts every digest. Non-video payloads
    * produce no rows (the header's kind code decides — parsed, not
    * joined). Same mapPartitions batch topology as the decoders; a codec
    * frame reader (seek to sample offset, decode GOP) drops into the
    * same slot.
    */
  def extractFrames(packed: Dataset[PackedMedia],
      nSamples: Int = 8): Dataset[FrameSlice] = {
    implicit val enc = Encoders.product[FrameSlice]
    packed.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        val p = r.payload
        require(p.length >= HeaderLen && p(0) == 'G' && p(1) == 'R' &&
          p(2) == 'F' && p(3) == 'T',
          s"not a GRFT container (media_id=${r.media_id})")
        val kindCode = p(4) & 0xff
        if (kindCode != 3) Iterator.empty // video only, per the header
        else {
          val blen = (p.length - HeaderLen).toLong
          (0 until nSamples).iterator.map { j =>
            val off = j.toLong * blen / nSamples
            val end = (j + 1).toLong * blen / nSamples
            md.reset()
            val digest = md.digest(java.util.Arrays.copyOfRange(
                p, HeaderLen + off.toInt, HeaderLen + end.toInt))
              .map("%02x".format(_)).mkString
            FrameSlice(r.media_id, j.toLong, off, end - off, digest)
          }
        }
      }
    }
  }

  final case class MediaHash(media_id: Long, phash: Long)

  /** STUB perceptual hash: a 32-bit simhash over the payload's byte
    * 4-grams — each 4-gram hashes to 32 bits (first four md5 bytes, the
    * same digest-prefix contract as PortableHash so the oracle reproduces
    * it), and phash bit b is the majority vote of gram bit b. Byte-n-gram
    * simhash is a REAL binary-similarity fingerprint (binary diffing /
    * malware clustering); for images a codec pHash (DCT of a downscaled
    * grayscale) drops in with the same signature, and everything
    * downstream — blocking, Hamming confirm — stays identical. Payloads
    * under 4 bytes hash to 0.
    */
  def phashStub(media: DataFrame): Dataset[MediaHash] = {
    implicit val enc = Encoders.product[MediaHash]
    implicit val inEnc = Encoders.product[MediaRow]
    media.as[MediaRow].mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val n = r.payload.length
        val votes = new Array[Int](32)
        var grams = 0
        var i = 0
        while (i + 4 <= n) {
          md.reset()
          val d = md.digest(java.util.Arrays.copyOfRange(r.payload, i, i + 4))
          val g = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          var b = 0
          while (b < 32) {
            if (((g >> b) & 1L) == 1L) votes(b) += 1
            b += 1
          }
          grams += 1
          i += 1
        }
        var h = 0L
        var b = 0
        while (b < 32) {
          if (2 * votes(b) > grams) h |= 1L << b
          b += 1
        }
        MediaHash(r.media_id, h)
      }
    }
  }

  /** Near-duplicate media pairs: two-band blocking over the phash (low and
    * high 16 bits — pairs only form inside a band bucket, never
    * all-pairs), confirmed by full 32-bit Hamming distance ≤ `maxHamming`.
    * Banding guarantees recall only for pairs whose diffs fall entirely in
    * one half; more bands / Hamming multi-probe is the recall upgrade,
    * exactly as on the text simhash side. At 100 TB each band join is one
    * hash shuffle on the band value, and the pair space is bounded by
    * bucket occupancy.
    */
  def phashPairs(hashes: Dataset[MediaHash], maxHamming: Int): DataFrame = {
    val h = hashes.toDF()
    def side(p: String) = h.select(col("media_id").as(s"media_id_$p"),
      col("phash").as(s"ph_$p"),
      (col("phash") % lit(65536L)).as("blk_lo"),
      expr("phash DIV 65536").as("blk_hi"))
    val a = side("a")
    val b = side("b")
    // two equi-joins + union, NOT one OR-join (an OR disjunction would
    // plan as a nested-loop cross product; per-band equi-joins stay hash)
    val lo = a.drop("blk_hi").join(b.drop("blk_hi"), Seq("blk_lo"))
    val hi = a.drop("blk_lo").join(b.drop("blk_lo"), Seq("blk_hi"))
    lo.select(col("media_id_a"), col("ph_a"), col("media_id_b"), col("ph_b"))
      .union(hi.select(col("media_id_a"), col("ph_a"), col("media_id_b"), col("ph_b")))
      .filter(col("media_id_a") < col("media_id_b"))
      .distinct()
      .withColumn("hamming", expr("bit_count(ph_a ^ ph_b)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("media_id_a"), col("media_id_b"), col("hamming"))
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
