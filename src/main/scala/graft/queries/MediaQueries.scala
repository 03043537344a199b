package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal-plumbing driver queries: binary payload transport + metadata
  * is oracle-checked (byte lengths, digests, kinds); the batched decode stub
  * itself is exercised rows-only (mapPartitions is not SQL-expressible).
  */
object MediaQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Binary transport check: payload byte length + md5 digest computed on
    * the binary column. Oracle hashes the same UTF-8 bytes via md5(text)
    * (DuckDB lacks md5(BLOB)).
    */
  val mediaMeta: Q = (s, dir) =>
    Multimodal.fromDocuments(Tables.documents(s, dir))
      .select(col("media_id"), col("kind"),
        length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("sha"))
      .orderBy(col("media_id"))

  val mediaMetaSql: String =
    """SELECT doc_id AS media_id,
      |       (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INTEGER)] AS kind,
      |       octet_length(encode(text)) AS n_bytes,
      |       md5(text) AS sha
      |FROM documents ORDER BY media_id""".stripMargin

  /** Batched decode stub + typed features. The stub's byte math is
    * deterministic (first two payload bytes), so it IS SQL-expressible: the
    * corpus is ASCII (verified per driver dataset), so byte k of the UTF-8
    * payload == ascii(substr(text, k, 1)), with ascii('') = 0 matching the
    * stub's empty-payload default.
    */
  val mediaDecode: Q = (s, dir) =>
    Multimodal.decodeStub(Multimodal.fromDocuments(Tables.documents(s, dir)))
      .toDF().orderBy(col("media_id"))

  /** Shared decoded-features CTE mirroring Multimodal.{fromDocuments,
    * decodeBytes}: kind from doc_id mod 3, pseudo-metadata from b0/b1.
    */
  private val featuresSql: String =
    """feats AS (
      |  SELECT doc_id AS media_id,
      |         (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INTEGER)] AS kind,
      |         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |         md5(text) AS sha,
      |         ascii(substr(text, 1, 1)) AS b0,
      |         ascii(substr(text, 2, 1)) AS b1
      |  FROM documents),
      |decoded AS (
      |  SELECT media_id, kind, n_bytes, sha,
      |         CAST(CASE kind WHEN 'image' THEN 64 + b0 * 4
      |                        WHEN 'video' THEN 320 + b0 ELSE 0 END AS BIGINT) AS width,
      |         CAST(CASE kind WHEN 'image' THEN 64 + b1 * 4
      |                        WHEN 'video' THEN 240 + b1 ELSE 0 END AS BIGINT) AS height,
      |         CAST(CASE kind WHEN 'audio' THEN 1000 + b0 * 16
      |                        WHEN 'video' THEN 5000 + b1 * 32 ELSE 0 END AS BIGINT) AS duration_ms
      |  FROM feats)""".stripMargin

  val mediaDecodeSql: String =
    s"""WITH $featuresSql
       |SELECT media_id, kind, n_bytes, sha, width, height, duration_ms
       |FROM decoded ORDER BY media_id""".stripMargin

  /** Frame-sampling explode over decoded video rows. */
  val mediaFrames: Q = (s, dir) =>
    Multimodal.sampleFrames(
        Multimodal.decodeStub(Multimodal.fromDocuments(Tables.documents(s, dir))),
        everyMs = 500L)
      .orderBy(col("media_id"), col("frame_offset_ms"))

  val mediaFramesSql: String =
    s"""WITH $featuresSql
       |SELECT media_id, sha,
       |       CAST(unnest(range(0, duration_ms, 500)) AS BIGINT) AS frame_offset_ms
       |FROM decoded WHERE kind = 'video'
       |ORDER BY media_id, frame_offset_ms""".stripMargin

  /** REAL binary decode: documents are packed into GRFT containers
    * (17-byte big-endian header + body, Multimodal.packMedia) and the
    * query's decode path PARSES the header back — magic validation,
    * positional big-endian field reads, body slice + digest. Encoder and
    * decoder are separate code paths; the oracle recomputes every field
    * from the generation arithmetic on (doc_id, byte length) and the body
    * digest from the raw text, so a misread offset, an endianness flip, or
    * a wrong body slice fails the hash gate. This is the load-bearing
    * version of [[mediaDecode]]'s stub: same mapPartitions topology, real
    * bytes in the middle.
    */
  val mediaDecodeReal: Q = (s, dir) =>
    Multimodal.decodePacked(
        Multimodal.packMedia(Tables.documents(s, dir)))
      .toDF().orderBy(col("media_id"))

  val mediaDecodeRealSql: String =
    """WITH f AS (
      |  SELECT doc_id AS media_id, doc_id % 3 AS kc,
      |         CAST(octet_length(encode(text)) AS BIGINT) AS blen,
      |         md5(text) AS body_md5
      |  FROM documents)
      |SELECT media_id,
      |       CASE kc WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |               ELSE 'video' END AS kind,
      |       CAST(17 + blen AS BIGINT) AS n_bytes,
      |       CAST(CASE kc WHEN 0 THEN 64 + (media_id % 97) * 4
      |                    WHEN 2 THEN 320 + (media_id % 33) * 8
      |                    ELSE 0 END AS BIGINT) AS width,
      |       CAST(CASE kc WHEN 0 THEN 48 + (media_id % 89) * 4
      |                    WHEN 2 THEN 240 + (media_id % 25) * 8
      |                    ELSE 0 END AS BIGINT) AS height,
      |       CAST(CASE kc WHEN 0 THEN 0
      |                    ELSE 1000 + (blen % 1000) * 40 END AS BIGINT) AS duration_ms,
      |       CAST(CASE kc WHEN 0 THEN 1
      |                    ELSE (1000 + (blen % 1000) * 40) // 40 END AS BIGINT) AS n_frames,
      |       body_md5
      |FROM f ORDER BY media_id""".stripMargin

  /** REAL frame extraction ([[Multimodal.extractFrames]]): GRFT video
    * bodies cut into 8 evenly-spaced byte slices at their actual
    * header-relative offsets, one md5 per slice. The oracle recomputes
    * offsets with the same integer division over the text's byte length
    * and digests the corresponding substring — the fixture corpus is
    * ASCII by construction (octet_length == length at every SF), so
    * 1-based character slicing in DuckDB addresses the identical bytes
    * the Spark side cuts from the payload; any header-length or bounds
    * error shifts every digest.
    */
  val mediaFramesReal: Q = (s, dir) =>
    Multimodal.extractFrames(
        Multimodal.packMedia(Tables.documents(s, dir)))
      .toDF().orderBy(col("media_id"), col("frame_idx"))

  val mediaFramesRealSql: String =
    """WITH v AS (
      |  SELECT doc_id AS media_id, text,
      |         CAST(octet_length(encode(text)) AS BIGINT) AS blen
      |  FROM documents WHERE doc_id % 3 = 2),
      |j AS (SELECT media_id, text, blen, unnest(range(0, 8)) AS frame_idx FROM v),
      |sl AS (
      |  SELECT media_id, frame_idx,
      |         (frame_idx * blen) // 8 AS frame_off,
      |         ((frame_idx + 1) * blen) // 8 - (frame_idx * blen) // 8 AS frame_len,
      |         md5(substring(text, CAST((frame_idx * blen) // 8 + 1 AS BIGINT),
      |                       CAST(((frame_idx + 1) * blen) // 8 - (frame_idx * blen) // 8 AS BIGINT)))
      |           AS frame_md5
      |  FROM j)
      |SELECT media_id, frame_idx, frame_off, frame_len, frame_md5
      |FROM sl ORDER BY media_id, frame_idx""".stripMargin

  /** Media near-dup pairs via the stub perceptual hash (byte-4-gram
    * simhash, Multimodal.phashStub): two-band 16-bit blocking, full 32-bit
    * Hamming ≤ 3 confirm — the image-dedup pipeline shape with the codec
    * stubbed and the blocking/Hamming machinery real. The stub hashes the
    * payload BYTES; the ASCII corpus makes that SQL-expressible
    * (byte 4-gram == substr(text, i, 4), gram hash == first 8 md5 hex
    * digits — the PortableHash digest-prefix contract).
    */
  val mediaPhashPairs: Q = (s, dir) =>
    Multimodal.phashPairs(
        Multimodal.phashStub(Multimodal.fromDocuments(Tables.documents(s, dir))),
        maxHamming = 3)
      .orderBy(col("media_id_a"), col("media_id_b"))

  val mediaPhashPairsSql: String = {
    // outer lambda variable MUST NOT be `i` — hash32Sql's inner
    // list_transform binds `i` and would shadow the gram position
    val gramHash = graft.functions.PortableHash.hash32Sql("substr(d.text, CAST(gp AS INTEGER), 4)")
    s"""WITH hs AS (
       |  SELECT doc_id AS media_id,
       |         list_transform(range(1, octet_length(encode(text)) - 2),
       |           gp -> ($gramHash)) AS grams
       |  FROM documents d
       |  -- byte grams are read with character substr, and gram positions
       |  -- with octet_length: valid ONLY for pure-ASCII text. Assert the
       |  -- invariant per row so a multi-byte fixture fails loudly instead
       |  -- of silently desynchronizing positions (ADVICE r5).
       |  WHERE CASE WHEN octet_length(encode(d.text)) = length(d.text) THEN TRUE
       |             ELSE error('non-ASCII document breaks byte-gram phash oracle') END
       |    AND octet_length(encode(text)) >= 4),
       |ph AS (
       |  SELECT media_id, CAST(list_sum(list_transform(range(0, 32),
       |           b -> CASE WHEN 2 * len(list_filter(grams,
       |                       g -> (g >> CAST(b AS INTEGER)) % 2 = 1)) > len(grams)
       |                THEN CAST(1 AS BIGINT) << CAST(b AS INTEGER)
       |                ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS phash
       |  FROM hs
       |  UNION ALL
       |  SELECT doc_id AS media_id, CAST(0 AS BIGINT) AS phash
       |  FROM documents WHERE octet_length(encode(text)) < 4)
       |SELECT a.media_id AS media_id_a, b.media_id AS media_id_b,
       |       CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
       |FROM ph a JOIN ph b
       |  ON a.media_id < b.media_id
       | AND (a.phash % 65536 = b.phash % 65536
       |      OR a.phash // 65536 = b.phash // 65536)
       |WHERE bit_count(xor(a.phash, b.phash)) <= 3
       |ORDER BY media_id_a, media_id_b""".stripMargin
  }

  /** Exact multimodal dedup — the first pass every media curation pipeline
    * runs: group by CONTENT hash of the binary payload, keep the
    * lowest-id copy, count the duplicates. Deliberately zero custom code:
    * `md5(binary)` is a codegen'd built-in, so unlike the decode stubs
    * this needs no mapPartitions — content-hash dedup of opaque payloads
    * is fully declarative, and the one shuffle carries (hash, partial
    * count) pairs with map-side combine, never payload bytes (the digest
    * projection drops the binary column before the exchange — the same
    * never-shuffle-the-payload property the whole multimodal family
    * keeps).
    */
  val mediaDedup: Q = (s, dir) =>
    Multimodal.fromDocuments(Tables.documents(s, dir))
      .groupBy(md5(col("payload")).as("content_md5"))
      .agg(min(col("media_id")).as("media_id"), count(lit(1)).as("n_copies"))
      .select(col("media_id"), col("content_md5"), col("n_copies"))
      .orderBy(col("media_id"))

  val mediaDedupSql: String =
    """SELECT min(doc_id) AS media_id, md5(text) AS content_md5,
      |       count(*) AS n_copies
      |FROM documents GROUP BY md5(text) ORDER BY media_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "media_dedup" -> mediaDedup,
    "media_phash_pairs" -> mediaPhashPairs,
    "media_meta" -> mediaMeta,
    "media_decode_stub" -> mediaDecode,
    "media_decode_real" -> mediaDecodeReal,
    "media_frames_real" -> mediaFramesReal,
    "media_frame_sample" -> mediaFrames)

  val oracleSql: Map[String, String] = Map(
    "media_dedup" -> mediaDedupSql,
    "media_phash_pairs" -> mediaPhashPairsSql,
    "media_meta" -> mediaMetaSql,
    "media_decode_stub" -> mediaDecodeSql,
    "media_decode_real" -> mediaDecodeRealSql,
    "media_frames_real" -> mediaFramesRealSql,
    "media_frame_sample" -> mediaFramesSql)
}
