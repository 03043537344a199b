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

  /** Batched decode stub + typed features (rows-only check). */
  val mediaDecode: Q = (s, dir) =>
    Multimodal.decodeStub(Multimodal.fromDocuments(Tables.documents(s, dir)))
      .toDF().orderBy(col("media_id"))

  /** Frame-sampling explode over decoded video rows (rows-only check). */
  val mediaFrames: Q = (s, dir) =>
    Multimodal.sampleFrames(
        Multimodal.decodeStub(Multimodal.fromDocuments(Tables.documents(s, dir))),
        everyMs = 500L)
      .orderBy(col("media_id"), col("frame_offset_ms"))

  val queries: Map[String, Q] = Map(
    "media_meta" -> mediaMeta,
    "media_decode_stub" -> mediaDecode,
    "media_frame_sample" -> mediaFrames)

  val oracleSql: Map[String, String] = Map(
    "media_meta" -> mediaMetaSql)
}
