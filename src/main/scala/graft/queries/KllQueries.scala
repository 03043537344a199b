package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.relational.KllSketch

/** Quantile-sketch queries over the events metric stream (reference
  * analog: percentile monitoring over tick/latency values —
  * extract_forex.py's metrics would feed exactly this at fleet scale).
  * Three faces of the same primitive:
  *
  *  - `kll_quantiles`: one-shot sketch build + read-out per event_type.
  *  - `kll_merge_days`: per-(type, day) sketches merged across days by
  *    union + re-compaction — the per-partition serving pattern (each
  *    day's job emits a tiny sketch; any date range answers from merged
  *    sketches without touching row data).
  *  - `stream_kll` (PipelineQueries): the same day sketches SHIPPED as a
  *    stream through the hardened GraftSink, merged at read time —
  *    result identical to the batch merge, so it shares this oracle.
  *
  * Every compaction decision is the parity of a portable md5 hash
  * (KllSketch scaladoc), so the DuckDB oracle replays the identical
  * sketch: rounds unroll CTE-by-CTE (the pagerank pattern), and the
  * quantile outputs are ACTUAL corpus doubles (selection, not
  * arithmetic) — hash-exact cross-engine with no quantize/round step.
  */
object KllQueries {

  type Q = (SparkSession, String) => DataFrame

  private val Qs = Seq(0.5, 0.9, 0.99)

  /** Rounds for the one-shot sketch: 12k rows/type at sf0.01 → ~47 items
    * at level 8 (k≈64-item sketch, rank error < 2^8 of 12k ranks ≈ 2%).
    */
  private val OneShotRounds = 8

  /** Per-day rounds (≈400 rows/(type,day) → ~25 items at level 4) and the
    * merge cascade ceiling (union of ~30 day sketches re-compacts levels
    * 0 until 9).
    */
  private val DayRounds = 4
  private val MergeToLevel = 9

  val kllQuantiles: Q = (s, dir) => {
    val sk = KllSketch.sketch(Tables.events(s, dir), Seq("event_type"),
      col("value"), col("event_id"), rounds = OneShotRounds)
    KllSketch.quantiles(sk, Seq("event_type"), Qs).orderBy(col("event_type"))
  }

  val kllQuantilesSql: String =
    s"""WITH k0 AS (
       |  SELECT event_type, 0 AS level, CAST(value AS DOUBLE) AS value,
       |         CAST(event_id AS BIGINT) AS tid, CAST(1 AS BIGINT) AS w
       |  FROM events),
       |${KllSketch.compactSql("k0", Seq("event_type"), 0, OneShotRounds, "sk")},
       |${KllSketch.quantilesSql("sk", Seq("event_type"), Qs, "q")}
       |SELECT event_type, n_rows, p50, p90, p99
       |FROM q ORDER BY event_type""".stripMargin

  /** Per-day sketch items for (type, day) — shared by the batch merge and
    * the stream_kll fixture (PipelineQueries ships exactly this relation
    * through the sink).
    */
  private[queries] def daySketch(s: SparkSession, dir: String): DataFrame =
    KllSketch.sketch(
      Tables.events(s, dir).withColumn("day", to_date(col("ts"))),
      Seq("event_type", "day"), col("value"), col("event_id"),
      rounds = DayRounds)

  /** Merge day sketches per type: drop the day key, re-compact the union
    * (levels cascade 0 until MergeToLevel), read out quantiles.
    */
  private[queries] def mergeDaySketches(items: DataFrame): DataFrame = {
    val merged = KllSketch.compact(
      items.select(col("event_type"), col("level"), col("value"),
        col("tid"), col("w")),
      Seq("event_type"), 0, MergeToLevel)
    KllSketch.quantiles(merged, Seq("event_type"), Qs)
      .orderBy(col("event_type"))
  }

  val kllMergeDays: Q = (s, dir) => mergeDaySketches(daySketch(s, dir))

  val kllMergeDaysSql: String =
    s"""WITH k0d AS (
       |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
       |         0 AS level, CAST(value AS DOUBLE) AS value,
       |         CAST(event_id AS BIGINT) AS tid, CAST(1 AS BIGINT) AS w
       |  FROM events),
       |${KllSketch.compactSql("k0d", Seq("event_type", "day"), 0, DayRounds, "skd")},
       |mg AS (SELECT event_type, level, value, tid, w FROM skd),
       |${KllSketch.compactSql("mg", Seq("event_type"), 0, MergeToLevel, "skm")},
       |${KllSketch.quantilesSql("skm", Seq("event_type"), Qs, "q")}
       |SELECT event_type, n_rows, p50, p90, p99
       |FROM q ORDER BY event_type""".stripMargin

  val queries: Map[String, Q] = Map(
    "kll_quantiles" -> kllQuantiles,
    "kll_merge_days" -> kllMergeDays)

  val oracleSql: Map[String, String] = Map(
    "kll_quantiles" -> kllQuantilesSql,
    "kll_merge_days" -> kllMergeDaysSql)
}
