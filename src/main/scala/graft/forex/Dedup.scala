package graft.forex

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators.
  *
  * D1 — exact whole-row dedup (reference: scripts/extract_forex.py:127-131,
  * pandas `drop_duplicates`): Spark `dropDuplicates()` — hash aggregate on
  * all columns, map-side combined, one shuffle.
  *
  * D2 — keyed keep-one (reference: models/staging/stg_eurusd.sql:36-39,
  * `QUALIFY row_number() OVER (PARTITION BY datetime ORDER BY datetime DESC) = 1`).
  * Spark has no QUALIFY: rewritten as window column + filter. The reference
  * orders by the partition key itself, so *which* duplicate survives is
  * engine-dependent; we make the tie-break explicit (SURVEY §5) so the
  * DuckDB oracle is reproducible.
  */
object Dedup {

  /** D1: drop exactly-identical rows. */
  def exactRows(df: DataFrame): DataFrame = df.dropDuplicates()

  /** D2: keep exactly one row per `key`, deterministically (last by
    * `tieBreak` descending). One shuffle on the key — same cost as any
    * keyed aggregate at scale.
    */
  def keyedKeepOne(df: DataFrame, key: Column, tieBreak: Seq[Column]): DataFrame =
    keyedKeepOne(df, Seq(key), tieBreak)

  /** Multi-column-key variant of D2 — the multi-symbol pipeline dedups per
    * (symbol, observed_at), one shuffle on the compound key.
    */
  def keyedKeepOne(df: DataFrame, keys: Seq[Column], tieBreak: Seq[Column]): DataFrame = {
    val order = if (tieBreak.isEmpty) keys.map(_.desc) else tieBreak.map(_.desc)
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
