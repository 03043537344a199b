package graft.store

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, TimestampType}

/** SCD Type-2 snapshots — the dbt `snapshots/` surface of the reference
  * (the directory is scaffolded in the reference repo; dbt's
  * `check`-strategy snapshot is the canonical implementation) as a
  * DataFrame operator: each application of a source batch appends history
  * rows instead of overwriting, so every key carries its full change
  * timeline as [valid_from, valid_to) intervals with one current row.
  *
  * Semantics (dbt check strategy, default hard-delete handling):
  *  - new key            → open a current row (valid_from = now);
  *  - tracked change     → close the old current row (valid_to = now,
  *    is_current = false) and open a new current one;
  *  - unchanged          → row passes through untouched;
  *  - key absent from the batch → stays current (dbt's default: deletes
  *    are not invalidated).
  * Change detection is null-safe value equality on `trackCols` (IS
  * DISTINCT FROM), never a string/hash digest — exact doubles compare
  * identically on every engine.
  *
  * Scale shape: one full-outer join of the CURRENT slice against the
  * batch on the key (history rows never join — they are a pass-through
  * union), so cost is O(current + batch) per application regardless of
  * accumulated history depth; on disk the history naturally partitions by
  * valid_from day through IncrementalStore.
  */
object Scd2 {

  /** Apply one source batch to an optional existing snapshot table.
    * `existing` must carry valid_from/valid_to/is_current (i.e. be a prior
    * result of this function); `batch` is the raw source slice.
    *
    * Precondition (enforced): `keyCols` are unique within `batch` — dbt's
    * snapshot contract. A duplicate batch key would fan out the full-outer
    * join and open multiple "current" rows for one key, silently breaking
    * the one-current-row-per-key invariant, so it fails fast instead. The
    * check is one map-side-combined aggregation over the batch (bounded
    * collect: limit 1), negligible next to the join it protects.
    */
  def snapshot(existing: Option[DataFrame], batch: DataFrame,
      keyCols: Seq[String], trackCols: Seq[String], now: Timestamp): DataFrame = {
    val dup = batch.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"Scd2.snapshot: batch has duplicate key ${keyCols.mkString("(", ",", ")")}" +
        s" = ${dup.headOption.map(_.toSeq.dropRight(1).mkString(",")).getOrElse("")}" +
        " — snapshot keys must be unique per batch")
    val opened = batch
      .withColumn("valid_from", lit(now))
      .withColumn("valid_to", lit(null).cast(TimestampType))
      .withColumn("is_current", lit(true).cast(BooleanType))
    existing match {
      case None => opened
      case Some(table) =>
        val cur = table.filter(col("is_current"))
        val hist = table.filter(!col("is_current"))
        // carry EVERY non-key batch column (not just the tracked ones):
        // opened rows must be the full new source row — falling back to the
        // cur side would null a brand-new key's passenger columns and carry
        // stale values onto a changed key's new version
        val passCols = batch.columns.filterNot(keyCols.contains).toSeq
        val b = batch.select(
          keyCols.map(col) ++ passCols.map(c => col(c).as(s"__b_$c"))
            :+ lit(true).as("__b_present"): _*)
        val joined = cur.join(b, keyCols, "full_outer")
        val present = col("valid_from").isNotNull // key existed in cur
        val batchPresent = col("__b_present").isNotNull
        val changed = trackCols
          .map(c => !(col(s"__b_$c") <=> col(c)))
          .reduce(_ || _)
        // Single pass over the join: each row maps to its output rows via
        // one exploded action array — filtering the same join three ways
        // (closed/kept/opened) would make Catalyst EXECUTE the full-outer
        // join three times (no subtree reuse across filters), tripling the
        // dominant cost at scale.
        val outCols = cur.columns // batch cols + valid_from/valid_to/is_current
        def shaped(fields: Map[String, org.apache.spark.sql.Column]) =
          struct(outCols.map(c => fields.getOrElse(c, col(c)).as(c)).toIndexedSeq: _*)
        val closedRow = shaped(Map(
          "valid_to" -> lit(now).cast(TimestampType),
          "is_current" -> lit(false).cast(BooleanType)))
        val keptRow = shaped(Map.empty)
        val openedRow = shaped(
          passCols.map(c => c -> col(s"__b_$c")).toMap ++ Map(
            "valid_from" -> lit(now).cast(TimestampType),
            "valid_to" -> lit(null).cast(TimestampType),
            "is_current" -> lit(true).cast(BooleanType)))
        val out = joined
          .select(explode(
            when(present && batchPresent && changed, array(closedRow, openedRow))
              .when(present, array(keptRow)) // unchanged match or batch-absent
              .otherwise(array(openedRow))   // brand-new key
          ).as("__r"))
          .select(col("__r.*"))
        hist.unionByName(out)
    }
  }
}
