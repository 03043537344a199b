package graft.store

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout for co-located joins (SURVEY §4 row 3's
  * `cluster_by` taken to its scale conclusion).
  *
  * A fact table bucketed AND sorted by its join key joins another table
  * bucketed the same way with NO exchange and NO sort: at 100 TB that
  * removes the dominant cost of repeated fact-fact joins (the shuffle is
  * paid once at write time, amortized over every subsequent join/agg on
  * the bucket key — the Spark-native equivalent of the reference's
  * BigQuery clustering).
  */
object Bucketing {

  /** Save as a bucketed+sorted managed table (parquet).
    *
    * Idempotent across JVMs: with the default in-memory catalog the table
    * METADATA dies with the session but the warehouse FILES persist, so a
    * bare `saveAsTable` in a fresh JVM fails with LOCATION_ALREADY_EXISTS.
    * When the catalog still knows the table, its real location is resolved
    * from the catalog (warehouse.dir may have been reconfigured since the
    * table was written); only when the metadata is gone does the cleanup
    * fall back to the default-database layout `<warehouse>/<name>`, which
    * is why qualified `db.table` names are rejected up front — their files
    * live at `<warehouse>/<db>.db/<name>` and a blind guess would delete
    * the wrong path.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit = {
    require(!table.contains("."),
      s"writeBucketed requires an unqualified table name, got '$table'")
    val spark = df.sparkSession
    val catalogLoc: Option[org.apache.hadoop.fs.Path] =
      if (spark.catalog.tableExists(table))
        spark.sql(s"DESCRIBE FORMATTED `$table`")
          .where("col_name = 'Location'")
          .collect().headOption
          .map(r => new org.apache.hadoop.fs.Path(r.getString(1)))
      else None
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = catalogLoc.getOrElse(new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(wh)) fs.delete(wh, true)
    df.write
      .format("parquet")
      .mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
  }
}
