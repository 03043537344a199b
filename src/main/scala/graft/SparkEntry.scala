package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ForexQueries.fctTimeframes(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ §7.4 extension
    * surface: text analysis, dedup family, similarity search, multimodal).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ForexQueries.queries ++ TextQueries.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ MediaQueries.queries ++
      RelationalQueries.queries ++ SamplingQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ForexQueries.oracleSql ++ TextQueries.oracleSql ++ DedupQueries.oracleSql ++
      SimilarityQueries.oracleSql ++ MediaQueries.oracleSql ++
      RelationalQueries.oracleSql ++ SamplingQueries.oracleSql
}
