package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Deterministic sampling & dataset splitting for training-data pipelines.
  *
  * Everything is hash-of-key based — never `rand()`: assignments are stable
  * across runs, retries, cluster sizes, and engines (the bucket hash is the
  * portable md5 parse), which is what makes train/test splits reproducible
  * and leak-free at 100 TB. Per-row work only: no shuffle, fully parallel.
  */
object Sampling {

  /** Stable bucket in [0, buckets) for a key column. */
  def bucket(key: Column, buckets: Int = 100): Column =
    pmod(PortableHash.hash32(key), lit(buckets.toLong))

  /** Deterministic fraction sample: keep rows whose key-bucket falls below
    * fraction·buckets.
    */
  def sampleByKey(df: DataFrame, key: Column, fraction: Double,
      buckets: Int = 10000): DataFrame =
    df.filter(bucket(key, buckets) < lit((fraction * buckets).toLong))

  /** Train/val/test assignment from cumulative percentage cutoffs, e.g.
    * `split(col, Seq("train" -> 80, "val" -> 10, "test" -> 10))`.
    */
  def split(key: Column, weights: Seq[(String, Int)]): Column = {
    require(weights.map(_._2).sum == 100, "weights must sum to 100")
    val b = bucket(key, 100)
    val cutoffs = weights.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    weights.zip(cutoffs).foldLeft(lit(null).cast("string")) {
      case (acc, ((name, _), cut)) =>
        when(acc.isNotNull, acc).when(b < cut, name).otherwise(lit(null))
    }
  }
}
