package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Sketch aggregates for approximate analytics at 100 TB — the cardinality
  * path when exact `count(DISTINCT ...)` (a full shuffle of every distinct
  * key) is too expensive. Spark ships `approx_count_distinct`, but its
  * HLL++ register layout is engine-private and not oracle-checkable; this
  * HyperLogLog is built from plain relational expressions over the
  * engine-portable hash, so the DuckDB oracle reproduces it BIT-EXACTLY —
  * the sketch itself is part of the checked query contract, not a black box.
  *
  * Shape at scale: one hash aggregate to (group, bucket) registers — map-side
  * combined, shuffle carries ≤ m=64 rows per group regardless of input size —
  * then a 64-row-per-group reduction. Compare: exact distinct shuffles every
  * distinct key.
  *
  * Determinism: the register sum Σ 2^−M_j is NOT summed in floats (order-
  * dependent) — each term is scaled to the integer 2^(27−M_j), summed as
  * BIGINT (exact, any order), and divided by 2^27 once at the end: every
  * float op runs on bit-identical inputs in both engines.
  */
object Sketches {

  /** m = 2^6 = 64 registers; the portable hash is 32-bit, so 6 bucket bits
    * leave a 26-bit value field: rho ∈ [1, 27].
    */
  private val M = 64
  private val ValueBits = 26
  /** alpha_64 · m² · 2^27 — pre-folded to ONE double literal so neither
    * engine multiplies decimal literals (Spark and DuckDB disagree on
    * decimal-literal arithmetic; a single shortest-round-trip double is
    * parsed identically).
    */
  private[graft] val Numerator: Double = 0.709 * (64.0 * 64.0) * 134217728.0

  /** Small-range (linear counting) correction table: m·ln(m/V) for
    * V = 1..m, PRECOMPUTED once here and embedded as the same 64 double
    * constants in both engines. `ln` is not IEEE exactly-rounded — JVM and
    * DuckDB libms may differ in the last ulp — so neither engine ever
    * calls it: V is an integer in [1, m], which makes the whole correction
    * a 64-entry literal lookup. Index i holds V = i+1.
    */
  private[graft] val LinearCount: IndexedSeq[Double] =
    (1 to M).map(v => M.toDouble * math.log(M.toDouble / v))

  /** Standard small-range threshold 2.5·m below which the raw estimator is
    * biased high and linear counting is preferred (Flajolet et al.).
    */
  private[graft] val SmallRange: Double = 2.5 * M

  /** Per-(group, bucket) HLL registers: `__bucket` ∈ [0, m), `__m` = max
    * rho. Registers are the sketch's MERGEABLE partial state: registers of
    * any partitioning of the input (days, shards, streams) merge by
    * per-bucket `max` into exactly the registers of the whole — which is
    * what lets a store keep per-day sketches and serve any date range
    * without re-reading rows (see [[mergeRegisters]] and the
    * hll_merge_days query).
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], key: Column): DataFrame = {
    val g = groupCols.map(col)
    df
      .select(g :+ PortableHash.hash32(key).as("__h"): _*)
      .withColumn("__bucket", expr(s"__h % $M"))
      .withColumn("__w", expr(s"shiftright(__h, 6)"))
      .withColumn("__rho",
        when(col("__w") === 0, lit(ValueBits + 1).cast("long"))
          .otherwise(lit(ValueBits + 1) - length(bin(col("__w"))).cast("long")))
      .groupBy(g :+ col("__bucket"): _*)
      .agg(max(col("__rho")).as("__m"))
  }

  /** Merge registers down to a coarser grouping (drop the partition
    * columns): per-bucket max — exact, associative, order-free.
    */
  def mergeRegisters(reg: DataFrame, groupCols: Seq[String]): DataFrame =
    reg.groupBy(groupCols.map(col) :+ col("__bucket"): _*)
      .agg(max(col("__m")).as("__m"))

  /** Estimate from a register table (integer register sum, one division).
    * Emits `hll_raw` (uncorrected) and `hll_est` — the raw value with the
    * standard small-range correction applied: when raw ≤ 2.5·m and some
    * register is still zero, linear counting m·ln(m/V) (via the shared
    * [[LinearCount]] literal table, V = zero-register count) replaces the
    * raw estimate, fixing the raw estimator's large positive bias at low
    * cardinality (observed 1.07 rel_err at n=31 with m=64 → ~0.03).
    */
  def hllFromRegisters(reg: DataFrame, groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    reg
      .groupBy(g: _*)
      .agg(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST(${ValueBits + 1} - __m AS INT))"))
          .as("__isum_obs"),
        count(lit(1)).as("__nb"))
      .withColumn("__isum",
        col("__isum_obs") + (lit(M.toLong) - col("__nb")) * lit(1L << (ValueBits + 1)))
      .withColumn("__v", lit(M.toLong) - col("__nb"))
      .withColumn("__raw", lit(Numerator) / col("__isum").cast("double"))
      // greatest(v, 1): element_at is eager per-row and 1-based; the v=0
      // row takes the otherwise() branch anyway
      .withColumn("__lc", element_at(array(LinearCount.map(lit): _*),
        greatest(col("__v"), lit(1L)).cast("int")))
      .select(g ++ Seq(
        col("__raw").as("hll_raw"),
        when(col("__raw") <= lit(SmallRange) && col("__v") >= 1, col("__lc"))
          .otherwise(col("__raw")).as("hll_est")): _*)
  }

  /** HyperLogLog distinct estimate of `key` per group: `hll_raw` plus the
    * small-range-corrected `hll_est`. The correction never calls `ln` at
    * query time (literal table, see [[LinearCount]]), keeping every float
    * op bit-identical cross-engine.
    */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], key: Column): DataFrame =
    hllFromRegisters(hllRegisters(df, groupCols, key), groupCols)

  /** Count-min sketch: d independent hash rows × w counters. Counts are
    * pure integers, so — unlike any float sketch — the estimate is exact
    * arithmetic end-to-end and needs no summation-order care at all.
    *
    * Shape at scale: the counter table is d·w rows REGARDLESS of stream
    * size (the explode multiplies rows by d, but the hash aggregate's
    * map-side combine collapses each partition to ≤ d·w partials before
    * the shuffle). Point estimates then join candidates (tiny) against the
    * counter table (tiny, broadcast) — the classic heavy-hitter check
    * without a second pass over the stream.
    */
  /** `groupCols` (default none) emit one counter table PER GROUP — the
    * per-day/per-partition form whose tables merge by per-cell ADDITION
    * (counters are integer-linear, so a day merge is BIT-equal to the
    * one-shot build; `cms_merge_days` proves it).
    */
  def cmsCounters(df: DataFrame, key: Column, d: Int = 4, w: Int = 256,
      groupCols: Seq[String] = Nil): DataFrame =
    df
      .select(groupCols.map(col) :+ explode(array((0 until d).map { i =>
        struct(lit(i.toLong).as("row_id"),
          pmod(PortableHash.hash32At(key, 1 + 8 * i), lit(w.toLong))
            .as("bucket"))
      }: _*)).as("rb"): _*)
      .groupBy(groupCols.map(col) :+ col("rb.row_id").as("row_id") :+
        col("rb.bucket").as("bucket"): _*)
      .agg(count(lit(1)).as("n"))

  /** CMS point estimate for each row of `candidates`: min over the d row
    * counters the key hashes into. Never underestimates; collisions only
    * inflate. Counters the key hashes into that are absent from the
    * counter table count as 0 (left join + coalesce), so a key never seen
    * by [[cmsCounters]] estimates 0 instead of being dropped (ADVICE r4).
    */
  def cmsEstimate(candidates: DataFrame, key: Column, counters: DataFrame,
      d: Int = 4, w: Int = 256): DataFrame = {
    val probes = candidates
      .select(key.as("__key"), explode(array((0 until d).map { i =>
        struct(lit(i.toLong).as("row_id"),
          pmod(PortableHash.hash32At(key, 1 + 8 * i), lit(w.toLong))
            .as("bucket"))
      }: _*)).as("rb"))
      .select(col("__key"), col("rb.row_id").as("row_id"), col("rb.bucket").as("bucket"))
    probes
      .join(broadcast(counters), Seq("row_id", "bucket"), "left")
      .groupBy(col("__key"))
      .agg(min(coalesce(col("n"), lit(0L))).as("n_cms"))
  }

  /** DuckDB mirror of the CMS bucket assignment for hash row `i` over
    * `keyExpr` (disjoint md5 spans — see PortableHash.hash32At).
    */
  def cmsBucketSql(i: Int, keyExpr: String, w: Int = 256): String =
    s"(${PortableHash.hash32AtSql(keyExpr, 1 + 8 * i)}) % $w"

  /** DuckDB mirror of [[hllRegisters]]: emits `<out>_hashed` and `<out>`
    * CTEs over relation `rel`; `<out>` has columns (groupCols..., bucket, m).
    */
  def hllRegistersSql(rel: String, groupCols: Seq[String], keyExpr: String,
      out: String = "reg"): String = {
    val g = groupCols.mkString(", ")
    s"""${out}_hashed AS (SELECT $g, ${PortableHash.hash32Sql(keyExpr)} AS hv FROM $rel),
       |$out AS (
       |  SELECT $g, hv % $M AS bucket,
       |         max(CASE WHEN (hv >> 6) = 0 THEN ${ValueBits + 1}
       |                  ELSE ${ValueBits + 1} - length(bin(hv >> 6)) END) AS m
       |  FROM ${out}_hashed GROUP BY ALL)""".stripMargin
  }

  /** DuckDB mirror of [[hllFromRegisters]]: a `<out>` CTE estimating from a
    * register relation `regRel` with columns (groupCols..., bucket, m).
    */
  def hllEstimateSql(regRel: String, groupCols: Seq[String],
      out: String = "hll"): String = {
    val g = groupCols.mkString(", ")
    // the 64 correction constants as string-cast double literals: DuckDB
    // CAST(VARCHAR AS DOUBLE) is a correctly-rounded parse, recovering the
    // exact Scala double (a bare 17-digit literal would be typed DECIMAL
    // first and can double-round — ADVICE r4)
    val lcList = LinearCount.map(d => s"CAST('$d' AS DOUBLE)")
      .mkString("[", ", ", "]")
    s"""${out}_raw AS (
       |  SELECT $g,
       |         CAST($Numerator AS DOUBLE) /
       |           CAST(CAST(sum(CAST(1 AS BIGINT) << CAST(${ValueBits + 1} - m AS INTEGER)) AS BIGINT)
       |                + ($M - count(*)) * ${1L << (ValueBits + 1)} AS DOUBLE) AS hll_raw,
       |         $M - count(*) AS v
       |  FROM $regRel GROUP BY ALL),
       |$out AS (
       |  SELECT $g, hll_raw,
       |         CASE WHEN hll_raw <= CAST('$SmallRange' AS DOUBLE) AND v >= 1
       |              THEN list_extract($lcList, CAST(v AS INTEGER))
       |              ELSE hll_raw END AS hll_est
       |  FROM ${out}_raw)""".stripMargin
  }

  /** DuckDB mirror of [[hllDistinct]] as a CTE pipeline over a `(groupCols,
    * key)` relation named `rel` with the key column named `key`.
    */
  def hllDistinctSql(rel: String, groupCols: Seq[String], keyExpr: String): String =
    s"""${hllRegistersSql(rel, groupCols, keyExpr)},
       |${hllEstimateSql("reg", groupCols)}""".stripMargin

  // ---------------------------------------------------- histogram quantiles

  /** Fixed-bin histogram of an integer-valued column: the MERGEABLE quantile
    * sketch. Exact `percentile` buffers every value per group — memory grows
    * with group size, the classic whale-group failure at 100 TB. The
    * histogram is one hash aggregate (map-side combined; the shuffle carries
    * ≤ range/binWidth rows per group regardless of input size), and two
    * histograms merge by summing counts per (group, bin) — per-day/partition
    * histograms serve any date range, exactly like the HLL registers above.
    *
    * Bin assignment is pure integer FLOOR division — zero float ops, so
    * mergeability and cross-engine parity are exact by construction.
    * Truncating division (Spark DIV / DuckDB //) would collapse the two
    * bins around zero into one on negative domains and shift every
    * negative bin edge, breaking the "over-reports by at most binWidth"
    * quantile contract (ADVICE r5); `(v - pmod(v, w)) DIV w` floors
    * exactly in integers for any sign, since pmod is non-negative.
    */
  def histCounts(df: DataFrame, groupCols: Seq[String], value: Column,
      binWidth: Long): DataFrame =
    df.withColumn("__v", value.cast("long"))
      .groupBy(groupCols.map(col) :+
        expr(s"(__v - pmod(__v, ${binWidth}L)) DIV ${binWidth}L").as("bin"): _*)
      .agg(count(lit(1)).as("n"))

  /** Merge partial histograms (same groupCols/binWidth): sum counts per
    * (group, bin). Exact — integer addition commutes.
    */
  def histMerge(parts: DataFrame*): DataFrame =
    parts.reduce(_ unionByName _)
      .groupBy(parts.head.columns.dropRight(1).toIndexedSeq.map(col): _*)
      .agg(sum(col("n")).as("n"))

  /** Quantile UPPER BOUNDS from a histogram: for each q, the upper edge of
    * the bin holding the rank-⌈q·n⌉ value — a deterministic estimate that
    * over-reports the true quantile by at most binWidth. The only float op
    * is the q·n product of the same double literal in both engines; rank
    * comparison and the edge arithmetic are integers.
    *
    * Scale shape: the cumulative window runs over ≤ range/binWidth bin rows
    * per group (sketch-sized, not data-sized), then one hash aggregate.
    */
  def histQuantiles(counts: DataFrame, groupCols: Seq[String],
      binWidth: Long, qs: Seq[Double]): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts
      .withColumn("cum", sum(col("n")).over(w))
      .withColumn("total",
        sum(col("n")).over(Window.partitionBy(groupCols.map(col): _*)))
    val ests = qs.map { q =>
      min(when(col("cum") >= ceil(lit(q) * col("total")),
        (col("bin") + 1) * binWidth)).as(s"p${(q * 100).round}_ub")
    }
    cum.groupBy(groupCols.map(col): _*)
      .agg(max(col("total")).cast("long").as("n_rows"), ests: _*)
  }

  /** DuckDB mirror of [[histCounts]] + [[histQuantiles]] over a relation
    * `rel` with the integer value expression `valueExpr`.
    */
  def histQuantilesSql(rel: String, groupCols: Seq[String], valueExpr: String,
      binWidth: Long, qs: Seq[Double]): String = {
    val g = groupCols.mkString(", ")
    val ests = qs.map { q =>
      s"""CAST(min(CASE WHEN cum >= ceil($q * total)
         |           THEN (bin + 1) * $binWidth END) AS BIGINT) AS p${(q * 100).round}_ub""".stripMargin
    }.mkString(",\n       ")
    s"""hist AS (
       |  -- floor division via the non-negative remainder, sign-safe like
       |  -- the Spark side's (v - pmod(v, w)) DIV w
       |  SELECT $g,
       |         (CAST($valueExpr AS BIGINT)
       |            - ((CAST($valueExpr AS BIGINT) % $binWidth + $binWidth) % $binWidth))
       |           // $binWidth AS bin,
       |         count(*) AS n
       |  FROM $rel GROUP BY ALL),
       |hcum AS (
       |  SELECT $g, bin, n,
       |         sum(n) OVER (PARTITION BY $g ORDER BY bin
       |           ROWS UNBOUNDED PRECEDING) AS cum,
       |         sum(n) OVER (PARTITION BY $g) AS total
       |  FROM hist),
       |hq AS (
       |  SELECT $g, CAST(max(total) AS BIGINT) AS n_rows,
       |       $ests
       |  FROM hcum GROUP BY $g)""".stripMargin
  }
}
