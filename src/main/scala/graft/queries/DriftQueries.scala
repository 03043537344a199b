package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Data-quality monitoring over `events`: outlier flagging and
  * distribution-drift measurement — the checks a training-data pipeline
  * runs per ingestion batch to catch broken sources BEFORE they poison a
  * corpus (a sensor stuck at 1e9, a schema change shifting a value scale).
  *
  * Parity notes: all moments accumulate in exact DECIMAL and convert to
  * double once; every derived expression (mean, variance, z) is written
  * with the SAME operation order on both engines; bin-indexed sums fold in
  * sorted bin order (float addition is not associative).
  */
object DriftQueries {

  type Q = (SparkSession, String) => DataFrame

  private def sumDec(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(30, 10)))

  /** Z-score outliers per event_type: rows with |value − mean| > 3σ under
    * the per-type sample statistics. The stats pass is one map-side-
    * combined aggregate (count + two exact-DECIMAL moments per type — a
    * few rows total at any scale); the flag pass re-scans with the tiny
    * stats relation broadcast. Two scans, zero windows — the stats never
    * sit in a window frame, so no per-type sort and no whale-type
    * single-task stage.
    *
    * Variance is the textbook `(Σx² − n·mean²)/(n−1)` with mean and both
    * sums fixed to doubles first — the exact same op sequence as the
    * oracle, so z matches bitwise.
    */
  val valueOutliers: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("event_type"), col("value"))
    // ANSI guards (default ANSI mode throws on double division by zero):
    // a single-row type has no sample variance (n-1 = 0), a constant type
    // has std = 0 and no outliers by definition, and float cancellation
    // can push the variance numerator a hair negative (DuckDB sqrt errors
    // on negatives) — clamp at 0 and gate every division.
    val stats = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sumDec(col("value")).cast("double").as("sx"),
        sumDec(col("value") * col("value")).cast("double").as("sxx"))
      .filter(col("n") > 1L)
      .withColumn("mean", col("sx") / col("n").cast("double"))
      .withColumn("std", sqrt(greatest(
        (col("sxx") - col("n").cast("double") * col("mean") * col("mean"))
          / (col("n").cast("double") - lit(1.0)), lit(0.0))))
      .filter(col("std") > lit(0.0))
    ev.join(broadcast(stats), "event_type")
      .withColumn("z", (col("value") - col("mean")) / col("std"))
      .filter(abs(col("z")) > lit(3.0))
      .select(col("event_id"), col("event_type"), col("value"),
        graft.Parity.pround(col("z"), 6).as("z"))
      .orderBy(col("event_id"))
  }

  val valueOutliersSql: String =
    s"""WITH stats AS (
       |  SELECT event_type, count(*) AS n,
       |         CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) AS sx,
       |         CAST(sum(CAST(value * value AS DECIMAL(30,10))) AS DOUBLE) AS sxx
       |  FROM events GROUP BY 1
       |  HAVING count(*) > 1),
       |ms AS (
       |  SELECT event_type, n, sx / CAST(n AS DOUBLE) AS mean,
       |         sqrt(greatest(
       |           (sxx - CAST(n AS DOUBLE) * (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE)))
       |              / (CAST(n AS DOUBLE) - 1.0), 0.0)) AS std
       |  FROM stats),
       |msp AS (SELECT * FROM ms WHERE std > 0.0)
       |SELECT e.event_id, e.event_type, e.value,
       |       ${graft.Parity.proundSql("(e.value - m.mean) / m.std", 6)} AS z
       |FROM events e JOIN msp m USING (event_type)
       |WHERE abs((e.value - m.mean) / m.std) > 3.0
       |ORDER BY e.event_id""".stripMargin

  /** Distribution drift between two snapshot days as total variation
    * distance: per event_type, histogram `value` into width-5 bins for
    * each day, then `tvd = 0.5 · Σ_bins |f_a − f_b|`. TVD over a shared
    * binning is the drift metric that needs one pass per side and merges
    * by bin — unlike KS it never needs a global sort of either sample.
    *
    * Scale shape: each day is a pushed-filter scan (raw-nanos predicate →
    * parquet row-group pruning) + one (type, bin) aggregate; the bin table
    * is bounded by types × occupied bins regardless of row count. The
    * per-type fold runs over that bounded bin list in sorted order —
    * deterministic, and never a whale partition.
    */
  val distDrift: Q = (s, dir) => {
    def binCounts(day: String, p: String): DataFrame =
      Tables.eventsDay(s, dir, java.time.LocalDate.parse(day))
        .select(col("event_type"), floor(col("value") / lit(5.0)).as("bin"))
        .groupBy(col("event_type"), col("bin"))
        .agg(count(lit(1)).as(s"${p}_n"))
    val a = binCounts("2024-01-05", "a")
    val b = binCounts("2024-01-20", "b")
    val joined = a.join(b, Seq("event_type", "bin"), "full_outer")
      .select(col("event_type"), col("bin"),
        coalesce(col("a_n"), lit(0L)).as("a_n"),
        coalesce(col("b_n"), lit(0L)).as("b_n"))
    val totals = joined.groupBy(col("event_type"))
      .agg(sum(col("a_n")).as("na"), sum(col("b_n")).as("nb"))
    // ANSI guard: a type present in only ONE of the two days has a zero
    // total on the other side — exactly the drift a monitor must surface.
    // Disjoint support is maximal drift by definition (TVD = 1), so emit
    // that directly instead of letting 0/0 throw under default ANSI mode.
    joined.join(broadcast(totals), "event_type")
      .withColumn("d", when(col("na") > 0L && col("nb") > 0L, abs(
        col("a_n").cast("double") / col("na").cast("double")
          - col("b_n").cast("double") / col("nb").cast("double")))
        .otherwise(lit(0.0)))
      .groupBy(col("event_type"))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        sort_array(collect_list(struct(col("bin"), col("d")))).as("ds"))
      .select(col("event_type"), col("n_a"), col("n_b"),
        when(col("n_a") > 0L && col("n_b") > 0L,
          graft.Parity.pround(
            lit(0.5) * expr("aggregate(ds, CAST(0 AS DOUBLE), (acc, x) -> acc + x.d)"),
            6))
          .otherwise(lit(1.0)).as("tvd"))
      .orderBy(col("event_type"))
  }

  val distDriftSql: String =
    s"""WITH ev AS (
       |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, value
       |  FROM events),
       |a AS (
       |  SELECT event_type, floor(value / 5.0) AS bin, count(*) AS a_n
       |  FROM ev WHERE d = DATE '2024-01-05' GROUP BY 1, 2),
       |b AS (
       |  SELECT event_type, floor(value / 5.0) AS bin, count(*) AS b_n
       |  FROM ev WHERE d = DATE '2024-01-20' GROUP BY 1, 2),
       |j AS (
       |  SELECT event_type, bin,
       |         coalesce(a_n, 0) AS a_n, coalesce(b_n, 0) AS b_n
       |  FROM a FULL JOIN b USING (event_type, bin)),
       |t AS (
       |  SELECT event_type, sum(a_n) AS na, sum(b_n) AS nb
       |  FROM j GROUP BY 1),
       |d AS (
       |  SELECT j.event_type, j.bin,
       |         CASE WHEN t.na > 0 AND t.nb > 0
       |              THEN abs(CAST(j.a_n AS DOUBLE) / CAST(t.na AS DOUBLE)
       |                       - CAST(j.b_n AS DOUBLE) / CAST(t.nb AS DOUBLE))
       |              ELSE 0.0 END AS d
       |  FROM j JOIN t USING (event_type))
       |SELECT event_type,
       |       CAST(max(na_) AS BIGINT) AS n_a, CAST(max(nb_) AS BIGINT) AS n_b,
       |       CASE WHEN max(na_) > 0 AND max(nb_) > 0
       |            THEN ${graft.Parity.proundSql(
                      "0.5 * list_reduce(list_prepend(CAST(0 AS DOUBLE), list(d ORDER BY bin)), (acc, x) -> acc + x)",
                      6)}
       |            ELSE 1.0 END AS tvd
       |FROM (SELECT d.event_type, d.bin, d.d, t.na AS na_, t.nb AS nb_
       |      FROM d JOIN t USING (event_type))
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin

  /** ROBUST outliers per event_type — median/MAD instead of mean/σ, the
    * detector that survives what z-scores cannot: the outliers themselves
    * inflate σ until they hide (masking), while the median absolute
    * deviation has a 50% breakdown point. Flag: |value − median| >
    * 3 · 1.4826 · MAD (1.4826 normalizes MAD to σ under normality; the
    * multiply is one exact IEEE op).
    *
    * Exact medians, not approx: rank selection via a per-type ordered
    * window — rows at 1-based ranks ⌊(n+1)/2⌋ and ⌈(n+1)/2⌉ average (one
    * add + one halving, both engine-exact; odd n selects one row twice by
    * the same formula). Two selection passes (values, then deviations),
    * each a per-type spillable window sort — parallel ACROSS types, so no
    * single-task stage; at 100 TB exact per-group medians are two sorts of
    * the group's own rows, the same cost class as any per-key window here,
    * and the deterministic (value, event_id) tiebreak makes both engines
    * select identical rows.
    */
  val robustOutliers: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("event_type"), col("value"))
    def medianBy(df: DataFrame, valueCol: String, out: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
        .orderBy(col(valueCol), col("event_id"))
      df.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))))
        // Spark `/` on longs is FRACTIONAL division (DuckDB's is `//`):
        // floor to get the integer ranks, or even-n groups select nothing
        .filter(col("rn") === floor((col("n") + 1L) / 2L).cast("long") ||
          col("rn") === floor((col("n") + 2L) / 2L).cast("long"))
        .groupBy(col("event_type"))
        // 1 row (odd n, both ranks coincide) or 2 (even): sum/count is
        // identity or one add + exact halving
        .agg((sum(col(valueCol)) / count(lit(1))).as(out))
    }
    val med = medianBy(ev, "value", "med")
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = medianBy(dev, "adev", "mad").filter(col("mad") > 0.0)
    dev.join(broadcast(mad), "event_type")
      .filter(col("adev") > lit(3.0) * (lit(1.4826) * col("mad")))
      .select(col("event_id"), col("event_type"), col("value"),
        graft.Parity.pround(col("med"), 6).as("med"),
        graft.Parity.pround(col("mad"), 6).as("mad"))
      .orderBy(col("event_id"))
  }

  val robustOutliersSql: String =
    s"""WITH ev AS (SELECT event_id, event_type, value FROM events),
       |r1 AS (
       |  SELECT event_type, value,
       |         row_number() OVER (PARTITION BY event_type
       |                            ORDER BY value, event_id) AS rn,
       |         count(*) OVER (PARTITION BY event_type) AS n
       |  FROM ev),
       |med AS (
       |  SELECT event_type, sum(value) / count(*) AS med
       |  FROM r1 WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
       |  GROUP BY 1),
       |dev AS (
       |  SELECT e.event_id, e.event_type, e.value, m.med,
       |         abs(e.value - m.med) AS adev
       |  FROM ev e JOIN med m USING (event_type)),
       |r2 AS (
       |  SELECT event_type, adev,
       |         row_number() OVER (PARTITION BY event_type
       |                            ORDER BY adev, event_id) AS rn,
       |         count(*) OVER (PARTITION BY event_type) AS n
       |  FROM dev),
       |mad AS (
       |  SELECT event_type, sum(adev) / count(*) AS mad
       |  FROM r2 WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
       |  GROUP BY 1
       |  HAVING sum(adev) / count(*) > 0.0)
       |SELECT d.event_id, d.event_type, d.value,
       |       ${graft.Parity.proundSql("d.med", 6)} AS med,
       |       ${graft.Parity.proundSql("a.mad", 6)} AS mad
       |FROM dev d JOIN mad a USING (event_type)
       |WHERE d.adev > 3.0 * (1.4826 * a.mad)
       |ORDER BY d.event_id""".stripMargin

  /** Winsorized statistics per event_type — clip at exact p05/p95, then
    * the robust mean: the aggregate a pipeline trusts when
    * [[robustOutliers]] says the tails are wild but the rows must still
    * count (dropping outliers biases; clipping bounds their leverage).
    * Percentiles are EXACT rank selections (percentile_disc semantics:
    * the value at rank ⌈q·n⌉ under the deterministic (value, event_id)
    * order — pure integer rank arithmetic, no interpolation, so both
    * engines select the identical row). Per-type ranks come from the
    * [[graft.relational.GlobalIndex]] PER-GROUP form, NOT a
    * `PARTITION BY event_type` window: event_type is a ~5-value
    * vocabulary, so a per-type window partition grows linearly with the
    * corpus and one task would eventually sort 1/5 of 100 TB. The global
    * index ranges over (event_type, value, event_id) — range partitions
    * cut WITHIN a type, keeping every sort task bounded — and the
    * per-type rank is `idx − min(idx per type) + 1` with the |types|-row
    * offset relation broadcast back. A 2-row-per-type bounds relation
    * broadcasts back for the clip; the clipped mean accumulates
    * exact-decimal. |types| output rows.
    */
  val winsorizeStats: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("event_type"), col("value"))
    val idxed = graft.relational.GlobalIndex.withGlobalIndex(
      ev, Seq("event_type", "value", "event_id"))
    val grp = idxed.groupBy(col("event_type"))
      .agg(min(col("idx")).as("idx0"), count(lit(1)).as("n"))
    val ranked = idxed.join(broadcast(grp), "event_type")
      .withColumn("rn", col("idx") - col("idx0") + lit(1L))
    // ceil(q*n) in pure integer arithmetic: (n*q100 + 99) div 100
    def rank(q100: Int) =
      floor((col("n") * q100 + lit(99L)) / lit(100L)).cast("long")
    val bounds = ranked
      .filter(col("rn") === rank(5) || col("rn") === rank(95))
      .groupBy(col("event_type"))
      .agg(min(col("value")).as("p05"), max(col("value")).as("p95"))
    ev.join(broadcast(bounds), "event_type")
      .withColumn("clipped", least(greatest(col("value"), col("p05")), col("p95")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("p05")).as("p05"), min(col("p95")).as("p95"),
        graft.Parity.pround(
          sumDec(col("clipped")).cast("double") / count(lit(1)), 6)
          .as("win_mean"))
      .orderBy(col("event_type"))
  }

  val winsorizeStatsSql: String =
    s"""WITH ev AS (SELECT event_id, event_type, value FROM events),
       |r AS (
       |  SELECT event_type, value,
       |         row_number() OVER (PARTITION BY event_type
       |                            ORDER BY value, event_id) AS rn,
       |         count(*) OVER (PARTITION BY event_type) AS n
       |  FROM ev),
       |b AS (
       |  SELECT event_type, min(value) AS p05, max(value) AS p95
       |  FROM r
       |  WHERE rn = (n * 5 + 99) // 100 OR rn = (n * 95 + 99) // 100
       |  GROUP BY 1)
       |SELECT e.event_type, count(*) AS n_rows,
       |       min(b.p05) AS p05, min(b.p95) AS p95,
       |       ${graft.Parity.proundSql(
                 "CAST(sum(CAST(least(greatest(e.value, b.p05), b.p95) AS DECIMAL(30,10))) AS DOUBLE) / count(*)",
                 6)} AS win_mean
       |FROM ev e JOIN b USING (event_type)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Benford leading-digit audit over `o_totalprice` — the forensic
    * data-quality check for fabricated or truncated numeric feeds:
    * naturally-occurring multi-scale amounts follow P(d) = log10(1+1/d);
    * a synthetic source (constant scale, uniform noise, price floors)
    * departs visibly. The output is the observed leading-digit
    * distribution against the Benford expectation — the reviewer eyeballs
    * (or thresholds) the gap.
    *
    * The nine expected shares are PRE-COMPUTED 6-dp literals, not
    * `log10()` calls: ln/log10 carry no cross-engine bit contract, and
    * the reference distribution is a constant anyway. The leading digit
    * is string-extracted from the integer part (exact; no float log
    * tricks), so the whole query is one map-side-combined 9-group
    * aggregate plus a 1-row total broadcast.
    */
  val benfordCheck: Q = (s, dir) => {
    val expected = typedLit(Map(
      1L -> 0.30103, 2L -> 0.176091, 3L -> 0.124939, 4L -> 0.09691,
      5L -> 0.079181, 6L -> 0.066947, 7L -> 0.057992, 8L -> 0.051153,
      9L -> 0.045757))
    val digits = Tables.orders(s, dir)
      .filter(col("o_totalprice") >= lit(1.0))
      .select(substring(floor(col("o_totalprice")).cast("long")
        .cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = digits.agg(sum(col("n")).as("ntot"))
    digits.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        graft.Parity.pround(
          col("n").cast("double") / col("ntot").cast("double"), 6)
          .as("share"),
        element_at(expected, col("digit")).as("expected"))
      .orderBy(col("digit"))
  }

  val benfordCheckSql: String =
    s"""WITH d AS (
       |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
       |  FROM orders WHERE o_totalprice >= 1.0),
       |g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
       |t AS (SELECT CAST(sum(n) AS BIGINT) AS ntot FROM g)
       |SELECT digit, n,
       |       ${graft.Parity.proundSql(
                 "CAST(n AS DOUBLE) / CAST(ntot AS DOUBLE)", 6)} AS share,
       |       CAST(CASE digit WHEN 1 THEN 0.30103 WHEN 2 THEN 0.176091
       |                  WHEN 3 THEN 0.124939 WHEN 4 THEN 0.09691
       |                  WHEN 5 THEN 0.079181 WHEN 6 THEN 0.066947
       |                  WHEN 7 THEN 0.057992 WHEN 8 THEN 0.051153
       |                  WHEN 9 THEN 0.045757 END AS DOUBLE) AS expected
       |FROM g CROSS JOIN t ORDER BY digit""".stripMargin

  /** Welch's two-sample t between every pair of event_types — the A/B
    * experiment readout (unequal variances, unequal n): t and the
    * Welch–Satterthwaite degrees of freedom for each (a, b) pair,
    * a < b lexicographically. The input is the SAME per-type moment
    * battery as [[valueOutliers]] (count + two exact-DECIMAL moments,
    * one map-side-combined corpus pass); the pair cross is
    * |types|²-bounded — a vocabulary-scale self-join, never corpus-scale.
    *
    * `sqrt` is IEEE-754 correctly rounded on both engines (unlike ln/pow),
    * so the statistic is written directly: every intermediate (se terms,
    * numerator, df parts) is a named single expression evaluated in the
    * same order on both sides.
    */
  val abWelchT: Q = (s, dir) => {
    val stats = Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sumDec(col("value")).cast("double").as("sx"),
        sumDec(col("value") * col("value")).cast("double").as("sxx"))
      .filter(col("n") > 1L)
      .withColumn("mean", col("sx") / col("n").cast("double"))
      .withColumn("se", greatest(
        (col("sxx") - col("n").cast("double") * col("mean") * col("mean"))
          / (col("n").cast("double") - lit(1.0)), lit(0.0))
        / col("n").cast("double"))
    val a = stats.select(col("event_type").as("type_a"), col("n").as("n_a"),
      col("mean").as("mean_a"), col("se").as("se_a"))
    val b = stats.select(col("event_type").as("type_b"), col("n").as("n_b"),
      col("mean").as("mean_b"), col("se").as("se_b"))
    a.join(broadcast(b), col("type_a") < col("type_b"))
      .filter(col("se_a") + col("se_b") > lit(0.0))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        graft.Parity.pround(
          (col("mean_a") - col("mean_b")) / sqrt(col("se_a") + col("se_b")),
          6).as("t_stat"),
        graft.Parity.pround(
          ((col("se_a") + col("se_b")) * (col("se_a") + col("se_b"))) /
            (col("se_a") * col("se_a") / (col("n_a").cast("double") - lit(1.0)) +
              col("se_b") * col("se_b") / (col("n_b").cast("double") - lit(1.0))),
          6).as("df"))
      .orderBy(col("type_a"), col("type_b"))
  }

  val abWelchTSql: String =
    s"""WITH st AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) AS sx,
       |         CAST(sum(CAST(value * value AS DECIMAL(30,10))) AS DOUBLE) AS sxx
       |  FROM events GROUP BY 1 HAVING count(*) > 1),
       |m AS (SELECT event_type, n, sx / CAST(n AS DOUBLE) AS mean, sxx FROM st),
       |v AS (SELECT event_type, n, mean,
       |             greatest((sxx - CAST(n AS DOUBLE) * mean * mean)
       |                        / (CAST(n AS DOUBLE) - 1.0), 0.0)
       |               / CAST(n AS DOUBLE) AS se
       |      FROM m)
       |SELECT a.event_type AS type_a, b.event_type AS type_b,
       |       a.n AS n_a, b.n AS n_b,
       |       ${graft.Parity.proundSql(
                 "(a.mean - b.mean) / sqrt(a.se + b.se)", 6)} AS t_stat,
       |       ${graft.Parity.proundSql(
                 "((a.se + b.se) * (a.se + b.se)) / (a.se * a.se / (CAST(a.n AS DOUBLE) - 1.0) + b.se * b.se / (CAST(b.n AS DOUBLE) - 1.0))",
                 6)} AS df
       |FROM v a JOIN v b ON a.event_type < b.event_type
       |WHERE a.se + b.se > 0.0
       |ORDER BY type_a, type_b""".stripMargin

  /** Higher-moment distribution report per event_type — skewness and
    * excess kurtosis alongside the mean/std battery: the drift signals a
    * variance monitor misses (a source can keep its mean and variance
    * while its tail behavior flips — fat tails show in m₄, asymmetry in
    * m₃). All four raw power sums accumulate exact-DECIMAL in the SAME
    * one-pass map-side-combined aggregate ([[valueOutliers]]' battery
    * extended); central moments derive from raw ones in doubles with one
    * fixed operation order, σ via the bit-portable sqrt. Σx⁴ uses
    * DECIMAL(38,6): 32 integer digits hold 560⁴ × 10¹² rows with room to
    * spare, where (30,10) would saturate.
    */
  val momentsReport: Q = (s, dir) => {
    def sumDec6(c: org.apache.spark.sql.Column) =
      sum(c.cast(DecimalType(38, 6)))
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sumDec(col("value")).cast("double").as("sx"),
        sumDec(col("value") * col("value")).cast("double").as("sxx"),
        sumDec6(col("value") * col("value") * col("value")).cast("double").as("sx3"),
        sumDec6(col("value") * col("value") * col("value") * col("value"))
          .cast("double").as("sx4"))
      .filter(col("n") > 1L)
      .withColumn("nd", col("n").cast("double"))
      .withColumn("mu", col("sx") / col("nd"))
      .withColumn("q2", col("sxx") / col("nd"))
      .withColumn("q3", col("sx3") / col("nd"))
      .withColumn("q4", col("sx4") / col("nd"))
      .withColumn("m2", col("q2") - col("mu") * col("mu"))
      .filter(col("m2") > lit(0.0))
      .withColumn("sd", sqrt(col("m2")))
      .select(col("event_type"), col("n"),
        graft.Parity.pround(col("mu"), 6).as("mean"),
        graft.Parity.pround(col("sd"), 6).as("std"),
        graft.Parity.pround(
          (col("q3") - lit(3.0) * col("mu") * col("q2") +
            lit(2.0) * col("mu") * col("mu") * col("mu")) /
            (col("sd") * col("sd") * col("sd")), 6).as("skewness"),
        graft.Parity.pround(
          (col("q4") - lit(4.0) * col("mu") * col("q3") +
            lit(6.0) * col("mu") * col("mu") * col("q2") -
            lit(3.0) * col("mu") * col("mu") * col("mu") * col("mu")) /
            (col("m2") * col("m2")) - lit(3.0), 6).as("kurtosis_excess"))
      .orderBy(col("event_type"))
  }

  val momentsReportSql: String =
    s"""WITH st AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) AS sx,
       |         CAST(sum(CAST(value * value AS DECIMAL(30,10))) AS DOUBLE) AS sxx,
       |         CAST(sum(CAST(value * value * value AS DECIMAL(38,6))) AS DOUBLE) AS sx3,
       |         CAST(sum(CAST(value * value * value * value AS DECIMAL(38,6))) AS DOUBLE) AS sx4
       |  FROM events GROUP BY 1 HAVING count(*) > 1),
       |d1 AS (
       |  SELECT event_type, n, CAST(n AS DOUBLE) AS nd, sx, sxx, sx3, sx4
       |  FROM st),
       |d2 AS (
       |  SELECT event_type, n, nd, sx / nd AS mu, sxx / nd AS q2,
       |         sx3 / nd AS q3, sx4 / nd AS q4
       |  FROM d1),
       |d3 AS (
       |  SELECT event_type, n, mu, q2, q3, q4, q2 - mu * mu AS m2
       |  FROM d2),
       |d4 AS (
       |  SELECT event_type, n, mu, q2, q3, q4, m2, sqrt(m2) AS sd
       |  FROM d3 WHERE m2 > 0.0)
       |SELECT event_type, n,
       |       ${graft.Parity.proundSql("mu", 6)} AS mean,
       |       ${graft.Parity.proundSql("sd", 6)} AS std,
       |       ${graft.Parity.proundSql(
                 "(q3 - 3.0 * mu * q2 + 2.0 * mu * mu * mu) / (sd * sd * sd)",
                 6)} AS skewness,
       |       ${graft.Parity.proundSql(
                 "(q4 - 4.0 * mu * q3 + 6.0 * mu * mu * q2 - 3.0 * mu * mu * mu * mu) / (m2 * m2) - 3.0",
                 6)} AS kurtosis_excess
       |FROM d4 ORDER BY event_type""".stripMargin


  /** Delete-one-group jackknife CI for the corpus mean document length —
    * the label-free error bar a corpus-stats report should carry: with
    * g sources as the jackknife groups, every leave-one-source-out mean
    * θ₍h₎ comes from the SAME one-pass per-source sums (θ₍h₎ =
    * (S−S_h)/(N−N_h) — g replicates priced as ONE aggregate, never g
    * passes), and SE² = (g−1)/g · Σ(θ₍h₎ − θ̄)². The group count is
    * bounded by construction (|sources|), so every cross-replicate sum
    * runs on a tiny relation; per-replicate arithmetic is pinned-order
    * IEEE, cross-replicate sums quantize 1e6 into exact DECIMAL, and the
    * 95% z rides as the shared literal 1.959964.
    */
  val jackknifeCi: Q = (s, dir) => {
    val dec = DecimalType(25, 0)
    val docs = Tables.documents(s, dir)
    val per = docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_h"), sum(col("n_chars").cast(dec)).as("s_h"))
    val tot = per.agg(sum(col("n_h")).as("n"), sum(col("s_h")).as("s"),
      count(lit(1)).as("g"))
    val loo = per.crossJoin(broadcast(tot))
      // g = 1: the single leave-one-out replicate is empty (n = n_h) and
      // the jackknife is undefined — pin the replicate to the overall
      // mean so dev = 0 and the CI collapses to the point estimate
      .withColumn("theta_loo",
        when(col("n") === col("n_h"),
          col("s").cast("double") / col("n").cast("double"))
        .otherwise((col("s").cast("double") - col("s_h").cast("double")) /
          (col("n").cast("double") - col("n_h").cast("double"))))
    val lbar = loo.agg(
      (sum(floor(col("theta_loo") * lit(1e6) + lit(0.5)).cast(dec))
        .cast("double") / lit(1e6) / max(col("g")).cast("double")).as("theta_bar"))
    val agg = loo.crossJoin(broadcast(lbar))
      .withColumn("dev", col("theta_loo") - col("theta_bar"))
      .agg(
        max(col("g")).as("g"),
        (max(col("s")).cast("double") / max(col("n")).cast("double")).as("theta_hat"),
        (sum(floor(col("dev") * col("dev") * lit(1e6) + lit(0.5)).cast(dec))
          .cast("double") / lit(1e6)).as("ssq"))
      .withColumn("se_jack", sqrt(
        (col("g").cast("double") - lit(1.0)) / col("g").cast("double") * col("ssq")))
    agg.select(col("g"),
      graft.Parity.pround(col("theta_hat"), 6).as("theta_hat"),
      graft.Parity.pround(col("se_jack"), 6).as("se_jack"),
      graft.Parity.pround(
        col("theta_hat") - lit(1.959964) * col("se_jack"), 6).as("ci_lo"),
      graft.Parity.pround(
        col("theta_hat") + lit(1.959964) * col("se_jack"), 6).as("ci_hi"))
  }

  val jackknifeCiSql: String =
    s"""WITH per AS (
       |  SELECT source, count(*) AS n_h, sum(CAST(n_chars AS DECIMAL(25,0))) AS s_h
       |  FROM documents GROUP BY 1),
       |tot AS (
       |  SELECT sum(n_h) AS n, sum(s_h) AS s, count(*) AS g FROM per),
       |loo AS (
       |  -- g = 1 guard mirrors the engine: empty replicate -> overall mean
       |  SELECT p.*, t.n, t.s, t.g,
       |         CASE WHEN t.n = p.n_h
       |              THEN CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE)
       |              ELSE (CAST(t.s AS DOUBLE) - CAST(p.s_h AS DOUBLE)) /
       |                (CAST(t.n AS DOUBLE) - CAST(p.n_h AS DOUBLE)) END AS theta_loo
       |  FROM per p CROSS JOIN tot t),
       |lb AS (
       |  SELECT CAST(sum(CAST(floor(theta_loo * 1e6 + 0.5) AS DECIMAL(25,0))) AS DOUBLE)
       |           / 1e6 / CAST(max(g) AS DOUBLE) AS theta_bar
       |  FROM loo),
       |agg AS (
       |  SELECT max(l.g) AS g,
       |         max(CAST(l.s AS DOUBLE) / CAST(l.n AS DOUBLE)) AS theta_hat,
       |         sqrt((CAST(max(l.g) AS DOUBLE) - 1.0) / CAST(max(l.g) AS DOUBLE)
       |           * (CAST(sum(CAST(floor((l.theta_loo - b.theta_bar)
       |               * (l.theta_loo - b.theta_bar) * 1e6 + 0.5) AS DECIMAL(25,0))) AS DOUBLE) / 1e6)) AS se_jack
       |  FROM loo l CROSS JOIN lb b)
       |SELECT CAST(g AS BIGINT) AS g,
       |       ${graft.Parity.proundSql("theta_hat", 6)} AS theta_hat,
       |       ${graft.Parity.proundSql("se_jack", 6)} AS se_jack,
       |       ${graft.Parity.proundSql("theta_hat - 1.959964 * se_jack", 6)} AS ci_lo,
       |       ${graft.Parity.proundSql("theta_hat + 1.959964 * se_jack", 6)} AS ci_hi
       |FROM agg""".stripMargin


  val queries: Map[String, Q] = Map(
    "moments_report" -> momentsReport,
    "value_outliers" -> valueOutliers,
    "robust_outliers" -> robustOutliers,
    "winsorize_stats" -> winsorizeStats,
    "dist_drift" -> distDrift,
    "benford_check" -> benfordCheck,
    "ab_welch_t" -> abWelchT,
    "jackknife_ci" -> jackknifeCi)

  val oracleSql: Map[String, String] = Map(
    "moments_report" -> momentsReportSql,
    "value_outliers" -> valueOutliersSql,
    "robust_outliers" -> robustOutliersSql,
    "winsorize_stats" -> winsorizeStatsSql,
    "dist_drift" -> distDriftSql,
    "benford_check" -> benfordCheckSql,
    "ab_welch_t" -> abWelchTSql,
    "jackknife_ci" -> jackknifeCiSql)
}
