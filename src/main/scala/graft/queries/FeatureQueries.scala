package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Supervised feature-engineering over `events`/`embeddings` — the
  * tabular-side preprocessing a training-data pipeline runs before any
  * model sees a row: leakage-safe categorical encoding, deterministic
  * cross-validation folds, and recency weighting.
  *
  * Parity notes (the house rules): cross-row double sums quantize to
  * exact DECIMAL before summing (float addition is not associative across
  * engines/partitionings); every derived double expression is written with
  * the SAME operation order on both sides; weights that must be exact are
  * built from integer bit-shifts (2^-k), never libm `pow` (no cross-engine
  * bit contract).
  */
object FeatureQueries {

  type Q = (SparkSession, String) => DataFrame

  private def sumDec(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(30, 10)))

  // ------------------------------------------------------------ target_encode

  /** Smoothed target (mean) encoding of a categorical feature — the
    * standard high-cardinality-categorical treatment for tabular training
    * data: encode each `event_type` by a shrunk mean of the target
    * (`value`), `enc = (Σ_c y + m·ȳ) / (n_c + m)` with prior weight
    * m = 100. Rare categories collapse to the global mean (no leakage
    * from tiny cells), frequent ones keep their own mean.
    *
    * Scale shape: ONE map-side-combined aggregate per category plus a
    * 1-row global-moment relation broadcast back — no window, no second
    * corpus scan (the global sums derive from the per-category relation,
    * which is vocabulary-bounded, not corpus-bounded). At 100 TB the only
    * corpus-scale stage is the first partial aggregate.
    */
  val targetEncode: Q = (s, dir) => {
    val perCat = Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sumDec(col("value")).as("sy"))
    val globals = perCat.agg(
      sum(col("n")).as("ng"), sum(col("sy")).as("syg"))
    perCat.crossJoin(broadcast(globals))
      .withColumn("gmean",
        col("syg").cast("double") / col("ng").cast("double"))
      .select(col("event_type"), col("n"),
        graft.Parity.pround(
          (col("sy").cast("double") + lit(100.0) * col("gmean")) /
            (col("n").cast("double") + lit(100.0)), 6).as("enc"))
      .orderBy(col("event_type"))
  }

  val targetEncodeSql: String =
    s"""WITH pc AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       |         sum(CAST(value AS DECIMAL(30,10))) AS sy
       |  FROM events GROUP BY 1),
       |g AS (SELECT CAST(sum(n) AS BIGINT) AS ng, sum(sy) AS syg FROM pc)
       |SELECT event_type, n,
       |       ${graft.Parity.proundSql(
                 "(CAST(sy AS DOUBLE) + 100.0 * (CAST(syg AS DOUBLE) / CAST(ng AS DOUBLE))) / (CAST(n AS DOUBLE) + 100.0)",
                 6)} AS enc
       |FROM pc CROSS JOIN g ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------ kfold_assign

  /** Deterministic k-fold cross-validation assignment with a fold-balance
    * report: fold(row) = hash(vec_id) mod 5 via the engine-portable hash,
    * so every re-run — and every engine — assigns identical folds without
    * persisting an assignment table. The output is the per-(fold, label)
    * contingency: the balance check run before training to confirm no
    * fold is label-skewed.
    *
    * Scale shape: per-row hash + one map-side-combined aggregate; the
    * result is (k × |labels|)-bounded. `rand()`-based folding would be
    * neither reproducible across retries nor consistent across engines —
    * the same argument as [[SamplingQueries]]' portable-hash splits.
    */
  val kfoldAssign: Q = (s, dir) =>
    Tables.embeddings(s, dir)
      .select(pmod(graft.functions.PortableHash.hash32(col("vec_id")),
        lit(5L)).as("fold"), col("label"))
      .groupBy(col("fold"), col("label"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("fold"), col("label"))

  val kfoldAssignSql: String =
    s"""SELECT ${graft.functions.PortableHash.hash32Sql("vec_id")} % 5 AS fold,
       |       CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n
       |FROM embeddings GROUP BY 1, 2 ORDER BY fold, label""".stripMargin

  // ------------------------------------------------------------ decay_weighted

  /** Recency-weighted per-user mean — the time-decay aggregate a feature
    * store computes ("user's recent activity level"): each event weighs
    * 2^-k where k = age-in-weeks at the corpus high-watermark, i.e. a
    * 1-week half-life in weekly steps. The weight is built as
    * `1 / (1 << k)` — an integer shift then one exact IEEE division by a
    * power of two — NOT `pow(0.5, k)`: libm pow carries no cross-engine
    * bit contract, shifts do. k caps at 62 (shift-width bound; 2^-62 is
    * already 0 at the DECIMAL(30,10) quantization both engines share).
    *
    * Scale shape: the high-watermark is a 1-row broadcast (the
    * [[graft.store.IncrementalStore]] watermark pattern); then one
    * map-side-combined aggregate per user. No window, no per-user sort —
    * at 100 TB the whale user costs nothing beyond its row count.
    */
  val decayWeighted: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    val hw = ev.agg(max(to_date(col("ts"))).as("mx"))
    ev.crossJoin(broadcast(hw))
      .withColumn("k",
        least(floor(datediff(col("mx"), to_date(col("ts"))) / lit(7))
          .cast("int"), lit(62)))
      .withColumn("w",
        lit(1.0) / expr("shiftleft(CAST(1 AS BIGINT), k)").cast("double"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sumDec(col("value") * col("w")).as("svw"),
        sumDec(col("w")).as("sw"))
      // a user whose entire history is older than ~35 weeks quantizes
      // every weight to 0 at DECIMAL(30,10): no recency signal exists, so
      // the row is dropped rather than emitting 0/0 (NULL on Spark, NaN on
      // DuckDB — a guaranteed cross-engine divergence)
      .filter(col("sw") > lit(0))
      .select(col("user_id"), col("n"),
        graft.Parity.pround(
          col("svw").cast("double") / col("sw").cast("double"), 6)
          .as("decayed_mean"))
      .orderBy(col("user_id"))
  }

  val decayWeightedSql: String =
    s"""WITH hw AS (SELECT max(CAST(ts AS DATE)) AS mx FROM events),
       |wts AS (
       |  SELECT user_id, value,
       |         1.0 / CAST((CAST(1 AS BIGINT) << LEAST(
       |           CAST(floor(date_diff('day', CAST(ts AS DATE), mx) / 7) AS INTEGER),
       |           62)) AS DOUBLE) AS w
       |  FROM events CROSS JOIN hw)
       |SELECT user_id, CAST(count(*) AS BIGINT) AS n,
       |       ${graft.Parity.proundSql(
                 "CAST(sum(CAST(value * w AS DECIMAL(30,10))) AS DOUBLE) / CAST(sum(CAST(w AS DECIMAL(30,10))) AS DOUBLE)",
                 6)} AS decayed_mean
       |FROM wts GROUP BY user_id
       |HAVING sum(CAST(w AS DECIMAL(30,10))) > 0
       |ORDER BY user_id""".stripMargin

  // ------------------------------------------------------------ gini_activity

  /** Gini coefficient of per-user activity — the whale-user inequality
    * profile (how concentrated is the event stream?), the number a
    * sampling strategy consults before deciding per-user caps. Exact rank
    * formula G = (2·Σᵢ i·cᵢ − (n+1)·Σc) / (n·Σc) over counts sorted
    * ascending — the rank i comes from [[graft.relational.GlobalIndex]]
    * (range-partitioned global row number), NEVER a single-partition
    * `row_number() OVER (ORDER BY …)`: the count relation is
    * |users|-sized, which at 100 TB is itself billions of rows. Both Σ
    * accumulate in DECIMAL(38,0) (i·c products reach ~1e27 at profiled
    * scale); the final expression is three exact integer casts and fixed
    * double arithmetic. ONE output row.
    */
  val giniActivity: Q = (s, dir) => {
    val counts = Tables.events(s, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
    val idxed = graft.relational.GlobalIndex.withGlobalIndex(
      counts, Seq("c", "user_id"))
    // cast BEFORE multiplying: idx·c wraps BIGINT at exactly the scale
    // this profile diagnoses (the skew_profile lesson); 19+19 digit
    // operands keep the product inside both engines' DECIMAL(38,0)
    idxed.agg(count(lit(1)).as("n_users"),
        sum(col("c").cast(DecimalType(38, 0))).as("sc"),
        sum(col("idx").cast(DecimalType(19, 0)) *
          col("c").cast(DecimalType(19, 0))).as("src"))
      .select(col("n_users"), col("sc").cast("long").as("total_events"),
        graft.Parity.pround(
          (lit(2.0) * col("src").cast("double") -
            (col("n_users").cast("double") + lit(1.0)) * col("sc").cast("double")) /
            (col("n_users").cast("double") * col("sc").cast("double")), 6)
          .as("gini"))
  }

  val giniActivitySql: String =
    s"""WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS c
       |           FROM events GROUP BY 1),
       |r AS (SELECT c, CAST(row_number() OVER (ORDER BY c, user_id) AS BIGINT) AS idx
       |      FROM c),
       |g AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
       |             sum(CAST(c AS DECIMAL(38,0))) AS sc,
       |             sum(CAST(idx AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))) AS src
       |      FROM r)
       |SELECT n_users, CAST(sc AS BIGINT) AS total_events,
       |       ${graft.Parity.proundSql(
                 "(2.0 * CAST(src AS DOUBLE) - (CAST(n_users AS DOUBLE) + 1.0) * CAST(sc AS DOUBLE)) / (CAST(n_users AS DOUBLE) * CAST(sc AS DOUBLE))",
                 6)} AS gini
       |FROM g""".stripMargin

  // ------------------------------------------------------------ churn_labels

  /** Churn label generation — the supervised-label derivation a training
    * pipeline runs against its own event log: the observation window ends
    * 14 days before the corpus high-watermark; users active in the
    * observation window get `churned = 1` iff they have NO event in the
    * final 14 days. Features (here: observation-window event count) and
    * label come from the SAME single conditional aggregate, so the label
    * boundary is leak-proof by construction (no post-cutoff data feeds a
    * feature). One corpus pass, one 1-row cutoff broadcast.
    */
  val churnLabels: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    val hw = ev.agg(date_sub(max(to_date(col("ts"))), 14).as("cutoff"))
    ev.crossJoin(broadcast(hw))
      .groupBy(col("user_id"))
      .agg(sum(when(to_date(col("ts")) < col("cutoff"), 1L).otherwise(0L))
          .as("n_before"),
        sum(when(to_date(col("ts")) >= col("cutoff"), 1L).otherwise(0L))
          .as("n_after"))
      .filter(col("n_before") > 0L)
      .select(col("user_id"), col("n_before"),
        when(col("n_after") === 0L, 1L).otherwise(0L).as("churned"))
      .orderBy(col("user_id"))
  }

  val churnLabelsSql: String =
    s"""WITH hw AS (SELECT max(CAST(ts AS DATE)) - 14 AS cutoff FROM events),
       |g AS (
       |  SELECT user_id,
       |         CAST(sum(CASE WHEN CAST(ts AS DATE) < cutoff THEN 1 ELSE 0 END) AS BIGINT) AS n_before,
       |         CAST(sum(CASE WHEN CAST(ts AS DATE) >= cutoff THEN 1 ELSE 0 END) AS BIGINT) AS n_after
       |  FROM events CROSS JOIN hw GROUP BY user_id)
       |SELECT user_id, n_before,
       |       CAST(CASE WHEN n_after = 0 THEN 1 ELSE 0 END AS BIGINT) AS churned
       |FROM g WHERE n_before > 0 ORDER BY user_id""".stripMargin

  // ------------------------------------------------------------ seasonality

  /** Calendar seasonality profile — mean value per (event_type, ISO
    * weekday, hour-of-day): the time-feature extraction a forecasting or
    * anomaly pipeline joins back onto raw events ("is this value odd FOR
    * A SUNDAY 3AM?"). One map-side-combined aggregate into a
    * (|types|×7×24)-bounded relation. Weekday parity trap: Spark's
    * `dayofweek` is Sunday=1 while DuckDB's `dayofweek` is Sunday=0, so
    * BOTH sides are written in the ISO convention instead (Monday=1 …
    * Sunday=7: Spark `weekday()+1`, DuckDB `isodow()`), which no engine
    * disagrees on.
    */
  val seasonalityProfile: Q = (s, dir) =>
    Tables.events(s, dir)
      .select(col("event_type"),
        (expr("weekday(ts)") + lit(1)).cast("long").as("isodow"),
        hour(col("ts")).cast("long").as("hod"), col("value"))
      .groupBy(col("event_type"), col("isodow"), col("hod"))
      .agg(count(lit(1)).as("n"),
        graft.Parity.pround(
          sumDec(col("value")).cast("double") / count(lit(1)).cast("double"),
          6).as("mean_value"))
      .orderBy(col("event_type"), col("isodow"), col("hod"))

  val seasonalityProfileSql: String =
    s"""SELECT event_type,
       |       CAST(isodow(CAST(ts AS TIMESTAMP)) AS BIGINT) AS isodow,
       |       CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hod,
       |       CAST(count(*) AS BIGINT) AS n,
       |       ${graft.Parity.proundSql(
                 "CAST(sum(CAST(value AS DECIMAL(30,10))) AS DOUBLE) / CAST(count(*) AS DOUBLE)",
                 6)} AS mean_value
       |FROM events
       |GROUP BY 1, 2, 3 ORDER BY event_type, isodow, hod""".stripMargin

  // ------------------------------------------------------------ registry

  /** Rank-based quantile normalization of the metric stream — the
    * ML-preprocessing transform that maps each value to its empirical
    * quantile r/(n+1) within its event type (heavy-tail-proof feature
    * scaling; two batches normalize onto the same [0,1] scale no matter
    * how their raw ranges drift). The per-group rank runs through
    * [[GlobalIndex]]'s range-parallel two-phase form — global index over
    * (type, value, event_id), minus each type's broadcast min-index —
    * never a per-type single-task ORDER BY window; ranks are exact
    * integers, so the only float op is one pinned division.
    */
  val quantileNormalize: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("event_type"), col("value"))
    val gi = graft.relational.GlobalIndex.withGlobalIndex(ev,
      Seq("event_type", "value", "event_id"), idxName = "__gidx")
    val grp = gi.groupBy(col("event_type"))
      .agg(min(col("__gidx")).as("__g0"), count(lit(1)).as("__n"))
    gi.join(broadcast(grp), "event_type")
      .withColumn("rank", col("__gidx") - col("__g0") + 1L)
      .select(col("event_id"), col("event_type"), col("value"), col("rank"),
        graft.Parity.pround(
          col("rank").cast("double") /
            (col("__n") + lit(1L)).cast("double"), 6).as("qnorm"))
      .orderBy(col("event_id"))
  }

  val quantileNormalizeSql: String =
    s"""WITH r AS (
       |  SELECT event_id, event_type, CAST(value AS DOUBLE) AS value,
       |         CAST(row_number() OVER (PARTITION BY event_type
       |           ORDER BY CAST(value AS DOUBLE), event_id) AS BIGINT) AS rank,
       |         count(*) OVER (PARTITION BY event_type) AS n
       |  FROM events)
       |SELECT event_id, event_type, value, rank,
       |       ${graft.Parity.proundSql("CAST(rank AS DOUBLE) / CAST(n + 1 AS DOUBLE)", 6)} AS qnorm
       |FROM r ORDER BY event_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "target_encode" -> targetEncode,
    "kfold_assign" -> kfoldAssign,
    "decay_weighted" -> decayWeighted,
    "gini_activity" -> giniActivity,
    "churn_labels" -> churnLabels,
    "seasonality_profile" -> seasonalityProfile,
    "quantile_normalize" -> quantileNormalize)

  val oracleSql: Map[String, String] = Map(
    "target_encode" -> targetEncodeSql,
    "kfold_assign" -> kfoldAssignSql,
    "decay_weighted" -> decayWeightedSql,
    "gini_activity" -> giniActivitySql,
    "churn_labels" -> churnLabelsSql,
    "seasonality_profile" -> seasonalityProfileSql,
    "quantile_normalize" -> quantileNormalizeSql)
}
