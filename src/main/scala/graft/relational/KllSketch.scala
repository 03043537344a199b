package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Mergeable rank-error quantile sketch — the KLL/MRL-class primitive that
  * completes the sketch family beside [[Sketches.histCounts]] (reference
  * analog: the percentile read-outs a monitoring pass runs over metric
  * streams). The histogram needs a pre-chosen bin width — fine for bounded
  * domains, wrong for heavy-tailed unknown ranges where a fixed grid
  * under-resolves the tail; [[GlobalIndex]] is exact but costs a full
  * range-repartition of the corpus per quantile query. This sketch keeps
  * ACTUAL data values (selection, not arithmetic — so estimates are
  * bit-exact corpus elements on any engine) with a rank-error bound, and
  * two sketches merge by union + re-compaction, the per-day/per-partition
  * serving pattern of the HLL registers and CMS counters.
  *
  * Algorithm: leveled compaction with DERANDOMIZED coin flips. Every value
  * starts at level 0 with weight 1. Round r sorts the level-r items per
  * group by (value, tiebreak), pairs them by rank, keeps ONE member of each
  * pair — chosen by the parity of a portable 32-bit hash of
  * (group, level, pair), not rand(), so both engines replay the identical
  * sketch — and promotes it to level r+1 with doubled weight; an unpaired
  * last item stays put. Classic KLL flips a fair coin per compaction; the
  * hash parity derandomizes it (the md5 bits are uncorrelated with the
  * data ordering), keeping the expected-case analysis while making the
  * sketch a pure function of the data. Each round halves the level-r
  * count and preserves total weight exactly, so after R rounds the sketch
  * holds ≤ n/2^R items at level R plus ≤1 leftover per lower level, and
  * any threshold's weighted rank differs from its true rank by at most
  * Σ_{r<R} 2^r < 2^R (one compaction at level r displaces a rank estimate
  * by at most one level-(r+1) weight; KllSketchSpec measures the bound
  * against GlobalIndex exact ranks).
  *
  * Scale shape: every ranking runs through [[GlobalIndex]]'s range-
  * partitioned two-phase form (never a per-group single-task window — the
  * level-0 sort is over the full corpus), rounds touch geometrically
  * shrinking relations (total work ≈ 2n), and the quantile read-out
  * windows over SKETCH rows (2^R× smaller than the data; R is the caller's
  * accuracy/size dial, log2(n/k) for a k-item sketch). Rounds are an
  * UNCONDITIONAL pinned count, not a data-dependent while-loop: the oracle
  * unrolls exactly R CTE rounds (the pagerank pattern), and a
  * conditional "compact only when over capacity" branch would make the
  * SQL mirror data-dependent.
  */
object KllSketch {

  /** Per-group rank (1-based, ordered by `orderCols`) via the GlobalIndex
    * two-phase form: global index over (groupCols ++ orderCols), then
    * subtract each group's min index — the sort stays range-parallel, and
    * the per-group offset relation is |groups| rows. `groupCols ++
    * orderCols` must be a unique total order.
    */
  private def perGroupRank(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[String]): DataFrame = {
    val gi = GlobalIndex.withGlobalIndex(df, groupCols ++ orderCols,
      idxName = "__gidx")
    val mins =
      if (groupCols.isEmpty) gi.select(min(col("__gidx")).as("__g0"))
      else gi.groupBy(groupCols.map(col): _*).agg(min(col("__gidx")).as("__g0"))
    val joined =
      if (groupCols.isEmpty) gi.crossJoin(broadcast(mins))
      else gi.join(mins, groupCols)
    joined.withColumn("rk", col("__gidx") - col("__g0") + 1L)
      .drop("__gidx", "__g0")
  }

  /** Lift raw rows to level-0 sketch items: (groupCols…, level, value,
    * tid, w=1). `tidCol` must be unique per row (the deterministic sort
    * tiebreak and the item identity through promotions).
    */
  def items0(df: DataFrame, groupCols: Seq[String], valueCol: Column,
      tidCol: Column): DataFrame =
    df.select(groupCols.map(col) ++ Seq(lit(0).as("level"),
      valueCol.cast("double").as("value"), tidCol.cast("long").as("tid"),
      lit(1L).as("w")): _*)

  /** Run compaction rounds `fromLevel until toLevel`: round r halves the
    * level-r items into level r+1 (hash-chosen member of each rank pair,
    * weight doubled; odd leftover stays at level r). Usable both to BUILD
    * a sketch (fromLevel 0 over level-0 items) and to MERGE sketches
    * (union the item relations, then re-compact — levels over capacity
    * cascade upward through the same rounds).
    */
  /** @param inputMaterialized callers whose `itemsIn` is already backed by
    *   files (a [[graft.Scratch.fixture]], a sink read-back) set this to
    *   skip the FIRST round's scratch write — the two consumers then
    *   re-read cheap files instead of paying a redundant write; purely a
    *   physical choice, values unchanged.
    */
  def compact(itemsIn: DataFrame, groupCols: Seq[String],
      fromLevel: Int, toLevel: Int,
      inputMaterialized: Boolean = false): DataFrame = {
    var items = itemsIn
    for (r <- fromLevel until toLevel) {
      // materialize the round's input once: it has two consumers (cur +
      // rest) and feeds the next round — left lazy, round R's plan
      // re-evaluates every earlier round's ranking per consumer, turning
      // the R-round cascade quadratic in recomputation (the three KLL
      // queries' sf0.01 verify run: 121 s lazy → 64 s materialized).
      // Each write is a shrinking relation (≤ n/2^r level-r items), so
      // total scratch IO ≈ 2n rows.
      if (r != fromLevel || !inputMaterialized)
        items = graft.Scratch.table(items, s"kll-round-$r")
      val cur = items.filter(col("level") === r)
      val rest = items.filter(col("level") =!= r)
      val ranked = perGroupRank(cur, groupCols, Seq("value", "tid"))
        .withColumn("pair", expr("(rk - 1L) DIV 2L"))
      val paired = ranked.withColumn("pc",
        count(lit(1)).over(
          Window.partitionBy((groupCols :+ "pair").map(col): _*)))
      // hash parity picks the surviving pair member; the key renders group
      // values, the level literal, and the pair ordinal identically in
      // both engines (ISO dates, plain integers)
      val keyCols = groupCols.map(c => col(c).cast("string")) ++
        Seq(lit(r.toString), col("pair").cast("string"))
      val keepPos = PortableHash.hash32(concat_ws("|", keyCols: _*)) % 2L
      val promoted = paired
        .filter(col("pc") === 2L && (col("rk") - 1L) % 2L === keepPos)
        .select(groupCols.map(col) ++ Seq(lit(r + 1).as("level"),
          col("value"), col("tid"), (col("w") * 2L).as("w")): _*)
      val leftover = paired.filter(col("pc") === 1L)
        .select(groupCols.map(col) ++ Seq(col("level"), col("value"),
          col("tid"), col("w")): _*)
      items = rest.unionByName(promoted).unionByName(leftover)
    }
    items
  }

  /** Build a sketch in `rounds` compaction rounds: ≤ n/2^rounds items at
    * the top level plus ≤1 leftover per lower level, total weight = n.
    */
  def sketch(df: DataFrame, groupCols: Seq[String], valueCol: Column,
      tidCol: Column, rounds: Int): DataFrame =
    compact(items0(df, groupCols, valueCol, tidCol), groupCols, 0, rounds)

  /** [[sketch]] through [[compactAuto]]: the BUILD gets the fused single-
    * job plan when the corpus is measured small enough for per-(group,
    * level) windows, and the range-parallel GlobalIndex cascade otherwise
    * — the count here scans the source once (at 100 TB that cost is noise
    * against the build it sizes, and parquet count() is metadata-only).
    * Values identical either way (compactFused ≡ compact, spec-pinned).
    */
  def sketchAuto(df: DataFrame, groupCols: Seq[String], valueCol: Column,
      tidCol: Column, rounds: Int): DataFrame =
    compactAuto(items0(df, groupCols, valueCol, tidCol), groupCols, 0, rounds)

  /** Certified-small input ceiling for [[compactAuto]]'s fused path: a
    * merge input under this row count sorts per (group, level) partition in
    * a single task comfortably (≤ ~32 MB of (value, tid, w) triples even if
    * one partition holds everything).
    */
  val FuseMaxRows: Long = 1000000L

  /** SUB-THRESHOLD FAST PATH: the same compaction rounds as [[compact]],
    * value-for-value, planned as ONE linear job with zero per-round scratch
    * round-trips. [[compact]] must materialize every round because its
    * output feeds two consumers (the level-r branch and the pass-through
    * branch) plus the next round — left lazy, the R-round cascade
    * re-evaluates exponentially. This form consumes each round's input
    * EXACTLY ONCE: rank within (group, level) — for level-r rows identical
    * to ranking the filtered level-r relation — derive the odd-count
    * leftover from the partition count (`rk == cnt && cnt odd` ⇔ the
    * unpaired last item), and express compact-or-carry as one projection +
    * filter. R rounds stack into R window operators in a single linear
    * plan: no self-union, no recompute multiplication, no job-per-round.
    *
    * The per-(group, level) window is the memory bound the caller must
    * certify (contrast [[compact]]'s GlobalIndex range-parallel rank, which
    * has none): ONLY use this on relations that are certifiably tiny —
    * sketch-item tables, never raw rows. [[compactAuto]] enforces that with
    * a count of the (file-backed) input. Values are identical to
    * [[compact]] by construction: same rank order (value, tid unique),
    * same pair ordinal, same derandomized hash-parity survivor, same
    * promotion arithmetic — KllSketchSpec pins bit-equality.
    */
  def compactFused(itemsIn: DataFrame, groupCols: Seq[String],
      fromLevel: Int, toLevel: Int): DataFrame = {
    // ONE exchange for the whole cascade (r18): every round's window
    // clusters on (group…, level), but `level` is rewritten each round, so
    // the planner re-exchanges on every round — R shuffles of the same
    // shrinking relation. Hash-partitioning ONCE on groupCols alone
    // satisfies every round's ClusteredDistribution (the hash keys are a
    // subset of each round's cluster keys and pass through every
    // projection untouched), so rounds 2..R plan as LOCAL SORTS under the
    // single exchange. Values are unchanged — same rows per partition
    // group-wise, same per-(group, level) rank order. Skew bound: one
    // partition holds at most one group's items, and the fused path is
    // only entered on certified-≤fuseMaxRows inputs (compactAuto), so a
    // single-group partition is ≤1M sketch items by construction.
    var items =
      if (groupCols.nonEmpty) itemsIn.repartition(groupCols.map(col): _*)
      else itemsIn
    for (r <- fromLevel until toLevel) {
      val part = (groupCols :+ "level").map(col)
      val wOrd = Window.partitionBy(part: _*).orderBy(col("value"), col("tid"))
      val wAll = Window.partitionBy(part: _*)
      val ranked = items
        .withColumn("rk", row_number().over(wOrd).cast("long"))
        .withColumn("cnt", count(lit(1)).over(wAll))
      // identical survivor choice to compact(): the key renders the same
      // (group…, round, pair) triple — level == r for every compacted row,
      // and pair = (rk-1) DIV 2 over the same per-(group, level=r) rank
      val keyCols = groupCols.map(c => col(c).cast("string")) ++
        Seq(lit(r.toString), expr("(rk - 1L) DIV 2L").cast("string"))
      val keepPos = PortableHash.hash32(concat_ws("|", keyCols: _*)) % 2L
      val isCur = col("level") === r
      val isLeftover = col("cnt") % 2L === 1L && col("rk") === col("cnt")
      items = ranked
        .filter(!isCur || isLeftover || (col("rk") - 1L) % 2L === keepPos)
        .select(groupCols.map(col) ++ Seq(
          when(isCur && !isLeftover, lit(r + 1)).otherwise(col("level"))
            .as("level"),
          col("value"), col("tid"),
          when(isCur && !isLeftover, col("w") * 2L).otherwise(col("w"))
            .as("w")): _*)
    }
    items
  }

  /** Dispatch between [[compactFused]] (one linear job) and the round-by-
    * round [[compact]] cascade, certified by COUNTING the input — the
    * `maxPerKeyHint` discipline applied to compaction: the fast path is
    * taken only when the relation is measured ≤ `fuseMaxRows`, never on
    * faith. `itemsIn` must be cheap to count (a fixture scan, a sink
    * read-back — both callers' inputs are file-backed), which is exactly
    * the "known from the previous round's materialization" condition.
    * A caller that already knows the row count (it just materialized the
    * input, or the count rode an `observe` metric) passes `knownRows` to
    * skip the redundant count job (ADVICE r15). Note `inputMaterialized`
    * only affects the FALLBACK branch ([[compact]]'s first-round scratch
    * decision); the fused branch consumes the input lazily either way.
    * Values are identical on either branch, so the dispatch is a purely
    * physical choice.
    */
  def compactAuto(itemsIn: DataFrame, groupCols: Seq[String],
      fromLevel: Int, toLevel: Int, inputMaterialized: Boolean = false,
      fuseMaxRows: Long = FuseMaxRows,
      knownRows: Option[Long] = None): DataFrame =
    if (knownRows.getOrElse(itemsIn.count()) <= fuseMaxRows)
      compactFused(itemsIn, groupCols, fromLevel, toLevel)
    else compact(itemsIn, groupCols, fromLevel, toLevel, inputMaterialized)

  /** Quantile read-out: for each q, the smallest sketch value whose
    * cumulative weight reaches ⌈q·n⌉ — an actual corpus element (selection,
    * not interpolation), over-/under-reporting the true quantile's rank by
    * at most the compaction bound. The cumulative window runs over SKETCH
    * rows per group (2^rounds× smaller than the data), the
    * [[Sketches.histQuantiles]] shape.
    */
  def quantiles(sk: DataFrame, groupCols: Seq[String],
      qs: Seq[Double]): DataFrame = {
    val wCum = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("value"), col("tid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sk
      .withColumn("cum", sum(col("w")).over(wCum))
      .withColumn("total",
        sum(col("w")).over(Window.partitionBy(groupCols.map(col): _*)))
    val ests = qs.map { q =>
      min(when(col("cum") >= ceil(lit(q) * col("total")), col("value")))
        .as(s"p${(q * 100).round}")
    }
    val out = cum.groupBy(groupCols.map(col): _*)
      .agg(max(col("total")).cast("long").as("n_rows"), ests: _*)
    out
  }

  // ------------------------------------------------------------ SQL mirror

  /** DuckDB CTE chain mirroring [[compact]]: `src` must expose
    * (groupCols…, level, value, tid, w); emits `<out>` with the same
    * shape after rounds `fromLevel until toLevel`. The per-group rank is
    * row_number over (value, tid) — value-identical to the engine's
    * GlobalIndex two-phase rank (same unique total order).
    */
  def compactSql(src: String, groupCols: Seq[String],
      fromLevel: Int, toLevel: Int, out: String): String = {
    val g = groupCols.mkString(", ")
    val part = if (groupCols.isEmpty) "" else s"PARTITION BY $g "
    val steps = (fromLevel until toLevel).map { r =>
      val prev = if (r == fromLevel) src else s"${out}_k$r"
      val nxt = if (r + 1 == toLevel) out else s"${out}_k${r + 1}"
      val keyParts = groupCols.map(c => s"CAST($c AS VARCHAR)") ++
        Seq(s"'$r'", "CAST(pair AS VARCHAR)")
      // MATERIALIZED: each round references the previous round's CTE twice
      // (level<>r carry-through + the ranked branch) — inlined, the chain
      // re-evaluates 2^rounds times and DuckDB exhausts file handles on the
      // base scan; materialized, each round runs exactly once (as Spark does)
      s"""${out}_r${r}_ranked AS MATERIALIZED (
         |  SELECT *, (row_number() OVER (${part}ORDER BY value, tid) - 1) // 2 AS pair,
         |         (row_number() OVER (${part}ORDER BY value, tid) - 1) % 2 AS pos
         |  FROM $prev WHERE level = $r),
         |${out}_r${r}_paired AS MATERIALIZED (
         |  SELECT *, count(*) OVER (PARTITION BY ${if (g.isEmpty) "pair" else s"$g, pair"}) AS pc
         |  FROM ${out}_r${r}_ranked),
         |$nxt AS MATERIALIZED (
         |  SELECT ${if (g.isEmpty) "" else s"$g, "}level, value, tid, w
         |  FROM $prev WHERE level <> $r
         |  UNION ALL
         |  SELECT ${if (g.isEmpty) "" else s"$g, "}level, value, tid, w
         |  FROM ${out}_r${r}_paired WHERE pc = 1
         |  UNION ALL
         |  SELECT ${if (g.isEmpty) "" else s"$g, "}$r + 1 AS level, value, tid, w * 2 AS w
         |  FROM ${out}_r${r}_paired
         |  WHERE pc = 2 AND pos = ${PortableHash.hash32Sql(
               s"concat_ws('|', ${keyParts.mkString(", ")})")} % 2)""".stripMargin
    }
    steps.mkString(",\n")
  }

  /** DuckDB mirror of [[quantiles]] over sketch CTE `sk`: emits `<out>`
    * with (groupCols…, n_rows, p<q>…).
    */
  def quantilesSql(sk: String, groupCols: Seq[String], qs: Seq[Double],
      out: String): String = {
    val g = groupCols.mkString(", ")
    val part = if (groupCols.isEmpty) "" else s"PARTITION BY $g "
    val ests = qs.map { q =>
      s"min(CASE WHEN cum >= ceil($q * total) THEN value END) AS p${(q * 100).round}"
    }.mkString(",\n         ")
    s"""${out}_cum AS (
       |  SELECT *, sum(w) OVER (${part}ORDER BY value, tid
       |           ROWS UNBOUNDED PRECEDING) AS cum,
       |         sum(w) OVER (${part.stripSuffix(" ")}) AS total
       |  FROM $sk),
       |$out AS (
       |  SELECT ${if (g.isEmpty) "" else s"$g, "}CAST(max(total) AS BIGINT) AS n_rows,
       |         $ests
       |  FROM ${out}_cum${if (g.isEmpty) "" else s" GROUP BY $g"})""".stripMargin
  }
}
