package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.{Components, DocDedup}

/** Dedup-family driver queries over `documents` with DuckDB oracles that
  * reproduce every md5-derived signature bit-for-bit (SURVEY §7.4).
  */
object DedupQueries {

  type Q = (SparkSession, String) => DataFrame

  import DocDedup.{BandSize, NumHashes}

  /** CTEs: normed words exploded with positions, 3-gram shingles, minhash
    * signatures — mirrors DocDedup.{explodedWords, shingles,
    * minhashSignatures}.
    */
  private[queries] val sigsSql: String = {
    val mhCols = (0 until NumHashes)
      .map(j => s"min(md5('$j:' || shingle)) AS mh_$j").mkString(",\n         ")
    s"""normed AS (
       |  SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
       |  FROM documents),
       |wordpos AS (
       |  SELECT doc_id,
       |         unnest(string_split(norm, ' ')) AS word,
       |         unnest(range(1, len(string_split(norm, ' ')) + 1)) AS pos
       |  FROM normed),
       |sh0 AS (
       |  SELECT doc_id,
       |         word || ' ' || lead(word, 1) OVER win || ' ' || lead(word, 2) OVER win AS shingle,
       |         (lead(word, 1) OVER win IS NOT NULL AND lead(word, 2) OVER win IS NOT NULL) AS complete
       |  FROM wordpos WINDOW win AS (PARTITION BY doc_id ORDER BY pos)),
       |sh AS (SELECT doc_id, shingle FROM sh0 WHERE complete),
       |sigs AS (
       |  SELECT doc_id,
       |         $mhCols
       |  FROM sh GROUP BY doc_id)""".stripMargin
  }

  private[queries] val bandsSql: String = {
    val nBands = NumHashes / BandSize
    val branches = (0 until nBands).map { b =>
      val key = (0 until BandSize).map(i => s"mh_${b * BandSize + i}").mkString(" || '|' || ")
      s"  SELECT doc_id, $b AS band_idx, md5($key) AS band_key FROM sigs"
    }
    "bands AS (\n" + branches.mkString("\n  UNION ALL\n") + ")"
  }

  private[queries] val pairsSql: String =
    """cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
      |  FROM bands a JOIN bands b
      |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
      |   AND a.doc_id < b.doc_id)""".stripMargin

  /** Shared CTE chain `simp/cedges/reach/lbl` (expects sigs/bands/cand in
    * scope, statement must open `WITH RECURSIVE`): est-Jaccard ≥ 0.5
    * edges, symmetrized, recursive reachability, min-id cluster labels —
    * THE cluster labeling. Every cluster-consuming oracle
    * ([[dedupClustersSql]], [[dedupKeepBestSql]], [[goldenRecordsSql]])
    * must share this single definition: a threshold or rounding change
    * here changes them all together, which is the contract.
    */
  private val clusterLabelCtesSql: String = {
    val eq = (0 until NumHashes)
      .map(j => s"CASE WHEN sa.mh_$j = sb.mh_$j THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""simp AS (
       |  SELECT c.doc_id_a, c.doc_id_b
       |  FROM cand c
       |  JOIN sigs sa ON c.doc_id_a = sa.doc_id
       |  JOIN sigs sb ON c.doc_id_b = sb.doc_id
       |  WHERE floor((CAST($eq AS DOUBLE) / $NumHashes) * 1e6 + 0.5) / 1e6 >= 0.5),
       |cedges AS (
       |  SELECT doc_id_a AS s, doc_id_b AS d FROM simp
       |  UNION ALL
       |  SELECT doc_id_b AS s, doc_id_a AS d FROM simp),
       |reach AS (
       |  SELECT doc_id AS v, doc_id AS u FROM documents
       |  UNION
       |  SELECT r.v, e.d FROM reach r JOIN cedges e ON r.u = e.s),
       |lbl AS (SELECT v AS doc_id, min(u) AS cluster_id FROM reach GROUP BY v)""".stripMargin
  }

  // ---------------------------------------------------------------- queries

  val dedupExactDocs: Q = (s, dir) =>
    DocDedup.exactDuplicates(Tables.documents(s, dir)).orderBy(col("fp"))

  val dedupExactDocsSql: String =
    """WITH normed AS (
      |  SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
      |  FROM documents)
      |SELECT md5(norm) AS fp, count(*) AS n_docs, min(doc_id) AS keep_doc_id
      |FROM normed GROUP BY 1 ORDER BY fp""".stripMargin

  val minhashSignatures: Q = (s, dir) =>
    DocDedup.minhashSignatures(Tables.documents(s, dir)).orderBy(col("doc_id"))

  val minhashSignaturesSql: String =
    s"""WITH $sigsSql
       |SELECT * FROM sigs ORDER BY doc_id""".stripMargin

  val lshCandidatePairs: Q = (s, dir) =>
    DocDedup.lshCandidatePairs(Tables.documents(s, dir))
      .orderBy(col("doc_id_a"), col("doc_id_b"))

  val lshCandidatePairsSql: String =
    s"""WITH $sigsSql,
       |$bandsSql,
       |$pairsSql
       |SELECT doc_id_a, doc_id_b FROM cand ORDER BY doc_id_a, doc_id_b""".stripMargin

  /** Incremental LSH pair discovery at the gate: the corpus arrives as
    * TWO batches (split by doc_id parity — a stand-in for "yesterday's
    * corpus" + "today's batch"), runs
    * [[DocDedup.incrementalCandidatePairs]], and the oracle states the
    * ONE-SHOT full-corpus pair set — so the gate proves
    * batch(day1) + incremental(day2) ≡ recompute-from-scratch, the
    * reference's high-watermark contract applied to dedup.
    */
  val neardupIncremental: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val target = StoreQueries.scratchPath(s, s"graft_store/neardup_incremental")
    DocDedup.incrementalCandidatePairs(s,
      Seq(docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1)),
      target)
      .orderBy(col("doc_id_a"), col("doc_id_b"))
  }

  /** Same statement as [[lshCandidatePairsSql]]: the oracle is the
    * one-shot form; sharing it is the equivalence proof.
    */
  val neardupIncrementalSql: String = lshCandidatePairsSql

  /** Incremental exact dedup at the gate: two parity batches fold into
    * the persisted fingerprint aggregate
    * ([[DocDedup.incrementalExactDuplicates]]); the oracle is the
    * one-shot [[dedupExactDocsSql]] — merge(fold(day1), day2) ≡
    * recompute, because count/min are associative.
    */
  val dedupIncrementalExact: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val target = StoreQueries.scratchPath(s, s"graft_store/dedup_incremental_exact")
    DocDedup.incrementalExactDuplicates(s,
      Seq(docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1)),
      target)
      .orderBy(col("fp"))
  }

  val dedupIncrementalExactSql: String = dedupExactDocsSql

  /** Incremental clustering at the gate: two parity batches run
    * [[DocDedup.incrementalClusterLabels]] (contracted-graph CC — star
    * edges of the stored labeling + the new batch's edges); the oracle is
    * `dedup_clusters`' recursive-CTE reachability over the FULL corpus,
    * so the gate proves incremental CC ≡ full CC.
    */
  val dedupClustersIncremental: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val target = StoreQueries.scratchPath(s, s"graft_store/dedup_clusters_incremental")
    val labels = DocDedup.incrementalClusterLabels(s,
      Seq(docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1)),
      target)
      .select(col("v").as("doc_id"), col("label").as("cluster_id"))
    val sizes = labels.groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
      .orderBy(col("doc_id"))
  }

  // lazy: dedupClustersSql is declared later in the file — an eager val
  // here would capture null at object init
  lazy val dedupClustersIncrementalSql: String = dedupClustersSql

  val neardupMinhash: Q = (s, dir) =>
    DocDedup.estimatedJaccardPairs(Tables.documents(s, dir))
      .orderBy(col("doc_id_a"), col("doc_id_b"))

  val neardupMinhashSql: String = {
    val eq = (0 until NumHashes)
      .map(j => s"CASE WHEN sa.mh_$j = sb.mh_$j THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH $sigsSql,
       |$bandsSql,
       |$pairsSql
       |SELECT c.doc_id_a, c.doc_id_b,
       |       floor((CAST($eq AS DOUBLE) / $NumHashes) * 1e6 + 0.5) / 1e6 AS est_jaccard
       |FROM cand c
       |JOIN sigs sa ON c.doc_id_a = sa.doc_id
       |JOIN sigs sb ON c.doc_id_b = sb.doc_id
       |ORDER BY doc_id_a, doc_id_b""".stripMargin
  }

  /** Cross-source duplication matrix — the dedup-PLANNING diagnostic run
    * before the dedup itself: which source pairs share near-duplicate
    * content (e.g. two crawls of the same sites), so the pipeline knows
    * where cluster-scoped dedup will actually bite. Built entirely on the
    * proven MinHash chain: LSH candidates → estimated Jaccard ≥ 0.5 (the
    * estimate is k/8 — every eighth is binary-exact, so the threshold
    * compare is engine-independent) → pair's UNORDERED source pair via
    * least/greatest → count. Within-source pairs appear as (s, s) rows.
    *
    * Scale shape: the pair relation is LSH-collision-bounded (never
    * all-pairs); the two enrichment joins probe the slim (doc_id, source)
    * projection; the group set is ≤ |sources|² with map-side partials.
    */
  val sourceOverlap: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val pairs = DocDedup.estimatedJaccardPairs(docs)
      .filter(col("est_jaccard") >= 0.5)
    val src = docs.select(col("doc_id"), col("source"))
    pairs
      .join(src.as("ssa"), pairs("doc_id_a") === col("ssa.doc_id"))
      .join(src.as("ssb"), pairs("doc_id_b") === col("ssb.doc_id"))
      .select(least(col("ssa.source"), col("ssb.source")).as("source_a"),
        greatest(col("ssa.source"), col("ssb.source")).as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_neardup_pairs"))
      .orderBy(col("source_a"), col("source_b"))
  }

  val sourceOverlapSql: String = {
    val eq = (0 until NumHashes)
      .map(j => s"CASE WHEN sa.mh_$j = sb.mh_$j THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH $sigsSql,
       |$bandsSql,
       |$pairsSql,
       |est AS (
       |  SELECT c.doc_id_a, c.doc_id_b,
       |         floor((CAST($eq AS DOUBLE) / $NumHashes) * 1e6 + 0.5) / 1e6 AS est_jaccard
       |  FROM cand c
       |  JOIN sigs sa ON c.doc_id_a = sa.doc_id
       |  JOIN sigs sb ON c.doc_id_b = sb.doc_id),
       |src AS (SELECT doc_id, source FROM documents)
       |SELECT least(x.source, y.source) AS source_a,
       |       greatest(x.source, y.source) AS source_b,
       |       count(*) AS n_neardup_pairs
       |FROM est e
       |JOIN src x ON e.doc_id_a = x.doc_id
       |JOIN src y ON e.doc_id_b = y.doc_id
       |WHERE e.est_jaccard >= 0.5
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin
  }

  val ngramJaccard: Q = (s, dir) =>
    DocDedup.exactJaccardPairs(Tables.documents(s, dir))
      .orderBy(col("doc_id_a"), col("doc_id_b"))

  val ngramJaccardSql: String =
    s"""WITH $sigsSql,
       |$bandsSql,
       |$pairsSql,
       |shd AS (SELECT DISTINCT doc_id, shingle FROM sh),
       |sizes AS (SELECT doc_id, count(*) AS n_shingles FROM shd GROUP BY doc_id),
       |inter AS (
       |  SELECT c.doc_id_a, c.doc_id_b, count(*) AS n_common
       |  FROM cand c
       |  JOIN shd sa ON c.doc_id_a = sa.doc_id
       |  JOIN shd sb ON c.doc_id_b = sb.doc_id AND sa.shingle = sb.shingle
       |  GROUP BY 1, 2)
       |SELECT c.doc_id_a, c.doc_id_b,
       |       floor((CAST(coalesce(i.n_common, 0) AS DOUBLE)
       |             / (za.n_shingles + zb.n_shingles - coalesce(i.n_common, 0))) * 1e6 + 0.5) / 1e6 AS jaccard
       |FROM cand c
       |LEFT JOIN inter i ON c.doc_id_a = i.doc_id_a AND c.doc_id_b = i.doc_id_b
       |JOIN sizes za ON c.doc_id_a = za.doc_id
       |JOIN sizes zb ON c.doc_id_b = zb.doc_id
       |ORDER BY c.doc_id_a, c.doc_id_b""".stripMargin

  /** Weighted (multiset) Jaccard for the LSH candidate pairs — the
    * boilerplate-robust near-dup score set-Jaccard misses: two documents
    * sharing one template paragraph repeated many times look near-identical
    * to SET overlap, while the multiset measure
    * Σ_w min(c_a, c_b) / Σ_w max(c_a, c_b) weighs every repetition. Only
    * the intersection needs a join (Σmax = tot_a + tot_b − Σmin, the
    * inclusion–exclusion identity), so the plan is: per-doc word COUNTS
    * (one corpus aggregate, map-side combined), candidate pairs fan out by
    * doc A's words and meet doc B's counts co-partitioned on
    * (doc_id, word) — cost ∝ LSH collisions × doc length, the
    * [[ngramJaccard]] collision-bounded shape, never a corpus self-join.
    * All sums are exact integers; the score is ONE IEEE division.
    */
  val weightedJaccard: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val wc = graft.Scratch.table(
      docs.select(col("doc_id"),
          explode(graft.text.TextAnalysis.words(col("text"))).as("word"))
        .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("c")),
      "wjac-wc")
    val tots = wc.groupBy(col("doc_id")).agg(sum(col("c")).as("tot"))
    val cand = graft.Scratch.table(
      DocDedup.lshCandidatePairs(docs), "wjac-cand")
    val inter = cand
      .join(wc.select(col("doc_id").as("doc_id_a"), col("word"),
        col("c").as("ca")), Seq("doc_id_a"))
      .join(wc.select(col("doc_id").as("doc_id_b"), col("word"),
        col("c").as("cb")), Seq("doc_id_b", "word"))
      .groupBy(col("doc_id_a"), col("doc_id_b"))
      .agg(sum(least(col("ca"), col("cb"))).as("w_common"))
    cand
      .join(inter, Seq("doc_id_a", "doc_id_b"), "left")
      .join(tots.select(col("doc_id").as("doc_id_a"), col("tot").as("ta")),
        Seq("doc_id_a"))
      .join(tots.select(col("doc_id").as("doc_id_b"), col("tot").as("tb")),
        Seq("doc_id_b"))
      .select(col("doc_id_a"), col("doc_id_b"),
        coalesce(col("w_common"), lit(0L)).as("w_common"),
        graft.Parity.pround(
          coalesce(col("w_common"), lit(0L)).cast("double") /
            (col("ta") + col("tb") - coalesce(col("w_common"), lit(0L)))
              .cast("double"), 6).as("weighted_jaccard"))
      .orderBy(col("doc_id_a"), col("doc_id_b"))
  }

  val weightedJaccardSql: String =
    s"""WITH $sigsSql,
       |$bandsSql,
       |$pairsSql,
       |wc AS (SELECT doc_id, word, count(*) AS c FROM wordpos GROUP BY 1, 2),
       |tots AS (SELECT doc_id, sum(c) AS tot FROM wc GROUP BY 1),
       |inter AS (
       |  SELECT c.doc_id_a, c.doc_id_b, sum(least(wa.c, wb.c)) AS w_common
       |  FROM cand c
       |  JOIN wc wa ON c.doc_id_a = wa.doc_id
       |  JOIN wc wb ON c.doc_id_b = wb.doc_id AND wa.word = wb.word
       |  GROUP BY 1, 2)
       |SELECT c.doc_id_a, c.doc_id_b,
       |       CAST(coalesce(i.w_common, 0) AS BIGINT) AS w_common,
       |       ${graft.Parity.proundSql(
                 "CAST(coalesce(i.w_common, 0) AS DOUBLE) / CAST(ta.tot + tb.tot - coalesce(i.w_common, 0) AS DOUBLE)",
                 6)} AS weighted_jaccard
       |FROM cand c
       |LEFT JOIN inter i ON c.doc_id_a = i.doc_id_a AND c.doc_id_b = i.doc_id_b
       |JOIN tots ta ON c.doc_id_a = ta.doc_id
       |JOIN tots tb ON c.doc_id_b = tb.doc_id
       |ORDER BY c.doc_id_a, c.doc_id_b""".stripMargin

  val simhashSignatures: Q = (s, dir) =>
    DocDedup.simhashSignatures(Tables.documents(s, dir)).orderBy(col("doc_id"))

  /** Shared CTE chain ending in `sims(doc_id, simhash32)` — mirrors
    * DocDedup.simhashSignatures (portable hex→int digit parse of md5).
    */
  private val simhashCte: String = {
    val powers = (0 until 8).map(i => 1L << (4 * (7 - i))) // 16^(7-i)
    val powerList = powers.mkString("[", ", ", "]")
    val bitCols = (0 until 32)
      .map(b => s"sum(CASE WHEN (h // ${1L << b}) % 2 = 1 THEN 1 ELSE -1 END) AS bit_$b")
      .mkString(",\n         ")
    val simExpr = (0 until 32)
      .map(b => s"CASE WHEN bit_$b > 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    s"""normed AS (
       |  SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
       |  FROM documents),
       |wordpos AS (
       |  SELECT doc_id, unnest(string_split(norm, ' ')) AS word FROM normed),
       |toks AS (
       |  SELECT doc_id,
       |         list_sum(list_transform(range(1, 9),
       |           i -> CAST(strpos('0123456789abcdef', substr(md5(word), CAST(i AS INTEGER), 1)) - 1 AS BIGINT)
       |                * ($powerList)[i])) AS h
       |  FROM wordpos),
       |bits AS (
       |  SELECT doc_id,
       |         $bitCols
       |  FROM toks GROUP BY doc_id),
       |sims AS (
       |  SELECT doc_id, CAST($simExpr AS BIGINT) AS simhash32 FROM bits)""".stripMargin
  }

  val simhashSignaturesSql: String =
    s"""WITH $simhashCte
       |SELECT doc_id, simhash32 FROM sims ORDER BY doc_id""".stripMargin

  /** SimHash near-dup pairs: high-16-bit blocking, Hamming <= 3. */
  val simhashPairs: Q = (s, dir) =>
    DocDedup.simhashPairs(Tables.documents(s, dir))
      .orderBy(col("doc_id_a"), col("doc_id_b"))

  val simhashPairsSql: String =
    s"""WITH $simhashCte
       |SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       |       CAST(bit_count(xor(a.simhash32, b.simhash32)) AS BIGINT) AS hamming
       |FROM sims a JOIN sims b
       |  ON a.simhash32 // 65536 = b.simhash32 // 65536 AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash32, b.simhash32)) <= 3
       |ORDER BY doc_id_a, doc_id_b""".stripMargin

  /** End-to-end corpus dedup: drop every doc marked as the higher-id side
    * of a near-dup pair (est. Jaccard ≥ 0.5); single-link transitive
    * clusters keep their lowest-id representative via the pair ordering.
    */
  val dedupKeepDocs: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val drops = DocDedup.estimatedJaccardPairs(docs)
      .filter(col("est_jaccard") >= 0.5)
      .select(col("doc_id_b")).distinct()
    docs.join(drops, docs("doc_id") === drops("doc_id_b"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))
  }

  val dedupKeepDocsSql: String = {
    val eq = (0 until NumHashes)
      .map(j => s"CASE WHEN sa.mh_$j = sb.mh_$j THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH $sigsSql,
       |$bandsSql,
       |$pairsSql,
       |drops AS (
       |  SELECT DISTINCT c.doc_id_b
       |  FROM cand c
       |  JOIN sigs sa ON c.doc_id_a = sa.doc_id
       |  JOIN sigs sb ON c.doc_id_b = sb.doc_id
       |  WHERE floor((CAST($eq AS DOUBLE) / $NumHashes) * 1e6 + 0.5) / 1e6 >= 0.5)
       |SELECT doc_id, lang, source FROM documents
       |WHERE doc_id NOT IN (SELECT doc_id_b FROM drops)
       |ORDER BY doc_id""".stripMargin
  }

  /** Near-dup CLUSTERS: connected components over the est-Jaccard ≥ 0.5
    * pair graph (same threshold as dedup_keep_docs), every document labeled
    * with the min doc_id of its transitive group plus the group size.
    * Pair detection says "a~b"; clustering turns "a~b, b~c" into one
    * {a,b,c} group with one canonical keeper — the collapse step a curation
    * pipeline actually acts on. Min-label propagation to a fixpoint
    * (Components.connectedComponents); the oracle recomputes the closure
    * with a recursive CTE, so the whole chain — signatures → bands →
    * candidate pairs → similarity gate → transitive closure — is
    * hash-checked end-to-end.
    */
  /** Shared (docs → per-doc cluster label) derivation: est-Jaccard ≥ 0.5
    * pair edges into the given connected-components algorithm. The single
    * definition keeps the clustering threshold and edge derivation
    * identical across every cluster-consuming query.
    */
  private def clusterLabels(docs: DataFrame,
      cc: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val edges = DocDedup.estimatedJaccardPairs(docs)
      .filter(col("est_jaccard") >= 0.5)
      .select(col("doc_id_a").as("a"), col("doc_id_b").as("b"))
    cc(docs.select(col("doc_id").as("v")), edges)
      .select(col("v").as("doc_id"), col("label").as("cluster_id"))
  }

  private def clustersVia(
      cc: (DataFrame, DataFrame) => DataFrame): Q = (s, dir) => {
    val labels = clusterLabels(Tables.documents(s, dir), cc)
    val sizes = labels.groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
      .orderBy(col("doc_id"))
  }

  val dedupClusters: Q = clustersVia(Components.connectedComponents)

  /** Same clustering through the large-star/small-star algorithm
    * (O(log n) rounds vs O(diameter)) — identical labels by construction,
    * so it shares dedup_clusters' oracle: two independent algorithms must
    * agree bit-for-bit with the recursive-CTE reachability answer.
    */
  val dedupClustersStar: Q = clustersVia(Components.connectedComponentsStar)

  val dedupClustersSql: String =
    s"""WITH RECURSIVE $sigsSql,
       |$bandsSql,
       |$pairsSql,
       |$clusterLabelCtesSql,
       |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM lbl GROUP BY cluster_id)
       |SELECT l.doc_id, l.cluster_id, s.cluster_size
       |FROM lbl l JOIN sz s USING (cluster_id)
       |ORDER BY l.doc_id""".stripMargin

  /** Quality-aware canonical selection: per near-dup cluster, keep the
    * HIGHEST-QUALITY member (tie → min doc_id) instead of the min-id one —
    * what a curation pipeline actually wants when one copy of a template
    * is cleaner than the rest. Output is the per-doc keep/drop labeling:
    * cluster id, quality score, and the keep flag. Scale shape: clustering
    * as in dedup_clusters, quality is per-row arithmetic, and the winner
    * pick is a row_number window over cluster-sized partitions (bounded by
    * the largest near-dup group, which LSH banding keeps small).
    */
  val dedupKeepBest: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
    val labels = clusterLabels(docs, Components.connectedComponents)
    val qual = graft.text.TextAnalysis.qualityScore(docs)
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("quality_score").desc, col("doc_id"))
    labels
      .join(qual, "doc_id")
      .withColumn("keep", row_number().over(w) === 1)
      .select(col("doc_id"), col("cluster_id"), col("quality_score"), col("keep"))
      .orderBy(col("doc_id"))
  }

  val dedupKeepBestSql: String = {
    val stopCnt = TextQueries.stopCountSql(TextQueries.stopEn)
    s"""WITH RECURSIVE $sigsSql,
       |$bandsSql,
       |$pairsSql,
       |$clusterLabelCtesSql,
       |qw AS (
       |  SELECT doc_id, text,
       |         string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS ws
       |  FROM documents),
       |qstats AS (
       |  SELECT doc_id,
       |         len(ws) AS word_count,
       |         len(regexp_extract_all(text, '[.,;:!?]')) AS punct_count,
       |         floor((CAST($stopCnt AS DOUBLE) / len(ws)) * 1e6 + 0.5) / 1e6 AS stopword_ratio
       |  FROM qw),
       |qual AS (
       |  SELECT doc_id,
       |         floor((0.4 * least(CAST(word_count AS DOUBLE) / 50, 1.0)
       |             + 0.3 * least(stopword_ratio * 5, 1.0)
       |             + 0.3 * greatest(0.0, 1.0 - CAST(punct_count AS DOUBLE) / greatest(word_count, 1))) * 1e6 + 0.5) / 1e6
       |           AS quality_score
       |  FROM qstats)
       |SELECT l.doc_id, l.cluster_id, q.quality_score,
       |       (row_number() OVER (PARTITION BY l.cluster_id
       |          ORDER BY q.quality_score DESC, l.doc_id) = 1) AS keep
       |FROM lbl l JOIN qual q USING (doc_id)
       |ORDER BY l.doc_id""".stripMargin
  }

  /** Benchmark decontamination: flag corpus documents that share any word
    * 8-gram with a held-out benchmark set — the standard eval-leakage
    * guard before training (n-gram collision, not exact match, because
    * leaked eval items are near-copies: reflowed, retitled, partially
    * quoted). Benchmark here = doc_id < 50 of the same table, so the
    * oracle recomputes both sides from `documents` alone.
    *
    * Scale shape: real benchmark suites are tiny relative to the corpus,
    * so the distinct benchmark shingle set is broadcast and the corpus
    * streams through a map-side semi-probe (zero corpus shuffle before
    * the per-doc distinct, which carries doc_ids only). The shingle
    * arrays are built per-row from each doc's own word array
    * (DocDedup.shingles — zero-shuffle construction).
    */
  val decontaminate: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val sh = DocDedup.shingles(docs, n = 8)
    val benchShingles = sh.filter(col("doc_id") < 50).select(col("shingle")).distinct()
    val hits = sh.filter(col("doc_id") >= 50)
      .join(broadcast(benchShingles), Seq("shingle"))
      .select(col("doc_id")).distinct()
      .withColumn("hit", lit(true))
    docs.filter(col("doc_id") >= 50)
      .select(col("doc_id"))
      // hits GROWS with the corpus (every contaminated doc), so no hint —
      // AQE broadcasts it while it fits, key-shuffles at 100 TB; only the
      // benchmark-bounded shingle set above earns a hard broadcast
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("hit"), lit(false)).as("contaminated"))
      .orderBy(col("doc_id"))
  }

  val decontaminateSql: String = {
    val gram8 = (1 to 8).map(i => s"ws[i+$i]").mkString(" || ' ' || ")
    s"""WITH normed AS (
       |  SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
       |  FROM documents),
       |w AS (SELECT doc_id, string_split(norm, ' ') AS ws FROM normed),
       |sh AS (
       |  SELECT doc_id,
       |         CASE WHEN len(ws) >= 8
       |              THEN list_transform(range(0, len(ws) - 7), i -> $gram8)
       |              ELSE []::VARCHAR[] END AS sh
       |  FROM w),
       |bsh AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id < 50),
       |hits AS (
       |  SELECT DISTINCT doc_id
       |  FROM (SELECT doc_id, unnest(sh) AS s FROM sh WHERE doc_id >= 50) c
       |  WHERE s IN (SELECT s FROM bsh))
       |SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
       |FROM (SELECT doc_id FROM documents WHERE doc_id >= 50) d
       |LEFT JOIN hits h ON d.doc_id = h.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Edit-distance fuzzy pairs — the confirm stage for near-dup candidates
    * where token-level Jaccard is too coarse (OCR noise, small in-word
    * edits). Blocked by `lang` (standing in for an LSH/block key: at scale
    * the pair space always comes pre-gated, never all-pairs) and capped to
    * a fixed id range so the pair count is SF-independent; comparing
    * 40-char normalized prefixes bounds per-pair cost to O(40^2) DP cells.
    * Spark and DuckDB `levenshtein` are the same classic edit distance, so
    * the oracle matches exactly.
    *
    * The length-difference prefilter (|len_a − len_b| ≤ maxDist) is
    * result-neutral — levenshtein ≥ |len_a − len_b| always — but runs
    * before the O(len²) DP, so a pathological candidate set (many long
    * strings of wildly different lengths) can't quadratic-blow the
    * confirm stage at scale: only length-plausible pairs reach the DP.
    */
  val fuzzyPairs: Q = (s, dir) => {
    val p = Tables.documents(s, dir)
      .filter(col("doc_id") < 300)
      .select(col("doc_id"), col("lang"),
        substring(graft.text.TextAnalysis.normText(col("text")), 1, 40).as("pfx"))
    p.as("a").join(p.as("b"),
        col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id") &&
        abs(length(col("a.pfx")) - length(col("b.pfx"))) <= 20)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.lang").as("lang"),
        levenshtein(col("a.pfx"), col("b.pfx")).cast("long").as("lev"))
      .filter(col("lev") <= 20)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val fuzzyPairsSql: String =
    """WITH normed AS (
      |  SELECT doc_id, lang, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
      |  FROM documents WHERE doc_id < 300),
      |p AS (SELECT doc_id, lang, substr(norm, 1, 40) AS pfx FROM normed)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang AS lang,
      |       CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS lev
      |FROM p a JOIN p b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |             AND abs(len(a.pfx) - len(b.pfx)) <= 20
      |WHERE levenshtein(a.pfx, b.pfx) <= 20
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Asymmetric shingle CONTAINMENT for LSH candidates — |A∩B|/|A| and
    * |A∩B|/|B|. Jaccard misses subset relationships (a tweet quoted inside
    * a long article has tiny Jaccard but containment ≈ 1); dedup policies
    * that drop the CONTAINED side need the directed measure. Same
    * collision-bounded shape as [[ngramJaccard]]: candidates join the
    * per-doc distinct shingle SETS, the intersection is a per-pair
    * `array_intersect` — the shingle stream is never self-joined, so cost
    * is ∝ LSH collisions at any corpus size. Each containment is ONE IEEE
    * division of exact integers.
    */
  val containmentPairs: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val docSets = graft.Scratch.table(
      DocDedup.shingleSets(docs), "containment-sets")
    val nCommon = size(array_intersect(col("za.shs"), col("zb.shs")))
    DocDedup.lshCandidatePairs(docs)
      .join(docSets.as("za"), col("doc_id_a") === col("za.doc_id"))
      .join(docSets.as("zb"), col("doc_id_b") === col("zb.doc_id"))
      .select(col("doc_id_a"), col("doc_id_b"),
        graft.Parity.pround(
          nCommon.cast("double") / size(col("za.shs")).cast("double"), 6)
          .as("contain_a_in_b"),
        graft.Parity.pround(
          nCommon.cast("double") / size(col("zb.shs")).cast("double"), 6)
          .as("contain_b_in_a"))
      .orderBy(col("doc_id_a"), col("doc_id_b"))
  }

  val containmentPairsSql: String =
    s"""WITH $sigsSql,
       |$bandsSql,
       |$pairsSql,
       |shd AS (SELECT DISTINCT doc_id, shingle FROM sh),
       |sizes AS (SELECT doc_id, count(*) AS n_shingles FROM shd GROUP BY doc_id),
       |inter AS (
       |  SELECT c.doc_id_a, c.doc_id_b, count(*) AS n_common
       |  FROM cand c
       |  JOIN shd sa ON c.doc_id_a = sa.doc_id
       |  JOIN shd sb ON c.doc_id_b = sb.doc_id AND sa.shingle = sb.shingle
       |  GROUP BY 1, 2)
       |SELECT c.doc_id_a, c.doc_id_b,
       |       ${graft.Parity.proundSql(
                 "CAST(coalesce(i.n_common, 0) AS DOUBLE) / CAST(za.n_shingles AS DOUBLE)",
                 6)} AS contain_a_in_b,
       |       ${graft.Parity.proundSql(
                 "CAST(coalesce(i.n_common, 0) AS DOUBLE) / CAST(zb.n_shingles AS DOUBLE)",
                 6)} AS contain_b_in_a
       |FROM cand c
       |LEFT JOIN inter i ON c.doc_id_a = i.doc_id_a AND c.doc_id_b = i.doc_id_b
       |JOIN sizes za ON c.doc_id_a = za.doc_id
       |JOIN sizes zb ON c.doc_id_b = zb.doc_id
       |ORDER BY c.doc_id_a, c.doc_id_b""".stripMargin

  /** MinHash estimator quality report — ONE row auditing the sketch the
    * whole near-dup family trusts: over the LSH candidate pairs, compare
    * the signature-agreement estimate against the exact shingle Jaccard
    * at the τ = 0.5 decision both engines use ([[sourceOverlap]],
    * [[neardupMinhash]]): confusion counts, precision/recall of the
    * estimator AS A CLASSIFIER of "exact ≥ τ" (candidate-restricted — LSH
    * recall itself is a different, unobservable quantity without the
    * quadratic ground truth this query exists to avoid), and the mean
    * absolute estimation error. Both inputs are collision-bounded
    * relations already computed by their own queries; the eval is a
    * pair-keyed join plus one global aggregate.
    */
  val minhashEstEval: Q = (s, dir) => {
    import org.apache.spark.sql.types.DecimalType
    DocDedup.estVsExactPairs(Tables.documents(s, dir))
      .select(col("est_jaccard").as("e"), col("jaccard").as("x"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("e") >= 0.5 && col("x") >= 0.5, 1L).otherwise(0L)).as("tp"),
        sum(when(col("e") >= 0.5 && col("x") < 0.5, 1L).otherwise(0L)).as("fp"),
        sum(when(col("e") < 0.5 && col("x") >= 0.5, 1L).otherwise(0L)).as("fn"),
        sum(abs(col("e") - col("x")).cast(DecimalType(30, 10))).as("sae"))
      .select(col("n_pairs"), col("tp"), col("fp"), col("fn"),
        graft.Parity.pround(when(col("tp") + col("fp") > 0L,
          col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
          .otherwise(lit(0.0)), 6).as("precision"),
        graft.Parity.pround(when(col("tp") + col("fn") > 0L,
          col("tp").cast("double") / (col("tp") + col("fn")).cast("double"))
          .otherwise(lit(0.0)), 6).as("recall"),
        graft.Parity.pround(
          col("sae").cast("double") / col("n_pairs").cast("double"), 6)
          .as("mae"))
  }

  /** Oracle: `est` and `exact` re-derived from the shared CTE chain —
    * |A∩B| via the distinct-shingle equi-join, the estimate via the
    * signature-agreement count, joined on the pair key. */
  val minhashEstEvalSql: String = {
    val eq = (0 until NumHashes)
      .map(j => s"CASE WHEN sa.mh_$j = sb.mh_$j THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH $sigsSql,
       |$bandsSql,
       |$pairsSql,
       |est AS (
       |  SELECT c.doc_id_a, c.doc_id_b,
       |         floor((CAST($eq AS DOUBLE) / ${NumHashes}) * 1e6 + 0.5) / 1e6 AS e
       |  FROM cand c
       |  JOIN sigs sa ON c.doc_id_a = sa.doc_id
       |  JOIN sigs sb ON c.doc_id_b = sb.doc_id),
       |shd AS (SELECT DISTINCT doc_id, shingle FROM sh),
       |sizes AS (SELECT doc_id, count(*) AS n_shingles FROM shd GROUP BY doc_id),
       |inter AS (
       |  SELECT c.doc_id_a, c.doc_id_b, count(*) AS n_common
       |  FROM cand c
       |  JOIN shd sa ON c.doc_id_a = sa.doc_id
       |  JOIN shd sb ON c.doc_id_b = sb.doc_id AND sa.shingle = sb.shingle
       |  GROUP BY 1, 2),
       |exact AS (
       |  SELECT c.doc_id_a, c.doc_id_b,
       |         floor((CAST(coalesce(i.n_common, 0) AS DOUBLE)
       |               / (za.n_shingles + zb.n_shingles - coalesce(i.n_common, 0))) * 1e6 + 0.5) / 1e6 AS x
       |  FROM cand c
       |  LEFT JOIN inter i ON c.doc_id_a = i.doc_id_a AND c.doc_id_b = i.doc_id_b
       |  JOIN sizes za ON c.doc_id_a = za.doc_id
       |  JOIN sizes zb ON c.doc_id_b = zb.doc_id),
       |j AS (SELECT e, x FROM est JOIN exact USING (doc_id_a, doc_id_b)),
       |g AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       |         CAST(sum(CASE WHEN e >= 0.5 AND x >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |         CAST(sum(CASE WHEN e >= 0.5 AND x < 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |         CAST(sum(CASE WHEN e < 0.5 AND x >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |         sum(CAST(abs(e - x) AS DECIMAL(30,10))) AS sae
       |  FROM j)
       |SELECT n_pairs, tp, fp, fn,
       |       ${graft.Parity.proundSql(
                 "CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) ELSE 0.0 END",
                 6)} AS precision,
       |       ${graft.Parity.proundSql(
                 "CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) ELSE 0.0 END",
                 6)} AS recall,
       |       ${graft.Parity.proundSql(
                 "CAST(sae AS DOUBLE) / CAST(n_pairs AS DOUBLE)", 6)} AS mae
       |FROM g""".stripMargin
  }

  /** Shingle novelty per document — what fraction of a doc's distinct
    * 3-gram shingles appear in NO earlier document (doc_id order standing
    * in for arrival order): the memorization/redundancy signal a
    * curriculum or dedup-threshold decision reads, finer than pairwise
    * near-dup (a doc can be 60% recycled boilerplate without any single
    * close pair). Shape: the distinct (doc, shingle) relation → one
    * shingle-keyed aggregate for each shingle's FIRST doc (map-side
    * combined min) → join back co-partitioned on the shingle → per-doc
    * exact ratio. No pair space at all — linear in the shingle stream.
    */
  val shingleNovelty: Q = (s, dir) => {
    val shd = graft.Scratch.table(
      DocDedup.shingleSets(Tables.documents(s, dir))
        .select(col("doc_id"), explode(col("shs")).as("shingle")),
      "novelty-shd")
    val first = shd.groupBy(col("shingle")).agg(min(col("doc_id")).as("first_doc"))
    shd.join(first, "shingle")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") < col("doc_id"), 1L).otherwise(0L)).as("n_seen"))
      .select(col("doc_id"), col("n_shingles"),
        graft.Parity.pround(
          lit(1.0) - col("n_seen").cast("double") /
            col("n_shingles").cast("double"), 6).as("novelty"))
      .orderBy(col("doc_id"))
  }

  val shingleNoveltySql: String =
    s"""WITH $sigsSql,
       |shd AS (SELECT DISTINCT doc_id, shingle FROM sh),
       |fst AS (SELECT shingle, min(doc_id) AS first_doc FROM shd GROUP BY 1),
       |g AS (
       |  SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
       |         CAST(sum(CASE WHEN f.first_doc < s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_seen
       |  FROM shd s JOIN fst f USING (shingle)
       |  GROUP BY 1)
       |SELECT doc_id, n_shingles,
       |       ${graft.Parity.proundSql(
                 "1.0 - CAST(n_seen AS DOUBLE) / CAST(n_shingles AS DOUBLE)",
                 6)} AS novelty
       |FROM g ORDER BY doc_id""".stripMargin

  /** Survivorship merge — the MDM "golden record" per near-dup cluster:
    * instead of SELECTING one member ([[dedupKeepBest]]'s quality argmax),
    * each output FIELD is merged independently by its own rule — canonical
    * id = min member (stable), lang = majority vote (tie → lexicographic),
    * length = the longest member's. The field rules are all exact
    * aggregates over the cluster-keyed join of labels × documents; the
    * majority vote is a (cluster, lang) count with a per-cluster
    * row_number window — bounded by |langs per cluster|, a closed
    * vocabulary, never corpus-scale.
    */
  val goldenRecords: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val labeled = graft.Scratch.table(
      clusterLabels(docs, Components.connectedComponents)
        .join(docs.select(col("doc_id"), col("lang"), col("n_chars")), "doc_id"),
      "golden-labeled")
    val base = labeled.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        min(col("doc_id")).as("canonical_doc_id"),
        max(col("n_chars")).as("max_chars"))
    val langVote = labeled.groupBy(col("cluster_id"), col("lang"))
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(col("cnt").desc, col("lang"))
    val majority = langVote.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("lang").as("majority_lang"))
    base.join(majority, "cluster_id")
      .select(col("cluster_id"), col("n_members"),
        col("canonical_doc_id"), col("majority_lang"), col("max_chars"))
      .orderBy(col("cluster_id"))
  }

  /** Field rules over the ONE shared cluster labeling
    * ([[clusterLabelCtesSql]] — the same `lbl` dedup_clusters states). */
  val goldenRecordsSql: String = {
    s"""WITH RECURSIVE $sigsSql,
       |$bandsSql,
       |$pairsSql,
       |$clusterLabelCtesSql,
       |lj AS (SELECT l.cluster_id, d.doc_id, d.lang, d.n_chars
       |       FROM lbl l JOIN documents d USING (doc_id)),
       |base AS (
       |  SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
       |         min(doc_id) AS canonical_doc_id,
       |         max(n_chars) AS max_chars
       |  FROM lj GROUP BY 1),
       |vote AS (SELECT cluster_id, lang, count(*) AS cnt FROM lj GROUP BY 1, 2),
       |mj AS (
       |  SELECT cluster_id, lang AS majority_lang
       |  FROM (SELECT cluster_id, lang,
       |               row_number() OVER (PARTITION BY cluster_id
       |                                  ORDER BY cnt DESC, lang) AS rn
       |        FROM vote)
       |  WHERE rn = 1)
       |SELECT b.cluster_id, b.n_members, b.canonical_doc_id,
       |       m.majority_lang, b.max_chars
       |FROM base b JOIN mj m USING (cluster_id)
       |ORDER BY cluster_id""".stripMargin
  }

  /** Fellegi–Sunter field-weight calibration over the LSH candidate
    * space — probabilistic record linkage's m/u estimation run where
    * GENUINE match labels exist: "matched" is the engine's own near-dup
    * decision (signature-agreement estimate ≥ 0.5 — every eighth is
    * binary-exact, so the label is engine-independent), and the
    * unmatched side is the LSH near-misses — exactly the hard pairs a
    * linker must discriminate. For each metadata field (lang equality,
    * source equality, length within 20%), m = P(agree | matched),
    * u = P(agree | unmatched), weight = m/u in the log-free ratio form
    * the FS scoring rule multiplies. The length predicate is pure
    * integer arithmetic (|Δ|·5 ≤ max — no division). Output: 3 exact
    * count-ratio rows; pair space ∝ LSH collisions, never quadratic.
    */
  /** The per-candidate-pair agreement relation shared by the M-step
    * calibration ([[fsFieldWeights]]) and the EM round ([[fsEmRound]]):
    * (matched, lang, source, length) — matched is the engine's own
    * signature-agreement decision, the field columns are 0/1 agreement
    * indicators.
    */
  private def fsPairs(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val meta = docs.select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    DocDedup.estimatedJaccardPairs(docs)
      .withColumn("matched", (col("est_jaccard") >= 0.5).cast("long"))
      .join(meta.select(col("doc_id").as("doc_id_a"), col("lang").as("lang_a"),
        col("source").as("src_a"), col("n_chars").as("nc_a")), "doc_id_a")
      .join(meta.select(col("doc_id").as("doc_id_b"), col("lang").as("lang_b"),
        col("source").as("src_b"), col("n_chars").as("nc_b")), "doc_id_b")
      .select(col("matched"),
        (col("lang_a") === col("lang_b")).cast("long").as("lang"),
        (col("src_a") === col("src_b")).cast("long").as("source"),
        (abs(col("nc_a") - col("nc_b")) * lit(5L) <=
          greatest(col("nc_a"), col("nc_b"))).cast("long").as("length"))
  }

  val fsFieldWeights: Q = (s, dir) => {
    val pairs = fsPairs(s, dir)
    pairs.select(col("matched"), explode(array(
        struct(lit("lang").as("field"), col("lang").as("agree")),
        struct(lit("length").as("field"), col("length").as("agree")),
        struct(lit("source").as("field"), col("source").as("agree")))).as("fa"))
      .select(col("matched"), col("fa.field").as("field"), col("fa.agree"))
      .groupBy(col("field"))
      .agg(sum(col("matched")).as("n_matched"),
        sum(lit(1L) - col("matched")).as("n_unmatched"),
        sum(col("agree") * col("matched")).as("am"),
        sum(col("agree") * (lit(1L) - col("matched"))).as("au"))
      .filter(col("n_matched") > 0L && col("n_unmatched") > 0L)
      .withColumn("m", col("am").cast("double") / col("n_matched").cast("double"))
      .withColumn("u", col("au").cast("double") / col("n_unmatched").cast("double"))
      .select(col("field"), col("n_matched"), col("n_unmatched"),
        graft.Parity.pround(col("m"), 6).as("m"),
        graft.Parity.pround(col("u"), 6).as("u"),
        graft.Parity.pround(
          when(col("u") > lit(0.0), col("m") / col("u")).otherwise(lit(0.0)),
          6).as("weight"))
      .orderBy(col("field"))
  }

  /** Shared oracle CTE chain through `prs(matched, lang, source, length)`
    * — the DuckDB mirror of [[fsPairs]].
    */
  private val fsPrsCtesSql: String = {
    val eq = (0 until NumHashes)
      .map(j => s"CASE WHEN sa.mh_$j = sb.mh_$j THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""$sigsSql,
       |$bandsSql,
       |$pairsSql,
       |est AS (
       |  SELECT c.doc_id_a, c.doc_id_b,
       |         CAST(CASE WHEN floor((CAST($eq AS DOUBLE) / $NumHashes) * 1e6 + 0.5) / 1e6 >= 0.5
       |              THEN 1 ELSE 0 END AS BIGINT) AS matched
       |  FROM cand c
       |  JOIN sigs sa ON c.doc_id_a = sa.doc_id
       |  JOIN sigs sb ON c.doc_id_b = sb.doc_id),
       |prs AS (
       |  SELECT e.matched,
       |         CAST(CASE WHEN da.lang = db.lang THEN 1 ELSE 0 END AS BIGINT) AS lang,
       |         CAST(CASE WHEN da.source = db.source THEN 1 ELSE 0 END AS BIGINT) AS source,
       |         CAST(CASE WHEN abs(da.n_chars - db.n_chars) * 5 <= greatest(da.n_chars, db.n_chars)
       |              THEN 1 ELSE 0 END AS BIGINT) AS length
       |  FROM est e
       |  JOIN documents da ON e.doc_id_a = da.doc_id
       |  JOIN documents db ON e.doc_id_b = db.doc_id)""".stripMargin
  }

  val fsFieldWeightsSql: String = {
    s"""WITH $fsPrsCtesSql,
       |f AS (
       |  SELECT matched, 'lang' AS field, lang AS agree FROM prs
       |  UNION ALL
       |  SELECT matched, 'length' AS field, length AS agree FROM prs
       |  UNION ALL
       |  SELECT matched, 'source' AS field, source AS agree FROM prs),
       |g AS (
       |  SELECT field,
       |         CAST(sum(matched) AS BIGINT) AS n_matched,
       |         CAST(sum(1 - matched) AS BIGINT) AS n_unmatched,
       |         CAST(sum(agree * matched) AS BIGINT) AS am,
       |         CAST(sum(agree * (1 - matched)) AS BIGINT) AS au
       |  FROM f GROUP BY 1),
       |d AS (
       |  SELECT field, n_matched, n_unmatched,
       |         CAST(am AS DOUBLE) / CAST(n_matched AS DOUBLE) AS m,
       |         CAST(au AS DOUBLE) / CAST(n_unmatched AS DOUBLE) AS u
       |  FROM g WHERE n_matched > 0 AND n_unmatched > 0)
       |SELECT field, n_matched, n_unmatched,
       |       floor(m * 1e6 + 0.5) / 1e6 AS m,
       |       floor(u * 1e6 + 0.5) / 1e6 AS u,
       |       floor((CASE WHEN u > 0.0 THEN m / u ELSE 0.0 END) * 1e6 + 0.5) / 1e6 AS weight
       |FROM d ORDER BY field""".stripMargin
  }

  /** One Fellegi–Sunter EM iteration over the candidate-pair agreement
    * relation — the calibration loop a real linker runs where
    * [[fsFieldWeights]] is a single M-step on fixed labels:
    *
    *  - initial (m⁰, u⁰, p⁰) from the engine-labeled counts (clamped into
    *    [10⁻⁶, 1−10⁻⁶] so degenerate fields can't zero a likelihood);
    *  - E-step: per-pair posterior match probability under conditional
    *    independence, P = p⁰·Πf(m) / (p⁰·Πf(m) + (1−p⁰)·Πf(u)) — pure
    *    per-row IEEE arithmetic in the identical literal order on both
    *    engines;
    *  - M-step: posterior-weighted re-estimates m¹/u¹/p¹. Cross-row sums
    *    of posteriors quantize at 1e7 and sum exact DECIMAL (the
    *    association-free house pattern); the complement weights reuse the
    *    SAME quantized value (1e7 − q), so m¹ and u¹ come from one exact
    *    partition of the mass.
    *
    * Output: one row per field (m⁰, u⁰ → m¹, u¹, weight¹ = m¹/u¹) plus the
    * re-estimated class prior. Pair space ∝ LSH collisions, one aggregate
    * pass per step — the iteration parallelizes exactly like the M-step.
    */
  val fsEmRound: Q = (s, dir) => {
    // two consumers (initial params + the E-step scan) — materialize once
    val prs = graft.Scratch.table(fsPairs(s, dir), "fs-em-pairs")
    def clamp(c: org.apache.spark.sql.Column) =
      least(greatest(c, lit(0.000001)), lit(0.999999))
    // a day with zero matched (or zero unmatched) LSH pairs must not kill
    // the job: an empty class carries no evidence, so its conditionals
    // fall back to the uninformative 0.5 (then clamp as usual)
    def safeRatio(num: org.apache.spark.sql.Column,
        den: org.apache.spark.sql.Column) =
      clamp(when(den === lit(0L), lit(0.5))
        .otherwise(num.cast("double") / den.cast("double")))
    val params = prs.agg(
      count(lit(1)).as("n"),
      sum(col("matched")).as("nm"),
      sum(col("lang") * col("matched")).as("aml"),
      sum(col("lang") * (lit(1L) - col("matched"))).as("aul"),
      sum(col("source") * col("matched")).as("ams"),
      sum(col("source") * (lit(1L) - col("matched"))).as("aus"),
      sum(col("length") * col("matched")).as("amn"),
      sum(col("length") * (lit(1L) - col("matched"))).as("aun"))
      .select(
        safeRatio(col("aml"), col("nm")).as("m0_lang"),
        safeRatio(col("aul"), col("n") - col("nm")).as("u0_lang"),
        safeRatio(col("ams"), col("nm")).as("m0_src"),
        safeRatio(col("aus"), col("n") - col("nm")).as("u0_src"),
        safeRatio(col("amn"), col("nm")).as("m0_len"),
        safeRatio(col("aun"), col("n") - col("nm")).as("u0_len"),
        safeRatio(col("nm"), col("n")).as("p0"))
    def term(a: String, p: String) =
      when(col(a) === lit(1L), col(p)).otherwise(lit(1.0) - col(p))
    val e = prs.crossJoin(broadcast(params))
      .withColumn("num", col("p0") * term("lang", "m0_lang")
        * term("source", "m0_src") * term("length", "m0_len"))
      .withColumn("den", (lit(1.0) - col("p0")) * term("lang", "u0_lang")
        * term("source", "u0_src") * term("length", "u0_len"))
      .withColumn("qp", floor(col("num") / (col("num") + col("den")) * lit(1e7) + lit(0.5)))
    val dec = org.apache.spark.sql.types.DecimalType(25, 0)
    val m = e.groupBy(col("m0_lang"), col("u0_lang"), col("m0_src"),
        col("u0_src"), col("m0_len"), col("u0_len"))
      .agg(
        count(lit(1)).as("n2"),
        sum(col("qp").cast(dec)).as("sp"),
        sum((lit(1e7) - col("qp")).cast(dec)).as("su"),
        sum((col("qp") * col("lang")).cast(dec)).as("spl"),
        sum(((lit(1e7) - col("qp")) * col("lang")).cast(dec)).as("sul"),
        sum((col("qp") * col("source")).cast(dec)).as("sps"),
        sum(((lit(1e7) - col("qp")) * col("source")).cast(dec)).as("sus"),
        sum((col("qp") * col("length")).cast(dec)).as("spn"),
        sum(((lit(1e7) - col("qp")) * col("length")).cast(dec)).as("sun"))
      .withColumn("p1",
        col("sp").cast("double") / (col("n2").cast("double") * lit(1e7)))
    // same degenerate-class guard post-E-step: all posterior mass on one
    // side (every qp 0 or 1e7) leaves the other class without evidence;
    // the clamp keeps the re-estimates proper probabilities so the FS
    // weight m1/u1 stays finite when a field agrees on every pair
    def m1(spa: String) = clamp(when(col("sp") === lit(0L), lit(0.5))
      .otherwise(col(spa).cast("double") / col("sp").cast("double")))
    def u1(sua: String) = clamp(when(col("su") === lit(0L), lit(0.5))
      .otherwise(col(sua).cast("double") / col("su").cast("double")))
    m.select(explode(array(
        struct(lit("lang").as("field"), col("m0_lang").as("m0"),
          col("u0_lang").as("u0"), m1("spl").as("m1"), u1("sul").as("u1")),
        struct(lit("length").as("field"), col("m0_len").as("m0"),
          col("u0_len").as("u0"), m1("spn").as("m1"), u1("sun").as("u1")),
        struct(lit("source").as("field"), col("m0_src").as("m0"),
          col("u0_src").as("u0"), m1("sps").as("m1"), u1("sus").as("u1"))))
        .as("fr"), col("p1"))
      .select(col("fr.field").as("field"),
        graft.Parity.pround(col("fr.m0"), 6).as("m0"),
        graft.Parity.pround(col("fr.u0"), 6).as("u0"),
        graft.Parity.pround(col("fr.m1"), 6).as("m1"),
        graft.Parity.pround(col("fr.u1"), 6).as("u1"),
        graft.Parity.pround(col("fr.m1") / col("fr.u1"), 6).as("weight1"),
        graft.Parity.pround(col("p1"), 6).as("p1"))
      .orderBy(col("field"))
  }

  val fsEmRoundSql: String =
    s"""WITH $fsPrsCtesSql,
       |g AS (
       |  SELECT count(*) AS n, sum(matched) AS nm,
       |         sum(lang * matched) AS aml, sum(lang * (1 - matched)) AS aul,
       |         sum(source * matched) AS ams, sum(source * (1 - matched)) AS aus,
       |         sum(length * matched) AS amn, sum(length * (1 - matched)) AS aun
       |  FROM prs),
       |par AS (
       |  -- degenerate-class guard mirrors safeRatio: empty class -> 0.5
       |  SELECT least(greatest(CASE WHEN nm = 0 THEN 0.5 ELSE CAST(aml AS DOUBLE) / CAST(nm AS DOUBLE) END, 0.000001), 0.999999) AS m0_lang,
       |         least(greatest(CASE WHEN n - nm = 0 THEN 0.5 ELSE CAST(aul AS DOUBLE) / CAST(n - nm AS DOUBLE) END, 0.000001), 0.999999) AS u0_lang,
       |         least(greatest(CASE WHEN nm = 0 THEN 0.5 ELSE CAST(ams AS DOUBLE) / CAST(nm AS DOUBLE) END, 0.000001), 0.999999) AS m0_src,
       |         least(greatest(CASE WHEN n - nm = 0 THEN 0.5 ELSE CAST(aus AS DOUBLE) / CAST(n - nm AS DOUBLE) END, 0.000001), 0.999999) AS u0_src,
       |         least(greatest(CASE WHEN nm = 0 THEN 0.5 ELSE CAST(amn AS DOUBLE) / CAST(nm AS DOUBLE) END, 0.000001), 0.999999) AS m0_len,
       |         least(greatest(CASE WHEN n - nm = 0 THEN 0.5 ELSE CAST(aun AS DOUBLE) / CAST(n - nm AS DOUBLE) END, 0.000001), 0.999999) AS u0_len,
       |         least(greatest(CASE WHEN n = 0 THEN 0.5 ELSE CAST(nm AS DOUBLE) / CAST(n AS DOUBLE) END, 0.000001), 0.999999) AS p0
       |  FROM g),
       |e AS (
       |  SELECT floor(num / (num + den) * 1e7 + 0.5) AS qp, lang, source, length
       |  FROM (
       |    SELECT p.lang, p.source, p.length,
       |           pr.p0 * (CASE WHEN p.lang = 1 THEN pr.m0_lang ELSE 1.0 - pr.m0_lang END)
       |                 * (CASE WHEN p.source = 1 THEN pr.m0_src ELSE 1.0 - pr.m0_src END)
       |                 * (CASE WHEN p.length = 1 THEN pr.m0_len ELSE 1.0 - pr.m0_len END) AS num,
       |           (1.0 - pr.p0) * (CASE WHEN p.lang = 1 THEN pr.u0_lang ELSE 1.0 - pr.u0_lang END)
       |                 * (CASE WHEN p.source = 1 THEN pr.u0_src ELSE 1.0 - pr.u0_src END)
       |                 * (CASE WHEN p.length = 1 THEN pr.u0_len ELSE 1.0 - pr.u0_len END) AS den
       |    FROM prs p CROSS JOIN par pr)),
       |mm AS (
       |  SELECT count(*) AS n2,
       |         sum(CAST(qp AS DECIMAL(25,0))) AS sp,
       |         sum(CAST(1e7 - qp AS DECIMAL(25,0))) AS su,
       |         sum(CAST(qp * lang AS DECIMAL(25,0))) AS spl,
       |         sum(CAST((1e7 - qp) * lang AS DECIMAL(25,0))) AS sul,
       |         sum(CAST(qp * source AS DECIMAL(25,0))) AS sps,
       |         sum(CAST((1e7 - qp) * source AS DECIMAL(25,0))) AS sus,
       |         sum(CAST(qp * length AS DECIMAL(25,0))) AS spn,
       |         sum(CAST((1e7 - qp) * length AS DECIMAL(25,0))) AS sun
       |  FROM e),
       |r AS (
       |  SELECT par.*, mm.*,
       |         CAST(sp AS DOUBLE) / (CAST(n2 AS DOUBLE) * 1e7) AS p1
       |  FROM mm CROSS JOIN par),
       |uf AS (
       |  -- clamp mirrors the engine: proper probabilities, finite weight
       |  SELECT 'lang' AS field, m0_lang AS m0, u0_lang AS u0,
       |         least(greatest(CASE WHEN sp = 0 THEN 0.5 ELSE CAST(spl AS DOUBLE) / CAST(sp AS DOUBLE) END, 0.000001), 0.999999) AS m1,
       |         least(greatest(CASE WHEN su = 0 THEN 0.5 ELSE CAST(sul AS DOUBLE) / CAST(su AS DOUBLE) END, 0.000001), 0.999999) AS u1, p1 FROM r
       |  UNION ALL
       |  SELECT 'length', m0_len, u0_len,
       |         least(greatest(CASE WHEN sp = 0 THEN 0.5 ELSE CAST(spn AS DOUBLE) / CAST(sp AS DOUBLE) END, 0.000001), 0.999999),
       |         least(greatest(CASE WHEN su = 0 THEN 0.5 ELSE CAST(sun AS DOUBLE) / CAST(su AS DOUBLE) END, 0.000001), 0.999999), p1 FROM r
       |  UNION ALL
       |  SELECT 'source', m0_src, u0_src,
       |         least(greatest(CASE WHEN sp = 0 THEN 0.5 ELSE CAST(sps AS DOUBLE) / CAST(sp AS DOUBLE) END, 0.000001), 0.999999),
       |         least(greatest(CASE WHEN su = 0 THEN 0.5 ELSE CAST(sus AS DOUBLE) / CAST(su AS DOUBLE) END, 0.000001), 0.999999), p1 FROM r)
       |SELECT field,
       |       ${graft.Parity.proundSql("m0", 6)} AS m0,
       |       ${graft.Parity.proundSql("u0", 6)} AS u0,
       |       ${graft.Parity.proundSql("m1", 6)} AS m1,
       |       ${graft.Parity.proundSql("u1", 6)} AS u1,
       |       ${graft.Parity.proundSql("m1 / u1", 6)} AS weight1,
       |       ${graft.Parity.proundSql("p1", 6)} AS p1
       |FROM uf ORDER BY field""".stripMargin

  val queries: Map[String, Q] = Map(
    "fs_field_weights" -> fsFieldWeights,
    "fs_em_round" -> fsEmRound,
    "golden_records" -> goldenRecords,
    "shingle_novelty" -> shingleNovelty,
    "containment_pairs" -> containmentPairs,
    "minhash_est_eval" -> minhashEstEval,
    "decontaminate" -> decontaminate,
    "fuzzy_pairs" -> fuzzyPairs,
    "dedup_keep_docs" -> dedupKeepDocs,
    "dedup_clusters" -> dedupClusters,
    "dedup_clusters_star" -> dedupClustersStar,
    "dedup_keep_best" -> dedupKeepBest,
    "dedup_exact_docs" -> dedupExactDocs,
    "minhash_signatures" -> minhashSignatures,
    "lsh_candidate_pairs" -> lshCandidatePairs,
    "neardup_incremental" -> neardupIncremental,
    "dedup_incremental_exact" -> dedupIncrementalExact,
    "dedup_clusters_incremental" -> dedupClustersIncremental,
    "neardup_minhash" -> neardupMinhash,
    "ngram_jaccard" -> ngramJaccard,
    "weighted_jaccard" -> weightedJaccard,
    "source_overlap" -> sourceOverlap,
    "simhash_signatures" -> simhashSignatures,
    "simhash_pairs" -> simhashPairs)

  val oracleSql: Map[String, String] = Map(
    "fs_field_weights" -> fsFieldWeightsSql,
    "fs_em_round" -> fsEmRoundSql,
    "golden_records" -> goldenRecordsSql,
    "shingle_novelty" -> shingleNoveltySql,
    "containment_pairs" -> containmentPairsSql,
    "minhash_est_eval" -> minhashEstEvalSql,
    "decontaminate" -> decontaminateSql,
    "fuzzy_pairs" -> fuzzyPairsSql,
    "simhash_pairs" -> simhashPairsSql,
    "dedup_keep_docs" -> dedupKeepDocsSql,
    "dedup_clusters" -> dedupClustersSql,
    "dedup_clusters_star" -> dedupClustersSql, // same labels, O(log n)-round algorithm
    "dedup_keep_best" -> dedupKeepBestSql,
    "dedup_exact_docs" -> dedupExactDocsSql,
    "minhash_signatures" -> minhashSignaturesSql,
    "lsh_candidate_pairs" -> lshCandidatePairsSql,
    "neardup_incremental" -> neardupIncrementalSql,
    "dedup_incremental_exact" -> dedupIncrementalExactSql,
    "dedup_clusters_incremental" -> dedupClustersIncrementalSql,
    "neardup_minhash" -> neardupMinhashSql,
    "ngram_jaccard" -> ngramJaccardSql,
    "weighted_jaccard" -> weightedJaccardSql,
    "source_overlap" -> sourceOverlapSql,
    "simhash_signatures" -> simhashSignaturesSql)
}
