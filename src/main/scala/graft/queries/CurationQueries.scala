package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.DocDedup
import graft.functions.PortableHash
import graft.sampling.Sampling
import graft.text.TextAnalysis

/** The flagship end-to-end training-data curation query: the full corpus
  * pipeline a 100 TB pretraining run needs, as ONE composed dataflow —
  *
  *   1. exact dedup (fingerprint group-by, keep lowest doc_id),
  *   2. near-dup removal (MinHash banding → LSH candidates → estimated
  *      Jaccard ≥ 0.5, drop the higher-id side — never all-pairs),
  *   3. quality gate (composite score ≥ 0.5) + language gate (lang-ID = en),
  *   4. deterministic 80/10/10 train/val/test assignment (hash-of-key,
  *      never rand()).
  *
  * Every stage reuses the already-oracle-checked operator (DocDedup,
  * TextAnalysis, Sampling); the oracle below recomputes the whole chain in
  * DuckDB, so the COMPOSITION is verified end-to-end, not just the parts.
  * Near-dup pairs are computed over the full corpus rather than the
  * exact-dedup survivors: exact duplicates share identical signatures, so
  * either ordering yields the same survivor set, and the full-corpus form
  * keeps one signature subtree shared with the standalone dedup queries.
  */
object CurationQueries {

  type Q = (SparkSession, String) => DataFrame

  val corpusCuration: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val keepers = DocDedup.exactDuplicates(docs)
      .select(col("keep_doc_id").as("doc_id"))
    val drops = DocDedup.estimatedJaccardPairs(docs)
      .filter(col("est_jaccard") >= 0.5)
      .select(col("doc_id_b")).distinct()
    val quality = TextAnalysis.qualityScore(docs) // (doc_id, quality_score)
    val lang = TextAnalysis.langId(docs).select(col("doc_id"), col("lang_pred"))
    // keepers' ids are drawn from docs, so keepers IS the exact-dedup
    // survivor set — no join back to documents needed
    keepers
      .join(drops, col("doc_id") === col("doc_id_b"), "left_anti")
      .join(quality.filter(col("quality_score") >= 0.5), "doc_id")
      .join(lang.filter(col("lang_pred") === "en"), "doc_id")
      .select(col("doc_id"), col("lang_pred"), col("quality_score"),
        Sampling.split(col("doc_id"),
          Seq("train" -> 80, "val" -> 10, "test" -> 10)).as("split"))
      .orderBy(col("doc_id"))
  }

  val corpusCurationSql: String = {
    import DedupQueries.{sigsSql, bandsSql, pairsSql}
    import TextQueries.{stopCountSql, stopEn, stopEs, stopDe, stopFr}
    val eq = (0 until DocDedup.NumHashes)
      .map(j => s"CASE WHEN sa.mh_$j = sb.mh_$j THEN 1 ELSE 0 END")
      .mkString(" + ")
    // qualified: the final select joins three relations that all carry doc_id
    val bucket = s"(${PortableHash.hash32Sql("k.doc_id")}) % 100"
    s"""WITH $sigsSql,
       |$bandsSql,
       |$pairsSql,
       |drops AS (
       |  SELECT DISTINCT c.doc_id_b
       |  FROM cand c
       |  JOIN sigs sa ON c.doc_id_a = sa.doc_id
       |  JOIN sigs sb ON c.doc_id_b = sb.doc_id
       |  WHERE floor((CAST($eq AS DOUBLE) / ${DocDedup.NumHashes}) * 1e6 + 0.5) / 1e6 >= 0.5),
       |keepers AS (
       |  SELECT min(doc_id) AS doc_id FROM normed GROUP BY md5(norm)),
       |wq AS (
       |  -- derive from the sigs chain's normed CTE: ONE canonical
       |  -- normalization expression, not a third copy of it
       |  SELECT n.doc_id, d.text, string_split(n.norm, ' ') AS ws
       |  FROM normed n JOIN documents d ON n.doc_id = d.doc_id),
       |stats AS (
       |  SELECT doc_id,
       |         len(ws) AS word_count,
       |         len(regexp_extract_all(text, '[.,;:!?]')) AS punct_count,
       |         floor((CAST(${stopCountSql(stopEn)} AS DOUBLE) / len(ws)) * 1e6 + 0.5) / 1e6 AS stopword_ratio
       |  FROM wq),
       |quality AS (
       |  SELECT doc_id,
       |         floor((0.4 * least(CAST(word_count AS DOUBLE) / 50, 1.0)
       |             + 0.3 * least(stopword_ratio * 5, 1.0)
       |             + 0.3 * greatest(0.0, 1.0 - CAST(punct_count AS DOUBLE) / greatest(word_count, 1))) * 1e6 + 0.5) / 1e6
       |           AS quality_score
       |  FROM stats),
       |langscores AS (
       |  SELECT doc_id,
       |         ${stopCountSql(stopEn)} AS score_en,
       |         ${stopCountSql(stopEs)} AS score_es,
       |         ${stopCountSql(stopDe)} AS score_de,
       |         ${stopCountSql(stopFr)} AS score_fr
       |  FROM wq),
       |lang AS (
       |  SELECT doc_id,
       |         CASE
       |           WHEN score_en >= greatest(score_es, score_de, score_fr) AND score_en > 0 THEN 'en'
       |           WHEN score_es >= greatest(score_de, score_fr) AND score_es > 0 THEN 'es'
       |           WHEN score_de >= score_fr AND score_de > 0 THEN 'de'
       |           WHEN score_fr > 0 THEN 'fr'
       |           ELSE 'und'
       |         END AS lang_pred
       |  FROM langscores)
       |SELECT k.doc_id, l.lang_pred, q.quality_score,
       |       CASE WHEN $bucket < 80 THEN 'train'
       |            WHEN $bucket < 90 THEN 'val'
       |            ELSE 'test' END AS split
       |FROM keepers k
       |JOIN quality q ON k.doc_id = q.doc_id
       |JOIN lang l ON k.doc_id = l.doc_id
       |WHERE k.doc_id NOT IN (SELECT doc_id_b FROM drops)
       |  AND q.quality_score >= 0.5 AND l.lang_pred = 'en'
       |ORDER BY k.doc_id""".stripMargin
  }

  /** Curriculum sharding — deterministic data ORDERING for training:
    * rank the corpus by quality (best first, doc_id tie-break), then cut
    * the ranked stream into shards of ~equal TOKEN budget (4096 here —
    * a hyperparameter), so shard 0 is the highest-quality slice and a
    * trainer can schedule easy→hard (or anneal mixture weights) by shard
    * number. The assignment is a pure function of (quality, doc_id,
    * token counts) — re-running on identical data yields identical
    * shards, which is what makes a training run resumable.
    *
    * Scale shape: the only global coordination is the running token
    * total in rank order, and that uses [[graft.relational.GlobalIndex
    * .withPrefixSum]] — range-partition on the (quality desc, doc_id)
    * key, parallel local running sums, cross-partition offsets from a
    * per-partition SUM relation (one row per partition, broadcast back)
    * — never `sum() OVER (ORDER BY …)`'s single-task funnel, which the
    * oracle (corpus fits one node) is allowed to use but 100 TB is not.
    * The shard id is exact integer floor-division of the EXCLUSIVE
    * prefix (cum − own), so a whale document cannot straddle assignment.
    */
  val curriculumShards: Q = (s, dir) => {
    val budget = 4096L
    val docs = Tables.documents(s, dir)
    val base = TextAnalysis.qualityScore(docs)
      .join(docs.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens")),
        Seq("doc_id"))
      // range keys sort ascending: negate the (already 1e-6-quantized,
      // so exactly negatable) score for best-first order
      .withColumn("ord", -col("quality_score"))
    graft.relational.GlobalIndex
      .withPrefixSum(base, Seq("ord", "doc_id"), "n_tokens",
        cumName = "cum_tokens")
      .select(col("doc_id"), col("quality_score"), col("n_tokens"),
        col("cum_tokens"),
        // SQL `div`: exact BIGINT division (Spark's `/` is fractional —
        // a float quotient truncated back can land on the wrong side of
        // a boundary; DuckDB's `//` is the same exact integer op)
        expr(s"(cum_tokens - n_tokens) div $budget").as("shard"))
      .orderBy(col("doc_id"))
  }

  val curriculumShardsSql: String = {
    s"""WITH ${TextQueries.normedSql},
       |${TextQueries.gopherStatsSql},
       |quality AS (
       |  SELECT doc_id, ${TextQueries.qualityScoreColSql} AS quality_score
       |  FROM gstats),
       |toks AS (
       |  SELECT doc_id,
       |         len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\\s]|\\s+')) AS n_tokens
       |  FROM documents),
       |ranked AS (
       |  SELECT q.doc_id, q.quality_score, t.n_tokens,
       |         CAST(sum(t.n_tokens) OVER (
       |           ORDER BY q.quality_score DESC, q.doc_id) AS BIGINT) AS cum_tokens
       |  FROM quality q JOIN toks t ON q.doc_id = t.doc_id)
       |SELECT doc_id, quality_score, n_tokens, cum_tokens,
       |       (cum_tokens - n_tokens) // 4096 AS shard
       |FROM ranked ORDER BY doc_id""".stripMargin
  }

  /** Cohen's κ agreement between the corpus's two quality raters — the
    * Gopher rule-battery gate ([[TextQueries.gopherFilters]]' `keep`) and
    * the composite score threshold (quality_score ≥ ½). κ corrects raw
    * agreement for chance, which is the statistic a curation team checks
    * before trusting one cheap filter as a proxy for another (or for
    * human labels): high raw agreement with κ ≈ 0 means the filters
    * agree only because both mostly say "keep".
    *
    * Scale shape: BOTH rule batteries come from ONE corpus scan — the
    * shared [[TextQueries.gopherStats]] projection carries every stat
    * either rater needs, the flags are per-row expressions over it
    * ([[TextQueries.gopherKeepCol]] / [[TextAnalysis.qualityScoreCol]] —
    * the same single definitions the standalone gates use), and the 2×2
    * table is ONE map-side-combined aggregate; no corpus-wide join, no
    * second pass. Everything after the four cells is driver-free scalar
    * arithmetic on a 1-row frame. Cells are count(when(...)) — count
    * never nulls on an empty corpus, matching the oracle's FILTER
    * semantics. All marginal products are computed in DOUBLE with a
    * fixed op order (they overflow BIGINT at ~3e9 docs); po and pe are
    * single divisions; κ's pe=1 degeneracy (both raters constant) is
    * defined 1 on perfect agreement, 0 otherwise, identically in the
    * oracle.
    */
  val kappaAgreement: Q = (s, dir) => {
    val st = TextQueries.gopherStats(Tables.documents(s, dir))
    val flags = st.select(
      TextQueries.gopherKeepCol(col("word_count"), col("avg_word_len"),
        col("stopword_count"), col("dup_ratio")).as("ra"),
      (TextAnalysis.qualityScoreCol(col("word_count"), col("stopword_ratio"),
        col("punct_count")) >= 0.5).as("rb"))
    val cells = flags
      .agg(count(lit(1)).as("n"),
        count(when(col("ra") && col("rb"), true)).as("n11"),
        count(when(col("ra") && !col("rb"), true)).as("n10"),
        count(when(!col("ra") && col("rb"), true)).as("n01"),
        count(when(!col("ra") && !col("rb"), true)).as("n00"))
    val nd = col("n").cast("double")
    val po = (col("n11") + col("n00")).cast("double") / nd
    val pe = ((col("n11") + col("n10")).cast("double") *
        (col("n11") + col("n01")).cast("double") +
      (col("n01") + col("n00")).cast("double") *
        (col("n10") + col("n00")).cast("double")) / (nd * nd)
    cells.select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
      graft.Parity.pround(po, 6).as("po"),
      graft.Parity.pround(pe, 6).as("pe"),
      graft.Parity.pround(
        when(pe === 1.0, when(po === 1.0, lit(1.0)).otherwise(lit(0.0)))
          .otherwise((po - pe) / (lit(1.0) - pe)), 6).as("kappa"))
  }

  val kappaAgreementSql: String = {
    val po = "CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE)"
    val pe = "(CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE) " +
      "+ CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE)) " +
      "/ (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))"
    s"""WITH ${TextQueries.normedSql},
       |${TextQueries.gopherStatsSql},
       |flags AS (
       |  SELECT ${TextQueries.gopherKeepSql} AS ra,
       |         (${TextQueries.qualityScoreColSql}) >= 0.5 AS rb
       |  FROM gstats),
       |cells AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |         CAST(count(*) FILTER (WHERE ra AND rb) AS BIGINT) AS n11,
       |         CAST(count(*) FILTER (WHERE ra AND NOT rb) AS BIGINT) AS n10,
       |         CAST(count(*) FILTER (WHERE NOT ra AND rb) AS BIGINT) AS n01,
       |         CAST(count(*) FILTER (WHERE NOT ra AND NOT rb) AS BIGINT) AS n00
       |  FROM flags)
       |SELECT n, n11, n10, n01, n00,
       |       ${graft.Parity.proundSql(po, 6)} AS po,
       |       ${graft.Parity.proundSql(pe, 6)} AS pe,
       |       ${graft.Parity.proundSql(
                 s"CASE WHEN ($pe) = 1.0 THEN (CASE WHEN ($po) = 1.0 THEN 1.0 ELSE 0.0 END) " +
                   s"ELSE (($po) - ($pe)) / (1.0 - ($pe)) END", 6)} AS kappa
       |FROM cells""".stripMargin
  }

  /** Source-mixture waterfilling — the allocation step AFTER
    * [[SamplingQueries]]' fixed-rate mixing: given a total token BUDGET
    * (half the corpus here), give every source an equal share except
    * where a source simply doesn't have that many tokens, and
    * redistribute the slack to the bigger sources — i.e. find the level
    * c with Σ min(avail_s, c) = budget. Equalizing over-concentrated
    * sources is exactly how pretraining mixtures cap a dominant crawl
    * without starving small high-quality sources.
    *
    * Scale shape: per-source token totals are one map-side-combined
    * aggregate (the corpus-scale pass); everything after lives on the
    * |sources|-bounded relation — source is a closed vocabulary, so the
    * unpartitioned prefix-sum window here is bounded by CONSTRUCTION
    * (the HLL-register argument), not by data. The level j (how many
    * sources saturate) is picked by the closed-form feasibility test
    * avail_k·(n−k) + prefix_k ≤ budget per row and one max; the water
    * level is a single division, allocations one least() each.
    */
  val mixtureWaterfill: Q = (s, dir) => {
    val avail = Tables.documents(s, dir)
      .groupBy(col("source"))
      .agg(sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("avail"))
    val tot = avail.agg(sum(col("avail")).as("total"),
      count(lit(1)).as("n_src"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("avail"), col("source"))
    val ranked = graft.Scratch.table(
      avail.crossJoin(broadcast(tot))
        .withColumn("budget", expr("total div 2"))
        .withColumn("k", row_number().over(w).cast("long"))
        .withColumn("prefix", sum(col("avail")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow))),
      "waterfill-ranked")
    // j = #sources that saturate (take all their tokens) at the level
    val j = ranked.agg(coalesce(max(when(
        col("avail") * (col("n_src") - col("k")) + col("prefix") <= col("budget"),
        col("k"))), lit(0L)).as("j"))
    // level from the scratch'd |sources|-row relation only — never a
    // second corpus pass (ranked already carries budget and n_src). The
    // j = n_src corner (zero-token corpus: budget 0, every source
    // "saturates") would divide 0/0 — NULL on Spark, NaN on DuckDB —
    // so it is pinned to level 0 on both engines.
    val level = ranked.join(broadcast(j), col("k") === col("j"))
      .select(when(col("n_src") === col("j"), lit(0.0))
        .otherwise((col("budget") - col("prefix")).cast("double") /
          (col("n_src") - col("j")).cast("double")))
      .unionAll(ranked.filter(col("k") === 1L)
        .crossJoin(broadcast(j)).filter(col("j") === 0L)
        .select(col("budget").cast("double") / col("n_src").cast("double")))
      .toDF("level")
    ranked.crossJoin(broadcast(level))
      .select(col("source"), col("avail"),
        graft.Parity.pround(col("level"), 6).as("level"),
        graft.Parity.pround(
          least(col("avail").cast("double"), col("level")), 6).as("alloc_tokens"))
      .orderBy(col("source"))
  }

  val mixtureWaterfillSql: String =
    s"""WITH av AS (
       |  SELECT source,
       |         CAST(sum(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\\s]|\\s+'))) AS BIGINT) AS avail
       |  FROM documents GROUP BY 1),
       |tot AS (SELECT CAST(sum(avail) AS BIGINT) AS total,
       |               CAST(count(*) AS BIGINT) AS n_src
       |        FROM av),
       |rk AS (
       |  SELECT source, avail, total // 2 AS budget, n_src,
       |         row_number() OVER (ORDER BY avail, source) AS k,
       |         CAST(sum(avail) OVER (ORDER BY avail, source
       |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS prefix
       |  FROM av CROSS JOIN tot),
       |j AS (SELECT COALESCE(max(CASE WHEN avail * (n_src - k) + prefix <= budget
       |                               THEN k END), 0) AS j
       |      FROM rk),
       |lvl AS (
       |  SELECT CASE WHEN n_src = j.j THEN 0.0
       |              ELSE CAST(budget - prefix AS DOUBLE) / CAST(n_src - j.j AS DOUBLE)
       |         END AS level
       |  FROM rk JOIN j ON rk.k = j.j
       |  UNION ALL
       |  SELECT CAST(budget AS DOUBLE) / CAST(n_src AS DOUBLE)
       |  FROM rk CROSS JOIN j WHERE rk.k = 1 AND j.j = 0)
       |SELECT source, avail,
       |       ${graft.Parity.proundSql("level", 6)} AS level,
       |       ${graft.Parity.proundSql(
                 "least(CAST(avail AS DOUBLE), level)", 6)} AS alloc_tokens
       |FROM rk CROSS JOIN lvl ORDER BY source""".stripMargin

  val queries: Map[String, Q] = Map(
    "corpus_curation" -> corpusCuration,
    "curriculum_shards" -> curriculumShards,
    "kappa_agreement" -> kappaAgreement,
    "mixture_waterfill" -> mixtureWaterfill)
  val oracleSql: Map[String, String] = Map(
    "corpus_curation" -> corpusCurationSql,
    "curriculum_shards" -> curriculumShardsSql,
    "kappa_agreement" -> kappaAgreementSql,
    "mixture_waterfill" -> mixtureWaterfillSql)
}
