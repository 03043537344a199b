package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Document deduplication family for training-data pipelines:
  *
  *  - exact: canonical-fingerprint group-by (one shuffle on the digest);
  *  - MinHash + LSH: word-shingle signatures, banded bucket join — the
  *    scale path for near-dup detection (candidate pairs ∝ collisions, never
  *    all-pairs);
  *  - SimHash: 32-bit majority-bit sketch with high-bits blocking;
  *  - n-gram Jaccard: exact similarity on LSH candidates only.
  *
  * Portability: "hashes" are md5-derived (lexicographic min over hex digests
  * is a valid uniform minhash), so the DuckDB oracle can reproduce every
  * signature bit-for-bit. At 100 TB swap md5 for xxhash64 via one function —
  * topology is unchanged.
  */
object DocDedup {

  final val NumHashes = 8
  final val BandSize = 2 // 4 bands of 2 rows → catches J ≳ 0.5 pairs

  /** Exact dedup: group identical canonical fingerprints, keep the smallest
    * doc_id as representative.
    */
  def exactDuplicates(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .groupBy("fp")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keep_doc_id"))

  /** (doc_id, pos, word) exploded normalized words. */
  private def explodedWords(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      posexplode(TextAnalysis.words(col("text"))).as(Seq("pos", "word")))

  /** (doc_id, shingle) word 3-gram shingles via lead windows. */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val withLeads = explodedWords(docs).select(
      col("doc_id"),
      concat_ws(" ", (0 until n).map(i =>
        if (i == 0) col("word") else lead(col("word"), i).over(w)): _*).as("shingle"),
      (0 until n).drop(1).map(i => lead(col("word"), i).over(w).isNotNull)
        .reduce(_ && _).as("complete"))
    withLeads.filter(col("complete")).select("doc_id", "shingle")
  }

  /** MinHash signature: NumHashes seeded minima over md5(seed:shingle). */
  def minhashSignatures(docs: DataFrame): DataFrame =
    shingles(docs)
      .groupBy("doc_id")
      .agg(
        min(md5(concat(lit("0:"), col("shingle")))).as("mh_0"),
        (1 until NumHashes).map(j =>
          min(md5(concat(lit(s"$j:"), col("shingle")))).as(s"mh_$j")): _*)

  /** Signatures materialized once for multi-branch pair queries.
    *
    * The banded self-join plus signature re-join references the signature
    * subtree up to 4x, and Catalyst's ReusedExchange does not fire across
    * the self-join aliases — observed 4 full recomputes of the shingle
    * window + 32-column min agg. A lazy localCheckpoint collapses the
    * branches onto one computed RDD (the in-query analog of materializing
    * the signature table, which is how a 100 TB corpus would run this:
    * signatures persisted once, pair generation reading them).
    */
  private def materializedSignatures(docs: DataFrame): DataFrame =
    minhashSignatures(docs).localCheckpoint(false)

  private def bandsOf(sigs: DataFrame): DataFrame = {
    val nBands = NumHashes / BandSize
    sigs.select(
      col("doc_id"),
      posexplode(array((0 until nBands).map { b =>
        md5(concat_ws("|", (0 until BandSize).map(i => col(s"mh_${b * BandSize + i}")): _*))
      }: _*)).as(Seq("band_idx", "band_key")))
  }

  private def pairsFromSigs(sigs: DataFrame): DataFrame = {
    val bands = bandsOf(sigs)
    val l = bands.as("l")
    val r = bands.as("r")
    l.join(r,
        col("l.band_idx") === col("r.band_idx") &&
        col("l.band_key") === col("r.band_key") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_id_a"), col("r.doc_id").as("doc_id_b"))
      .distinct()
  }

  /** LSH banded candidate pairs: docs sharing any band of the signature.
    * Join is per (band_idx, band_key) bucket — the only pairs materialized
    * are hash-collision candidates, which is what makes near-dup detection
    * feasible at scale (vs O(n²) all-pairs).
    */
  def lshCandidatePairs(docs: DataFrame): DataFrame =
    pairsFromSigs(materializedSignatures(docs))

  /** Estimated Jaccard for candidate pairs: fraction of equal signature
    * rows. Exact-Jaccard refinement joins shingle sets for candidates only.
    */
  def estimatedJaccardPairs(docs: DataFrame): DataFrame = {
    val sigs = materializedSignatures(docs)
    val pairs = pairsFromSigs(sigs)
    val a = sigs.as("a")
    val b = sigs.as("b")
    val eqCount = (0 until NumHashes)
      .map(j => when(col(s"a.mh_$j") === col(s"b.mh_$j"), 1).otherwise(0))
      .reduce(_ + _)
    pairs
      .join(a, pairs("doc_id_a") === col("a.doc_id"))
      .join(b, pairs("doc_id_b") === col("b.doc_id"))
      .select(col("doc_id_a"), col("doc_id_b"),
        graft.Parity.pround(eqCount.cast("double") / NumHashes, 6).as("est_jaccard"))
  }

  /** Exact n-gram Jaccard, computed ONLY for LSH candidate pairs:
    * |A ∩ B| via shingle-set join, |A ∪ B| = |A| + |B| − |A ∩ B|.
    */
  def exactJaccardPairs(docs: DataFrame): DataFrame = {
    val sh = shingles(docs).distinct().localCheckpoint(false)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val pairs = lshCandidatePairs(docs)
    val inter = pairs
      .join(sh.as("sa"), col("doc_id_a") === col("sa.doc_id"))
      .join(sh.as("sb"),
        col("doc_id_b") === col("sb.doc_id") && col("sa.shingle") === col("sb.shingle"))
      .groupBy("doc_id_a", "doc_id_b")
      .agg(count(lit(1)).as("n_common"))
    pairs
      .join(inter, Seq("doc_id_a", "doc_id_b"), "left")
      .na.fill(0L, Seq("n_common"))
      .join(sizes.as("za"), col("doc_id_a") === col("za.doc_id"))
      .join(sizes.as("zb"), col("doc_id_b") === col("zb.doc_id"))
      .select(col("doc_id_a"), col("doc_id_b"),
        graft.Parity.pround(col("n_common").cast("double") /
          (col("za.n_shingles") + col("zb.n_shingles") - col("n_common")), 6)
          .as("jaccard"))
  }

  /** Portable 32-bit word hash: positional hex-digit parse of the first 8
    * md5 chars (expressible identically in the DuckDB oracle, which lacks
    * a hex→int conversion).
    */
  private val wordHash32: Column =
    expr("""aggregate(sequence(1, 8), CAST(0 AS BIGINT),
           |  (acc, i) -> acc * 16 + CAST(instr('0123456789abcdef', substring(md5(word), i, 1)) - 1 AS BIGINT))""".stripMargin)

  /** SimHash-32: per-bit majority vote over word hashes. */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    val toks = explodedWords(docs).select(col("doc_id"), wordHash32.as("h"))
    val bitSums = toks.groupBy("doc_id").agg(
      sum(when(expr("(h div 1) % 2") === 1, 1).otherwise(-1)).as("bit_0"),
      (1 until 32).map(b =>
        sum(when(expr(s"(h div ${1L << b}) % 2") === 1, 1).otherwise(-1)).as(s"bit_$b")): _*)
    val sim = (0 until 32)
      .map(b => when(col(s"bit_$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    bitSums.select(col("doc_id"), sim.as("simhash32"))
  }

  /** Near-dup pairs via SimHash: block on the high 16 bits (LSH-style),
    * keep pairs within `maxHamming` of each other.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sigs = simhashSignatures(docs).withColumn("block", expr("simhash32 div 65536"))
    val l = sigs.as("l")
    val r = sigs.as("r")
    l.join(r, col("l.block") === col("r.block") && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_id_a"), col("r.doc_id").as("doc_id_b"),
        expr("bit_count(l.simhash32 ^ r.simhash32)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
