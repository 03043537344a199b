package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.similarity.Similarity

/** Similarity-search driver queries over `embeddings` with DuckDB oracles.
  *
  * Dot products on both sides are strict sequential left-folds over
  * double-cast elements (Spark `aggregate`, DuckDB `list_reduce`), so
  * doubles match bit-for-bit; results are additionally rounded to 6.
  *
  * `neardup_embeddings` caps the pair space at vec_id < 1000 per side: the
  * capped query demonstrates (and oracle-checks) the pair computation, while
  * `ann_lsh_topk` is the uncapped scale path (bucket-pruned, rows-only
  * check).
  */
object SimilarityQueries {

  type Q = (SparkSession, String) => DataFrame

  /** DuckDB sequential dot product (left fold starting at 0.0, like Spark's
    * aggregate; 0.0 + x == x exactly so list_reduce over the transformed
    * products matches).
    */
  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |  list_transform(range(1, len($a) + 1),
       |    i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (x, y) -> x + y)""".stripMargin

  private def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)}) / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  val embeddingNorms: Q = (s, dir) =>
    Similarity.norms(Tables.embeddings(s, dir)).orderBy(col("vec_id"))

  val embeddingNormsSql: String =
    s"""SELECT vec_id, CAST(label AS BIGINT) AS label,
       |       floor(sqrt(${dotSql("embedding", "embedding")}) * 1e6 + 0.5) / 1e6 AS l2_norm
       |FROM embeddings ORDER BY vec_id""".stripMargin

  val knnBruteForce: Q = (s, dir) =>
    Similarity.knnBruteForce(Tables.embeddings(s, dir), queryVecId = 0L, k = 10)

  val knnBruteForceSql: String =
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
       |SELECT e.vec_id, CAST(e.label AS BIGINT) AS label,
       |       floor((${cosineSql("e.embedding", "q.qe")}) * 1e6 + 0.5) / 1e6 AS cos_sim
       |FROM embeddings e, q
       |WHERE e.vec_id <> 0
       |ORDER BY cos_sim DESC, vec_id
       |LIMIT 10""".stripMargin

  val neardupEmbeddings: Q = (s, dir) =>
    Similarity.neardupPairs(
        Tables.embeddings(s, dir).filter(col("vec_id") < 1000), minCosine = 0.3)
      .orderBy(col("vec_id_a"), col("vec_id_b"))

  val neardupEmbeddingsSql: String =
    s"""WITH e AS (SELECT vec_id, label, embedding FROM embeddings WHERE vec_id < 1000)
       |SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b, CAST(a.label AS BIGINT) AS label,
       |       floor((${cosineSql("a.embedding", "b.embedding")}) * 1e6 + 0.5) / 1e6 AS cos_sim
       |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE floor((${cosineSql("a.embedding", "b.embedding")}) * 1e6 + 0.5) / 1e6 >= 0.3
       |ORDER BY vec_id_a, vec_id_b""".stripMargin

  /** Scale-path ANN: LSH sign-buckets, candidates restricted to the query's
    * bucket. Not SQL-expressible (seeded hyperplanes) → rows-only check.
    */
  val annLshTopK: Q = (s, dir) =>
    Similarity.annLshTopK(
        Tables.embeddings(s, dir), queryVecIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10)
      .orderBy(col("query_vec_id"), col("rank"))

  val queries: Map[String, Q] = Map(
    "embedding_norms" -> embeddingNorms,
    "knn_bruteforce" -> knnBruteForce,
    "neardup_embeddings" -> neardupEmbeddings,
    "ann_lsh_topk" -> annLshTopK)

  val oracleSql: Map[String, String] = Map(
    "embedding_norms" -> embeddingNormsSql,
    "knn_bruteforce" -> knnBruteForceSql,
    "neardup_embeddings" -> neardupEmbeddingsSql)
}
