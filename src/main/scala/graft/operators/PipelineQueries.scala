package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-contract query wrappers for the LLM-pipeline operators
  * (dedup / similarity / text analysis / multimodal) over the
  * `documents` and `embeddings` fixtures.
  */
object PipelineQueries {

  // ---------------------------------------------------------------- dedup

  def dedupExact(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.exact(Tables.documents(spark, sfDir))
      .orderBy(col("keep_id"))

  val dedupExactSql: String =
    """SELECT md5(text) AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
      |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin

  def dedupNgram(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.ngramJaccard(Tables.documents(spark, sfDir), n = 5, threshold = 0.5)
      .orderBy(col("id_a"), col("id_b"))

  val dedupNgramSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    unnest([array_to_string(t[i:i+4], ' ')
      |            FOR i IN generate_series(1, greatest(len(t)-4, 1))]) AS s
      |  FROM toks),
      |sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
      |p AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT id_a, id_b, inter / (sa.n_sh + sb.n_sh - inter) AS jaccard
      |FROM p
      |JOIN sz sa ON p.id_a = sa.doc_id
      |JOIN sz sb ON p.id_b = sb.doc_id
      |WHERE inter / (sa.n_sh + sb.n_sh - inter) >= 0.5
      |ORDER BY id_a, id_b""".stripMargin

  /** MinHash+LSH — hash functions not reproducible in DuckDB SQL; rows-only
    * check here, recall asserted against exact Jaccard in DedupSpec. */
  def dedupMinhash(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.minhashLsh(Tables.documents(spark, sfDir))
      .orderBy(col("id_a"), col("id_b"))

  /** SimHash — rows-only for the same reason; spec checks agreement with
    * exact Jaccard near-dups. */
  def dedupSimhash(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.simhashPairs(Tables.documents(spark, sfDir))
      .orderBy(col("id_a"), col("id_b"))

  def dedupEmbedding(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.embeddingNearDup(Tables.embeddings(spark, sfDir), threshold = 0.5)
      .orderBy(col("id_a"), col("id_b"))

  val dedupEmbeddingSql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b
      |FROM e a JOIN e b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(a.v, b.v) >= 0.5
      |ORDER BY 1, 2""".stripMargin

  /** Hyperplane-LSH scale path — rows-only; recall vs brute force in spec. */
  def dedupEmbeddingLsh(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.embeddingNearDupLsh(Tables.embeddings(spark, sfDir), threshold = 0.5)
      .orderBy(col("id_a"), col("id_b"))
}
