package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions._

/** Exact k-NN similarity search over the `embeddings` point collection.
  *
  * Re-expresses the reference's server-side Qdrant search
  * (reference: vector_db_query.py:78-86 `client.search(..., limit=5)`,
  * text_img.py:74-78 `limit=1`) as a Spark plan: the query set is tiny and the
  * corpus is huge, so the right physical shape is a **broadcast nested-loop
  * join** (broadcast the queries, stream the corpus) followed by a per-query
  * top-k. At 100 TB the corpus side stays partition-parallel with no shuffle
  * of corpus rows; only k rows per query per partition survive the rank
  * filter's partial evaluation.
  */
object Knn {

  /** Generic top-k: for each row of `queries` (qid, qvec) score against
    * `corpus` (vec_id, embedding) and keep the k nearest by cosine,
    * ties broken by ascending vec_id on the 6-dp-rounded score.
    */
  def topK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = corpus
      .crossJoin(broadcast(queries))
      .withColumn("score", cosineSimilarity6(col("qvec"), col("embedding")))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vec_id"), col("score"), col("rank"))
      .orderBy(col("qid"), col("rank"))
  }

  /** q01_knn_topk_cosine — top-5 neighbors for each of the first 10 vectors
    * used as queries (reference: vector_db_query.py:78-86).
    */
  def knnTopkCosine(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), toDouble(col("embedding")).as("qvec"))
    val corpus = emb.select(col("vec_id"), toDouble(col("embedding")).as("embedding"))
    topK(queries, corpus, 5)
  }

  val q01OracleSql: String =
    """WITH q AS (
      |  SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec
      |  FROM embeddings WHERE vec_id < 10
      |), c AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
      |), s AS (
      |  SELECT q.qid, c.vec_id,
      |         round(CASE WHEN sqrt(list_dot_product(q.qvec, q.qvec)) * sqrt(list_dot_product(c.vec, c.vec)) = 0
      |               THEN 0.0
      |               ELSE list_dot_product(q.qvec, c.vec)
      |                    / (sqrt(list_dot_product(q.qvec, q.qvec)) * sqrt(list_dot_product(c.vec, c.vec))) END, 6) AS score
      |  FROM q CROSS JOIN c
      |)
      |SELECT qid, vec_id, score, rank
      |FROM (SELECT qid, vec_id, score,
      |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
      |      FROM s)
      |WHERE rank <= 5
      |ORDER BY qid, rank""".stripMargin

  /** q02_knn_top1_filtered — top-1 neighbor per query restricted to corpus
    * points sharing the query's payload label — filtered vector search
    * (reference: text_img.py:74-78 limit=1; payload filter is the standard
    * Qdrant filtered-search pattern over payload fields, vector_db.py:89).
    * Self-match (vec_id = qid) is excluded so the result is not trivially the
    * query itself.
    */
  def knnTop1Filtered(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), toDouble(col("embedding")).as("qvec"), col("label").as("qlabel"))
    val corpus = emb.select(col("vec_id"), toDouble(col("embedding")).as("embedding"), col("label"))
    val scored = corpus
      .join(broadcast(queries), col("label") === col("qlabel") && col("vec_id") =!= col("qid"))
      .withColumn("score", cosineSimilarity6(col("qvec"), col("embedding")))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 1)
      .select(col("qid"), col("vec_id"), col("label").cast("long").as("label"), col("score"))
      .orderBy(col("qid"))
  }

  val q02OracleSql: String =
    """WITH q AS (
      |  SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec, label AS qlabel
      |  FROM embeddings WHERE vec_id < 10
      |), c AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS vec, label FROM embeddings
      |), s AS (
      |  SELECT q.qid, c.vec_id, c.label,
      |         round(CASE WHEN sqrt(list_dot_product(q.qvec, q.qvec)) * sqrt(list_dot_product(c.vec, c.vec)) = 0
      |               THEN 0.0
      |               ELSE list_dot_product(q.qvec, c.vec)
      |                    / (sqrt(list_dot_product(q.qvec, q.qvec)) * sqrt(list_dot_product(c.vec, c.vec))) END, 6) AS score
      |  FROM q JOIN c ON c.label = q.qlabel AND c.vec_id <> q.qid
      |)
      |SELECT qid, vec_id, CAST(label AS BIGINT) AS label, score
      |FROM (SELECT qid, vec_id, label, score,
      |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
      |      FROM s)
      |WHERE rank <= 1
      |ORDER BY qid""".stripMargin
}
