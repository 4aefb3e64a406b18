package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** Exact k-NN similarity search over the `embeddings` point collection.
  *
  * Re-expresses the reference's server-side Qdrant search
  * (reference: vector_db_query.py:78-86 `client.search(..., limit=5)`,
  * text_img.py:74-78 `limit=1`) as a Spark plan shaped for a huge corpus and
  * a small query set:
  *
  *  - **broadcast nested-loop join**: queries are broadcast, the corpus
  *    streams partition-parallel — corpus rows never shuffle;
  *  - **native codegen'd cosine** ([[graft.functions.CosineSimilarity]]) —
  *    one fused loop per pair instead of the three-pass zip_with/aggregate
  *    expression form;
  *  - **per-group top-k via a bounded-heap Aggregator** ([[TopK]]) — partial
  *    top-k per partition, merged per query. The naive
  *    `row_number over (partition by qid)` window would shuffle all N×q
  *    scored rows into q partitions; this shuffles ≤ q × partitions × k.
  */
object Knn {

  /** Generic top-k: for each row of `queries` (qid, qvec) score against
    * `corpus` (vec_id, embedding) and keep the k nearest by cosine,
    * ties broken by ascending vec_id on the 6-dp-rounded score.
    */
  def topK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    GraftFunctions.ensureRegistered(queries.sparkSession)
    val scored = corpus
      .crossJoin(broadcast(queries))
      .select(
        col("qid"),
        col("vec_id").as("id"),
        round(GraftFunctions.cosine(col("qvec"), col("embedding")), 6).as("score"))
    val tk = TopK.topKUdaf(k)
    scored
      .groupBy(col("qid"))
      .agg(tk(col("id"), col("score")).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .toDF("qid", "pos", "s")
      .select(
        col("qid"),
        col("s.id").as("vec_id"),
        col("s.score").as("score"),
        (col("pos") + 1).cast("long").as("rank"))
      .orderBy(col("qid"), col("rank"))
  }

  /** q01_knn_topk_cosine — top-5 neighbors for each of the first 10 vectors
    * used as queries (reference: vector_db_query.py:78-86).
    */
  def knnTopkCosine(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.select(col("vec_id"), col("embedding"))
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
    * (reference: text_img.py:74-78 limit=1; payload filtering over stored
    * fields, vector_db.py:89). Self-match excluded. Implemented with
    * `max_by` over a (score, -id) ordering struct: a declarative aggregate
    * with map-side partial aggregation — no window shuffle at all.
    */
  def knnTop1Filtered(spark: SparkSession, sfDir: String): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"), col("label").as("qlabel"))
    val corpus = emb.select(col("vec_id"), col("embedding"), col("label"))
    corpus
      .join(broadcast(queries), col("label") === col("qlabel") && col("vec_id") =!= col("qid"))
      .select(
        col("qid"), col("vec_id"), col("label"),
        round(GraftFunctions.cosine(col("qvec"), col("embedding")), 6).as("score"))
      .groupBy(col("qid"))
      .agg(max_by(
        struct(col("vec_id"), col("label"), col("score")),
        struct(col("score"), (col("vec_id") * -1).as("negid"))).as("h"))
      .select(
        col("qid"),
        col("h.vec_id").as("vec_id"),
        col("h.label").cast("long").as("label"),
        col("h.score").as("score"))
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
