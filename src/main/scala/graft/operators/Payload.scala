package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.Tables
import graft.functions.VectorFunctions._

/** Payload handling patterns from the reference: base64 round-trip of stored
  * blobs (reference: vector_db.py:67-72 encode, vector_db_query.py:87-88
  * decode) and enriching k-NN hits with their stored payload fields
  * (reference: vector_db_query.py:85-89 — Qdrant returns `payload` inline;
  * relationally that is a join of hit ids against the payload table).
  */
object Payload {

  /** q09_base64_payload — encode a text prefix to base64 and decode it back,
    * emitting both sides of the round-trip.
    */
  def base64Payload(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("b64", base64(substring(col("text"), 1, 32).cast("binary")))
      .select(
        col("doc_id"),
        col("b64"),
        unbase64(col("b64")).cast("string").as("decoded"))
      .orderBy(col("doc_id"))

  val q09OracleSql: String =
    """WITH enc AS (
      |  SELECT doc_id, to_base64(encode(substring(text, 1, 32))) AS b64 FROM documents
      |)
      |SELECT doc_id, b64, decode(from_base64(b64)) AS decoded
      |FROM enc ORDER BY doc_id""".stripMargin

  /** q12_payload_enrich_join — the q01 k-NN hits joined back to the
    * `documents` payload table by id (vec_id = doc_id; both are dense
    * 0-based id spaces, FIXTURES.md). The hit set is tiny (queries × k), so
    * it is broadcast against the payload table — at 100 TB the payload scan
    * is pruned to the projected columns and the join never shuffles the big
    * side.
    */
  def payloadEnrichJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val hits = Knn.knnTopkCosine(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"), substring(col("text"), 1, 40).as("snippet"))
    broadcast(hits)
      .join(docs, hits("vec_id") === docs("doc_id"))
      .select(col("qid"), col("vec_id"), col("score"), col("rank"), col("lang"), col("source"), col("snippet"))
      .orderBy(col("qid"), col("rank"))
  }

  /** q29_json_payload_stats — schemaless JSON payload handling (the
    * reference stores payloads as JSON dicts on the wire,
    * vector_db.py:89): parse `events.props` with an explicit schema via
    * `from_json`, then aggregate the extracted field per event type.
    * The parse is a scalar expression inside the scan stage — no extra
    * pass; at scale, prefer materializing hot JSON fields to columns
    * exactly like this query's select does.
    */
  def jsonPayloadStats(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = StructType(Seq(StructField("k", LongType)))
    Tables.events(spark, sfDir)
      .select(col("event_type"), from_json(col("props"), schema).getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(avg(col("k")), 6).as("avg_k"),
        max(col("k")).as("max_k"),
        sum(when(col("k") >= 50, 1L).otherwise(0L)).as("n_high"))
      .orderBy(col("event_type"))
  }

  val q29OracleSql: String =
    """WITH e AS (
      |  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events
      |)
      |SELECT event_type,
      |       COUNT(*) AS n_events,
      |       round(avg(k), 6) AS avg_k,
      |       max(k) AS max_k,
      |       CAST(sum(CASE WHEN k >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
      |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin

  val q12OracleSql: String =
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
      |), hits AS (
      |  SELECT qid, vec_id, score, rank
      |  FROM (SELECT qid, vec_id, score,
      |               row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
      |        FROM s)
      |  WHERE rank <= 5
      |)
      |SELECT h.qid, h.vec_id, h.score, h.rank, d.lang, d.source, substring(d.text, 1, 40) AS snippet
      |FROM hits h JOIN documents d ON h.vec_id = d.doc_id
      |ORDER BY h.qid, h.rank""".stripMargin
}
