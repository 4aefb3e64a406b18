package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Embedding-UDF surface (SURVEY.md §2A P7–P9): the reference's only
  * extension points are its three model embedders — ResNet-50 over images
  * (reference: vector_db.py:55-63), CLIP over images
  * (reference: text_img.py:33-39), and CLIP over text
  * (reference: text_img.py:66-71). This operator is the Spark-shaped socket
  * a real encoder plugs into: `mapPartitions` over the rows with ONE
  * encoder initialization per partition (model load costs seconds — per-row
  * init would dominate the job), every row of the partition streamed
  * through the open encoder. It is the Scala analogue of an iterator-based
  * (`mapInPandas`-style) batch UDF, and the same pattern as
  * [[Multimodal.multimodalDecode]]'s per-partition decode.
  *
  * A real CLIP/ResNet drops in by supplying an `encoderFactory` whose
  * returned closure holds the loaded model; nothing about the plan changes.
  * The bundled [[Embed.hashingTextEncoder]] is a deterministic, model-free
  * stand-in (char-trigram feature hashing, L2-normalized) so the operator
  * is fully testable in this container.
  */
object Embed {

  /** Append `outputCol: array<float>` to `df` by running every value of
    * `inputCol` (String or Array[Byte] — anything the encoder accepts)
    * through an encoder that is constructed once per partition.
    *
    * @param encoderFactory called once per partition, on the executor; the
    *                       returned function embeds one value. Model
    *                       loading belongs in the factory body.
    */
  def embedColumn[T](
      df: DataFrame,
      inputCol: String,
      outputCol: String,
      encoderFactory: () => T => Array[Float]): DataFrame = {
    val outSchema = df.schema.add(outputCol, ArrayType(FloatType))
    val inIdx     = df.schema.fieldIndex(inputCol)
    df.mapPartitions { rows =>
      val embed = encoderFactory() // one init per partition / task
      rows.map(r => Row.fromSeq(r.toSeq :+ embed(r.getAs[T](inIdx)).toSeq))
    }(Encoders.row(outSchema))
  }

  /** Cross-engine-checkable count encoder: char-trigram counts hashed into
    * `dim` buckets by the first 4 bytes of each trigram's md5 — DuckDB
    * computes the identical buckets, so [[embedTextDeclared]] can run the
    * whole embedding socket under the oracle gate. The `MessageDigest`
    * is the "model" here: initialized ONCE per partition in the factory
    * body, reused for every row, exactly where a real encoder loads.
    */
  def md5CountEncoder(dim: Int): () => String => Array[Float] =
    () => {
      val md = java.security.MessageDigest.getInstance("MD5") // per-partition init
      text => {
        val v = new Array[Float](dim)
        val s = " " + text.toLowerCase + " "
        var i = 0
        while (i + 3 <= s.length) {
          val d = md.digest(s.substring(i, i + 3).getBytes("UTF-8"))
          val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          v((h % dim).toInt) += 1f
          i += 1
        }
        v
      }
    }

  /** q41_embed_text — the embedding-UDF surface as a declared,
    * oracle-checked query: every document run through [[embedColumn]] with
    * the [[md5CountEncoder]], emitting the integer feature vector
    * (driver-hashable space-joined string) and its L2 norm. A hash match
    * proves the whole mapPartitions encode path — partitioning, batch
    * iteration, per-partition init, schema — byte-for-byte against an
    * engine that never saw the Scala closure.
    */
  def embedTextDeclared(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val out  = embedColumn[String](docs, "text", "emb", md5CountEncoder(16))
    out.select(
      col("doc_id"),
      array_join(transform(col("emb"), x => x.cast("long")), " ").as("emb"),
      round(sqrt(aggregate(col("emb").cast("array<double>"), lit(0.0), (a, x) => a + x * x)), 6).as("norm"))
      .orderBy(col("doc_id"))
  }

  val q41OracleSql: String =
    """WITH s AS (
      |  SELECT doc_id, ' ' || lower(text) || ' ' AS s FROM documents
      |), tri AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(s) - 1),
      |           i -> substring(s, CAST(i AS INT), 3))) AS t
      |  FROM s
      |), b AS (
      |  SELECT doc_id, CAST(('0x' || substring(md5(t), 1, 8))::UBIGINT % 16 AS BIGINT) AS bucket
      |  FROM tri
      |), c AS (
      |  SELECT doc_id, bucket, COUNT(*) AS n FROM b GROUP BY doc_id, bucket
      |), grid AS (
      |  SELECT d.doc_id, r.range AS bucket
      |  FROM (SELECT DISTINCT doc_id FROM documents) d CROSS JOIN range(16) r
      |), vec AS (
      |  SELECT g.doc_id, g.bucket, COALESCE(c.n, 0) AS n
      |  FROM grid g LEFT JOIN c ON c.doc_id = g.doc_id AND c.bucket = g.bucket
      |)
      |SELECT doc_id,
      |       array_to_string(list(CAST(n AS BIGINT) ORDER BY bucket), ' ') AS emb,
      |       round(sqrt(list_aggregate(list_transform(list(CAST(n AS DOUBLE) ORDER BY bucket),
      |             x -> x * x), 'sum')), 6) AS norm
      |FROM vec GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q59_cross_modal_search — the reference's shared-embedding-space
    * convention as a declared, oracle-checked query: a TEXT-derived query
    * vector searches the (image-modality) embeddings corpus, exactly the
    * text→image semantic of text_img.py:64-85 (CLIP text tower encodes
    * the query, `client.search` over the image collection). The first 5
    * documents' text runs through the [[embedColumn]] socket with the
    * engine-neutral [[md5CountEncoder]] at the corpus' dim (the toy
    * stand-in for the text tower — a real CLIP drops into the same
    * factory), then exact cosine top-5 via [[Knn.topK]] (broadcast
    * queries; the corpus never shuffles). The oracle recomputes the
    * encoder AND the search in DuckDB — a hash match proves the
    * cross-modal path (encode socket → shared space → search) end-to-end.
    */
  def crossModalSearch(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // pinned to the fixtures' embedding dim BECAUSE the oracle's bucket
    // arithmetic (`% 64`, `range(64)`) is pinned — house style (q41's
    // md5CountEncoder(16) vs `% 16`); a dynamic read here would silently
    // adapt while the oracle didn't
    val dim = 64
    val docs = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 5).select(col("doc_id"), col("text"))
    val queries = embedColumn[String](docs, "text", "qvec", md5CountEncoder(dim))
      .select(col("doc_id").as("qid"), col("qvec"))
    val corpus = graft.Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    Knn.topK(queries, corpus, 5)
  }

  /** The shared text-encoder CTEs of q59 AND q63: documents 0..4 through
    * the md5 trigram count encoder at the corpus dim (64), producing
    * `q(qid, qvec DOUBLE[])` — ONE definition, so the exact search oracle
    * (q59) and the index-probe oracle (q63, composed into
    * [[IvfIndex.probeOracleSqlWith]]) can never drift on what "the text
    * tower" computes.
    */
  private val textQueryCtes: String =
    """enc_s AS (
      |  SELECT doc_id, ' ' || lower(text) || ' ' AS s FROM documents WHERE doc_id < 5
      |), enc_tri AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(s) - 1),
      |           i -> substring(s, CAST(i AS INT), 3))) AS t
      |  FROM enc_s
      |), enc_b AS (
      |  SELECT doc_id, CAST(('0x' || substring(md5(t), 1, 8))::UBIGINT % 64 AS BIGINT) AS bucket
      |  FROM enc_tri
      |), enc_cnt AS (
      |  SELECT doc_id, bucket, COUNT(*) AS n FROM enc_b GROUP BY doc_id, bucket
      |), enc_grid AS (
      |  SELECT d.doc_id, r.range AS bucket
      |  FROM (SELECT doc_id FROM documents WHERE doc_id < 5) d CROSS JOIN range(64) r
      |), q AS (
      |  SELECT g.doc_id AS qid,
      |         list(CAST(COALESCE(c.n, 0) AS DOUBLE) ORDER BY g.bucket) AS qvec
      |  FROM enc_grid g LEFT JOIN enc_cnt c ON c.doc_id = g.doc_id AND c.bucket = g.bucket
      |  GROUP BY g.doc_id
      |)""".stripMargin

  val q59OracleSql: String =
    s"""WITH $textQueryCtes, c AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
       |), sc AS (
       |  SELECT q.qid, c.vec_id, ${IvfIndex.cosSql("q.qvec", "c.vec")} AS score
       |  FROM q CROSS JOIN c
       |)
       |SELECT qid, vec_id, score, rank
       |FROM (SELECT qid, vec_id, score,
       |             row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
       |      FROM sc)
       |WHERE rank <= 5
       |ORDER BY qid, rank""".stripMargin

  /** q63_cross_modal_index — the reference's FULL text_img.py story
    * (encode → index → search) as one declared, oracle-checked query
    * (VERDICT r5 item 3): the image-modality corpus is built into the
    * persisted IVF index, text queries go through the [[embedColumn]]
    * tower into the shared space (q59's encoder), and the search is the
    * real partition-pruned [[IvfIndex.probe]] at nprobe = 1 — not the
    * exact scan q59 declares. The oracle composes q59's encoder CTEs with
    * q38's assignment/routing/probe CTEs
    * ([[IvfIndex.probeOracleSqlWith]]), so a hash match proves encoder,
    * index layout, routing, pruning, and ranking agree end-to-end.
    * Reference: text_img.py:64-85 (CLIP text tower → `client.search` on
    * the image collection), vector_db.py:20-24 (the persisted collection).
    */
  def crossModalIndexSearch(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val dim = 64 // pinned with the oracle's bucket arithmetic, as in q59
    val corpus = graft.Tables.embeddings(spark, sfDir)
    val indexDir = java.nio.file.Files.createTempDirectory("graft_xmodal_index").toString
    IvfIndex.build(spark, corpus, indexDir)
    val docs = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") < 5).select(col("doc_id"), col("text"))
    val queries = embedColumn[String](docs, "text", "qvec", md5CountEncoder(dim))
      .select(col("doc_id").as("qid"), col("qvec"))
    IvfIndex.probe(spark, indexDir, queries, k = 5, nprobe = 1)
  }

  /** q38's probe oracle with q59's text-encoder CTEs as the query batch. */
  val q63OracleSql: String =
    IvfIndex.probeOracleSqlWith(textQueryCtes, nprobe = 1, filtered = false, k = 5)

  /** Deterministic toy text encoder: char-trigram feature hashing into
    * `dim` buckets, L2-normalized. Stands in for CLIP's text tower
    * (reference: text_img.py:66-71) — same signature, no model weights.
    */
  def hashingTextEncoder(dim: Int): () => String => Array[Float] =
    () => { text =>
      val v = new Array[Float](dim)
      val s = " " + text.toLowerCase + " "
      var i = 0
      while (i + 3 <= s.length) {
        val h = scala.util.hashing.MurmurHash3.stringHash(s.substring(i, i + 3))
        v(math.floorMod(h, dim)) += 1f
        i += 1
      }
      var norm = 0.0
      var j    = 0
      while (j < dim) { norm += v(j).toDouble * v(j); j += 1 }
      val n = math.sqrt(norm)
      if (n > 0) { var k = 0; while (k < dim) { v(k) = (v(k) / n).toFloat; k += 1 } }
      v
    }
}
