package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** q96_hybrid_rrf — HYBRID RETRIEVAL with Reciprocal Rank Fusion: the
  * fusion layer that joins the engine's lexical half (q95 BM25,
  * [[TextAnalysis.bm25RankOf]]) with its vector half (q01-family cosine
  * top-k, [[Knn.topK]]) into one ranked answer — the complete hybrid
  * search a user of the reference's vector-only `client.search`
  * (reference: vector_db_query.py:78-86) upgrades to when lexical
  * precision matters. RRF (Cormack et al., SIGIR'09) is the standard
  * score-free fusion: `rrf(d) = Σ_lists 1/(k0 + rank_list(d))` with
  * k0 = [[RrfK0]] = 60, immune to the two scorers' incomparable scales.
  *
  * Both halves run over the SAME corpus (`documents`) and the SAME
  * deterministic query workload ([[TextAnalysis.bm25QueryTableOf]]: 4
  * three-term queries from the 12 highest-df alphabetic terms). The
  * lexical list is q95's BM25 top-10; the vector list embeds each query's
  * term text AND every document through the oracle-checkable md5
  * char-trigram count encoder ([[Embed.md5CountEncoder]], dim 16 — q41's
  * pinned socket) and takes exact cosine top-10 via the broadcast-query
  * bounded-heap [[Knn.topK]]. Fusion: full-outer join of the two ≤ q×10
  * rank lists, `rrf` rounded 6 dp BEFORE ranking (rank on the rounded
  * value, ties to the smaller doc_id — the q95 discipline), top-10 per
  * query with both source ranks carried (null where one half missed).
  *
  * 100 TB shape: each half is independently scale-audited (q95: two hash
  * aggregates + broadcast query cut + bounded heap; vector: one encoder
  * scan + broadcast queries + bounded heap — corpus text/vectors never
  * shuffle). The fusion layer itself touches only the two rank lists —
  * queries × k rows each — so the full-outer join and the final
  * row_number window are QUERY-scale, never corpus-scale; at production
  * the per-half top lists are exactly what an index serving tier emits,
  * and this is the reduce step over them. The query workload is derived
  * once here and shared by both halves (one definition, no drift); the
  * serving-tier shape — encode once, query many — is
  * [[buildHybridArtifacts]] + [[hybridRrfAgainstArtifacts]], spec-pinned
  * row-identical to the inline path with no corpus text in its plan.
  */
object Hybrid {

  /** RRF smoothing constant (Cormack et al.'s k = 60). */
  val RrfK0 = 60

  /** Docs returned per query by each half and by the fused list. */
  val HybridTopK = 10

  /** Encoder dim for the vector half — pinned with q41's oracle bucket
    * arithmetic (`% 16`).
    */
  val HybridDim = 16

  def hybridRrf(spark: SparkSession, sfDir: String): DataFrame =
    hybridRrfOf(Tables.documents(spark, sfDir))

  /** Composable core of q96 for ANY (doc_id, text, …) corpus. */
  def hybridRrfOf(docs: DataFrame): DataFrame = {
    // ONE corpus tokenization feeds the workload derivation AND every
    // branch of the lexical ranker (the q92 multiply-consumed-stage
    // discipline, tightened round 17: exchange reuse does not dedup the
    // tf branches — see TextAnalysis.tokenTfMaterialized).
    val tf = TextAnalysis.tokenTfMaterialized(docs)
    val qtab = localized(TextAnalysis.bm25QueryTableFromTf(tf))
    val dvecs = Embed.embedColumn[String](
      docs.select(col("doc_id"), col("text")), "text", "emb",
      Embed.md5CountEncoder(HybridDim))
      .select(col("doc_id").as("vec_id"), col("emb").as("embedding"))
    fuseWith(qtab, TextAnalysis.bm25RankFromTf(tf, qtab), dvecs)
  }

  /** Build the SERVING-TIER artifacts for hybrid search (VERDICT r11
    * item 3 — encode once, query many): the per-(doc, token) tf table
    * (every lexical input — dl, stats, df, the query workload — derives
    * from it) and the doc-embedding table (the corpus through the q41
    * encoder exactly once). The q54/q80 persisted-artifact pattern: at
    * 100 TB these are maintained per corpus snapshot and every query
    * run probes them without touching corpus text.
    */
  def buildHybridArtifacts(docs: DataFrame, dir: String): Unit = {
    TextAnalysis.tokenTfOf(docs)
      .write.mode("overwrite").parquet(s"$dir/tf.parquet")
    Embed.embedColumn[String](
      docs.select(col("doc_id"), col("text")), "text", "embedding",
      Embed.md5CountEncoder(HybridDim))
      .select(col("doc_id"), col("embedding"))
      .write.mode("overwrite").parquet(s"$dir/doc_embs.parquet")
  }

  /** The artifact-backed q96: spec-pinned row-identical to
    * [[hybridRrfOf]] over the same corpus, with NO corpus text scan and
    * NO re-encode in the plan — the lexical half ranks from the persisted
    * tf table, the vector half reads persisted doc embeddings, and only
    * the 4 query strings go through the encoder at query time.
    */
  def hybridRrfAgainstArtifacts(spark: SparkSession, artifactsDir: String): DataFrame = {
    val tf = spark.read.parquet(s"$artifactsDir/tf.parquet")
    val dvecs = spark.read.parquet(s"$artifactsDir/doc_embs.parquet")
      .select(col("doc_id").as("vec_id"), col("embedding"))
    val qtab = localized(TextAnalysis.bm25QueryTableFromTf(tf))
    fuseWith(qtab, TextAnalysis.bm25RankFromTf(tf, qtab), dvecs)
  }

  /** The 12-row workload table materialized to the DRIVER once and
    * replanted as a local relation: both halves read in-memory rows and
    * there is no cache entry to leak (VERDICT r11 item 5 — the earlier
    * `.cache()` was never unpersisted).
    */
  private[graft] def localized(derived: DataFrame): DataFrame =
    derived.sparkSession.createDataFrame(
      java.util.Arrays.asList(derived.collect(): _*), derived.schema)

  /** The vector-half query embeddings shared by q96 and the shortlist
    * consumers (q105 MMR): each query's 3 terms in rn order joined by a
    * single space (a 12-row aggregate), pushed through the same
    * per-partition-init encoder socket as the docs — ONE definition of
    * "the query vector", so fusion and diversification can never drift.
    */
  private[graft] def queryVecsOf(qtab: DataFrame): DataFrame = {
    val qtext = qtab
      .groupBy(col("qid"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("rn"), col("token")))),
          s => s.getField("token")), " ").as("qtext"))
    Embed.embedColumn[String](
      qtext, "qtext", "qvec", Embed.md5CountEncoder(HybridDim))
      .select(col("qid"), col("qvec"))
  }

  /** Fusion core shared by the inline, artifact, and serving (q152)
    * paths: the vector half's query embedding + exact cosine top-10,
    * then the RRF full-outer fusion — all query-scale (≤ queries × 2k
    * rows) past the two half rankings.
    */
  private[graft] def fuseWith(qtab: DataFrame, lexRanked: DataFrame, dvecs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lex = lexRanked
      .select(col("qid"), col("doc_id"), col("rank").as("lex_rank"))
    val qvecs = queryVecsOf(qtab)
    val vec = Knn.topK(qvecs, dvecs, HybridTopK)
      .select(col("qid"), col("vec_id").as("doc_id"), col("rank").as("vec_rank"))
    // fusion: query-scale only (≤ queries × 2k rows) — the window here is
    // deliberate and safe, unlike a corpus-scale window
    val fused = lex.join(vec, Seq("qid", "doc_id"), "full_outer")
      .select(col("qid"), col("doc_id"), col("lex_rank"), col("vec_rank"),
        round(
          coalesce(lit(1.0) / (lit(RrfK0) + col("lex_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(RrfK0) + col("vec_rank")), lit(0.0)),
          6).as("rrf"))
    val w = Window.partitionBy(col("qid")).orderBy(col("rrf").desc, col("doc_id").asc)
    fused
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= HybridTopK)
      .select(col("qid"), col("rank"), col("doc_id"), col("rrf"),
        col("lex_rank"), col("vec_rank"))
      .orderBy(col("qid"), col("rank"))
  }

  /** q95's lexical CTEs + q41's encoder CTEs (dim 16) over docs AND query
    * strings + cosine top-10 + the RRF full-outer fusion, up to and
    * including the `fused` CTE — shared verbatim by q96's oracle and the
    * q152 serving-composition oracle (the q63 one-generator discipline:
    * a composed row's oracle can only differ from its parts by the tail
    * it adds). `dvec` is `AS MATERIALIZED` for q152's benefit (its sims
    * CTE re-references it; a pure evaluation hint, harmless to q96).
    */
  private[graft] val q96FusionCtes: String =
    """WITH t AS (
      |  SELECT doc_id, unnest(regexp_extract_all(text, '(\w+|[^\w\s]+)', 1)) AS token FROM documents
      |), tf AS (
      |  SELECT doc_id, token, COUNT(*) AS tf FROM t GROUP BY doc_id, token
      |), dl AS (
      |  SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id
      |), stats AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n, CAST(AVG(dl) AS DOUBLE) AS avgdl FROM dl
      |), df AS (
      |  SELECT token, COUNT(*) AS df FROM tf GROUP BY token
      |), qt AS (
      |  SELECT token, df, row_number() OVER (ORDER BY df DESC, token) AS rn
      |  FROM df WHERE regexp_full_match(token, '[A-Za-z]{3,}')
      |  ORDER BY df DESC, token LIMIT 12
      |), q AS (
      |  SELECT CAST((rn - 1) // 3 AS BIGINT) AS qid, rn, token, df FROM qt
      |), s AS (
      |  SELECT q.qid, tf.doc_id,
      |         ln((stats.n - q.df + 0.5) / (q.df + 0.5) + 1) *
      |         (tf.tf * (1.2 + 1)) /
      |         (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl)) AS s
      |  FROM tf JOIN q USING (token) JOIN dl USING (doc_id) CROSS JOIN stats
      |), agg AS (
      |  SELECT qid, doc_id, round(SUM(s), 6) AS score FROM s GROUP BY qid, doc_id
      |), lexr AS (
      |  SELECT qid, doc_id, rnk FROM (
      |    SELECT qid, doc_id,
      |           row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rnk
      |    FROM agg)
      |  WHERE rnk <= 10
      |), qtext AS (
      |  SELECT qid, string_agg(token, ' ' ORDER BY rn) AS qtext FROM q GROUP BY qid
      |), enc_ds AS (
      |  SELECT doc_id, ' ' || lower(text) || ' ' AS s FROM documents
      |), enc_dtri AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(s) - 1),
      |           i -> substring(s, CAST(i AS INT), 3))) AS t
      |  FROM enc_ds
      |), enc_db AS (
      |  SELECT doc_id, CAST(('0x' || substring(md5(t), 1, 8))::UBIGINT % 16 AS BIGINT) AS bucket
      |  FROM enc_dtri
      |), enc_dc AS (
      |  SELECT doc_id, bucket, COUNT(*) AS n FROM enc_db GROUP BY doc_id, bucket
      |), enc_dgrid AS (
      |  SELECT d.doc_id, r.range AS bucket
      |  FROM (SELECT doc_id FROM documents) d CROSS JOIN range(16) r
      |), dvec AS MATERIALIZED (
      |  SELECT g.doc_id, list(CAST(COALESCE(c.n, 0) AS DOUBLE) ORDER BY g.bucket) AS vec
      |  FROM enc_dgrid g LEFT JOIN enc_dc c ON c.doc_id = g.doc_id AND c.bucket = g.bucket
      |  GROUP BY g.doc_id
      |), enc_qs AS (
      |  SELECT qid, ' ' || lower(qtext) || ' ' AS s FROM qtext
      |), enc_qtri AS (
      |  SELECT qid, unnest(list_transform(range(1, len(s) - 1),
      |           i -> substring(s, CAST(i AS INT), 3))) AS t
      |  FROM enc_qs
      |), enc_qb AS (
      |  SELECT qid, CAST(('0x' || substring(md5(t), 1, 8))::UBIGINT % 16 AS BIGINT) AS bucket
      |  FROM enc_qtri
      |), enc_qc AS (
      |  SELECT qid, bucket, COUNT(*) AS n FROM enc_qb GROUP BY qid, bucket
      |), enc_qgrid AS (
      |  SELECT q.qid, r.range AS bucket
      |  FROM (SELECT DISTINCT qid FROM qtext) q CROSS JOIN range(16) r
      |), qvec AS (
      |  SELECT g.qid, list(CAST(COALESCE(c.n, 0) AS DOUBLE) ORDER BY g.bucket) AS vec
      |  FROM enc_qgrid g LEFT JOIN enc_qc c ON c.qid = g.qid AND c.bucket = g.bucket
      |  GROUP BY g.qid
      |), cos AS (
      |  SELECT q.qid, d.doc_id,
      |         round(CASE WHEN sqrt(list_dot_product(q.vec, q.vec)) * sqrt(list_dot_product(d.vec, d.vec)) = 0
      |               THEN 0.0
      |               ELSE list_dot_product(q.vec, d.vec)
      |                    / (sqrt(list_dot_product(q.vec, q.vec)) * sqrt(list_dot_product(d.vec, d.vec))) END, 6) AS score
      |  FROM qvec q CROSS JOIN dvec d
      |), vecr AS (
      |  SELECT qid, doc_id, rnk FROM (
      |    SELECT qid, doc_id,
      |           row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rnk
      |    FROM cos)
      |  WHERE rnk <= 10
      |), fused AS (
      |  SELECT COALESCE(l.qid, v.qid) AS qid,
      |         COALESCE(l.doc_id, v.doc_id) AS doc_id,
      |         l.rnk AS lex_rank, v.rnk AS vec_rank,
      |         round(COALESCE(CAST(1 AS DOUBLE) / (60 + l.rnk), 0) +
      |               COALESCE(CAST(1 AS DOUBLE) / (60 + v.rnk), 0), 6) AS rrf
      |  FROM lexr l FULL OUTER JOIN vecr v ON l.qid = v.qid AND l.doc_id = v.doc_id
      |)""".stripMargin

  val q96OracleSql: String =
    s"""$q96FusionCtes
      |SELECT qid, rank, doc_id, rrf, lex_rank, vec_rank
      |FROM (
      |  SELECT qid, doc_id, rrf,
      |         CAST(row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id) AS BIGINT) AS rank,
      |         CAST(lex_rank AS BIGINT) AS lex_rank, CAST(vec_rank AS BIGINT) AS vec_rank
      |  FROM fused)
      |WHERE rank <= 10 ORDER BY qid, rank""".stripMargin
}
