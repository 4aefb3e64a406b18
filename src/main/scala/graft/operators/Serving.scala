package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** q152_serving_pipeline — the RETRIEVAL-SERVING composition (VERDICT r13
  * item 6): q92 declared the curation pipeline a user ships; this is the
  * other end-to-end composition — the serving flow the reference's user
  * actually runs against their collection (reference: vector_db.py:20-24
  * builds the persisted index once; vector_db_query.py:78-86 then queries
  * it many times). One declared row chains the existing cores:
  *
  *   1. ARTIFACT BUILD (once per corpus snapshot):
  *      [[Hybrid.buildHybridArtifacts]] — the per-(doc, token) tf table
  *      and the doc-embedding table (corpus text read exactly here, the
  *      q41 encoder run exactly once) — plus [[IvfIndex.buildSignBit]]
  *      over those embeddings: the persisted, orthant-partitioned vector
  *      store (the unlabeled nlist ∝ n layout, q62's quantizer).
  *   2. HYBRID RANK (every query): q95 BM25 from the tf artifact + q96's
  *      vector half reading the INDEX's points layout — fused by RRF
  *      ([[Hybrid.fuseWith]], the declared q96 semantics).
  *   3. DIVERSIFY (every query): q105's greedy MMR unroll
  *      ([[Ranking.mmrSelectFrom]]) over each query's fused top-10, with
  *      rel = the fused rrf score and pairwise sims from the served doc
  *      embeddings — the de-redundancy step between retrieval and display.
  *
  * The oracle composes q96's fusion CTEs ([[Hybrid.q96FusionCtes]]) with
  * q105's step CTEs ([[Ranking.mmrStepCtes]]) — the q63 one-generator
  * discipline: the composed oracle can only differ from the parts by the
  * candidate/sims bridge, so a hash match proves artifact build, both
  * ranking halves, fusion, and the greedy unroll agree end-to-end.
  *
  * 100 TB: corpus text is read once (artifact build) and NEVER appears in
  * the serving plan (plan-pinned in PlanShapeSpec, the
  * hybridRrfAgainstArtifacts discipline); the vector store is the
  * partitioned index layout read scan-only (freshly built ⇒
  * version-unique, no LWW window — a live index compacts to restore
  * that); everything past the two bounded-heap half-rankings is
  * query-scale driver-localized relations (the q105 shape). The index's
  * partition-PRUNED probe path is the separately declared q38/q53/q62
  * surface; the serving rerank here scores the shortlist exactly.
  */
object Serving {

  /** Fused candidates carried into the MMR stage, per query. */
  val ServeTopK = Hybrid.HybridTopK

  def servingPipeline(spark: SparkSession, sfDir: String): DataFrame =
    servingPipelineOf(spark, Tables.documents(spark, sfDir))

  /** Stage 1 — artifact build, the ONLY corpus-text pass: tf + doc
    * embeddings ([[Hybrid.buildHybridArtifacts]]) and the sign-bit IVF
    * layout over those embeddings. Returns the artifacts dir.
    */
  def buildServingArtifacts(spark: SparkSession, docs: DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_q152_serving").toString
    Hybrid.buildHybridArtifacts(docs, dir)
    val embs = spark.read.parquet(s"$dir/doc_embs.parquet")
      .select(col("doc_id").as("vec_id"), col("embedding"))
    IvfIndex.buildSignBit(spark, embs, s"$dir/index")
    dir
  }

  /** The serving vector store: the index's partitioned points layout,
    * scan-only. A freshly-built layout is version-unique by construction,
    * so the read needs no last-writer-wins window (a live index restores
    * that property with IvfIndex.compact/maintain).
    */
  private def servedVecs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(IvfIndex.pointsPath(s"$dir/index"))
      .select(col("vec_id"), col("embedding"))

  /** Stage 2 — the served hybrid ranking, LAZY (plan-pinned in
    * PlanShapeSpec: tf artifact + index points in the plan, corpus text
    * never).
    */
  def servedFused(spark: SparkSession, dir: String): DataFrame = {
    val tf = spark.read.parquet(s"$dir/tf.parquet")
    val qtab = Hybrid.localized(TextAnalysis.bm25QueryTableFromTf(tf))
    Hybrid.fuseWith(qtab, TextAnalysis.bm25RankFromTf(tf, qtab), servedVecs(spark, dir))
  }

  /** Composable core for ANY (doc_id, text, …) corpus. */
  def servingPipelineOf(spark: SparkSession, docs: DataFrame): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    serve(spark, buildServingArtifacts(spark, docs))
  }

  /** Stages 2+3 against EXISTING artifacts — the query-many half of the
    * build-once contract (Bench's q152_build/q152_serve split keys time
    * the halves separately; the declared row runs both).
    */
  def serve(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    val fused = servedFused(spark, dir)
    val dvecs = servedVecs(spark, dir)

    // ---- 3. MMR over the fused list: query-scale local relations ----
    val cand = Hybrid.localized(
      fused.select(col("qid"), col("doc_id"), col("rrf").as("rel")))
    // cached operator-scoped like q105's shortlist (round 17): the a/b
    // branches of the pair-sims self-join would otherwise each re-read
    // the index points layout; the cache is shortlist-scale and released
    // after localized(simPairs) materializes
    val shortVecs = dvecs
      .join(broadcast(cand.select(col("qid"), col("doc_id").as("vec_id"))), Seq("vec_id"))
      .select(col("qid"), col("vec_id").as("doc_id"), col("embedding"))
      .cache()
    try {
      val a = shortVecs.select(col("qid"), col("doc_id").as("a_id"), col("embedding").as("va"))
      val b = shortVecs.select(col("qid"), col("doc_id").as("b_id"), col("embedding").as("vb"))
      val simPairs = a.join(b, Seq("qid"))
        .filter(col("a_id") =!= col("b_id"))
        .select(col("qid"), col("a_id"), col("b_id"),
          round(GraftFunctions.cosine(col("va"), col("vb")), 6).as("sim"))
      Ranking.mmrSelectFrom(cand, Hybrid.localized(simPairs))
    } finally shortVecs.unpersist()
  }

  /** q96's fusion CTEs + the candidate/sims bridge + q105's unrolled
    * greedy steps. `cand` re-derives the fused top-[[ServeTopK]] with the
    * same (rrf DESC, doc_id) window [[Hybrid.fuseWith]] ranks by; rel is
    * the 6-dp rrf, so the 7-dp mmr rounding recovers λ·rel − (1−λ)·ms
    * exactly in both engines (the q105 argument verbatim).
    */
  val q152OracleSql: String = {
    val steps = (2 to Ranking.MmrSelect).map(Ranking.mmrStepCtes).mkString
    val unionAll = (1 to Ranking.MmrSelect).map(i => s"SELECT * FROM s$i").mkString(" UNION ALL ")
    s"""${Hybrid.q96FusionCtes}, cand AS MATERIALIZED (
      |  SELECT qid, doc_id, rrf AS rel FROM (
      |    SELECT qid, doc_id, rrf,
      |           row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id) AS rnk
      |    FROM fused)
      |  WHERE rnk <= $ServeTopK
      |), sims AS MATERIALIZED (
      |  SELECT x.qid, x.doc_id AS a_id, y.doc_id AS b_id,
      |         round(CASE WHEN sqrt(list_dot_product(dx.vec, dx.vec)) * sqrt(list_dot_product(dy.vec, dy.vec)) = 0
      |               THEN 0.0
      |               ELSE list_dot_product(dx.vec, dy.vec)
      |                    / (sqrt(list_dot_product(dx.vec, dx.vec)) * sqrt(list_dot_product(dy.vec, dy.vec))) END, 6) AS sim
      |  FROM cand x JOIN cand y ON x.qid = y.qid AND x.doc_id <> y.doc_id
      |  JOIN dvec dx ON dx.doc_id = x.doc_id JOIN dvec dy ON dy.doc_id = y.doc_id
      |), s1 AS (
      |  SELECT qid, 1 AS step, doc_id, mmr FROM (
      |    SELECT qid, doc_id, round(${Ranking.MmrLambda} * rel, 7) AS mmr,
      |           row_number() OVER (PARTITION BY qid ORDER BY round(${Ranking.MmrLambda} * rel, 7) DESC, doc_id) AS rn
      |    FROM cand)
      |  WHERE rn = 1
      |), sel1 AS (
      |  SELECT qid, doc_id FROM s1
      |)$steps
      |SELECT qid, CAST(step AS BIGINT) AS step, doc_id, mmr
      |FROM ($unionAll) ORDER BY qid, step""".stripMargin
  }
}
