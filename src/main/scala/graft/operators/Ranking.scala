package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** Retrieval-quality evaluation and result diversification — the two
  * serving-tier operations that close the loop AROUND the engine's
  * rankers (q95 BM25 / q96 hybrid / the q01 vector family): measure the
  * ranking (q104 nDCG, the standard IR quality metric) and post-process
  * it (q105 MMR, the standard diversity re-ranker). Together with q64
  * (ANN recall audit) and q103 (cluster purity) they complete the
  * evaluation row of SURVEY §2's operator families: every retrieval
  * surface the engine serves now has a declared, oracle-checked
  * quality-measurement query next to it.
  */
object Ranking {

  /** Ranks scored by q104's nDCG cut. */
  val NdcgK = 10

  /** q105: shortlist size fed to MMR, and how many it selects. */
  val MmrShortlist = 20
  val MmrSelect = 5

  /** MMR trade-off: relevance weight λ and diversity weight (1 − λ),
    * BOTH pinned as literals — `1 - 0.7` computed in doubles is
    * 0.30000000000000004, so the complement must be written out, not
    * derived, for the two engines to multiply identical constants.
    */
  val MmrLambda = 0.7
  val MmrDiv = 0.3

  /** q104_ndcg_eval — nDCG@[[NdcgK]] of the q95 BM25 ranking (Järvelin &
    * Kekäläinen, TOIS'02): graded relevance is derived deterministically
    * from the corpus itself — rel(q, d) = how many of the query's 3
    * terms appear in d (0–3, exact integers in both engines) — so the
    * metric needs no external judgment file and survives fixture
    * regeneration. gain = 2^rel − 1, discount = log2(rank + 1); IDCG
    * ranks ALL term-bearing docs by (rel desc, doc_id) through the
    * bounded-heap [[TopK]]; ndcg = round(dcg/idcg, 6) computed from the
    * two already-rounded sums so both engines divide identical numbers.
    *
    * 100 TB: the ranking is q95's audited plan; the rel table is one
    * broadcast-cut aggregate of the SAME (doc, token) tf stream (≤ 12 ×
    * docs rows in, ≤ queries × docs out, map-side combined); the DCG
    * join broadcasts the ≤ q×k ranked list back against it; IDCG is the
    * bounded heap, never a corpus window. Output is queries-scale.
    */
  def ndcgEval(spark: SparkSession, sfDir: String): DataFrame =
    ndcgEvalOf(Tables.documents(spark, sfDir))

  /** Composable core for ANY (doc_id, text, …) corpus. */
  def ndcgEvalOf(docs: DataFrame): DataFrame = {
    val tf = TextAnalysis.tokenTfMaterialized(docs)
    val qtab = Hybrid.localized(TextAnalysis.bm25QueryTableFromTf(tf))
    val ranked = TextAnalysis.bm25RankFromTf(tf, qtab)
    // graded relevance: tf rows ARE the distinct (doc, token) pairs, so
    // the count after the 12-term broadcast cut is "query terms present"
    val rel = tf
      .join(broadcast(qtab.select(col("qid"), col("token"))), Seq("token"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(count(lit(1)).cast("double").as("rel"))
    def gainOverDiscount(rel: org.apache.spark.sql.Column, rank: org.apache.spark.sql.Column) =
      (pow(lit(2.0), rel) - 1) / log2(rank + 1)
    val dcg = ranked
      .join(rel, Seq("qid", "doc_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0.0)))
      .groupBy(col("qid"))
      .agg(round(sum(gainOverDiscount(col("rel"), col("rank"))), 6).as("dcg"))
    val tk = TopK.topKUdaf(NdcgK)
    val idcg = rel
      .groupBy(col("qid"))
      .agg(tk(col("doc_id"), col("rel")).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .toDF("qid", "pos", "s")
      .groupBy(col("qid"))
      .agg(round(sum(gainOverDiscount(col("s.score"), col("pos") + 1)), 6).as("idcg"))
    dcg.join(idcg, Seq("qid"))
      .select(col("qid"), col("dcg"), col("idcg"),
        round(when(col("idcg") === 0, 0.0).otherwise(col("dcg") / col("idcg")), 6).as("ndcg"))
      .orderBy(col("qid"))
  }

  val q104OracleSql: String =
    s"""WITH t AS (
      |  SELECT doc_id, unnest(regexp_extract_all(text, '(\\w+|[^\\w\\s]+)', 1)) AS token FROM documents
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
      |  SELECT CAST((rn - 1) // 3 AS BIGINT) AS qid, token, df FROM qt
      |), s AS (
      |  SELECT q.qid, tf.doc_id,
      |         ln((stats.n - q.df + 0.5) / (q.df + 0.5) + 1) *
      |         (tf.tf * (1.2 + 1)) /
      |         (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl)) AS s
      |  FROM tf JOIN q USING (token) JOIN dl USING (doc_id) CROSS JOIN stats
      |), agg AS (
      |  SELECT qid, doc_id, round(SUM(s), 6) AS score FROM s GROUP BY qid, doc_id
      |), r AS (
      |  SELECT qid, doc_id,
      |         row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rnk
      |  FROM agg
      |), rel AS (
      |  SELECT q.qid, tf.doc_id, CAST(COUNT(*) AS DOUBLE) AS rel
      |  FROM tf JOIN q USING (token) GROUP BY q.qid, tf.doc_id
      |), dcg AS (
      |  SELECT r.qid,
      |         round(SUM(((2 ^ COALESCE(rel.rel, 0)) - 1) / log2(r.rnk + 1)), 6) AS dcg
      |  FROM r LEFT JOIN rel ON rel.qid = r.qid AND rel.doc_id = r.doc_id
      |  WHERE r.rnk <= $NdcgK GROUP BY r.qid
      |), itop AS (
      |  SELECT qid, rel,
      |         row_number() OVER (PARTITION BY qid ORDER BY rel DESC, doc_id) AS rnk
      |  FROM rel
      |), idcg AS (
      |  SELECT qid, round(SUM(((2 ^ rel) - 1) / log2(rnk + 1)), 6) AS idcg
      |  FROM itop WHERE rnk <= $NdcgK GROUP BY qid
      |)
      |SELECT d.qid, d.dcg, i.idcg,
      |       round(CASE WHEN i.idcg = 0 THEN 0.0 ELSE d.dcg / i.idcg END, 6) AS ndcg
      |FROM dcg d JOIN idcg i USING (qid) ORDER BY d.qid""".stripMargin

  /** q105_mmr_diversify — Maximal Marginal Relevance re-ranking
    * (Carbonell & Goldstein, SIGIR'98): from each query's exact-cosine
    * top-[[MmrShortlist]] shortlist (q96's vector half: the q41 encoder
    * over docs AND query text), greedily select [[MmrSelect]] results,
    * each step maximizing `λ·rel − (1−λ)·max-sim-to-already-selected`
    * (λ = [[MmrLambda]]), mmr rounded BEFORE the argmax, ties to the
    * smaller doc_id. Step 1 carries `round(λ·rel, 7)` (no diversity term
    * yet). The mmr rounds to 7 dp, not the house 6: rel and sim are
    * 6-dp decimals, so λ·rel − (1−λ)·ms is an EXACT ≤7-decimal value —
    * at 6 dp roughly one in ten of those lands exactly on a half-way
    * point, where Spark's BigDecimal HALF_UP on the binary double and
    * DuckDB's decimal rounding disagree (measured: 0.5637625 → 0.563762
    * vs 0.563763); at 7 dp the exact value is recovered bit-identically
    * in both engines and no half-way case exists. The de-redundancy step
    * a serving tier runs between retrieval and display — SemDeDup's
    * objective applied at query time.
    *
    * 100 TB: retrieval is the audited broadcast + bounded-heap shape;
    * everything after it operates on DRIVER-LOCALIZED query-scale
    * relations (≤ q × [[MmrShortlist]] candidates and their ≤ q × s²
    * pairwise sims — the [[Hybrid.localized]] 12-row-workload
    * discipline), so the [[MmrSelect]]−1 unrolled greedy steps are
    * local-relation joins that never touch the corpus: the plan reads
    * the corpus exactly twice (doc encode, shortlist-member encode
    * lookup), independent of the iteration count.
    */
  def mmrDiversify(spark: SparkSession, sfDir: String): DataFrame =
    mmrDiversifyOf(Tables.documents(spark, sfDir))

  /** Composable core for ANY (doc_id, text, …) corpus. */
  def mmrDiversifyOf(docs: DataFrame): DataFrame = {
    GraftFunctions.ensureRegistered(docs.sparkSession)
    val qtab = Hybrid.localized(TextAnalysis.bm25QueryTableOf(docs))
    val dvecs = Embed.embedColumn[String](
      docs.select(col("doc_id"), col("text")), "text", "emb",
      Embed.md5CountEncoder(Hybrid.HybridDim))
      .select(col("doc_id").as("vec_id"), col("emb").as("embedding"))
    val short = Knn.topK(Hybrid.queryVecsOf(qtab), dvecs, MmrShortlist)
      .select(col("qid"), col("vec_id").as("doc_id"), col("score").as("rel"))
    // localize the shortlist FIRST so the retrieval pass runs exactly
    // once: the pair-sims derivation below probes the already-collected
    // id list instead of re-executing the top-k plan underneath it (the
    // q92 multiply-consumed-stage discipline)
    val cand = Hybrid.localized(short)
    // shortlist-member embeddings: broadcast the q×s id list against the
    // encoder scan — corpus never shuffles, output is shortlist-scale.
    // CACHED operator-scoped (round 17, guide §2.4): the a/b sides of the
    // pair-sims self-join below are two plan branches over this subtree,
    // and without the cache each branch re-ran the ENCODER SCAN — a third
    // full corpus encode per call. The cache is shortlist-scale (q×s
    // rows), materialized while localized(simPairs) executes, released in
    // the finally; the corpus is now encoded exactly twice (ranking pass
    // + this lookup pass), the documented floor.
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
      // query-scale from here on: run the greedy unroll over local relations
      mmrSelectFrom(cand, Hybrid.localized(simPairs))
    } finally shortVecs.unpersist()
  }

  /** Below this many candidate/sim rows the greedy unroll folds
    * DRIVER-LOCALLY (round 18, guide §1.2 — the q110 cutover pattern):
    * both inputs arrive as already-collected local relations
    * ([[Hybrid.localized]], query-scale by contract), yet the unrolled
    * distributed loop still paid ~12 Spark jobs of scheduling overhead
    * per call (one localized-collect per selected step plus the
    * aggregates under it). The fold is BIT-identical, not just
    * tolerance-identical: the only arithmetic is λ·rel − (1−λ)·max(sim)
    * over already-6dp-rounded doubles with the same HALF_UP 7-dp round
    * (no reduction-order sums exist — max is order-free), and the argmax
    * tie rule (mmr desc, doc_id asc) is reproduced verbatim. Beyond the
    * bound — or for non-(long,long,double)-shaped frames — the unrolled
    * distributed loop runs unchanged (the 100 TB path); a parity spec
    * pins local == distributed on random inputs.
    */
  private[graft] val MmrLocalBound = 100000L

  /** The greedy selection core over a (qid, doc_id, rel) candidate frame
    * and a (qid, a_id, b_id, sim) pairwise-similarity frame (both
    * directions of each pair present). Query-scale by contract.
    */
  private[graft] def mmrSelectFrom(cand: DataFrame, sims: DataFrame,
                                   localBound: Long = MmrLocalBound): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    def shapes(df: DataFrame, want: Seq[org.apache.spark.sql.types.DataType]): Boolean =
      df.schema.fields.length == want.length &&
        df.schema.fields.map(_.dataType).sameElements(want)
    val localEligible =
      shapes(cand.select(col("qid"), col("doc_id"), col("rel")),
        Seq(LongType, LongType, DoubleType)) &&
      shapes(sims.select(col("qid"), col("a_id"), col("b_id"), col("sim")),
        Seq(LongType, LongType, LongType, DoubleType)) &&
      cand.count() <= localBound && sims.count() <= localBound
    if (localEligible) return mmrSelectLocal(cand, sims)
    mmrSelectDistributed(cand, sims)
  }

  /** Driver-local greedy fold — see [[MmrLocalBound]]. Same rounding
    * helper discipline as the q110 pagerank cutover: BigDecimal HALF_UP,
    * the identical function Spark's `round` applies to doubles.
    */
  private def mmrSelectLocal(cand: DataFrame, sims: DataFrame): DataFrame = {
    def rnd7(v: Double): Double =
      BigDecimal(v).setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble
    val candRows = cand.select(col("qid"), col("doc_id"), col("rel")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val simMap = sims.select(col("qid"), col("a_id"), col("b_id"), col("sim")).collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getDouble(3))).toMap
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    candRows.map(_._1).distinct.sorted.foreach { q =>
      val qc = candRows.filter(_._1 == q)
      val sel = scala.collection.mutable.ArrayBuffer.empty[Long]
      for (step <- 1 to MmrSelect) {
        // argmax by (mmr desc, doc_id asc) — the struct-min rule verbatim
        var best: Option[(Long, Double)] = None
        qc.foreach { case (_, d, rel) =>
          if (!sel.contains(d)) {
            val mmr =
              if (step == 1) Some(rnd7(MmrLambda * rel))
              else {
                // inner-join semantics: a candidate with NO sim edge to any
                // selected doc is excluded this step, like the distributed arm
                val ms = sel.flatMap(b => simMap.get((q, d, b)))
                if (ms.isEmpty) None else Some(rnd7(MmrLambda * rel - MmrDiv * ms.max))
              }
            mmr.foreach { m =>
              if (best.isEmpty || m > best.get._2 || (m == best.get._2 && d < best.get._1))
                best = Some((d, m))
            }
          }
        }
        best.foreach { case (d, m) => out += ((q, step.toLong, d, m)); sel += d }
      }
    }
    val spark2 = cand.sparkSession
    import spark2.implicits._
    out.toSeq.toDF("qid", "step", "doc_id", "mmr")
      .orderBy(col("qid"), col("step"))
  }

  /** The unrolled distributed greedy loop — the fallback beyond
    * [[MmrLocalBound]] and the 100 TB path.
    */
  private def mmrSelectDistributed(cand: DataFrame, sims: DataFrame): DataFrame = {
    def argmax(scored: DataFrame, step: Int): DataFrame = scored
      .withColumn("k", struct((-col("mmr")).as("neg"), col("doc_id"), col("mmr")))
      .groupBy(col("qid"))
      .agg(min(col("k")).as("k"))
      .select(col("qid"), lit(step.toLong).as("step"),
        col("k.doc_id").as("doc_id"), col("k.mmr").as("mmr"))

    // each step's pick re-localizes (a ≤ queries-row collect): `selected`
    // feeds THREE places in the next step (max-sim probe, anti-join,
    // union), so leaving it symbolic would triple the plan tree per step
    // (~3^k tiny aggregates by the last one); flat local relations keep
    // every step a constant-size plan
    var selected = Hybrid.localized(argmax(
      cand.withColumn("mmr", round(lit(MmrLambda) * col("rel"), 7)), 1))
    for (step <- 2 to MmrSelect) {
      val selIds = selected.select(col("qid"), col("doc_id"))
      val maxSim = sims
        .join(selIds.withColumnRenamed("doc_id", "b_id"), Seq("qid", "b_id"))
        .groupBy(col("qid"), col("a_id"))
        .agg(max(col("sim")).as("ms"))
      val scored = cand
        .join(selIds, Seq("qid", "doc_id"), "left_anti")
        .join(maxSim.withColumnRenamed("a_id", "doc_id"), Seq("qid", "doc_id"))
        .withColumn("mmr",
          round(lit(MmrLambda) * col("rel") - lit(MmrDiv) * col("ms"), 7))
      selected = Hybrid.localized(selected.unionByName(argmax(scored, step)))
    }
    selected.orderBy(col("qid"), col("step"))
  }

  /** q96's encoder/shortlist CTEs at k=[[MmrShortlist]] + the greedy
    * steps unrolled ([[mmrStepCtes]]).
    */
  /** The trigram/vector/candidate CTEs are `AS MATERIALIZED` (round 13):
    * each MMR step references `sims`/`cand`, and those reference `dvec`
    * — left to inlining, DuckDB re-evaluates the corpus-wide trigram
    * pipeline per reference, which is what pushed this oracle past 900 s
    * at sf1. A pure evaluation hint; semantics unchanged.
    */
  val q105OracleSql: String = {
    val steps = (2 to MmrSelect).map(mmrStepCtes).mkString
    val unionAll = (1 to MmrSelect).map(i => s"SELECT * FROM s$i").mkString(" UNION ALL ")
    s"""WITH t AS (
      |  SELECT doc_id, unnest(regexp_extract_all(text, '(\\w+|[^\\w\\s]+)', 1)) AS token FROM documents
      |), tf AS (
      |  SELECT doc_id, token, COUNT(*) AS tf FROM t GROUP BY doc_id, token
      |), df AS (
      |  SELECT token, COUNT(*) AS df FROM tf GROUP BY token
      |), qt AS (
      |  SELECT token, df, row_number() OVER (ORDER BY df DESC, token) AS rn
      |  FROM df WHERE regexp_full_match(token, '[A-Za-z]{3,}')
      |  ORDER BY df DESC, token LIMIT 12
      |), q AS (
      |  SELECT CAST((rn - 1) // 3 AS BIGINT) AS qid, rn, token, df FROM qt
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
      |), qvec AS MATERIALIZED (
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
      |), cand AS MATERIALIZED (
      |  SELECT qid, doc_id, score AS rel FROM (
      |    SELECT qid, doc_id, score,
      |           row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rnk
      |    FROM cos)
      |  WHERE rnk <= $MmrShortlist
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
      |    SELECT qid, doc_id, round($MmrLambda * rel, 7) AS mmr,
      |           row_number() OVER (PARTITION BY qid ORDER BY round($MmrLambda * rel, 7) DESC, doc_id) AS rn
      |    FROM cand)
      |  WHERE rn = 1
      |), sel1 AS (
      |  SELECT qid, doc_id FROM s1
      |)$steps
      |SELECT qid, CAST(step AS BIGINT) AS step, doc_id, mmr
      |FROM ($unionAll) ORDER BY qid, step""".stripMargin
  }

  /** One unrolled greedy step k: max-sim to the k−1 already-selected,
    * anti-join them out, argmax of the rounded mmr. Parameterized only
    * by CTE names (`cand`, `sims`, `sel*`), so q105's oracle and the
    * q152 serving-composition oracle share the identical step text.
    */
  private[graft] def mmrStepCtes(k: Int): String =
    s""", m$k AS (
      |  SELECT s.qid, s.a_id AS doc_id, MAX(s.sim) AS ms
      |  FROM sims s JOIN sel${k - 1} p ON p.qid = s.qid AND p.doc_id = s.b_id
      |  GROUP BY s.qid, s.a_id
      |), r$k AS (
      |  SELECT c.qid, c.doc_id, round($MmrLambda * c.rel - $MmrDiv * m$k.ms, 7) AS mmr
      |  FROM cand c JOIN m$k ON m$k.qid = c.qid AND m$k.doc_id = c.doc_id
      |  WHERE NOT EXISTS (SELECT 1 FROM sel${k - 1} p WHERE p.qid = c.qid AND p.doc_id = c.doc_id)
      |), s$k AS (
      |  SELECT qid, $k AS step, doc_id, mmr FROM (
      |    SELECT qid, doc_id, mmr,
      |           row_number() OVER (PARTITION BY qid ORDER BY mmr DESC, doc_id) AS rn
      |    FROM r$k)
      |  WHERE rn = 1
      |), sel$k AS (
      |  SELECT qid, doc_id FROM sel${k - 1} UNION ALL SELECT qid, doc_id FROM s$k
      |)""".stripMargin
}
