package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** Neighbor-vote classification and contrastive-pair mining over the
  * embedding collection — the two training-data operations a user of the
  * reference's labeled vector store runs NEXT, after storing labels as
  * payload (reference: vector_db.py:89 `payload={"label": int(label), ...}`)
  * and searching by vector (vector_db_query.py:78-86, text_img.py:74-78):
  *
  *  - '''q97_knn_classify''' — k-NN label propagation (auto-labeling): a
  *    held-out slice is treated as unlabeled; each point takes the majority
  *    label of its k nearest labeled neighbors. This is the classification
  *    loop the reference's MNIST demo implies (search, read neighbor
  *    payload labels, vote) expressed as one declarative plan, with the
  *    true label carried alongside so the result doubles as an accuracy
  *    audit table.
  *  - '''q98_triplet_mining''' — (anchor, positive, hard-negative) triplet
  *    mining for metric learning: per anchor, the nearest SAME-label
  *    neighbor (positive) and the nearest DIFFERENT-label neighbor (the
  *    hardest negative), plus the margin between them — the sampling step
  *    of triplet-loss / contrastive training (Schroff et al., FaceNet,
  *    CVPR'15; hard-negative mining as in DPR, Karpukhin et al. 2020).
  *
  * 100 TB shape (both): the corpus NEVER shuffles — queries/anchors are a
  * small broadcast side, scoring is a scan-local broadcast nested-loop with
  * the native codegen'd cosine, and reduction is either the bounded-heap
  * TopK aggregate (q97: partial top-k per partition, merged per query) or a
  * conditional `max_by` pair (q98: one aggregation pass, map-side partial,
  * two struct slots of state per anchor). Everything after the aggregate is
  * query-scale: q97's label join broadcasts the ≤ queries×k rank list back
  * against the label scan (no corpus shuffle), its vote window partitions
  * by qid over ≤ queries × distinct-label rows; q98's output is one row per
  * anchor. Scale knob: at 1000 executors the same plan holds for thousands
  * of queries per pass — beyond that, batch the query side (q41's routing
  * discipline) or route through the IVF index (q38 family) instead of the
  * exact scan.
  */
object Classify {

  /** Neighbors consulted per query point. */
  val K = 10

  /** Held-out "unlabeled" slice: vec_id < QueryIds plays the unlabeled
    * batch; the rest of the collection is the labeled corpus.
    */
  val QueryIds = 20

  /** q97_knn_classify — majority-vote label propagation from the labeled
    * corpus (vec_id >= QueryIds) onto the held-out slice (vec_id <
    * QueryIds). Ties on vote count break to the smaller label; output
    * carries (qid, pred_label, votes, true_label).
    */
  def knnClassify(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < QueryIds)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("label").cast("long").as("true_label"))
    val corpus = emb.filter(col("vec_id") >= QueryIds)
    knnClassifyOf(queries, corpus, K)
  }

  /** Composable core: `queries` = (qid, qvec, true_label), `corpus` =
    * (vec_id, embedding, label). Top-k by 6-dp-rounded cosine (ties to
    * smaller vec_id — the q01 ordering), then a per-qid majority vote.
    */
  def knnClassifyOf(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    GraftFunctions.ensureRegistered(queries.sparkSession)
    val top = Knn.topK(
      queries.select(col("qid"), col("qvec")),
      corpus.select(col("vec_id"), col("embedding")), k)
    // label lookup: the rank list is query-scale (≤ queries × k rows) —
    // broadcast it so the corpus label scan probes it scan-side; the
    // corpus never shuffles and the join output is rank-list-sized
    val voted = corpus.select(col("vec_id"), col("label").cast("long").as("label"))
      .join(broadcast(top.select(col("qid"), col("vec_id"))), Seq("vec_id"))
      .groupBy(col("qid"), col("label"))
      .agg(count(lit(1)).as("votes"))
    // majority with ties to the smaller label — a query-scale window
    // (≤ queries × distinct-labels rows partitioned by qid)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("votes").desc, col("label"))
    voted
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("qid"), col("label").as("pred_label"), col("votes"))
      .join(broadcast(queries.select(col("qid"), col("true_label"))), Seq("qid"))
      .orderBy(col("qid"))
  }

  val q97OracleSql: String =
    s"""WITH q AS (
      |  SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec,
      |         CAST(label AS BIGINT) AS true_label
      |  FROM embeddings WHERE vec_id < $QueryIds
      |), c AS (
      |  SELECT vec_id, CAST(label AS BIGINT) AS label,
      |         embedding::DOUBLE[] AS vec
      |  FROM embeddings WHERE vec_id >= $QueryIds
      |), s AS (
      |  SELECT q.qid, c.vec_id, c.label,
      |         round(CASE WHEN sqrt(list_dot_product(q.qvec, q.qvec)) * sqrt(list_dot_product(c.vec, c.vec)) = 0
      |               THEN 0.0
      |               ELSE list_dot_product(q.qvec, c.vec)
      |                    / (sqrt(list_dot_product(q.qvec, q.qvec)) * sqrt(list_dot_product(c.vec, c.vec))) END, 6) AS score
      |  FROM q CROSS JOIN c
      |), r AS (
      |  SELECT qid, vec_id, label,
      |         row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
      |  FROM s
      |), v AS (
      |  SELECT qid, label, count(*) AS votes FROM r WHERE rank <= $K
      |  GROUP BY qid, label
      |)
      |SELECT v.qid, v.label AS pred_label, v.votes, q.true_label
      |FROM (SELECT qid, label, votes,
      |             row_number() OVER (PARTITION BY qid ORDER BY votes DESC, label) AS rn
      |      FROM v) v
      |JOIN q ON q.qid = v.qid
      |WHERE v.rn = 1
      |ORDER BY v.qid""".stripMargin

  /** q98_triplet_mining — per anchor (vec_id < QueryIds), the nearest
    * same-label point (positive) and the nearest different-label point
    * (hardest negative), with the cosine margin between them. One scoring
    * pass, one aggregation: `max_by` with a CONDITIONAL ordering key (null
    * keys are skipped by max_by) picks both ends without a second scan.
    */
  def tripletMining(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val anchors = emb.filter(col("vec_id") < QueryIds)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("label").cast("long").as("anchor_label"))
    tripletMiningOf(anchors, emb.select(col("vec_id"), col("embedding"),
      col("label").cast("long").as("label")))
  }

  /** Composable core: `anchors` = (qid, qvec, anchor_label), `corpus` =
    * (vec_id, embedding, label). Self-matches excluded; ties on the
    * 6-dp-rounded score break to the smaller vec_id on both ends. EVERY
    * anchor returns a row (the oracle's LEFT-JOIN-from-anchors semantics,
    * ADVICE r11): an anchor whose non-self corpus side is empty keeps null
    * pos/neg ends instead of vanishing, so a composable caller mining a
    * sparse corpus sees the anchor, not a silent drop.
    */
  def tripletMiningOf(anchors: DataFrame, corpus: DataFrame): DataFrame = {
    GraftFunctions.ensureRegistered(anchors.sparkSession)
    val scored = corpus
      .crossJoin(broadcast(anchors))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("anchor_label"), col("vec_id"), col("label"),
        round(GraftFunctions.cosine(col("qvec"), col("embedding")), 6).as("score"))
    // (score, -vec_id) max_by key, gated by label side: null keys are
    // ignored, so each slot sees only its side of the corpus — one
    // aggregation pass, two struct slots of state per anchor
    def bestWhere(cond: org.apache.spark.sql.Column) =
      max_by(struct(col("vec_id"), col("score")),
        when(cond, struct(col("score"), (col("vec_id") * -1).as("negid"))))
    val best = scored
      .groupBy(col("qid"))
      .agg(
        bestWhere(col("label") === col("anchor_label")).as("pos"),
        bestWhere(col("label") =!= col("anchor_label")).as("neg"))
    // keep-anchor join: anchors and `best` are both query-scale, so the
    // left join is a broadcast-hash over ≤ |anchors| rows — the grouping
    // key stays qid alone (anchor_label is functionally dependent on it
    // and rides back in from the anchor side)
    anchors.select(col("qid"), col("anchor_label"))
      .join(broadcast(best), Seq("qid"), "left")
      .select(
        col("qid"), col("anchor_label"),
        col("pos.vec_id").as("pos_id"), col("pos.score").as("pos_score"),
        col("neg.vec_id").as("neg_id"), col("neg.score").as("neg_score"),
        round(col("pos.score") - col("neg.score"), 6).as("margin"))
      .orderBy(col("qid"))
  }

  /** q142's held-out slice: a bigger batch than q97's so the calibration
    * curve has population per confidence bin.
    */
  val CalibQueryIds = 200

  /** q142_knn_calibration — CONFIDENCE CALIBRATION of the q97
    * classifier: bucket the held-out predictions by their vote count
    * (the vote fraction votes/K IS the classifier's confidence — an
    * exact integer bin, no float binning anywhere) and report per bin
    * the population, hits, and accuracy — the reliability diagram
    * (Guo et al. ICML'17) every labeling pipeline reads before
    * trusting model-assigned labels at scale: a well-calibrated bin
    * has accuracy ≈ confidence, and the table is the input to an ECE
    * or a confidence threshold for auto-accept vs human review.
    *
    * 100 TB: q97's audited scan shape with a 200-query broadcast side,
    * then a ≤ K-row aggregate over the query-scale prediction table.
    * The corpus never shuffles; the calibration reduce is free.
    */
  def knnCalibration(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < CalibQueryIds)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
        col("label").cast("long").as("true_label"))
    val corpus = emb.filter(col("vec_id") >= CalibQueryIds)
    knnCalibrationOf(knnClassifyOf(queries, corpus, K), K)
  }

  /** Composable core over ANY (qid, pred_label, votes, true_label)
    * prediction frame (q97's output shape).
    */
  def knnCalibrationOf(preds: DataFrame, k: Int): DataFrame =
    preds
      .groupBy(col("votes"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("pred_label") === col("true_label"), 1L).otherwise(0L)).as("n_correct"))
      .select(col("votes"),
        round(col("votes") / lit(k.toDouble), 6).as("confidence"),
        col("n"), col("n_correct"),
        round(col("n_correct") / col("n").cast("double"), 6).as("accuracy"))
      .orderBy(col("votes"))

  val q142OracleSql: String =
    s"""WITH q AS (
      |  SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec,
      |         CAST(label AS BIGINT) AS true_label
      |  FROM embeddings WHERE vec_id < $CalibQueryIds
      |), c AS (
      |  SELECT vec_id, CAST(label AS BIGINT) AS label,
      |         embedding::DOUBLE[] AS vec
      |  FROM embeddings WHERE vec_id >= $CalibQueryIds
      |), s AS (
      |  SELECT q.qid, c.vec_id, c.label,
      |         round(CASE WHEN sqrt(list_dot_product(q.qvec, q.qvec)) * sqrt(list_dot_product(c.vec, c.vec)) = 0
      |               THEN 0.0
      |               ELSE list_dot_product(q.qvec, c.vec)
      |                    / (sqrt(list_dot_product(q.qvec, q.qvec)) * sqrt(list_dot_product(c.vec, c.vec))) END, 6) AS score
      |  FROM q CROSS JOIN c
      |), r AS (
      |  SELECT qid, vec_id, label,
      |         row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
      |  FROM s
      |), v AS (
      |  SELECT qid, label, count(*) AS votes FROM r WHERE rank <= $K
      |  GROUP BY qid, label
      |), p AS (
      |  SELECT v.qid, v.label AS pred_label, v.votes, q.true_label
      |  FROM (SELECT qid, label, votes,
      |               row_number() OVER (PARTITION BY qid ORDER BY votes DESC, label) AS rn
      |        FROM v) v
      |  JOIN q ON q.qid = v.qid
      |  WHERE v.rn = 1
      |)
      |SELECT votes, round(votes / CAST($K AS DOUBLE), 6) AS confidence,
      |       COUNT(*) AS n,
      |       CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
      |       round(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 6) AS accuracy
      |FROM p GROUP BY votes ORDER BY votes""".stripMargin

  val q98OracleSql: String =
    s"""WITH q AS (
      |  SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec,
      |         CAST(label AS BIGINT) AS anchor_label
      |  FROM embeddings WHERE vec_id < $QueryIds
      |), c AS (
      |  SELECT vec_id, CAST(label AS BIGINT) AS label,
      |         embedding::DOUBLE[] AS vec
      |  FROM embeddings
      |), s AS (
      |  SELECT q.qid, q.anchor_label, c.vec_id, c.label,
      |         round(CASE WHEN sqrt(list_dot_product(q.qvec, q.qvec)) * sqrt(list_dot_product(c.vec, c.vec)) = 0
      |               THEN 0.0
      |               ELSE list_dot_product(q.qvec, c.vec)
      |                    / (sqrt(list_dot_product(q.qvec, q.qvec)) * sqrt(list_dot_product(c.vec, c.vec))) END, 6) AS score
      |  FROM q CROSS JOIN c
      |  WHERE c.vec_id <> q.qid
      |), pos AS (
      |  SELECT qid, vec_id, score,
      |         row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
      |  FROM s WHERE label = anchor_label
      |), neg AS (
      |  SELECT qid, vec_id, score,
      |         row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
      |  FROM s WHERE label <> anchor_label
      |)
      |SELECT q.qid, q.anchor_label,
      |       pos.vec_id AS pos_id, pos.score AS pos_score,
      |       neg.vec_id AS neg_id, neg.score AS neg_score,
      |       round(pos.score - neg.score, 6) AS margin
      |FROM q
      |LEFT JOIN pos ON pos.qid = q.qid AND pos.rn = 1
      |LEFT JOIN neg ON neg.qid = q.qid AND neg.rn = 1
      |ORDER BY q.qid""".stripMargin
}
