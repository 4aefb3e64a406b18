package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions._

/** Embedding-space near-duplicate detection — the north-star dedup operator
  * family (BASELINE.json) generalizing the reference's cosine metric
  * (reference: vector_db.py:23). The exact similarity self-join is blocked
  * on the payload `label` (classic blocking/banding: candidates only form
  * within a block, turning an O(n²) global join into Σ O(b²) per block — the
  * same role LSH banding plays at 100 TB, where the block key becomes the
  * MinHash band or the LSH bucket).
  */
object Dedup {

  /** q10_near_dup_pairs — top-100 most-similar within-label pairs
    * (a_id < b_id) by cosine. A fixed-k ranking rather than a fixed
    * threshold so the query is meaningful at every scale factor (the
    * synthetic fixtures top out near cosine 0.45). `orderBy + limit`
    * compiles to TakeOrderedAndProject — a distributed per-partition top-k
    * merge, not a single-partition global sort.
    *
    * DECLARED ROLE (round 7, settled): this is the exact CANDIDATE-BUCKET
    * VERIFIER of the dedup family — all-pairs inside label blocks,
    * deliberately quadratic in block size, kept as the ground truth the
    * bucketed siblings' recall is measured against (DedupSpec). It is
    * never the shape run corpus-wide at scale; the scale paths are
    * [[scaledNearDup]] (q62, embedding space) and MinHash/LSH (q16, text).
    */
  def nearDupPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding").as("v"))
    val a = e.select(col("vec_id").as("a_id"), col("label"), col("v").as("va"))
    val b = e.select(col("vec_id").as("b_id"), col("label"), col("v").as("vb"))
    rankedPairs(a.join(b, Seq("label")).withColumn("pair_label", col("label").cast("long")), 100)
  }

  /** Shared scoring/ranking tail of both near-dup variants: ONE
    * definition of the (a_id < b_id) dedup, rounded-cosine score, and
    * (score desc, a_id, b_id) presentation, so a tweak to either cannot
    * silently diverge the recall comparison DedupSpec measures. `joined`
    * must have (a_id, b_id, va, vb, pair_label).
    */
  private def rankedPairs(joined: DataFrame, k: Int): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(joined.sparkSession)
    joined
      .filter(col("a_id") < col("b_id"))
      .select(
        col("a_id"), col("b_id"), col("pair_label").as("label"),
        round(graft.functions.GraftFunctions.cosine(col("va"), col("vb")), 6).as("score"))
      .orderBy(col("score").desc, col("a_id"), col("b_id"))
      .limit(k)
  }

  /** The 100 TB path for embedding near-dup — q10's semantics with the
    * quadratic tamed: candidate pairs form only INSIDE the persisted
    * index's nearest-centroid lists (the IVF assignment is itself an
    * LSH-like bucketing of embedding space), so the pair count is
    * Σ |list|² instead of Σ |label-block|² over arbitrary-size blocks —
    * and nlist is a knob: more lists, smaller blocks, fewer pairs. The
    * price is pairs that straddle a list boundary; the recall of the
    * top-k pairs vs the exhaustive q10 is measured in DedupSpec (the
    * sf0.1→sf1 scaling table shows why the trade exists: q10 is the one
    * measured-quadratic query in the engine).
    *
    * `indexDir` must hold an [[IvfIndex]] build of the same corpus.
    *
    * Unlike q10, list-blocked pairs CAN span payload labels (vectors
    * live in their assigned list, not their label's) — the `label`
    * column is the pair's COMMON label, null when the sides disagree,
    * never a one-sided claim.
    */
  def nearDupPairsViaIndex(spark: SparkSession, indexDir: String, k: Int = 100): DataFrame = {
    val pts = IvfIndex.latestPointsFor(spark, indexDir,
      spark.read.parquet(IvfIndex.pointsPath(indexDir)))
      .select(col("vec_id"), col("label"), col("embedding"), col("list_id"))
    val a = pts.select(col("vec_id").as("a_id"), col("label").as("a_label"),
      col("embedding").as("va"), col("list_id"))
    val b = pts.select(col("vec_id").as("b_id"), col("label").as("b_label"),
      col("embedding").as("vb"), col("list_id"))
    val joined = a.join(b, Seq("list_id")) // co-bucketed equi-join: pairs only within a list
      .withColumn("pair_label",
        when(col("a_label") === col("b_label"), col("a_label").cast("long")))
    rankedPairs(joined, k)
  }

  /** q56_index_blocked_neardup — [[nearDupPairsViaIndex]] as a declared,
    * oracle-checked query: build the persisted IVF index over the fixture
    * embeddings, then rank within-list pairs. The row proves the blocked
    * sibling returns exactly the pairs its blocking contract promises
    * (the oracle recomputes the nearest-centroid assignment algebraically
    * and joins a×b on the assigned list).
    *
    * DECLARED ROLE (round 7, settled): the ORACLE-VERIFIABLE FLOOR of the
    * blocked-dedup family. Its label-derived fixed-nlist build exists
    * BECAUSE the oracle can recompute it exactly — it is not scale-tuned
    * (measured exp 1.94 at sf10, BASELINE.md round-5 table) and is not
    * the shape to run at 100 TB. The scale shape is [[scaledNearDup]]
    * (q62): the SAME ranking over the nlist∝n sign-bit build, under the
    * hard hash signal since round 6 and measured linear. q56 stays
    * declared so the family keeps one row whose full build+rank layout an
    * external engine re-derives from scratch.
    */
  def indexBlockedNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val indexDir = java.nio.file.Files.createTempDirectory("graft_ivf_neardup").toString
    IvfIndex.build(spark, emb, indexDir)
    nearDupPairsViaIndex(spark, indexDir, k = 100)
  }

  /** q62_scaled_neardup — the SCALE-READY embedding near-dup path under the
    * oracle (VERDICT r5 item 1): the same [[nearDupPairsViaIndex]] ranking
    * q56 declares, but over [[IvfIndex.buildSignBit]] — a sign-bit coarse
    * quantizer whose nlist = 2^b grows with the corpus (b derived from the
    * row count, ~200 rows/list at every scale), so the within-list pair
    * budget Σ|list|² is LINEAR in n instead of q56's fixed-nlist quadratic.
    * The quantizer is pure arithmetic (bit i of list_id = [embedding(i) >
    * 0]) — DuckDB recomputes the assignment exactly, which is what puts the
    * TRUE 100 TB dedup shape under the hard hash signal where q56's
    * label build (the oracle-friendly floor) and `buildUnsupervised`'s
    * KMeans (scale-safe but not externally recomputable) could not.
    * Measured scaling lives in BASELINE.md; q56 stays as the label-blocked
    * sibling, q10 as the exact within-block verifier.
    */
  def scaledNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val indexDir = java.nio.file.Files.createTempDirectory("graft_ivf_signbit").toString
    IvfIndex.buildSignBit(spark, emb, indexDir)
    nearDupPairsViaIndex(spark, indexDir, k = 100)
  }

  val q10OracleSql: String =
    """WITH e AS (
      |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
      |), pairs AS (
      |  SELECT a.vec_id AS a_id, b.vec_id AS b_id, CAST(a.label AS BIGINT) AS label,
      |         round(CASE WHEN sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)) = 0
      |               THEN 0.0
      |               ELSE list_dot_product(a.v, b.v)
      |                    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) END, 6) AS score
      |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
      |)
      |SELECT a_id, b_id, label, score
      |FROM pairs
      |ORDER BY score DESC, a_id, b_id
      |LIMIT 100""".stripMargin

  /** q10's presentation over pairs blocked by the index's nearest-centroid
    * assignment instead of the payload label — the `asg` CTE is the SAME
    * algebraic build recomputation q38's oracle uses
    * ([[IvfIndex.oracleAsgCtes]]), so this oracle and the probe oracles
    * can never drift on what "the persisted layout" means. Pair label is
    * common-or-null, exactly [[nearDupPairsViaIndex]]'s contract.
    */
  val q56OracleSql: String =
    s"""${IvfIndex.oracleAsgCtes}, pts AS (
       |  SELECT e.vec_id, e.label, e.v, a.list_id
       |  FROM e JOIN asg a ON a.vec_id = e.vec_id
       |), pairs AS (
       |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |         CASE WHEN a.label = b.label THEN CAST(a.label AS BIGINT) END AS label,
       |         ${IvfIndex.cosSql("a.v", "b.v")} AS score
       |  FROM pts a JOIN pts b ON a.list_id = b.list_id AND a.vec_id < b.vec_id
       |)
       |SELECT a_id, b_id, label, score
       |FROM pairs
       |ORDER BY score DESC, a_id, b_id
       |LIMIT 100""".stripMargin

  /** q56's presentation over the SIGN-BIT assignment: `b` is recomputed
    * from the corpus count with the same integer-only formula as
    * [[IvfIndex.buildSignBit]] (bit_length via DuckDB `bin()`, no float
    * log), `list_id` by the same bit arithmetic — so the oracle and the
    * persisted layout agree on every list boundary, at every corpus size.
    */
  val q62OracleSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
       |), nb AS (
       |  SELECT LEAST(CASE WHEN (COUNT(*) - 1) // 200 = 0 THEN 0
       |               ELSE length(bin((COUNT(*) - 1) // 200)) END,
       |               MIN(len(v))) AS b
       |  FROM e
       |), asg AS (
       |  SELECT vec_id,
       |         CAST(COALESCE(list_aggregate(list_transform(range(0, nb.b),
       |                i -> CASE WHEN v[CAST(i + 1 AS INT)] > 0
       |                          THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
       |                          ELSE CAST(0 AS BIGINT) END),
       |              'sum'), 0) AS BIGINT) AS list_id
       |  FROM e CROSS JOIN nb
       |), pts AS (
       |  SELECT e.vec_id, e.label, e.v, a.list_id
       |  FROM e JOIN asg a ON a.vec_id = e.vec_id
       |), pairs AS (
       |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |         CASE WHEN a.label = b.label THEN CAST(a.label AS BIGINT) END AS label,
       |         ${IvfIndex.cosSql("a.v", "b.v")} AS score
       |  FROM pts a JOIN pts b ON a.list_id = b.list_id AND a.vec_id < b.vec_id
       |)
       |SELECT a_id, b_id, label, score
       |FROM pairs
       |ORDER BY score DESC, a_id, b_id
       |LIMIT 100""".stripMargin
}
