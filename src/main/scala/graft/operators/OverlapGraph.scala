package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Link analysis over the document-overlap graph — the iterative
  * fixed-point family (alongside q74's connected components): PageRank
  * with a pinned iteration count over the q91 winnow-match edges.
  *
  * Why a curation engine wants this: q91's pairs say "these two share a
  * span"; PageRank over that graph says WHICH documents are template
  * HUBS — the license stubs, navigation boilerplate, and mirror indexes
  * that overlap half the corpus sit at the top of the ranking long
  * before any single pairwise score looks alarming. The classic web use
  * (rank by endorsement) inverts here into a cleaning signal: high
  * overlap-rank = shared-text concentrator = inspect/remove first.
  */
object OverlapGraph {

  /** Damping factor and its complement — BOTH pinned as literals (the
    * q105 lesson: `1 - 0.85` computed in doubles is not 0.15's nearest
    * double times anything predictable; spell the pair out so the two
    * engines iterate the identical affine map).
    */
  val PrDamping = 0.85
  val PrBase = 0.15

  /** Fixed Lloyd-style iteration count (the q101 discipline: both
    * engines run the identical unrolled computation).
    */
  val PrIters = 3

  /** Presentation cut of the declared row. */
  val PrTopN = 20

  /** Edge-evidence floor: ≥ 2 shared rare fingerprints. Deliberately
    * BELOW q91's declared minShared=5 — a pair report needs each edge to
    * stand alone, but link analysis AGGREGATES edges, so weak-but-many
    * evidence is exactly its regime (at q91's floor the fixture graph
    * degenerates to isolated pairs and every pr fixes at 1.0; at 2 the
    * degree spectrum reaches ~27 and the hub ranking carries signal —
    * measured, the q10/q102 fixture-meaningfulness lesson).
    */
  val PrMinShared = 2

  /** Per-iteration carry precision: 10 dp keeps the two engines'
    * reduction-order ulp noise (~1e-16 per sum) from accumulating
    * across iterations without eating signal (pr mass is ≥ [[PrBase]]
    * by construction, 8 orders above the carry grain); the declared
    * output re-rounds to the house 6 dp.
    */
  val PrCarryDp = 10

  /** q110_overlap_pagerank — WEIGHTED PAGERANK over the q91 overlap
    * graph, [[PrIters]] unrolled iterations, mass units (init 1.0 per
    * node, base [[PrBase]] + [[PrDamping]] · weighted in-sum), edge
    * weight = n_shared normalized by the source's total out-weight (an
    * exact integer ratio — both engines divide identical longs). The
    * graph is symmetrized, so no dangling mass exists by construction.
    * Emits the top-[[PrTopN]] hub documents by (pr desc, doc_id).
    *
    * 100 TB: the edge list is q91's output — DECISION-scale by the
    * maxDf cull (fanout per fingerprint structurally capped), not
    * corpus-scale — and every iteration is one equi-join + one hash
    * aggregate over it (the q74 per-round shape); the iteration count
    * is a pinned constant, so the whole fixed-point costs
    * [[PrIters]] edge-scale shuffles. The corpus is touched exactly
    * once (q91's fingerprint scan); ranking is TakeOrderedAndProject.
    */
  def overlapPagerank(spark: SparkSession, sfDir: String): DataFrame =
    overlapPagerankOf(Tables.documents(spark, sfDir))

  /** Composable core for ANY (doc_id, text, …) corpus. */
  def overlapPagerankOf(docs: DataFrame): DataFrame =
    pagerankOverEdges(TextAnalysis.winnowMatchesOf(docs, minShared = PrMinShared))

  /** Below this many (directed) ratio edges the fixed point runs as a
    * DRIVER-LOCAL fold (round 17, guide §1.2): the edge list is
    * decision-scale by the q91 contract, and each distributed iteration
    * costs a join + aggregate + localCheckpoint job — pure scheduling
    * overhead when the whole graph fits in a few MB. Beyond the bound
    * the per-round distributed loop runs unchanged (the 100 TB path).
    * Both paths iterate the identical affine map with the identical
    * [[PrCarryDp]] HALF_UP carry round, which is precisely the grain
    * that absorbs reduction-order ulp noise — the same contract that
    * already lets Spark's partition-order sums hash-match DuckDB's.
    */
  val LocalEdgeBound = 100000L

  /** The fixed-point core over ANY undirected (a_id, b_id, n_shared)
    * edge frame (edge-scale by contract). Checkpointed per round: each
    * iteration's frame feeds the next join, and an unbroken lineage
    * would re-execute the whole prefix per round (the q74 per-round
    * discipline).
    */
  private[graft] def pagerankOverEdges(matches: DataFrame,
                                       localEdgeBound: Long = LocalEdgeBound): DataFrame = {
    val edges = matches
      .select(col("a_id").as("src"), col("b_id").as("dst"), col("n_shared"))
      .unionByName(matches
        .select(col("b_id").as("src"), col("a_id").as("dst"), col("n_shared")))
    val ratios = edges
      .join(edges.groupBy(col("src")).agg(sum(col("n_shared")).as("wsum")), Seq("src"))
      .select(col("src"), col("dst"),
        (col("n_shared").cast("double") / col("wsum")).as("r"))
      .localCheckpoint(true)
    if (ratios.count() <= localEdgeBound) {
      // deterministic local fold: per-dst in-sums accumulated in sorted
      // (dst, src) order, the same HALF_UP carry/presentation rounds
      val rs = ratios.collect()
        .map(row => (row.getLong(0), row.getLong(1), row.getDouble(2)))
        .sortBy(e => (e._2, e._1))
      def rnd(v: Double, dp: Int): Double =
        BigDecimal(v).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
      var pr: Map[Long, Double] =
        rs.iterator.map(_._1).toArray.distinct.map(_ -> 1.0).toMap
      for (_ <- 1 to PrIters) {
        val acc = scala.collection.mutable.LinkedHashMap.empty[Long, Double]
        rs.foreach { case (src, dst, r) =>
          acc(dst) = acc.getOrElse(dst, 0.0) + pr(src) * r
        }
        pr = acc.iterator.map { case (d, s) =>
          d -> rnd(PrBase + PrDamping * s, PrCarryDp) }.toMap
      }
      val spark2 = matches.sparkSession
      import spark2.implicits._
      return pr.toSeq.map { case (d, v) => (d, rnd(v, 6)) }.sortBy(_._1)
        .toDF("doc_id", "pr")
        .orderBy(col("pr").desc, col("doc_id"))
        .limit(PrTopN)
    }
    var pr = ratios.select(col("src").as("doc_id")).distinct()
      .withColumn("pr", lit(1.0))
      .localCheckpoint(true)
    for (_ <- 1 to PrIters) {
      pr = ratios
        .join(pr.withColumnRenamed("doc_id", "src"), Seq("src"))
        .groupBy(col("dst").as("doc_id"))
        .agg(round(lit(PrBase) + lit(PrDamping) * sum(col("pr") * col("r")), PrCarryDp)
          .as("pr"))
        .localCheckpoint(true)
    }
    pr.select(col("doc_id"), round(col("pr"), 6).as("pr"))
      .orderBy(col("pr").desc, col("doc_id"))
      .limit(PrTopN)
  }

  /** q91's edge CTEs + symmetrize/normalize + [[PrIters]] unrolled
    * mass-update rounds.
    */
  val q110OracleSql: String = {
    val iters = (1 to PrIters).map { i =>
      s""", p$i AS (
         |  SELECT e.dst AS doc_id,
         |         round($PrBase + $PrDamping * SUM(p.pr * e.r), $PrCarryDp) AS pr
         |  FROM re e JOIN p${i - 1} p ON p.doc_id = e.src
         |  GROUP BY e.dst
         |)""".stripMargin
    }.mkString
    // q91's fingerprint/match pipeline, verbatim up to the pair set
    val matchCtes = TextAnalysis.q91OracleSql
      .split("\\n\\)\\nSELECT")(0)
    s"""$matchCtes
       |), m AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_shared
       |  FROM kept a JOIN kept b USING (fp)
       |  WHERE a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $PrMinShared
       |), e AS (
       |  SELECT a_id AS src, b_id AS dst, n_shared FROM m
       |  UNION ALL
       |  SELECT b_id AS src, a_id AS dst, n_shared FROM m
       |), w AS (
       |  SELECT src, SUM(n_shared) AS wsum FROM e GROUP BY src
       |), re AS (
       |  SELECT e.src, e.dst, CAST(e.n_shared AS DOUBLE) / w.wsum AS r
       |  FROM e JOIN w USING (src)
       |), p0 AS (
       |  SELECT DISTINCT src AS doc_id, 1.0 AS pr FROM re
       |)$iters
       |SELECT doc_id, round(pr, 6) AS pr
       |FROM p$PrIters
       |ORDER BY pr DESC, doc_id
       |LIMIT $PrTopN""".stripMargin
  }

  /** Presentation cut for the triangle report. */
  val TriTopN = 20

  /** q118_overlap_triangles — TRIANGLE PARTICIPATION over the q91
    * winnow-match graph: how many closed triads each document sits in,
    * top-[[TriTopN]] by (triangles desc, doc_id). Triangles are the
    * link-analysis complement to q110's PageRank: rank finds HUBS, triads
    * find CLIQUES — a content farm cross-quoting itself forms dense
    * triangle clusters long before any single page accumulates rank
    * (the classic web-spam signal; trusses/clustering coefficients are
    * this count normalized).
    *
    * Each triangle a<b<c counts exactly once: the canonical orientation
    * ((a,b) ⋈ (b,c) closing with (a,c)) makes the count a pure
    * equi-join expression — no distinct, no per-node set intersection.
    *
    * 100 TB: the edge list is decision-scale by the q91 contract and
    * checkpoints once (one winnow execution feeds all three join
    * sides); both triangle joins are equi-joins on edge endpoints. On a
    * web-scale graph with heavy-hitter degrees the same plan holds
    * after re-orienting edges by (degree, id) — Cohen's
    * degree-ordering bounds each node's out-set by √|E| and with it the
    * wedge fanout; the fixture graph's near-dup cliques don't need it.
    */
  def overlapTriangles(spark: SparkSession, sfDir: String): DataFrame =
    trianglesOverEdges(TextAnalysis.winnowMatchesOf(
      graft.Tables.documents(spark, sfDir), minShared = PrMinShared))

  /** Composable core over ANY canonical (a_id < b_id) edge frame. */
  private[graft] def trianglesOverEdges(matches: DataFrame): DataFrame = {
    val e = matches.select(col("a_id").as("a"), col("b_id").as("b"))
      .localCheckpoint(true)
    val wedges = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("wa"), col("e1.b").as("wb"), col("e2.b").as("wc"))
    val tri = wedges.join(e.as("e3"),
      col("wa") === col("e3.a") && col("wc") === col("e3.b"))
      .select(col("wa"), col("wb"), col("wc"))
    tri.select(explode(array(col("wa"), col("wb"), col("wc"))).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("triangles"))
      .orderBy(col("triangles").desc, col("doc_id"))
      .limit(TriTopN)
  }

  /** q91's edge CTEs + the oriented two-join triangle closure. */
  val q118OracleSql: String = {
    val matchCtes = TextAnalysis.q91OracleSql
      .split("\\n\\)\\nSELECT")(0)
    s"""$matchCtes
       |), m AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM kept a JOIN kept b USING (fp)
       |  WHERE a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $PrMinShared
       |), tg AS (
       |  SELECT e1.a_id AS a, e1.b_id AS b, e2.b_id AS c
       |  FROM m e1
       |  JOIN m e2 ON e1.b_id = e2.a_id
       |  JOIN m e3 ON e3.a_id = e1.a_id AND e3.b_id = e2.b_id
       |), corners AS (
       |  SELECT a AS doc_id FROM tg
       |  UNION ALL SELECT b FROM tg
       |  UNION ALL SELECT c FROM tg
       |)
       |SELECT doc_id, COUNT(*) AS triangles
       |FROM corners GROUP BY doc_id
       |ORDER BY triangles DESC, doc_id
       |LIMIT $TriTopN""".stripMargin
  }
}
