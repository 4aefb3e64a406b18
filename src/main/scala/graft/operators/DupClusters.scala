package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Duplicate-CLUSTER assignment — the step real curation pipelines run
  * after near-dup pair generation (the reference stops at per-query
  * similarity hits, e.g. `vector_db_query.py`'s scored search; corpus
  * curation needs the transitive grouping): near-dup pairs form a graph,
  * each connected component is one duplicate cluster, and exactly one
  * keeper (the minimum doc_id) survives per cluster. Pairwise removal
  * (q16/q70's edge-dominated pass) under-removes when similarity is not
  * transitive A~B~C with A!~C; clustering resolves that the way
  * production dedup does.
  *
  * Connected components run as alternating LARGE-STAR / SMALL-STAR
  * rounds (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC 2014 — the published shuffle-native algorithm): each
  * round is two hash-aggregates + equi-joins on the EDGE set, and the
  * edge set contracts toward one star per component centered at its
  * minimum node. Convergence is O(log²) rounds in the worst case
  * (spec-measured: a 1024-node chain — the adversarial diameter case
  * where naive min-propagation needs 1024 rounds — converges in ≤ 10).
  * The driver loop holds no data: per-round state is a localCheckpoint'd
  * edge DataFrame, decision-scale (≈ duplicate pairs), never the corpus.
  */
object DupClusters {

  /** Star-round cap. Components converge in ~log²(largest component);
    * 40 rounds covers components far beyond any real corpus (the spec's
    * 1024-chain needs ≤ 10). Non-convergence raises rather than
    * returning a silently-partial clustering.
    */
  val MaxIter = 40

  /** LARGE-STAR: every node connects its strictly-LARGER neighbors to
    * the minimum of its closed neighborhood. Emitted edges are (bigger
    * node → candidate root); symmetric orientation happens here so the
    * caller can keep edges canonical.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(min("v").as("mn"))
      .select(col("u"), least(col("mn"), col("u")).as("m"))
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  /** SMALL-STAR: every node connects its smaller-or-equal neighbors
    * (and itself) to the minimum of that set. Output is canonically
    * oriented (u > v) and distinct — the fixpoint of
    * smallStar∘largeStar is one star per component.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val oriented = e.filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
    val mins = oriented.groupBy("u").agg(min("v").as("m"))
    val nbr  = oriented.join(mins, "u").select(col("v").as("n"), col("m"))
    val self = mins.select(col("u").as("n"), col("m"))
    nbr.union(self)
      .filter(col("n") =!= col("m"))
      .select(col("n").as("u"), col("m").as("v"))
      .distinct()
  }

  /** Below this many canonical edges the components are computed with a
    * DRIVER-LOCAL union-find instead of distributed star rounds
    * (round 17, guide §1.2): the edge set is decision-scale by contract
    * (≈ verified duplicate pairs, never the corpus), and each star round
    * costs ~6 distributed jobs (two aggregates, two joins, a
    * localCheckpoint, the convergence count/anti-join) — pure scheduling
    * overhead when the whole graph fits in a few MB on the driver.
    * 100 000 edges collect to ~1.6 MB; beyond the bound the star rounds
    * run unchanged (the 100 TB path). Both algorithms label every
    * incident node with its component MINIMUM, so the outputs are
    * identical by definition (spec-pinned against union-find either way).
    */
  val LocalEdgeBound = 100000L

  /** Connected components of an undirected graph given as a 2-column
    * (src, dst) pair DataFrame. Returns (node, component) for every node
    * incident to at least one edge — component = minimum node id, the
    * deterministic keeper convention. Isolated nodes never appear (the
    * caller coalesces them to themselves, see [[dupClustersOf]]).
    *
    * Each round materializes eagerly (localCheckpoint) so lineage stays
    * flat across iterations; the convergence check is a deterministic
    * set-equality (count + anti-join), never a hash of the edge set.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = MaxIter): DataFrame =
    ccWithRounds(edges, maxIter)._1

  /** In-driver union-find over a collected canonical edge list: iterative
    * find with path halving, union by smaller-root-wins (the min-label
    * convention directly). Returns (node → component-min) for every
    * incident node.
    */
  private[graft] def unionFindLocal(es: Array[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrElse(x, x) != x) {
        val p = parent(x)
        val gp = parent.getOrElse(p, p)
        parent(x) = gp // path halving
        x = gp
      }
      x
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = es.iterator.flatMap { case (a, b) => Iterator(a, b) }.toArray.distinct
    nodes.iterator.map(n => n -> find(n)).toMap
  }

  private[graft] def ccWithRounds(edges: DataFrame, maxIter: Int = MaxIter,
                                  localEdgeBound: Long = LocalEdgeBound): (DataFrame, Int) = {
    val Seq(sc, dc) = edges.columns.take(2).toSeq
    var e = edges
      .select(col(sc).cast("long").as("u"), col(dc).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(true)
    if (e.count() <= localEdgeBound) {
      val labels = unionFindLocal(e.collect().map(r => (r.getLong(0), r.getLong(1))))
      val spark2 = edges.sparkSession
      import spark2.implicits._
      return (labels.toSeq.sortBy(_._1).toDF("node", "component"), 0)
    }
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      converged = next.count() == e.count() &&
        next.join(e, Seq("u", "v"), "left_anti").isEmpty
      e = next
      rounds += 1
    }
    require(converged, s"connectedComponents: no fixpoint after $maxIter star rounds")
    // At the fixpoint every component is a star centered at its minimum;
    // labels read straight off the edges. min-over-neighborhood (not a
    // blind "v is the root") so a hypothetical non-star fixpoint would
    // fail the spec's union-find comparison instead of hiding.
    val sym = e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))
    val labels = sym.groupBy("u").agg(min("v").as("mn"))
      .select(col("u").as("node"), least(col("mn"), col("u")).as("component"))
    (labels, rounds)
  }

  /** q74_dup_clusters — every document labeled with its duplicate
    * cluster: MinHash-verified near-dup pairs (q16's machinery,
    * threshold 0.5) → connected components → (doc_id, cluster_id =
    * component min, cluster_size). Singletons cluster as themselves with
    * size 1; the keeper of every cluster IS its cluster_id.
    */
  def dupClusters(spark: SparkSession, sfDir: String): DataFrame =
    dupClustersOf(Tables.documents(spark, sfDir))

  /** Composable core of q74 for ANY (doc_id, text, …) corpus. The CC
    * input is the decision-scale verified pair set — the corpus-scale
    * work is q16's banded candidate generation, already sub-quadratic;
    * the star rounds touch only pairs, and the final label join is one
    * corpus-scale broadcast-or-shuffle equi-join.
    */
  def dupClustersOf(docs: DataFrame): DataFrame = {
    val pairs  = DedupExtras.minhashVerifiedPairsOf(docs).select("a_id", "b_id")
    val labels = connectedComponents(pairs)
    val assigned = docs.select(col("doc_id"))
      .join(labels, col("doc_id") === col("node"), "left")
      .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("cluster_id"))
    val sizes = assigned.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    assigned.join(sizes, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
      .orderBy(col("doc_id"))
  }

  /** Oracle: q16's verified-pair CTEs (un-ranked, full set) + a
    * recursive-CTE transitive closure, label = min reachable node.
    * Closure size is Σ|component|² — fixture-fine; the ENGINE never
    * materializes a closure, that is exactly what the star rounds avoid.
    */
  /** Shared CTE prefix of the q74/q83 oracles: q16's verified-pair CTEs
    * (un-ranked, full set) + recursive transitive closure → `lab`
    * (doc_id, cluster_id = min reachable node).
    */
  private[operators] val clusterCtePrefix: String = {
    val sigSelect = (0 until DedupExtras.NumHashes).map(i => s"min(md5('$i:' || s)) AS sig$i").mkString(", ")
    val bandSelects = (0 until DedupExtras.Bands).map(b =>
      s"SELECT doc_id, $b AS band, md5(sig${2 * b} || sig${2 * b + 1}) AS bkey FROM sigs").mkString("\n  UNION ALL\n  ")
    s"""WITH RECURSIVE sh AS (
       |  SELECT doc_id,
       |         list_distinct(list_transform(range(1, len(toks) - 1),
       |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
       |  FROM (SELECT doc_id, regexp_extract_all(text, '(\\w+|[^\\w\\s]+)', 1) AS toks FROM documents)
       |  WHERE len(toks) >= 3
       |), ex AS (
       |  SELECT doc_id, unnest(sh) AS s FROM sh
       |), sigs AS (
       |  SELECT doc_id, $sigSelect FROM ex GROUP BY doc_id
       |), bands AS (
       |  $bandSelects
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
       |), pairs AS (
       |  SELECT c.a_id, c.b_id
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.a_id
       |  JOIN sh sb ON sb.doc_id = c.b_id
       |  WHERE round(len(list_intersect(sa.sh, sb.sh))
       |              / CAST(len(list_distinct(sa.sh || sb.sh)) AS DOUBLE), 6) >= ${DedupExtras.JaccardThreshold}
       |), edges AS (
       |  SELECT a_id AS u, b_id AS v FROM pairs
       |  UNION
       |  SELECT b_id AS u, a_id AS v FROM pairs
       |), reach(src, node) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT r.src, e.v FROM reach r JOIN edges e ON e.u = r.node
       |), lab AS (
       |  SELECT src AS doc_id, min(node) AS cluster_id FROM reach GROUP BY src
       |)""".stripMargin
  }

  val q74OracleSql: String =
    s"""$clusterCtePrefix
       |SELECT l.doc_id, l.cluster_id, CAST(c.n AS BIGINT) AS cluster_size
       |FROM lab l
       |JOIN (SELECT cluster_id, count(*) AS n FROM lab GROUP BY cluster_id) c USING (cluster_id)
       |ORDER BY doc_id""".stripMargin

  /** q150_keep_best_dedup — QUALITY-AWARE dedup selection: within each
    * multi-document near-dup cluster (q74's MinHash+CC clusters — exact
    * copies are degenerate here: identical text means identical quality,
    * so the interesting unit is the NEAR-dup family), keep the
    * highest-quality member (q20's composite, rounded 6 dp BEFORE the
    * argmax; ties to the smaller doc_id) instead of q45's
    * keep-smallest-id convention — what production curation actually
    * ships (Gopher/FineWeb-style pipelines dedup THEN keep the best
    * exemplar). Emits one row per contested cluster: keeper vs the
    * keep-first baseline and the quality gain — the evidence that
    * decides whether quality-aware selection pays for a corpus.
    *
    * 100 TB: clusters are q74's decision-scale CC labels (corpus-scale
    * work = q16's banded candidates, already sub-quadratic); quality is
    * q20's ONE corpus token pass; the join is a doc-keyed equi-join; the
    * two argmax aggregates run per cluster over dup-family-sized groups
    * (max/min of 6-dp-rounded (quality, −doc_id) structs — scan-local
    * partials, no window, no second corpus pass).
    */
  def keepBestDedup(spark: SparkSession, sfDir: String): DataFrame =
    keepBestDedupOf(Tables.documents(spark, sfDir))

  /** Composable core of q150 for ANY (doc_id, text, …) corpus. */
  def keepBestDedupOf(docs: DataFrame): DataFrame = {
    val clusters = dupClustersOf(docs).filter(col("cluster_size") > 1)
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
    val quality = TextAnalysis.qualityScoreOf(docs)
      .select(col("doc_id"), col("quality"))
    clusters.join(quality, Seq("doc_id"))
      .groupBy(col("cluster_id"), col("cluster_size"))
      .agg(
        max(struct(col("quality").as("q"), (-col("doc_id")).as("nid"))).as("best"),
        min(struct(col("doc_id").as("id"), col("quality").as("q"))).as("first"))
      .select(
        col("cluster_id"),
        col("cluster_size").cast("long").as("cluster_size"),
        (-col("best.nid")).cast("long").as("keeper_id"),
        col("best.q").as("keeper_quality"),
        col("first.id").as("first_id"),
        col("first.q").as("first_quality"),
        round(col("best.q") - col("first.q"), 6).as("quality_gain"))
      .orderBy(col("cluster_id"))
  }

  /** Oracle: the shared cluster CTEs + q20's quality CTEs + two
    * row_number argmaxes per cluster (best-quality and smallest-id).
    */
  val q150OracleSql: String = {
    val stop = TextAnalysis.EnStopwords.map(s => s"'$s'").mkString("(", ",", ")")
    s"""$clusterCtePrefix, csz AS (
       |  SELECT cluster_id, count(*) AS n FROM lab GROUP BY cluster_id
       |), multi AS (
       |  SELECT l.doc_id, l.cluster_id, c.n
       |  FROM lab l JOIN csz c USING (cluster_id) WHERE c.n > 1
       |), qtok AS (
       |  SELECT doc_id, unnest(regexp_extract_all(text, '(\\w+|[^\\w\\s]+)', 1)) AS tok FROM documents
       |), qagg AS (
       |  SELECT doc_id,
       |         COUNT(*) AS n_tokens,
       |         sum(CASE WHEN tok IN $stop THEN 1 ELSE 0 END) AS n_stop,
       |         sum(CASE WHEN regexp_matches(tok, '^[^a-z0-9]+$$') THEN 1 ELSE 0 END) AS n_punct
       |  FROM qtok GROUP BY doc_id
       |), qt AS (
       |  SELECT doc_id,
       |         round(LEAST(n_tokens / 100.0, 1.0) * 0.4
       |               + (1.0 - n_punct / CAST(n_tokens AS DOUBLE)) * 0.3
       |               + (n_stop / CAST(n_tokens AS DOUBLE)) * 0.3, 6) AS quality
       |  FROM qagg
       |), x AS (
       |  SELECT m.cluster_id, m.n, m.doc_id, q.quality,
       |         row_number() OVER (PARTITION BY m.cluster_id ORDER BY q.quality DESC, m.doc_id) AS rb,
       |         row_number() OVER (PARTITION BY m.cluster_id ORDER BY m.doc_id) AS rf
       |  FROM multi m JOIN qt q USING (doc_id)
       |)
       |SELECT b.cluster_id, CAST(b.n AS BIGINT) AS cluster_size,
       |       b.doc_id AS keeper_id, b.quality AS keeper_quality,
       |       f.doc_id AS first_id, f.quality AS first_quality,
       |       round(b.quality - f.quality, 6) AS quality_gain
       |FROM x b JOIN x f ON f.cluster_id = b.cluster_id AND f.rf = 1
       |WHERE b.rb = 1
       |ORDER BY b.cluster_id""".stripMargin
  }

  /** q83_leakage_safe_split — contamination-safe train/val assignment: the
    * split hashes the CLUSTER, not the doc, so a near-dup family can never
    * straddle train and validation (doc-hash splits leak: a val doc's
    * near-dup in train inflates eval — the q74 cluster is exactly the unit
    * that must move together). side = 'val' when the first nibble of
    * md5("split:" || cluster_id) is 0 (expected 1/16), else 'train' — the
    * q81 nibble convention, deterministic and RNG-free. Cost over q74 is
    * one scan-local hash per row.
    */
  def leakageSafeSplit(spark: SparkSession, sfDir: String): DataFrame =
    leakageSafeSplitOf(Tables.documents(spark, sfDir))

  /** Composable core of q83 for ANY (doc_id, text, …) corpus. */
  def leakageSafeSplitOf(docs: DataFrame): DataFrame = {
    val pairs  = DedupExtras.minhashVerifiedPairsOf(docs).select("a_id", "b_id")
    val labels = connectedComponents(pairs)
    docs.select(col("doc_id"))
      .join(labels, col("doc_id") === col("node"), "left")
      .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("cluster_id"))
      .withColumn("side",
        when(expr("instr('0123456789abcdef', substr(md5(concat('split:', cluster_id)), 1, 1)) - 1") === 0,
          lit("val")).otherwise(lit("train")))
      .select(col("doc_id"), col("cluster_id"), col("side"))
      .orderBy(col("doc_id"))
  }

  val q83OracleSql: String =
    s"""$clusterCtePrefix
       |SELECT doc_id, cluster_id,
       |       CASE WHEN strpos('0123456789abcdef', substring(md5('split:' || cluster_id), 1, 1)) - 1 = 0
       |            THEN 'val' ELSE 'train' END AS side
       |FROM lab
       |ORDER BY doc_id""".stripMargin
}
