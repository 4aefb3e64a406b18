package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Graph ANN over the persisted index layout — the Spark-shaped rendering
  * of the reference's ACTUAL index algorithm: Qdrant's server-side HNSW
  * (reference: compose.yaml:3 qdrant image; vector_db.py:20-24 cosine
  * collection; search at vector_db_query.py:78-82). A single global HNSW
  * is a pointer-chasing structure no shuffle-based engine should emulate;
  * the distributed form every segment-based vector store uses is the one
  * built here:
  *
  *  - **Per-list navigable-small-world graphs.** Each IVF list (already a
  *    parquet partition directory, bounded in size) gets its own NSW
  *    graph: nodes inserted in deterministic order, each linked to its
  *    `m` nearest among the already-inserted (found by beam search on the
  *    partial graph — Malkov et al.'s NSW construction), edges
  *    undirected, degree pruned to `2m` by cosine. The graph is persisted
  *    SELF-CONTAINED (vector + adjacency per row, `partitionBy(list_id)`)
  *    so a probe reads one layout and joins nothing.
  *  - **Routing + in-partition beam search.** A query routes to its
  *    nprobe nearest centroids exactly like [[IvfIndex.probe]] (same
  *    partition-pruned scan), then runs greedy beam search (width `ef`)
  *    inside each probed list's graph instead of scanning the list: the
  *    visited set is ~ef·degree nodes, SUB-LINEAR in list size — the HNSW
  *    property that matters, recovered per-partition.
  *
  * `ef` is the reference's quality knob (HNSW ef/limit): recall rises
  * monotonically with it, and `ef >= |list|` provably degenerates to the
  * exhaustive per-list scan — which is how q55 runs the ENTIRE graph
  * machinery under the q38 DuckDB oracle (graph traversal must reproduce
  * the exact probe bit-for-bit when the beam covers the list; the
  * sub-linear small-ef regime is spec-tested with recall + visited-node
  * counts, GraphAnnSpec).
  *
  * At 100 TB: graphs build with one `groupByKey(list_id)` pass over the
  * co-located layout (one shuffle; `flatMapGroups` streams ONE list per
  * group, so peak task memory is the single largest list — not the many
  * lists a hash partition would co-locate), and search touches nprobe
  * partitions × ef·degree vectors. Construction cost is O(n·efC·degree)
  * distance evaluations, the standard NSW bill.
  */
object GraphAnn {

  def graphPath(indexDir: String): String = s"$indexDir/graph"
  def graphMetaPath(indexDir: String): String = s"$indexDir/_graph_meta.json"

  /** Record which catalog state the graph was built against — the
    * catalog's per-build nonce AND its version counter — so a probe can
    * fail fast on a STALE graph: an append after [[buildGraphs]] adds
    * points the graph has no nodes for (version mismatch), and a full
    * index REBUILD resets the version counter to 1, which only the
    * buildId can distinguish from "same build, untouched". Silently
    * missing vectors is the worst failure mode a secondary index has;
    * same fail-fast-at-DDL philosophy as [[IvfIndex.IndexMeta]]'s dim
    * guard. Uses [[IvfIndex.writeSmallFileAtomic]] — the one
    * crash-ordering implementation, not a second copy.
    */
  final case class GraphMeta(builtForBuild: Long, builtAtVersion: Long)

  private def writeGraphMeta(spark: SparkSession, indexDir: String, meta: GraphMeta): Unit =
    IvfIndex.writeSmallFileAtomic(spark, graphMetaPath(indexDir),
      s"""{"built_for_build":${meta.builtForBuild},"built_at_version":${meta.builtAtVersion}}""")

  def readGraphMeta(spark: SparkSession, indexDir: String): Option[GraphMeta] =
    IvfIndex.readSmallFile(spark, graphMetaPath(indexDir)).flatMap { txt =>
      for {
        b <- IvfIndex.jsonNum(txt, "built_for_build")
        v <- IvfIndex.jsonNum(txt, "built_at_version")
      } yield GraphMeta(b, v)
    }

  /** True when graphs EXIST for this index but [[probeGraph]]'s freshness
    * guard would reject them: pinned to an older build/version, or their
    * metadata is missing (interrupted [[buildGraphs]]). False when no
    * graphs were ever built (nothing to maintain) or the layout is
    * pre-catalog (no staleness information exists — same as the guard).
    * This is the decision bit [[IvfIndex.maintain]] keys its rebuild on.
    */
  def graphsStale(spark: SparkSession, indexDir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(graphPath(indexDir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) false
    else (readGraphMeta(spark, indexDir), IvfIndex.readMeta(spark, indexDir)) match {
      case (Some(g), Some(m)) =>
        g.builtForBuild != m.buildId || g.builtAtVersion != m.nextVersion
      case (None, Some(_)) => true // graph files without metadata: rebuild
      case _ => false              // pre-catalog layout
    }
  }

  /** A persisted graph node: vector + adjacency, co-located by list. */
  final case class GraphRow(vec_id: Long, embedding: Array[Float],
                            neighbors: Array[Long], list_id: Long)
  // public: Spark's generated (de)serializers construct these reflectively
  final case class PointRow(vec_id: Long, embedding: Array[Float], list_id: Long)
  final case class Hit(qid: Long, probe_list: Long, vec_id: Long, score: Double)

  /** Bit-identical twin of the graft_cosine expression's arithmetic
    * (CosineSimilarity.nullSafeEval): left-to-right double accumulation
    * over exactly-widened floats, 0.0 on zero norm — so JVM-side search
    * scores equal the declared plans' scores to the last bit.
    */
  private[operators] def cosine(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** (score desc, vec_id asc) — the project-wide similarity tie-break. */
  private def better(s1: Double, id1: Long, s2: Double, id2: Long): Boolean =
    s1 > s2 || (s1 == s2 && id1 < id2)

  /** Best-first beam search over one list's graph. Returns the top-`ef`
    * (vec_id, score) by (score desc, vec_id asc) plus the visited-node
    * count (the sub-linearity evidence). Deterministic: candidate and
    * result orderings are total.
    */
  private[operators] def beamSearch(
      vecs: mutable.LongMap[Array[Float]],
      adj: Long => Array[Long],
      entry: Long, qvec: Array[Float], ef: Int): (Array[(Long, Double)], Int) = {
    // (score asc, id desc) natural order: max = best (score desc, id asc)
    implicit val ord: Ordering[(Double, Long)] =
      Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long.reverse)
    val visited = mutable.HashSet[Long](entry)
    val candidates = mutable.PriorityQueue[(Double, Long)]() // best-first
    val results = mutable.TreeSet[(Double, Long)]()          // worst = head
    val eScore = cosine(qvec, vecs(entry))
    candidates.enqueue((eScore, entry))
    results.add((eScore, entry))
    while (candidates.nonEmpty) {
      val (cs, cid) = candidates.dequeue()
      val (ws, wid) = results.head
      if (results.size >= ef && better(ws, wid, cs, cid)) {
        candidates.clear() // best open candidate is worse than the worst kept result
      } else {
        val nbs = adj(cid)
        var i = 0
        while (i < nbs.length) {
          val nb = nbs(i)
          if (visited.add(nb)) {
            val s = cosine(qvec, vecs(nb))
            val (ws2, wid2) = results.head
            if (results.size < ef || better(s, nb, ws2, wid2)) {
              candidates.enqueue((s, nb))
              results.add((s, nb))
              if (results.size > ef) results.remove(results.head)
            }
          }
          i += 1
        }
      }
    }
    (results.toArray.reverse.map { case (s, id) => (id, s) }, visited.size)
  }

  /** NSW insertion build for one list: nodes in vec_id order, each new
    * node linked (undirected) to its `m` nearest among the inserted,
    * found by beam search on the partial graph; degrees pruned to `2m+2`
    * by (cosine desc, vec_id asc) — EXCEPT the insertion-order chain
    * edges (node ↔ its predecessor), which are never pruned. The chain
    * is the connectivity guarantee: similarity pruning alone can sever a
    * region's only path to the entry (the classic graph-ANN
    * disconnection hazard); the always-kept chain makes every node
    * reachable from the entry (min vec_id) regardless of pruning, which
    * is what lets ef >= |list| search provably visit everything (q55's
    * oracle-equality relies on it).
    */
  private def buildListGraph(nodes: Array[PointRow], m: Int, efC: Int): Iterator[GraphRow] = {
    val sorted = nodes.sortBy(_.vec_id)
    val vecs = mutable.LongMap[Array[Float]]()
    val adj  = mutable.LongMap[mutable.ArrayBuffer[Long]]()
    val entry = sorted.head.vec_id
    val chainPrev = mutable.LongMap[Long]()
    val chainNext = mutable.LongMap[Long]()
    var prev = -1L
    sorted.foreach { node =>
      if (vecs.isEmpty) {
        vecs(node.vec_id) = node.embedding
        adj(node.vec_id) = mutable.ArrayBuffer.empty
      } else {
        chainPrev(node.vec_id) = prev
        chainNext(prev) = node.vec_id
        val (near, _) = beamSearch(vecs, id => adj(id).toArray,
          entry, node.embedding, math.max(efC, m))
        val links0 = near.take(m).map(_._1)
        val links  = if (links0.contains(prev)) links0 else links0 :+ prev
        vecs(node.vec_id) = node.embedding
        adj(node.vec_id) = mutable.ArrayBuffer.from(links)
        links.foreach { l =>
          val la = adj(l)
          la += node.vec_id
          if (la.length > 2 * m + 2) {
            // prune by similarity to l, but chain partners are immune
            val chain = Set(chainPrev.getOrElse(l, -1L), chainNext.getOrElse(l, -1L))
            val (keep, rest) = la.toArray.distinct.partition(chain.contains)
            val kept = keep ++ rest
              .map(id => (id, cosine(vecs(l), vecs(id))))
              .sortBy { case (id, s) => (-s, id) }
              .take(2 * m).map(_._1)
            adj(l) = mutable.ArrayBuffer.from(kept)
          }
        }
      }
      prev = node.vec_id
    }
    sorted.iterator.map(n =>
      GraphRow(n.vec_id, n.embedding, adj(n.vec_id).toArray.distinct.sorted, n.list_id))
  }

  /** Build per-list NSW graphs over the index's current last-writer-wins
    * view and persist them beside the layout. Deterministic for a fixed
    * layout. Re-run after appends/compaction, like any secondary index
    * rebuild.
    */
  def buildGraphs(spark: SparkSession, indexDir: String, m: Int = 8, efConstruction: Int = 32): Unit = {
    implicit val enc = Encoders.product[GraphRow]
    implicit val encP = Encoders.product[PointRow]
    implicit val encK = Encoders.scalaLong
    // catalog snapshot BEFORE reading points (pessimistic stamp): an
    // append landing mid-build bumps the counter past this value, so the
    // probe guard fails safe instead of blessing a graph that silently
    // misses the concurrently-appended rows
    val catalogAtStart = IvfIndex.readMeta(spark, indexDir)
    val points = IvfIndex.latestPointsFor(spark, indexDir,
      spark.read.parquet(IvfIndex.pointsPath(indexDir)))
      .select(col("vec_id"), col("embedding"), col("list_id")).as[PointRow]
    // groupByKey, NOT repartition(list_id)+mapPartitions: hash
    // partitioning co-locates MANY lists per shuffle partition, and a
    // whole-partition toArray would hold all of them at once. flatMapGroups
    // streams one group at a time, so peak task memory is the single
    // largest list — the bound the 100 TB story needs.
    points
      .groupByKey(_.list_id)
      .flatMapGroups { (_: Long, nodes: Iterator[PointRow]) =>
        buildListGraph(nodes.toArray, m, efConstruction)
      }
      .write.mode("overwrite").partitionBy("list_id").parquet(graphPath(indexDir))
    // pre-catalog layouts stamp (0, 1), matching a missing catalog
    writeGraphMeta(spark, indexDir,
      GraphMeta(catalogAtStart.map(_.buildId).getOrElse(0L),
        catalogAtStart.map(_.nextVersion).getOrElse(1L)))
  }

  /** Staleness guard shared by both probe variants: a graph built before
    * the latest append (version mismatch) OR against a different build of
    * the index (buildId mismatch — a rebuild resets the version counter,
    * so the counter alone cannot catch it) would silently drop vectors
    * from every result. Both mismatch directions fail; graph files
    * without metadata (a crashed buildGraphs) fail too, not fall through.
    */
  private def requireFreshGraph(spark: SparkSession, indexDir: String): Unit =
    (readGraphMeta(spark, indexDir), IvfIndex.readMeta(spark, indexDir)) match {
      case (Some(g), Some(meta)) =>
        require(g.builtForBuild == meta.buildId && g.builtAtVersion == meta.nextVersion,
          s"graph index at ${graphPath(indexDir)} is stale (built for build ${g.builtForBuild} " +
            s"version ${g.builtAtVersion}; catalog is build ${meta.buildId} version " +
            s"${meta.nextVersion}) — re-run GraphAnn.buildGraphs after append/compact/rebuild")
      case (None, Some(_)) =>
        throw new IllegalStateException(
          s"graph index at ${graphPath(indexDir)} has no ${graphMetaPath(indexDir)} " +
            "(interrupted buildGraphs?) — re-run GraphAnn.buildGraphs")
      case _ => () // pre-catalog layouts: no staleness information exists
    }

  /** Probe via graph traversal: route queries to their nprobe nearest
    * lists (the SAME routing as [[IvfIndex.probe]] — one implementation,
    * identical tie-breaks), read ONLY the probed lists' graph partitions,
    * beam-search each query inside each routed list, then rank the
    * candidates with the probe's own bounded-heap top-k + final window.
    * Output schema == [[IvfIndex.probe]]: (qid, probe_list, vec_id,
    * score, rank). This is the INTERACTIVE path: the query batch (qid +
    * vectors) is collected and broadcast, which a driver can afford at
    * query scale but not corpus scale — whole-corpus callers use
    * [[probeGraphBatch]].
    *
    * @param ef beam width, the recall knob; ef >= |list| degenerates to
    *           the exhaustive per-list scan (== IvfIndex.probe output)
    * @param visitedNodes optional accumulator recording how many graph
    *                     nodes every beam search touched in total — the
    *                     sub-linearity measurement
    */
  def probeGraph(spark: SparkSession, indexDir: String, queries: DataFrame,
                 k: Int = 3, nprobe: Int = 1, ef: Int = 32,
                 visitedNodes: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    implicit val encG = Encoders.product[GraphRow]
    implicit val encH = Encoders.product[Hit]
    requireFreshGraph(spark, indexDir)
    val routed = IvfIndex.route(spark, indexDir, queries, nprobe).localCheckpoint(true)
    // query batch to the driver — |queries| × nprobe rows, the same
    // query-scale routing decision every probe variant collects; the
    // probed-list IN-list falls out of the same collect
    val qByList: Map[Long, Array[(Long, Array[Float])]] = routed
      .select(col("probe_list"), col("qid"), col("qvec"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getSeq[Float](2).toArray)))
      .groupBy(_._1).map { case (l, a) => (l, a.map(_._2).sortBy(_._1)) }
    val lists = qByList.keys.toSeq.sorted
    val bcQ = spark.sparkContext.broadcast(qByList)

    implicit val encK = Encoders.scalaLong
    // groupByKey streams ONE list's rows per group (peak task memory = the
    // largest single list), instead of a repartition(list_id) whose hash
    // partitioning would co-locate many lists into one whole-partition
    // toArray
    val hits = spark.read.parquet(graphPath(indexDir))
      .filter(col("list_id").isin(lists: _*)) // partition-pruned scan
      .select(col("vec_id"), col("embedding"), col("neighbors"), col("list_id"))
      .as[GraphRow]
      .groupByKey(_.list_id)
      .flatMapGroups { (listId: Long, it: Iterator[GraphRow]) =>
        val qs = bcQ.value.getOrElse(listId, Array.empty)
        if (qs.isEmpty) Iterator.empty
        else {
          val rows = it.toArray
          val vecs = mutable.LongMap.from(rows.iterator.map(r => (r.vec_id, r.embedding)))
          val adj  = mutable.LongMap.from(rows.iterator.map(r => (r.vec_id, r.neighbors)))
          val entry = rows.iterator.map(_.vec_id).min
          qs.iterator.flatMap { case (qid, qvec) =>
            val (top, visited) = beamSearch(vecs, adj, entry, qvec, math.min(ef, rows.length))
            visitedNodes.foreach(_.add(visited.toLong))
            top.iterator.map { case (id, s) => Hit(qid, listId, id, s) }
          }
        }
      }
      .toDF()
    // THE presentation path — IvfIndex.rankTopK, shared with the scan and
    // filtered probes, so rounding/tie-breaks cannot drift between them
    IvfIndex.rankTopK(
      hits.select(col("qid"), col("probe_list"), col("vec_id"),
        round(col("score"), 6).as("score")),
      k)
  }

  // public: Spark's generated (de)serializers construct these reflectively
  final case class RoutedQuery(qid: Long, qvec: Array[Float], probe_list: Long)

  /** Batch-scale graph probe: identical semantics to [[probeGraph]] but the
    * query batch NEVER lands on the driver — routing stays a distributed
    * join ([[IvfIndex.route]]'s output), and each probed list's graph is
    * cogrouped with the queries routed to it, so a dedup-style
    * "probe with the whole corpus" call is bounded by (largest list +
    * its routed queries) per task instead of |corpus| driver memory.
    * [[probeGraph]] remains the interactive path (few queries, one
    * broadcast, no query shuffle); this is the whole-corpus path. Only the
    * probed-list id set (bounded by nlist, list-scale like every probe
    * variant's IN-list) is collected for partition pruning.
    *
    * Equivalence with [[probeGraph]] on the same inputs is spec-tested
    * (GraphAnnSpec) — same staleness guard, same beam search, same
    * presentation tail.
    */
  def probeGraphBatch(spark: SparkSession, indexDir: String, queries: DataFrame,
                      k: Int = 3, nprobe: Int = 1, ef: Int = 32,
                      visitedNodes: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    implicit val encG = Encoders.product[GraphRow]
    implicit val encR = Encoders.product[RoutedQuery]
    implicit val encH = Encoders.product[Hit]
    implicit val encK = Encoders.scalaLong
    requireFreshGraph(spark, indexDir)
    val routed = IvfIndex.route(spark, indexDir, queries, nprobe).localCheckpoint(true)
    // list-scale (<= nlist) — the partition-pruning IN-list, NOT the queries
    val lists = routed.select(col("probe_list")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq

    val graphRows = spark.read.parquet(graphPath(indexDir))
      .filter(col("list_id").isin(lists: _*)) // partition-pruned scan
      .select(col("vec_id"), col("embedding"), col("neighbors"), col("list_id"))
      .as[GraphRow]
      .groupByKey(_.list_id)
    val routedQs = routed
      .select(col("qid"), col("qvec"), col("probe_list"))
      .as[RoutedQuery]
      .groupByKey(_.probe_list)
    val hits = graphRows.cogroup(routedQs) { (listId, gIt, qIt) =>
      val qs = qIt.toArray
      if (qs.isEmpty) Iterator.empty
      else {
        val rows = gIt.toArray
        if (rows.isEmpty) Iterator.empty
        else {
          val vecs = mutable.LongMap.from(rows.iterator.map(r => (r.vec_id, r.embedding)))
          val adj  = mutable.LongMap.from(rows.iterator.map(r => (r.vec_id, r.neighbors)))
          val entry = rows.iterator.map(_.vec_id).min
          // qid order for determinism of accumulator traces; output order
          // is re-established by rankTopK regardless
          qs.sortBy(_.qid).iterator.flatMap { q =>
            val (top, visited) = beamSearch(vecs, adj, entry, q.qvec, math.min(ef, rows.length))
            visitedNodes.foreach(_.add(visited.toLong))
            top.iterator.map { case (id, s) => Hit(q.qid, listId, id, s) }
          }
        }
      }
    }.toDF()
    IvfIndex.rankTopK(
      hits.select(col("qid"), col("probe_list"), col("vec_id"),
        round(col("score"), 6).as("score")),
      k)
  }

  /** q55_graph_ann_probe — the whole graph machinery under the DuckDB
    * oracle: build the index, build the per-list graphs, probe through
    * BEAM SEARCH with `ef` covering every list, which provably reduces to
    * the exhaustive per-list scan — so the oracle is exactly q38's. A
    * hash match proves construction (connectivity included: an
    * unreachable node would drop a row), persistence, routing, traversal
    * and ranking reproduce the index-free computation bit-for-bit. The
    * approximate small-ef regime is spec-tested (GraphAnnSpec: recall@5
    * vs ef, visited ≪ list size).
    */
  def graphAnnProbe(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val indexDir = java.nio.file.Files.createTempDirectory("graft_graph_ann").toString
    IvfIndex.build(spark, emb, indexDir)
    buildGraphs(spark, indexDir, m = 8, efConstruction = 32)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    probeGraph(spark, indexDir, queries, k = 3, nprobe = 1, ef = Int.MaxValue)
  }

  val q55OracleSql: String = IvfIndex.q38OracleSql
}
