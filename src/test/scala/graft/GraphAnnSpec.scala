package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{GraphAnn, IvfIndex}

/** Graph ANN (per-list NSW + beam search) — the reference's HNSW-shaped
  * index path. The exhaustive-ef regime is oracle-checked as q55; these
  * specs cover what an oracle can't: the approximate small-ef regime
  * (recall monotone in ef), the sub-linearity (visited nodes ≪ list
  * size), determinism, and the layout contract.
  */
class GraphAnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val indexDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft_graph_spec").toString
    IvfIndex.build(spark, Tables.embeddings(spark, TestSpark.Sf0001), dir)
    GraphAnn.buildGraphs(spark, dir, m = 8, efConstruction = 32)
    dir
  }

  private def queries = Tables.embeddings(spark, TestSpark.Sf0001)
    .filter(col("vec_id") < 20)
    .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  test("graph layout is self-contained, list-partitioned, and every point has a node") {
    val g = spark.read.parquet(GraphAnn.graphPath(indexDir))
    val points = spark.read.parquet(IvfIndex.pointsPath(indexDir))
    assert(g.count() == points.count())
    assert(g.columns.toSet == Set("vec_id", "embedding", "neighbors", "list_id"))
    val dirs = new java.io.File(GraphAnn.graphPath(indexDir))
      .listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("list_id=")))
    // no dangling edges: every neighbor id is a node of the SAME list
    import spark.implicits._
    val bad = g.select(col("list_id"), explode(col("neighbors")).as("nb"))
      .join(g.select(col("list_id"), col("vec_id").as("nb")), Seq("list_id", "nb"), "left_anti")
    assert(bad.count() == 0, "every adjacency edge must point at a node in the same list")
  }

  test("graph probe scan is partition-pruned to the probed lists") {
    val p = GraphAnn.probeGraph(spark, indexDir, queries, k = 3, nprobe = 1, ef = 8)
      .queryExecution.executedPlan.toString
    // list_id must appear INSIDE a non-empty PartitionFilters bracket —
    // FileScan always prints the (possibly empty) key, so a substring
    // check on the key name alone would pass even with pruning regressed
    assert("""PartitionFilters: \[[^\]]*list_id""".r.findFirstIn(p).isDefined,
      s"the graph scan must prune to the routed lists' partitions;\n$p")
  }

  test("exhaustive ef reduces beam search to the exact probe (q55's oracle-equality property)") {
    import spark.implicits._
    val viaGraph = GraphAnn.probeGraph(spark, indexDir, queries, k = 3, nprobe = 1, ef = Int.MaxValue)
      .select($"qid", $"probe_list", $"vec_id", $"score", $"rank")
      .collect().map(_.toSeq).toSeq
    val viaScan = IvfIndex.probe(spark, indexDir, queries, k = 3, nprobe = 1)
      .select($"qid", $"probe_list", $"vec_id", $"score", $"rank")
      .collect().map(_.toSeq).toSeq
    assert(viaGraph == viaScan && viaGraph.nonEmpty,
      "a beam covering the list must reproduce the exhaustive scan bit-for-bit")
  }

  test("recall@3 rises monotonically with ef; search visits FAR fewer nodes than the scan reads") {
    import spark.implicits._
    val exact = IvfIndex.probe(spark, indexDir, queries, k = 3, nprobe = 1)
      .select($"qid", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val listSizes = spark.read.parquet(IvfIndex.pointsPath(indexDir))
      .groupBy("list_id").count().select(max("count")).head().getLong(0)

    def run(ef: Int): (Double, Long) = {
      val acc = spark.sparkContext.longAccumulator(s"visited_ef$ef")
      val got = GraphAnn.probeGraph(spark, indexDir, queries, k = 3, nprobe = 1, ef = ef,
        visitedNodes = Some(acc))
        .select($"qid", $"vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val recall = exact.map { case (q, ids) =>
        (ids & got.getOrElse(q, Set.empty)).size.toDouble / ids.size
      }.sum / exact.size
      (recall, acc.value / exact.size) // avg visited per query
    }

    val curve = Seq(2, 8, 32).map(ef => ef -> run(ef))
    info("recall@3 / avg visited per query vs ef (sf0.001): " + curve.map {
      case (ef, (r, v)) => f"ef=$ef%d: ${math.rint(r * 100) / 100}%.2f ($v%d nodes)"
    }.mkString(", "))
    assert(curve.sliding(2).forall { case Seq((_, (a, _)), (_, (b, _))) => b >= a - 1e-12 },
      s"recall must not decrease as ef grows: $curve")
    val (r32, v32) = curve.last._2
    assert(r32 >= 0.9, s"ef=32 must recover >=0.9 of the exact per-list top-3, got $r32")
    assert(v32 < listSizes, s"beam search must visit fewer nodes than the largest list ($v32 vs $listSizes)")
  }

  test("sub-linearity at real list sizes (sf0.1): beam visits a small fraction of each list") {
    import spark.implicits._
    val sf01 = "/root/testdata/sf0.1"
    val dir = java.nio.file.Files.createTempDirectory("graft_graph_sf01").toString
    IvfIndex.build(spark, Tables.embeddings(spark, sf01), dir)
    GraphAnn.buildGraphs(spark, dir, m = 8, efConstruction = 32)
    val qs = Tables.embeddings(spark, sf01).filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val avgList = spark.read.parquet(IvfIndex.pointsPath(dir))
      .groupBy("list_id").count().agg(avg("count")).head().getDouble(0)
    val acc = spark.sparkContext.longAccumulator("visited_sf01")
    val exact = IvfIndex.probe(spark, dir, qs, k = 3, nprobe = 1)
      .select($"qid", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = GraphAnn.probeGraph(spark, dir, qs, k = 3, nprobe = 1, ef = 8, Some(acc))
      .select($"qid", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = exact.map { case (q, ids) =>
      (ids & got.getOrElse(q, Set.empty)).size.toDouble / ids.size }.sum / exact.size
    val avgVisited = acc.value.toDouble / exact.size
    info(f"sf0.1 lists avg $avgList%.0f nodes; ef=8 visits $avgVisited%.0f/query at recall@3 $recall%.2f")
    assert(avgVisited < avgList / 2,
      s"beam must visit well under a list's nodes (visited $avgVisited vs list $avgList)")
    assert(recall >= 0.8, s"ef=8 recall@3 must hold up at real list sizes, got $recall")
  }

  test("graph build and search are deterministic") {
    import spark.implicits._
    val dir2 = java.nio.file.Files.createTempDirectory("graft_graph_det").toString
    IvfIndex.build(spark, Tables.embeddings(spark, TestSpark.Sf0001), dir2)
    GraphAnn.buildGraphs(spark, dir2, m = 8, efConstruction = 32)
    def adjacency(d: String) = spark.read.parquet(GraphAnn.graphPath(d))
      .select($"vec_id", $"neighbors").as[(Long, Seq[Long])].collect().toMap
    assert(adjacency(indexDir) == adjacency(dir2), "same layout must build the same graph")
    val a = GraphAnn.probeGraph(spark, indexDir, queries, k = 3, nprobe = 1, ef = 8).collect().toSeq
    val b = GraphAnn.probeGraph(spark, indexDir, queries, k = 3, nprobe = 1, ef = 8).collect().toSeq
    assert(a.map(_.toSeq) == b.map(_.toSeq))
  }

  test("probing a stale graph fails fast after an append; rebuild clears it") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_graph_stale").toString
    val emb = Tables.embeddings(spark, TestSpark.Sf0001)
    IvfIndex.build(spark, emb, dir)
    GraphAnn.buildGraphs(spark, dir, m = 8, efConstruction = 32)
    val qs = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    GraphAnn.probeGraph(spark, dir, qs, k = 3, nprobe = 1, ef = 8).collect() // fresh: fine

    IvfIndex.append(spark, emb.filter(col("vec_id") === 0), dir) // graph now misses v1
    val e = intercept[IllegalArgumentException] {
      GraphAnn.probeGraph(spark, dir, qs, k = 3, nprobe = 1, ef = 8).collect()
    }
    assert(e.getMessage.contains("stale"), s"must name the staleness: ${e.getMessage}")

    GraphAnn.buildGraphs(spark, dir, m = 8, efConstruction = 32) // rebuild over LWW view
    val r = GraphAnn.probeGraph(spark, dir, qs, k = 3, nprobe = 1, ef = 8)
    assert(r.count() > 0)
    assert(r.groupBy("qid", "vec_id").count().filter(col("count") > 1).count() == 0,
      "rebuilt graph reflects last-writer-wins: no duplicate ids")

    // a full INDEX rebuild resets the version counter to 1 — only the
    // catalog's per-build nonce can expose the graph as stale
    IvfIndex.build(spark, emb, dir)
    val e2 = intercept[IllegalArgumentException] {
      GraphAnn.probeGraph(spark, dir, qs, k = 3, nprobe = 1, ef = 8).collect()
    }
    assert(e2.getMessage.contains("stale"),
      s"a rebuilt index must invalidate the old graph: ${e2.getMessage}")
  }

  test("multiprobe graph search widens like the scan probe") {
    val n1 = GraphAnn.probeGraph(spark, indexDir, queries, k = 5, nprobe = 1, ef = 32)
    val n2 = GraphAnn.probeGraph(spark, indexDir, queries, k = 5, nprobe = 2, ef = 32)
    assert(n2.select("probe_list").distinct().count() >= n1.select("probe_list").distinct().count())
    assert(n2.count() >= n1.count())
  }

  test("probeGraphBatch (cogrouped, no driver query batch) equals probeGraph row-for-row") {
    // equality must hold in the APPROXIMATE regime too — both paths run
    // the same beam search from the same entry, so small-ef results agree
    // exactly, not just the exhaustive reduction
    for ((ef, nprobe) <- Seq((8, 1), (8, 2), (Int.MaxValue, 1))) {
      val interactive = GraphAnn.probeGraph(spark, indexDir, queries, k = 3, nprobe = nprobe, ef = ef)
        .collect().map(_.toSeq).toSeq
      val batch = GraphAnn.probeGraphBatch(spark, indexDir, queries, k = 3, nprobe = nprobe, ef = ef)
        .collect().map(_.toSeq).toSeq
      assert(batch == interactive && batch.nonEmpty,
        s"batch probe must match the interactive probe at ef=$ef nprobe=$nprobe")
    }
  }

  test("probeGraphBatch prunes the graph scan to the probed lists") {
    val p = GraphAnn.probeGraphBatch(spark, indexDir, queries, k = 3, nprobe = 1, ef = 8)
      .queryExecution.executedPlan.toString
    assert("""PartitionFilters: \[[^\]]*list_id""".r.findFirstIn(p).isDefined,
      s"the batch graph scan must prune to the routed lists' partitions;\n$p")
    // the whole-corpus path must never collect query VECTORS: the only
    // collected object is the probed-list id array (bounded by nlist)
    assert(!p.contains("BroadcastNestedLoop"),
      s"batch probe routes via join, not a broadcasted query batch;\n$p")
  }
}
