package graft.operators

import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Measurement harness for the graph-ANN ENTRY-POINT question (VERDICT r4
  * item 8): before building HNSW-style layer hierarchies, measure what the
  * current single-layer NSW actually pays for its arbitrary entry point
  * (min vec_id) at realistic list sizes, against the cheap alternative —
  * a MEDOID entry (the node nearest the list's mean vector, computable in
  * one pass at build time).
  *
  * For each routed (query, list) pair the harness runs the SAME
  * [[GraphAnn.beamSearch]] from both entries at several beam widths and
  * reports average visited nodes + recall@3 vs the exhaustive per-list
  * scan. The decision (recorded in BASELINE.md) follows the data: a layer
  * hierarchy only pays when beam search spends most of its visits
  * TRAVELING to the target region — which a medoid entry also fixes, at
  * the cost of one extra field in the graph layout rather than a
  * multi-layer structure.
  *
  * Usage: runMain graft.operators.GraphEntryBench [sfDir] [ef,ef,...]
  */
object GraphEntryBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val efs   = args.drop(1).headOption.map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(8, 16, 32))
    val spark = graft.MainSupport.localSession()

    val emb = graft.Tables.embeddings(spark, sfDir)
    val indexDir = java.nio.file.Files.createTempDirectory("graft_entry_bench").toString
    println(s"[entrybench] building index + graphs over $sfDir ...")
    IvfIndex.build(spark, emb, indexDir)
    val t0 = System.nanoTime()
    GraphAnn.buildGraphs(spark, indexDir, m = 8, efConstruction = 32)
    println(f"[entrybench] graph construction: ${(System.nanoTime() - t0) / 1e9}%.1f s")

    val queries = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val routed = IvfIndex.route(spark, indexDir, queries, nprobe = 1)
      .select(col("probe_list"), col("qid"), col("qvec")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2).toArray))
      .groupBy(_._1)

    // per (entry strategy, ef): (visited sum, recall sum, n)
    val acc = mutable.Map.empty[(String, Int), (Long, Double, Int)]
    var listSizes = Vector.empty[Int]
    routed.foreach { case (listId, qs) =>
      val rows = spark.read.parquet(GraphAnn.graphPath(indexDir))
        .filter(col("list_id") === listId)
        .select(col("vec_id"), col("embedding"), col("neighbors"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getSeq[Long](2).toArray))
      listSizes :+= rows.length
      val vecs = mutable.LongMap.from(rows.iterator.map(r => (r._1, r._2)))
      val adj  = mutable.LongMap.from(rows.iterator.map(r => (r._1, r._3)))
      val minEntry = rows.iterator.map(_._1).min
      // medoid: node nearest the list mean (one pass, build-time cheap)
      val dim = rows.head._2.length
      val mean = new Array[Float](dim)
      rows.foreach(r => { var i = 0; while (i < dim) { mean(i) += r._2(i); i += 1 } })
      var mi = 0
      while (mi < dim) { mean(mi) /= rows.length; mi += 1 }
      val medoid = rows.maxBy(r => GraphAnn.cosine(mean, r._2))._1

      qs.foreach { case (_, qid, qvec) =>
        // exhaustive per-list top-3 = the recall target
        val exact = rows.map(r => (r._1, GraphAnn.cosine(qvec, r._2)))
          .sortBy { case (id, s) => (-s, id) }.take(3).map(_._1).toSet
        for (ef <- efs; (name, entry) <- Seq("min_id" -> minEntry, "medoid" -> medoid)) {
          val (top, visited) = GraphAnn.beamSearch(vecs, adj, entry, qvec, ef)
          val got = top.take(3).map(_._1).toSet
          val recall = (exact & got).size.toDouble / exact.size
          val (v0, r0, n0) = acc.getOrElse((name, ef), (0L, 0.0, 0))
          acc((name, ef)) = (v0 + visited, r0 + recall, n0 + 1)
        }
      }
    }

    println(f"[entrybench] probed lists: ${routed.size}, sizes ${listSizes.min}..${listSizes.max} " +
      f"(avg ${listSizes.sum.toDouble / listSizes.size}%.0f), queries ${routed.valuesIterator.map(_.length).sum}")
    println(f"${"entry"}%-8s ${"ef"}%4s ${"avg_visited"}%12s ${"recall@3"}%9s")
    for (ef <- efs; name <- Seq("min_id", "medoid")) {
      val (v, r, n) = acc((name, ef))
      println(f"$name%-8s $ef%4d ${v.toDouble / n}%12.1f ${r / n}%9.3f")
    }
    spark.stop()
  }
}
