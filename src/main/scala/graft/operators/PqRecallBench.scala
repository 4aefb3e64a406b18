package graft.operators

import org.apache.spark.sql.functions._

/** Measurement harness for the IVFPQ compression/recall trade at REAL list
  * sizes (VERDICT r5 item 8): PqSpec's recall floor runs at sf0.001, where
  * a 50-row shortlist nearly covers every list — the knob looks free. This
  * main measures recall@5 of the ADC-shortlisted probe against the
  * UNCOMPRESSED probe of the same index (same routing, same probed lists —
  * isolating the PQ loss from the routing loss q64 audits) across a
  * shortlist ladder, at whatever scale `sfDir` holds. Results are recorded
  * in BASELINE.md ("IVFPQ shortlist × recall@5").
  *
  * Usage: runMain graft.operators.PqRecallBench <sfDir> [shortlists=5,10,25,50,100,200]
  */
object PqRecallBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val shortlists =
      if (args.length > 1) args(1).split(",").map(_.trim.toInt).toSeq
      else Seq(5, 10, 25, 50, 100, 200)
    val spark = graft.MainSupport.localSession()
    import spark.implicits._
    import graft.MainSupport.timed

    val emb = graft.Tables.embeddings(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_recall").toString
    val buildSec = timed(IvfIndex.build(spark, emb, dir))
    val cb = Pq.lifecycleTrain(spark, emb)
    val codesSec = timed(Pq.buildCodes(spark, dir, cb))
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      .localCheckpoint(true)

    val k = 5
    // ground truth: the uncompressed probe — same index, same routing
    val exact = IvfIndex.probe(spark, dir, queries, k = k, nprobe = 1)
      .select($"qid", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val covering = Pq.coveringShortlist(spark, dir)
    println(f"[pqrecall] sf=$sfDir n=${emb.count()} build=$buildSec%.1fs codes=$codesSec%.1fs " +
      f"covering_shortlist=$covering")
    (shortlists :+ covering).distinct.sorted.foreach { s =>
      val t0 = System.nanoTime()
      val got = Pq.probeCompressed(spark, dir, cb, queries, k = k, nprobe = 1, shortlist = s)
        .select($"qid", $"vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = exact.map { case (q, ids) =>
        (ids & got.getOrElse(q, Set.empty)).size.toDouble / ids.size
      }.sum / exact.size
      println(f"[pqrecall] shortlist=$s%6d recall@5=$recall%.3f probe=$sec%.2fs")
    }
    spark.stop()
  }
}
