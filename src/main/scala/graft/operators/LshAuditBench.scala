package graft.operators

import org.apache.spark.sql.functions._

import graft.{MainSupport, Tables}

/** Stage decomposition of q108 (the round-12 heavy row): candidates
  * (full-corpus banding + sample filter), truth (sample all-pairs), and
  * the metric tail, each timed on a fresh action.
  * Usage: runMain graft.operators.LshAuditBench [sfDir]
  */
object LshAuditBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = MainSupport.localSession()
    val docs = Tables.documents(spark, sfDir)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warmup scan
    docs.count()
    time("full q108")(Audit.lshAuditOf(docs).collect())
    val sampleDocs = docs.filter(col("doc_id") < Audit.AuditSampleIds)
    time("sampleDocs.count")(sampleDocs.count())
    time("shingles")(DedupExtras.shinglesFor(sampleDocs).count())
    time("signatures")(DedupExtras.signaturesOf(DedupExtras.shinglesFor(sampleDocs)).count())
    time("signatures 2nd")(DedupExtras.signaturesOf(DedupExtras.shinglesFor(sampleDocs)).count())
    val shc = DedupExtras.shinglesFor(sampleDocs).cache()
    shc.count()
    time("signatures cached-in")(DedupExtras.signaturesOf(shc).count())
    shc.unpersist()
    time("sigs fastHash")(DedupExtras.signaturesOf(DedupExtras.shinglesFor(sampleDocs), fastHash = true).count())
    time("bandRows")(DedupExtras.bandRowsOf(DedupExtras.signaturesOf(DedupExtras.shinglesFor(sampleDocs))).count())
    time("sample candidates")(DedupExtras.bandCandidatesOf(sampleDocs).count())
    val cand = DedupExtras.bandCandidatesOf(sampleDocs).localCheckpoint(true)
    val shs = DedupExtras.shinglesFor(sampleDocs)
    val truth = time("truth checkpoint")(shs.select(col("doc_id").as("a_id"), col("sh").as("sha"))
      .join(shs.select(col("doc_id").as("b_id"), col("sh").as("shb")), col("a_id") < col("b_id"))
      .filter(round(size(array_intersect(col("sha"), col("shb")))
        / size(array_union(col("sha"), col("shb"))).cast("double"), 6)
        >= DedupExtras.JaccardThreshold)
      .select(col("a_id"), col("b_id"))
      .localCheckpoint(true))
    time("metric tail") {
      val nT = truth.agg(count(lit(1)).as("truth_pairs"))
      val nC = cand.agg(count(lit(1)).as("cand_pairs"))
      val nTp = truth.join(cand, Seq("a_id", "b_id")).agg(count(lit(1)).as("tp"))
      nT.crossJoin(nC).crossJoin(nTp).collect()
    }
    time("bandCandidatesOf alone") {
      DedupExtras.bandCandidatesOf(docs)
        .filter(col("a_id") < Audit.AuditSampleIds && col("b_id") < Audit.AuditSampleIds)
        .count()
    }
    time("truth alone") {
      val sh = DedupExtras.shinglesFor(docs.filter(col("doc_id") < Audit.AuditSampleIds))
      sh.select(col("doc_id").as("a_id"), col("sh").as("sha"))
        .join(sh.select(col("doc_id").as("b_id"), col("sh").as("shb")),
          col("a_id") < col("b_id"))
        .filter(round(size(array_intersect(col("sha"), col("shb")))
          / size(array_union(col("sha"), col("shb"))).cast("double"), 6)
          >= DedupExtras.JaccardThreshold)
        .count()
    }
    spark.stop()
  }
}
