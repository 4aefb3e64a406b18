package graft.operators

import org.apache.spark.sql.functions.col

/** Per-STAGE wall-clock attribution for q92 (`runMain
  * graft.operators.CurationStageBench <sfDir> [samples]`) — the
  * boundary bench ([[CurationBoundaryBench]]) compares whole-chain
  * variants; this one times each stage in isolation so an optimization
  * round knows WHERE the declared row's seconds go:
  *
  *   1. survivors  — clean + exact dedup (stages 1–2, the q85/q15 cores)
  *   2. fuzzy      — [[TextAnalysis.fuzzySentenceDedupOf]] over the
  *                   stage-2 survivors (materializes internally)
  *   3. decon      — rebuilt-join + q60 gram join over the fuzzy output
  *   4. selectpack — q79 percentile selection + q69 pack plan
  *
  * Stages compose exactly like [[Curation.curationCheckpointedOf]] with
  * `cacheSurvivors = false` (the declared arm); each stage's input is
  * localCheckpoint'ed FIRST so a stage's number is its own cost, not its
  * upstream's recompute.
  */
object CurationStageBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val samples = if (args.length > 1) args(1).toInt else 3
    val spark = graft.MainSupport.localSession()
    import graft.MainSupport.timed
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    force(Curation.curationPipelineOf(docs.limit(2000))) // warmup
    spark.catalog.clearCache()

    def run(label: String)(mk: () => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to samples).map { _ =>
        val t = timed(force(mk()))
        spark.catalog.clearCache(); t
      }.sorted
      println(f"""{"curation_stage":"$label","sec":${graft.Bench.median(times)}%.3f,""" +
        s""""samples":[${times.map(t => f"$t%.3f").mkString(",")}]}""")
    }

    // pinned stage INPUTS (materialized once, outside any timed region)
    val survivors = Curation.dedupedClean(docs).localCheckpoint(true)
    // lang lookup joins the RAW docs like the round-17 production
    // composition (ADVICE r17: rows are identical either way, but the
    // stage attribution promises the declared arm's exact shape)
    val rebuilt = TextAnalysis.fuzzySentenceDedupOf(survivors)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("cleaned").as("text"))
      .localCheckpoint(true)
    val decon = Curation.deconOf(docs, rebuilt).localCheckpoint(true)

    run("survivors")(() => Curation.dedupedClean(docs))
    run("fuzzy")(() => TextAnalysis.fuzzySentenceDedupOf(survivors))
    run("decon")(() => Curation.deconOf(docs, rebuilt))
    run("selectpack")(() => Curation.selectAndPack(decon))
    run("declared_whole")(() => Curation.curationPipelineOf(docs))
    spark.stop()
  }
}
