package graft.operators

/** Measures q92's boundary-placement alternatives (`runMain
  * graft.operators.CurationBoundaryBench <sfDir> [samples]`): full
  * boundaries with the survivors cache (round-10 post-record shape), the
  * declared form without it, and the whole chain as one lazy plan.
  * Round-11 medians — sf0.1: 8.6 / 9.5 / 20.9 s; sf1: 50.4 / 21.1 /
  * 27.6 s. Reading: the fuzzy/decon boundaries pay everywhere (lazy
  * recomputes the sentence machinery per consumer — ReusedExchange covers
  * identical shuffle subtrees, not their post-shuffle tails), while the
  * survivors cache is a text-bearing corpus-scale frame whose storage
  * cost grows linearly and overtakes its saved recompute by sf1. Evidence
  * behind the BASELINE.md round-11 boundary study.
  */
object CurationBoundaryBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val samples = if (args.length > 1) args(1).toInt else 3
    // optional arm filter: at big scale factors the arms bias each other
    // (each warms the JIT for the next), so a fair comparison runs each
    // arm in its OWN identically-warmed JVM
    val onlyArm = if (args.length > 2) Some(args(2)) else None
    val spark = graft.MainSupport.localSession()
    import graft.MainSupport.timed
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    force(Curation.curationPipelineOf(docs.limit(2000))) // warmup
    spark.catalog.clearCache()
    def run(label: String, mk: () => org.apache.spark.sql.DataFrame): Unit =
      if (onlyArm.forall(_ == label)) {
      val times = (1 to samples).map { _ =>
        val t = timed(force(mk()))
        spark.catalog.clearCache(); t
      }.sorted
      // all samples printed: the per-sample spread IS part of the evidence
      // (JIT/codegen warmin and AQE re-plans show up as a fat first sample).
      // The headline is graft.Bench's true median (two middles averaged on
      // even n — ADVICE r11: the upper-middle alone biased even-n runs).
      println(f"""{"curation_variant":"$label","sec":${graft.Bench.median(times)}%.3f,""" +
        s""""samples":[${times.map(t => f"$t%.3f").mkString(",")}]}""")
      }
    run("boundaries_surv_cache", () => Curation.curationCheckpointedOf(docs))
    run("declared_no_surv_cache", () => Curation.curationPipelineOf(docs))
    run("lazy_one_plan", () => Curation.curationPlanOf(docs))
    spark.stop()
  }
}
