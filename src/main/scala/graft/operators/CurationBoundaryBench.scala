package graft.operators

/** Measures what q92's stage-boundary materialization (survivors cache +
  * decon cache + final localCheckpoint) costs or saves vs the same chain
  * as ONE lazy plan (`runMain graft.operators.CurationBoundaryBench
  * <sfDir> [samples]`): the boundaries model a production run's parquet
  * checkpoints and pay for themselves when the shared stages (the exact-
  * dedup fingerprint shuffle, the decontaminated frame) are each consumed
  * several times — but the cached frames carry full document TEXT, so at
  * larger scale factors the storage/serialization cost of the boundary
  * itself grows linearly while the recompute it avoids may be cheaper
  * scan-local work. This main produces the evidence at any sfDir.
  */
object CurationBoundaryBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val samples = if (args.length > 1) args(1).toInt else 3
    val spark = graft.MainSupport.localSession()
    import graft.MainSupport.timed
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    force(Curation.curationPipelineOf(docs.limit(2000))) // warmup
    spark.catalog.clearCache()
    def run(label: String, mk: () => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to samples).map { _ =>
        val t = timed(force(mk()))
        spark.catalog.clearCache(); t
      }.sorted
      println(f"""{"curation_variant":"$label","sec":${times(times.length / 2)}%.3f}""")
    }
    run("boundaries", () => Curation.curationPipelineOf(docs))
    run("lazy_one_plan", () => Curation.curationPlanOf(docs))
    spark.stop()
  }
}
