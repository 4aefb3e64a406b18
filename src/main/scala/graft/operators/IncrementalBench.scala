package graft.operators

import org.apache.spark.sql.functions.col

/** Measures q80's amortization claim (`runMain graft.operators
  * .IncrementalBench <sfDir>`): for a small batch (2% of the corpus —
  * the incremental-crawl regime), the inline path re-pays the store
  * fingerprint + shingle + band build EVERY batch, while the artifact
  * path pays it once (`buildStoreArtifacts`) and then only probes.
  * Evidence for BASELINE.md.
  */
object IncrementalBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.MainSupport.localSession()
    import graft.MainSupport.timed
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val store = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    val batch = Incremental.batchOf(store).filter(col("doc_id") % 100 < 2)
    val nBatch = batch.count()
    // warmup: JVM/codegen/parquet footers
    force(Incremental.incrementalDedupOf(batch.limit(100), store.limit(1000)))

    val inline = timed(force(Incremental.incrementalDedupOf(batch, store)))
    val dir = java.nio.file.Files.createTempDirectory("graft_inc_art").toString
    val build = timed(Incremental.buildStoreArtifacts(store, dir))
    val probe = timed(force(Incremental.incrementalDedupAgainstArtifacts(batch, dir)))
    println(f"[incremental] dir=$sfDir batch=$nBatch inline=$inline%.1fs " +
      f"artifact_build=$build%.1fs artifact_probe=$probe%.1fs")
    spark.stop()
  }
}
