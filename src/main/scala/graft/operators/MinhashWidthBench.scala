package graft.operators

/** Measures the MinHash signature-width runtime ladder (`runMain
  * graft.operators.MinhashWidthBench <sfDir> [samples]`): the full
  * verified-pair pipeline ([[DedupExtras.minhashVerifiedPairsOf]]) at the
  * declared 8/4 width and the production-class widths up to 128/32 —
  * the evidence for BASELINE.md on what SlimPajama/RefinedWeb-width
  * signatures cost through this machinery. Width multiplies ONLY the
  * per-shingle digest work and the signature row width; candidate
  * generation stays band-bucketed, so the expectation is sub-linear
  * growth in total runtime as the digest stage's share grows.
  */
object MinhashWidthBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val samples = if (args.length > 1) args(1).toInt else 3
    val spark = graft.MainSupport.localSession()
    import graft.MainSupport.timed
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    // warmup: JVM/codegen/parquet footers, charged to no width
    force(DedupExtras.minhashVerifiedPairsOf(docs.limit(500)))
    val widths = Seq((8, 4), (16, 8), (32, 16), (64, 16), (128, 32))
    for (fast <- Seq(false, true); (nh, b) <- widths) {
      val times = (1 to samples).map { _ =>
        val t = timed(force(DedupExtras.minhashVerifiedPairsOf(
          docs, numHashes = nh, bands = b, fastHash = fast)))
        spark.catalog.clearCache(); t
      }.sorted
      val med = times(times.length / 2)
      val pairs = DedupExtras.minhashVerifiedPairsOf(
        docs, numHashes = nh, bands = b, fastHash = fast).count()
      val fam = if (fast) "xxhash64" else "md5"
      println(f"""{"minhash_width":"$nh/$b","family":"$fam","sec":$med%.3f,"verified_pairs":$pairs}""")
    }
    spark.stop()
  }
}
