package graft.operators

/** Measures q78's LM-join knob (`runMain graft.operators.BigramLmBench
  * <sfDir>`): the per-doc bigram scoring with the bigram table
  * broadcast vs shuffle-hash joined, plus the table's type count — the
  * evidence for BASELINE.md on where the broadcast stops paying.
  * GenScale's disjoint per-replica vocab grows bigram TYPES linearly
  * with the corpus (a real corpus follows Heaps' law and grows them far
  * slower), so the scaled fixtures are the broadcast's worst case.
  */
object BigramLmBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.MainSupport.localSession()
    import graft.MainSupport.timed
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    // warmup: JVM/codegen/parquet footers, charged to neither variant
    force(TextAnalysis.bigramLogProbOf(docs.limit(1000)))
    val bc = timed(force(TextAnalysis.bigramLogProbOf(docs)))
    val sh = timed(force(TextAnalysis.bigramLogProbOf(docs, broadcastLm = false)))
    val typeCount = {
      import org.apache.spark.sql.functions._
      val toks = docs.select(TextPipeline.tokenArr(col("text")).as("toks"))
        .filter(size(col("toks")) >= 2)
      toks.select(explode(arrays_zip(
          slice(col("toks"), lit(1), size(col("toks")) - 1).as("w1"),
          slice(col("toks"), lit(2), size(col("toks")) - 1).as("w2"))).as("bg"))
        .select(col("bg.w1"), col("bg.w2")).distinct().count()
    }
    println(f"[bigramlm] dir=$sfDir bigram_types=$typeCount broadcast=$bc%.1fs shuffle=$sh%.1fs")
    spark.stop()
  }
}
