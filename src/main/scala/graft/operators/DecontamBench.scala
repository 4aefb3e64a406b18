package graft.operators

/** Measurement harness for the q60 bloom alternative (VERDICT r5 item 6):
  * time [[TextAnalysis.decontaminate]] (broadcast hash join of the
  * benchmark gram set) against [[TextAnalysis.decontaminateBloom]] (bloom
  * pre-cut + exact confirm) on the same fixtures, and assert the outputs
  * agree so the timing always compares equal answers. Results recorded in
  * BASELINE.md.
  *
  * Usage: runMain graft.operators.DecontamBench <sfDir> [samples=1]
  */
object DecontamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val samples = if (args.length > 1) args(1).toInt else 1
    val spark = graft.MainSupport.localSession()
    import graft.MainSupport.timed
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // equality first, on a bounded checksum (count + sum of shared_grams)
    // so the corpus never collects to the driver
    def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      import org.apache.spark.sql.functions._
      val r = df.agg(count(lit(1)), sum(col("shared_grams")), sum(col("contaminated"))).head()
      (r.getLong(0), r.getLong(1) + r.getLong(2))
    }
    val a = checksum(TextAnalysis.decontaminate(spark, sfDir))
    val b = checksum(TextAnalysis.decontaminateBloom(spark, sfDir))
    require(a == b, s"bloom path diverged from the exact path: $a vs $b")

    def med(f: => Unit): Double = {
      val ts = (1 to samples).map(_ => timed(f)).sorted
      if (ts.size % 2 == 1) ts(ts.size / 2) else (ts(ts.size / 2 - 1) + ts(ts.size / 2)) / 2
    }
    val broadcastSec = med(force(TextAnalysis.decontaminate(spark, sfDir)))
    val bloomSec     = med(force(TextAnalysis.decontaminateBloom(spark, sfDir)))
    println(f"[decontam] sf=$sfDir checksum=$a broadcast=$broadcastSec%.1fs bloom=$bloomSec%.1fs " +
      f"(x${broadcastSec / bloomSec}%.2f)")
    spark.stop()
  }
}
