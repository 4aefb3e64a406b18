package graft.operators

import org.apache.spark.sql.functions._

/** Measurement harness for the q56 nlist knob (BASELINE.md round-5): the
  * DECLARED q56 builds on the label quantizer (nlist = |labels|, fixed),
  * so its within-list pair budget Σ|list|² grows quadratically with the
  * corpus — the sf10 spot check shows exactly that. The operator's actual
  * scale contract is that nlist SCALES: `buildUnsupervised(nlist ∝ n)`
  * holds per-list size constant, making the pair budget — and the
  * runtime — linear. This main measures that claim: one unsupervised
  * build at the given nlist, then the same `nearDupPairsViaIndex` ranking
  * q56 declares, with the pair budget printed next to the time.
  *
  * Usage: runMain graft.operators.NearDupScaleBench <sfDir> <nlist> [k]
  */
object NearDupScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nlist = args(1).toInt
    val k     = if (args.length > 2) args(2).toInt else 100
    val spark = graft.MainSupport.localSession()
    import graft.MainSupport.timed
    val emb = graft.Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val dir = java.nio.file.Files.createTempDirectory("graft_neardup_scale").toString
    // ~50 training points per centroid is plenty for a coarse quantizer
    val frac = math.min(1.0, 50.0 * nlist / n)
    val buildSec = timed(IvfIndex.buildUnsupervised(spark, emb, dir, nlist, trainFraction = frac))
    val budget = spark.read.parquet(IvfIndex.pointsPath(dir))
      .groupBy(col("list_id")).count()
      .agg(sum((col("count") * (col("count") - 1) / 2).cast("long")).as("s"))
      .head().getLong(0)
    val pairSec = timed(
      Dedup.nearDupPairsViaIndex(spark, dir, k)
        .write.mode("overwrite").format("noop").save())
    println(f"[neardupscale] n=$n nlist=$nlist pair_budget=$budget " +
      f"(all-pairs ${n * (n - 1) / 2}) build=$buildSec%.1fs pairs=$pairSec%.1fs")
    spark.stop()
  }
}
