package graft.operators

import org.apache.spark.sql.functions._

/** Measures the q73 fingerprint-width knob (`runMain
  * graft.operators.SimhashScaleBench <sfDir> <bits>`): the banded
  * simhash near-dup at a given fingerprint width, printing the candidate
  * budget (Σ per-band bucket pairs) alongside wall time — the evidence
  * for BASELINE.md that widening the fingerprint, not the corpus-size
  * exponent, is what keeps the same plan sub-quadratic at scale.
  */
object SimhashScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val bits  = if (args.length > 1) args(1).toInt else 60
    val spark = graft.MainSupport.localSession()
    import graft.MainSupport.timed
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    val n = docs.count()
    val bandBits = bits / 4
    val fps = DedupExtras.simhashOf(docs, bits).localCheckpoint(true)
    val budget = fps
      .select(posexplode(array((0 until 4).map(b =>
        expr(s"(simhash div ${1L << (bandBits * b)}) % ${1L << bandBits}")): _*)))
      .toDF("band", "nib")
      .groupBy(col("band"), col("nib")).count()
      .agg(sum((col("count") * (col("count") - 1) / 2).cast("long")).as("s"))
      .head().getLong(0)
    val pairSec = timed(
      DedupExtras.simhashNearDupOf(docs, bits)
        .write.mode("overwrite").format("noop").save())
    println(f"[simhashscale] n=$n bits=$bits band_buckets=${1L << bandBits} " +
      f"cand_budget=$budget (all-pairs ${n * (n - 1) / 2}) pairs=$pairSec%.1fs")
    spark.stop()
  }
}
