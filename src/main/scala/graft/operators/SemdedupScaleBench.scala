package graft.operators

import graft.{MainSupport, Tables}

/** q102 boundary measurement: the declared fixed-k (q101-blocked)
  * SemDeDup vs the sign-bit nlist ∝ n scale path, per scale factor.
  * Usage: runMain graft.operators.SemdedupScaleBench <sfDir> [samples=3]
  */
object SemdedupScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val samples = if (args.length > 1) args(1).toInt else 3
    val spark = MainSupport.localSession()
    val emb = Tables.embeddings(spark, sfDir)
    emb.count() // warm the scan
    def med(f: => Long): Double = {
      val ts = (1 to samples).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(s"  rows=${ts.head._2}")
      val s = ts.map(_._1).sorted
      if (s.length % 2 == 1) s(s.length / 2) else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }
    if (!sys.env.contains("SKIP_FIXED")) {
      val fixed = med(Cluster.semdedup(spark, sfDir).count())
      println(f"""{"arm":"q102_fixed_k","sf":"$sfDir","sec":$fixed%.3f}""")
    }
    val scaled = med(Cluster.semdedupScaledOf(emb).count())
    println(f"""{"arm":"q102_signbit_scaled","sf":"$sfDir","sec":$scaled%.3f}""")
    spark.stop()
  }
}
