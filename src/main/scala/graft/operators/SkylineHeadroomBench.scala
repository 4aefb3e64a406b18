package graft.operators

import org.apache.spark.sql.functions._

/** Measures q177's cross-bucket carry-fold headroom (VERDICT r16 item 6):
  * replicate the part catalog ×REPLICAS with shifted ids and an x jitter,
  * so n — and with it the adaptive bucket count (buckets ∝ n via
  * `skyBucketWidthFor`) and the distinct-x grid — scales ×REPLICAS while
  * the per-bucket front mass stays domain-bounded like the real catalog.
  * This stresses exactly the single-task fold + per-bucket-carry
  * broadcast whose worst case `skyline3Of` documents. Run:
  * `scripts/run_main.sh graft.operators.SkylineHeadroomBench <sfDir> [replicas]`.
  */
object SkylineHeadroomBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val replicas = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = graft.MainSupport.localSession()
    import graft.MainSupport.timed

    val base = graft.Tables.part(spark, sfDir)
      .select(col("p_partkey").as("id"), col("p_retailprice").as("x"),
        col("p_size").cast("long").as("y"),
        length(col("p_name")).cast("long").as("z"))
    val big = base
      .crossJoin(broadcast(spark.range(0, replicas.toLong).toDF("rep")))
      .select((col("id") + col("rep") * lit(1000000000L)).as("id"),
        (col("x") + col("rep") * lit(0.0001)).as("x"), col("y"), col("z"))

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    force(Skyline.skyline3Of(base)) // warmup (JVM + codegen + parquet footers)
    val n1 = base.count()
    val t1 = timed(force(Skyline.skyline3Of(base)))
    val tN = timed(force(Skyline.skyline3Of(big)))
    println(f"[skyline3] dir=$sfDir n1=$n1 t1=$t1%.2fs replicas=$replicas " +
      f"tN=$tN%.2fs ratio=${tN / t1}%.2f exp=${math.log(tN / t1) / math.log(replicas.toDouble)}%.2f")
    spark.stop()
  }
}
