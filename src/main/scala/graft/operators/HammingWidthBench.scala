package graft.operators

/** Measures the multi-word sign-bit search across pack widths (`runMain
  * graft.operators.HammingWidthBench <sfDir> [samples]`): q99's
  * hammingTopkOf at dim 64 / 128 / 256 / 512 over the SAME corpus row
  * count, widening each fixture vector by tiling it (concat of w copies —
  * deterministic, keeps the float side realistic while sweeping the word
  * count 1 → 32). 512 is the reference's CLIP width (text_img.py:15) and
  * 2048 its ResNet-50 width (vector_db.py:17). The evidence for the round-12
  * multi-word pack (VERDICT r11 item 1): cost must grow ~linearly in the
  * word count and nothing should shuffle differently between widths.
  */
object HammingWidthBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val samples = if (args.length > 1) args(1).toInt else 3
    val spark = graft.MainSupport.localSession()
    import graft.MainSupport.timed
    import org.apache.spark.sql.functions._
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val emb = graft.Tables.embeddings(spark, sfDir)
    Seq(1, 2, 4, 8, 32).foreach { w =>
      val dim = 64 * w
      val widened = emb.select(col("vec_id"),
        concat(Seq.fill(w)(col("embedding")): _*).as("embedding"))
      val queries = widened.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      force(Ann.hammingTopkOf(queries, widened, 5, dim)) // warmup per width
      val times = (1 to samples).map { _ =>
        timed(force(Ann.hammingTopkOf(queries, widened, 5, dim)))
      }
      println(f"""{"hamming_width":$dim,"words":$w,"sec":${graft.Bench.median(times)}%.3f,""" +
        s""""samples":[${times.map(t => f"$t%.3f").mkString(",")}]}""")
    }
    spark.stop()
  }
}
