package graft.operators

/** Measures what 1-bit sign quantization costs in recall (`runMain
  * graft.operators.HammingRecallBench <sfDir> [m...]`): mean recall@5 of
  * (a) the raw Hamming top-5 (q99's direct ranking) and (b) the two-stage
  * Hamming-shortlist→exact-cosine rerank (q100) at several shortlist
  * widths, against brute-force exact cosine top-5 — the evidence for when
  * the binary path is a safe pre-filter. The exact side and each variant
  * run through the engine's own operators, so the audit measures the
  * SHIPPED plans, not a side reimplementation.
  */
object HammingRecallBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val ms = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(10, 25, 50, 100)
    val spark = graft.MainSupport.localSession()
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.select(col("vec_id"), col("embedding"))
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select(col("qid"), col("vec_id")).collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val exact = topSets(Knn.topK(queries, corpus, 5))
    def recall(got: Map[Long, Set[Long]]): Double = {
      val rs = exact.map { case (q, ids) => (ids & got.getOrElse(q, Set.empty)).size.toDouble / ids.size }
      rs.sum / rs.size
    }
    val direct = recall(topSets(Ann.hammingTopkOf(queries, corpus, 5)))
    println(f"""{"hamming_recall":"direct_top5","recall_at_5":$direct%.3f}""")
    ms.foreach { m =>
      val r = recall(topSets(Ann.hammingRerankOf(queries, corpus, m, 5)))
      println(f"""{"hamming_recall":"rerank_m$m","recall_at_5":$r%.3f}""")
    }
    spark.stop()
  }
}
