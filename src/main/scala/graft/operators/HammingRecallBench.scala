package graft.operators

/** Measures what 1-bit sign quantization costs in recall (`runMain
  * graft.operators.HammingRecallBench <sfDir> [m...]`): mean recall@5 of
  * (a) the raw Hamming top-5 (q99's direct ranking), (b) the two-stage
  * Hamming-shortlist→exact-cosine rerank (q100) at several shortlist
  * widths, and (c) — round 12 — the SAME two arms with the pinned HD
  * rotation ([[Ann.rotatedHammingRerankOf]]) before the sign, against
  * brute-force exact cosine top-5. Every variant runs through the
  * engine's own operators, so the audit measures the SHIPPED plans, not a
  * side reimplementation.
  *
  * Two corpora per run:
  * - `fixture`: the sfDir embeddings — (near-)isotropic, the regime where
  *   axis-aligned signs are already as good as rotated ones (a rotation
  *   of an isotropic cloud is statistically the same cloud);
  * - `anisotropic`: a seeded synthetic corpus with geometrically decaying
  *   per-coordinate variance (ratio 0.85, same row count and dim as the
  *   fixture) — the documented failure mode of axis-aligned sign codes:
  *   the informative variation lives in a few dominant coordinates while
  *   the many tail bits contribute noise to every Hamming distance. The
  *   rotation's job is to spread the signal across all code bits; this
  *   corpus is where the lift must show.
  */
object HammingRecallBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val ms = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(10, 25, 50, 100)
    val spark = graft.MainSupport.localSession()
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.embeddings(spark, sfDir)

    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select(col("qid"), col("vec_id")).collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

    def audit(label: String, corpus: org.apache.spark.sql.DataFrame, dim: Int): Unit = {
      val queries = corpus.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val c = corpus.select(col("vec_id"), col("embedding"))
      val exact = topSets(Knn.topK(queries, c, 5))
      def recall(got: Map[Long, Set[Long]]): Double = {
        val rs = exact.map { case (q, ids) => (ids & got.getOrElse(q, Set.empty)).size.toDouble / ids.size }
        rs.sum / rs.size
      }
      def row(variant: String, r: Double): Unit =
        println(f"""{"hamming_recall":"$variant","corpus":"$label","recall_at_5":$r%.3f}""")
      row("direct_top5", recall(topSets(Ann.hammingTopkOf(queries, c, 5, dim))))
      row("rotated_direct_top5", recall(topSets(Ann.rotatedHammingTopkOf(queries, c, 5, dim))))
      ms.foreach { m =>
        row(s"rerank_m$m", recall(topSets(Ann.hammingRerankOf(queries, c, m, 5, dim))))
        row(s"rotated_rerank_m$m", recall(topSets(Ann.rotatedHammingRerankOf(queries, c, m, 5, dim))))
      }
    }

    val dim = Ann.embeddingDim(emb, "embedding")
    audit("fixture", emb.select(col("vec_id"), col("embedding")), dim)

    // seeded anisotropic corpus: same row count/dim as the fixture,
    // coordinate j ~ N(0, 0.85^j) — deterministic (one LCG pass in vec_id
    // order), built driver-side (row-count × dim doubles, bench-only)
    val n = emb.count().toInt
    val rnd = new java.util.Random(0x616e697361L)
    val rows = (0 until n).map { id =>
      val v = Array.tabulate(dim)(j => (rnd.nextGaussian() * math.pow(0.85, j / 2.0)).toFloat)
      (id.toLong, v)
    }
    import spark.implicits._
    audit("anisotropic", rows.toDF("vec_id", "embedding"), dim)
    spark.stop()
  }
}
