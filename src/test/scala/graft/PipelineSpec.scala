package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Embed, IvfIndex, Knn}

/** End-to-end library composition — the user story a reference user runs:
  * raw documents → embedding socket → persisted unsupervised index →
  * ANN search, with the exact brute-force search as the ground truth.
  * Each stage is individually spec'd elsewhere; this proves the pieces
  * SNAP TOGETHER through their public signatures on a corpus that never
  * had a fixture embedding column.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("text -> embed -> unsupervised index -> search composes; full-probe ANN == exact k-NN") {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.Sf0001).select(col("doc_id"), col("text"))
    // stage 1: embedding socket (one encoder init per partition)
    val emb = Embed.embedColumn[String](docs, "text", "embedding", Embed.hashingTextEncoder(32))
      .select(col("doc_id").as("vec_id"), col("embedding"))
    // stage 2: persisted index over the derived embeddings — no labels exist,
    // so the unsupervised build is the only option (that is the point)
    val nlist = 8
    val dir = java.nio.file.Files.createTempDirectory("graft_pipeline").toString
    IvfIndex.buildUnsupervised(spark, emb, dir, nlist = nlist, seed = 5L)

    // stage 3: search the index; with every list probed the ANN result
    // must equal the exact brute-force top-3 over the same derived vectors
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val viaIndex = IvfIndex.probe(spark, dir, queries, k = 3, nprobe = nlist)
      .select($"qid", $"vec_id", $"score").as[(Long, Long, Double)].collect().toSet
    val exact = Knn.topK(queries, emb, 3)
      .select($"qid", $"vec_id", $"score").as[(Long, Long, Double)].collect().toSet
    assert(viaIndex == exact && exact.size == 15,
      s"pipeline ANN must reproduce exact search; index=$viaIndex exact=$exact")

    // every query's own vector is in the corpus: rank 1 is itself at 1.0
    val self = Knn.topK(queries, emb, 1)
      .select($"qid", $"vec_id", $"score").as[(Long, Long, Double)].collect()
    assert(self.forall { case (q, v, s) => q == v && s == 1.0 })
  }

  test("cross-modal through the index: text-derived queries probe the image-modality index") {
    import spark.implicits._
    // the reference's text_img.py story END-TO-END on engine machinery:
    // the IMAGE corpus (fixture embeddings) is indexed once; TEXT queries
    // go through the embedColumn tower into the shared space and probe it
    val corpus = Tables.embeddings(spark, TestSpark.Sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_xmodal_idx").toString
    IvfIndex.build(spark, corpus, dir)

    val dim = 64 // the fixtures' embedding dim (same pin as q59 vs its oracle)
    val queries = Embed.embedColumn[String](
      Tables.documents(spark, TestSpark.Sf0001).filter(col("doc_id") < 5)
        .select(col("doc_id"), col("text")),
      "text", "qvec", Embed.md5CountEncoder(dim))
      .select(col("doc_id").as("qid"), col("qvec"))

    // probing EVERY list must reproduce q59's exact search on (qid, vec_id)
    val nlist = spark.read.parquet(IvfIndex.centroidsPath(dir)).count().toInt
    val viaIndex = IvfIndex.probe(spark, dir, queries, k = 5, nprobe = nlist)
      .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet
    val exact = Embed.crossModalSearch(spark, TestSpark.Sf0001)
      .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet
    assert(viaIndex == exact && exact.size == 25,
      s"index-backed cross-modal search must agree with the declared exact q59; idx=$viaIndex exact=$exact")
  }
}
