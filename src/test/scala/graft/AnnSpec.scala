package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ann, Knn}

class AnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("LSH approximate k-NN reaches reasonable recall against exact k-NN") {
    import spark.implicits._
    val exact = Knn.knnTopkCosine(spark, TestSpark.Sf0001)
      .select($"qid", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = Ann.lshApproxKnn(spark, TestSpark.Sf0001)
      .select($"qid", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    assert(approx.keySet == exact.keySet)
    // the batch approxSimilarityJoin returns AT MOST k rows per query —
    // sparse buckets can under-fill (documented in the scaladoc), never over
    approx.values.foreach(ids => assert(ids.size <= 5))
    val recalls = exact.map { case (q, ids) => (ids & approx(q)).size.toDouble / ids.size }
    val mean = recalls.sum / recalls.size
    // every query at least finds itself (distance 0 is always bucketed with itself)
    exact.keys.foreach(q => assert(approx(q).contains(q)))
    assert(mean >= 0.5, s"mean recall $mean too low for 6 hash tables on 64-dim data")
  }

  test("IVF probe returns neighbors only from the probed cluster") {
    import spark.implicits._
    val labels = Tables.embeddings(spark, TestSpark.Sf0001)
      .select($"vec_id", $"label".cast("long")).as[(Long, Long)].collect().toMap
    val r = Ann.annIvfTopK(spark, TestSpark.Sf0001)
      .select($"qid", $"probe_label", $"vec_id").as[(Long, Long, Long)].collect()
    assert(r.nonEmpty)
    r.foreach { case (_, probe, vid) => assert(labels(vid) == probe) }
  }

  test("q99: packed xor+popcount Hamming equals the per-position sign diff count") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, TestSpark.Sf0001)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toMap
    val out = Ann.hammingTopk(spark, TestSpark.Sf0001)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.map(_._1).distinct.length == 10)
    def ham(a: Array[Float], b: Array[Float]): Long =
      a.zip(b).count { case (x, y) => (x > 0) != (y > 0) }.toLong
    out.foreach { case (qid, vid, h, _) => assert(h == ham(emb(qid), emb(vid))) }
    // rank 1 is the query itself at distance 0 (its own sign pattern)
    out.filter(_._4 == 1L).foreach { case (qid, vid, h, _) =>
      assert(vid == qid && h == 0L) }
    // ranks are ascending in distance within each query
    out.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._4).map(_._3).toSeq
      assert(sorted == sorted.sorted)
    }
  }

  test("q99: pack is total for dims shorter than 64 (absent positions never differ)") {
    import spark.implicits._
    val queries = Seq((0L, Array(1f, -1f))).toDF("qid", "qvec")
    val corpus = Seq((0L, Array(1f, -1f)), (1L, Array(1f, 1f)), (2L, Array(-1f, 1f)))
      .toDF("vec_id", "embedding")
    val r = Ann.hammingTopkOf(queries, corpus, 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(r == Seq((0L, 0L, 0L, 1L), (0L, 1L, 1L, 2L), (0L, 2L, 2L, 3L)))
  }

  test("q100: a full-width shortlist makes the rerank EXACTLY the float top-k") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, TestSpark.Sf0001)
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val corpus = emb.select($"vec_id", $"embedding")
    val n = corpus.count().toInt
    // shortlist = whole corpus → stage 2 IS brute-force cosine: rows must
    // match Knn.topK exactly (same rounding, same tie-break)
    val viaRerank = Ann.hammingRerankOf(queries, corpus, n, 5)
      .select($"qid", $"vec_id", $"score", $"rank")
      .as[(Long, Long, Double, Long)].collect().toSeq.sorted
    val viaExact = graft.operators.Knn.topK(queries, corpus, 5)
      .as[(Long, Long, Double, Long)].collect().toSeq.sorted
    assert(viaRerank == viaExact)
    // and the declared m=50 shortlist keeps every rerank row inside its
    // own Hamming shortlist
    val short = Ann.hammingTopkOf(queries, corpus, Ann.RerankM)
      .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet
    val reranked = Ann.hammingRerank(spark, TestSpark.Sf0001)
      .select($"qid", $"vec_id").as[(Long, Long)].collect()
    assert(reranked.nonEmpty && reranked.forall(short.contains))
  }
}
