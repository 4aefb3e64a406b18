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
}
