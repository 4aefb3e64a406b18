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

  test("pinned HD rotation: deterministic, isometric (dots preserved), seed-sensitive") {
    import spark.implicits._
    graft.functions.GraftFunctions.ensureRegistered(spark)
    import graft.functions.GraftFunctions.rotateHd
    // non-power-of-two dim exercises the zero-padding path (5 → 8)
    val vs = Seq(
      (0L, Array(1.0f, -2.0f, 0.5f, 3.0f, -0.25f)),
      (1L, Array(-1.5f, 0.0f, 2.5f, -0.75f, 1.0f)),
      (2L, Array(0.1f, 0.2f, -0.3f, 0.4f, -0.5f)))
    val df = vs.toDF("vec_id", "embedding")
    def rot(seed: Long): Map[Long, Seq[Double]] =
      df.select($"vec_id", rotateHd($"embedding", 5, seed).as("r"))
        .as[(Long, Seq[Double])].collect().toMap
    val r1 = rot(42L); val r1again = rot(42L); val r2 = rot(43L)
    assert(r1 == r1again, "same seed must rotate identically")
    assert(r1 != r2, "a different seed must give a different rotation")
    r1.values.foreach(v => assert(v.length == 8, "output is the padded width"))
    // isometry: every pairwise dot product preserved to fp tolerance —
    // the composition of diagonals and scaled Hadamards is orthogonal,
    // and zero-padding embeds the originals isometrically
    def dot(a: Seq[Double], b: Seq[Double]): Double = a.zip(b).map { case (x, y) => x * y }.sum
    for ((ia, va) <- vs; (ib, vb) <- vs) {
      val refDot = va.zip(vb).map { case (x, y) => x.toDouble * y.toDouble }.sum
      assert(math.abs(dot(r1(ia), r1(ib)) - refDot) < 1e-9,
        s"dot($ia,$ib) must be preserved by the rotation")
    }
  }

  test("rotated rerank: full-width shortlist still EXACTLY the float top-k (rotation only reorders stage 1)") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, TestSpark.Sf0001)
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val corpus = emb.select($"vec_id", $"embedding")
    val n = corpus.count().toInt
    val dim = Ann.embeddingDim(corpus, "embedding")
    val viaRotated = Ann.rotatedHammingRerankOf(queries, corpus, n, 5, dim)
      .select($"qid", $"vec_id", $"score", $"rank")
      .as[(Long, Long, Double, Long)].collect().toSeq.sorted
    val viaExact = graft.operators.Knn.topK(queries, corpus, 5)
      .as[(Long, Long, Double, Long)].collect().toSeq.sorted
    assert(viaRotated == viaExact)
    // the query itself survives any rotation: rot(q) == rot(q) bit-for-bit,
    // so rank 1 of the rotated DIRECT ranking is the query at distance 0
    val direct = Ann.rotatedHammingTopkOf(queries, corpus, 3, dim)
      .as[(Long, Long, Long, Long)].collect()
    direct.filter(_._4 == 1L).foreach { case (qid, vid, h, _) =>
      assert(vid == qid && h == 0L) }
  }

  test("rotated codes beat axis-aligned codes on anisotropic data (the lift the rotation exists for)") {
    import spark.implicits._
    // seeded corpus with geometrically decaying per-coordinate variance —
    // the documented failure mode of axis-aligned sign codes (signal in a
    // few dominant coordinates, the tail bits pure noise). Deterministic:
    // fixed LCG seed, fixed row order, pinned rotation.
    val dim = 64; val n = 600
    val rnd = new java.util.Random(0x616e697361L)
    val rows = (0 until n).map { id =>
      (id.toLong, Array.tabulate(dim)(j => (rnd.nextGaussian() * math.pow(0.85, j / 2.0)).toFloat))
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    def recallOf(df: org.apache.spark.sql.DataFrame, exact: Map[Long, Set[Long]]): Double = {
      val got = df.select($"qid", $"vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rs = exact.map { case (q, ids) => (ids & got.getOrElse(q, Set.empty[Long])).size.toDouble / ids.size }
      rs.sum / rs.size
    }
    val exact = Knn.topK(queries, corpus, 5)
      .select($"qid", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val plain = recallOf(Ann.hammingRerankOf(queries, corpus, 25, 5, dim), exact)
    val rotated = recallOf(Ann.rotatedHammingRerankOf(queries, corpus, 25, 5, dim), exact)
    assert(rotated >= plain + 0.2,
      s"the pinned rotation must lift anisotropic recall decisively: plain=$plain rotated=$rotated")
  }
}
