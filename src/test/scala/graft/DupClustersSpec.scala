package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DedupExtras, DupClusters}

/** Connected-components duplicate clustering (q74): the star-contraction
  * algorithm against a brute-force union-find ground truth, the
  * adversarial chain-diameter case, and the fixture-corpus invariants of
  * the declared query.
  */
class DupClustersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Ground truth: plain union-find over the same edge list. */
  private def unionFind(n: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(n.map(x => x -> x): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    n.map(x => x -> find(x)).toMap
  }

  test("star-contraction CC equals union-find on seeded random graphs") {
    import spark.implicits._
    for ((n, m, seed) <- Seq((50, 40, 1), (200, 150, 2), (400, 900, 3))) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val expected = unionFind(edges.flatMap(e => Seq(e._1, e._2)).distinct, edges)
      val got = DupClusters.connectedComponents(edges.toDF("u", "v"))
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"n=$n m=$m seed=$seed: CC labels diverge from union-find")
    }
  }

  test("1024-node chain (worst-case diameter) converges in logarithmic star rounds") {
    import spark.implicits._
    // naive min-propagation needs 1023 rounds here; star contraction is
    // the reason the operator holds at 100 TB component diameters
    val chain = (0L until 1023L).map(i => (i, i + 1)).toDF("u", "v")
    // localEdgeBound = 0 forces the distributed star rounds: this test pins
    // the 100 TB path, which the decision-scale union-find cutover would
    // otherwise absorb (1023 edges < LocalEdgeBound).
    val (labels, rounds) = DupClusters.ccWithRounds(chain, localEdgeBound = 0)
    assert(rounds <= 12, s"chain took $rounds star rounds; expected O(log2 1024)=~10")
    val lab = labels.as[(Long, Long)].collect().toMap
    assert(lab.size == 1024 && lab.values.forall(_ == 0L),
      "every chain node must label to component min 0")
  }

  test("driver-local union-find cutover agrees with the distributed star rounds") {
    import spark.implicits._
    for ((n, m, seed) <- Seq((60, 80, 11), (300, 260, 12))) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val df = edges.toDF("u", "v")
      val local = DupClusters.ccWithRounds(df)._1.as[(Long, Long)].collect().toMap
      val dist = DupClusters.ccWithRounds(df, localEdgeBound = 0)._1
        .as[(Long, Long)].collect().toMap
      assert(local == dist, s"n=$n m=$m seed=$seed: local cutover diverges from star rounds")
    }
  }

  test("q74 clusters the fixture corpus exactly as union-find over the verified pair set") {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.Sf0001).select("doc_id", "text")
    val pairs = DedupExtras.minhashVerifiedPairsOf(docs)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    assert(pairs.nonEmpty, "fixture must contain verified near-dup pairs")
    val allDocs = docs.select("doc_id").as[Long].collect().toSeq
    val expected = {
      val uf = unionFind(allDocs, pairs)
      allDocs.map(d => d -> uf(d)).toMap
    }
    val got = DupClusters.dupClustersOf(docs)
      .select("doc_id", "cluster_id", "cluster_size")
      .as[(Long, Long, Long)].collect()
    assert(got.map(r => r._1 -> r._2).toMap == expected,
      "cluster assignment must match union-find over the same pairs (incl. singletons = self)")
    // sizes are the true partition sizes and the keeper convention holds
    val bySize = expected.groupBy(_._2).map { case (c, ms) => c -> ms.size.toLong }
    assert(got.forall(r => r._3 == bySize(r._2)), "cluster_size must count the full cluster")
    assert(expected.forall { case (d, c) => c <= d }, "cluster_id is the component minimum")
    // transitivity: every verified pair co-clusters (the property the
    // pairwise edge-dominated pass cannot promise)
    val lab = got.map(r => r._1 -> r._2).toMap
    assert(pairs.forall { case (a, b) => lab(a) == lab(b) })
  }

  test("q150 keeps the highest-quality member per cluster, ties to the smaller id") {
    import spark.implicits._
    // doc 2 = doc 1's tokens + appended stopwords: same near-dup cluster
    // (shared-shingle Jaccard 8/12 ≈ 0.67 ≥ 0.5) but HIGHER q20 quality
    // (more tokens, higher stopword ratio) — keep-best must pick 2 where
    // keep-first picks 1. docs 4/5 are exact copies: identical quality,
    // the tie must fall to the smaller id (keeper == first, gain 0).
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa the of and in"),
      (3L, "solo document completely different words here friend"),
      (4L, "same same same words repeated here again now"),
      (5L, "same same same words repeated here again now"))
      .toDF("doc_id", "text")
    val out = DupClusters.keepBestDedupOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    assert(out.keySet == Set(1L, 4L), s"two contested clusters; got ${out.keySet}")
    val (sz1, keeper1, kq1, first1, fq1, gain1) = out(1L)
    assert(sz1 == 2 && keeper1 == 2L && first1 == 1L, "best-quality doc 2 beats first-id doc 1")
    assert(kq1 > fq1 && gain1 > 0 && math.abs(gain1 - (kq1 - fq1)) < 1e-9)
    val (sz4, keeper4, _, first4, _, gain4) = out(4L)
    assert(sz4 == 2 && keeper4 == 4L && first4 == 4L && gain4 == 0.0,
      "identical quality must tie to the smaller id — keep-best degrades to keep-first")
  }

  test("q150 agrees with a brute-force argmax over the fixture clusters") {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.Sf0001).select("doc_id", "text")
    val clusters = DupClusters.dupClustersOf(docs)
      .filter(col("cluster_size") > 1)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect()
    val quality = graft.operators.TextAnalysis.qualityScoreOf(docs)
      .select("doc_id", "quality").as[(Long, Double)].collect().toMap
    val expected = clusters.groupBy(_._2).map { case (c, ms) =>
      val members = ms.map(_._1)
      val keeper = members.minBy(d => (-quality(d), d))
      val first = members.min
      (c, members.size.toLong, keeper, quality(keeper), first, quality(first))
    }.toSet
    val got = DupClusters.keepBestDedupOf(docs).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5))).toSet
    assert(got == expected)
  }
}
