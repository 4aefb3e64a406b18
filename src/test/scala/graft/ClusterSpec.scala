package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cluster

/** q101/q102/q103 — deterministic k-means, SemDeDup pruning, and the
  * purity audit, on constructed geometry where every assignment, centroid,
  * and drop decision is checkable by hand.
  */
class ClusterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q101 core: pinned init, one Lloyd recompute, scan-local re-assignment") {
    // 1-D line (padded to 2-D): seeds are vec_id 0 → [0,0] and 1 → [10,0].
    // iter1 assigns {0,2,4}→c0, {1,3}→c1; recompute gives c0=[5/3,0],
    // c1=[9.5,0]; the final pass keeps the same membership with distances
    // to the RECOMPUTED centroids.
    val emb = Seq(
      (0L, Array(0f, 0f), 0),
      (1L, Array(10f, 0f), 0),
      (2L, Array(1f, 0f), 0),
      (3L, Array(9f, 0f), 0),
      (4L, Array(4f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Cluster.kmeansAssignedOf(emb, k = 2, iters = 2)
      .select("vec_id", "cluster", "d2").orderBy("vec_id").collect()
    val c0 = math.rint((5.0 / 3.0) * 1e6) / 1e6 // centroid avg rounded 6 dp
    def d2(x: Double, c: Double) = math.rint((x - c) * (x - c) * 1e6) / 1e6
    assert(out.toSeq == Seq(
      Row(0L, 0L, d2(0, c0)),
      Row(1L, 1L, d2(10, 9.5)),
      Row(2L, 0L, d2(1, c0)),
      Row(3L, 1L, d2(9, 9.5)),
      Row(4L, 0L, d2(4, c0))))
  }

  test("q101: distance ties assign to the smaller cluster id") {
    // seeds [0] and [10]; the point at [5] is equidistant — must go to c0
    val emb = Seq(
      (0L, Array(0f, 0f), 0), (1L, Array(10f, 0f), 0), (2L, Array(5f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
    // iters=1 → assignment against the raw seeds, no recompute
    val out = Cluster.kmeansAssignedOf(emb, k = 2, iters = 1)
      .select("vec_id", "cluster").orderBy("vec_id").collect()
    assert(out.toSeq == Seq(Row(0L, 0L), Row(1L, 1L), Row(2L, 0L)))
  }

  test("q101: an emptied cluster fails loud instead of diverging from the oracle") {
    // duplicate seeds: every point ties to c0 (smaller cid), c1 empties
    // during the recompute — the require must fire, not a silent k−1 run
    val emb = Seq(
      (0L, Array(0f, 0f), 0), (1L, Array(0f, 0f), 0), (2L, Array(1f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
    val e = intercept[IllegalArgumentException] {
      Cluster.kmeansAssignedOf(emb, k = 2, iters = 2).collect()
    }
    assert(e.getMessage.contains("emptied"))
  }

  test("q102 core: drops the most-redundant floor(size/4) per cluster; first point never red-scored") {
    // one cluster of 8: ids 10/11 nearly identical (cos ≈ 1), the rest
    // spread out — floor(8/4) = 2 drops: id 11 (near-dup of 10) and the
    // next-highest redundancy
    def v(deg: Double) = {
      val r = math.toRadians(deg)
      Array(math.cos(r), math.sin(r))
    }
    val assigned = Seq(
      (10L, v(0), 0L), (11L, v(1), 0L),   // near-dup pair
      (12L, v(45), 0L), (13L, v(90), 0L), (14L, v(135), 0L),
      (15L, v(180), 0L), (16L, v(225), 0L), (17L, v(270), 0L))
      .toDF("vec_id", "vec", "cluster")
    val out = Cluster.semdedupOf(assigned).collect()
    assert(out.length == 2)
    // id 11's red = cos(1°) ≈ 0.999848 — the clear top drop
    assert(out.head.getLong(0) == 11L)
    assert(math.abs(out.head.getDouble(2) - math.rint(math.cos(math.toRadians(1)) * 1e6) / 1e6) < 1e-9)
    // a cluster's minimum-id point carries the −2.0 sentinel and is never
    // dropped ahead of real redundancy
    assert(!out.map(_.getLong(0)).contains(10L))
  }

  test("q102: clusters smaller than the drop divisor drop nothing") {
    val assigned = Seq(
      (0L, Array(1.0, 0.0), 0L), (1L, Array(1.0, 0.001), 0L), (2L, Array(0.0, 1.0), 0L))
      .toDF("vec_id", "vec", "cluster")
    // floor(3/4) = 0 — even a near-identical pair survives
    assert(Cluster.semdedupOf(assigned).collect().isEmpty)
  }

  test("q103 core: majority label, ties to the smaller label, purity = maj/size") {
    val assigned = Seq(
      (0L, 0L, 5L), (1L, 0L, 5L), (2L, 0L, 3L),        // cluster 0: 2×5, 1×3
      (3L, 1L, 7L), (4L, 1L, 2L))                      // cluster 1: 1–1 tie → label 2
      .toDF("vec_id", "cluster", "label")
    val out = Cluster.clusterPurityOf(assigned).collect()
    assert(out.toSeq == Seq(
      Row(0L, 3L, 5L, 2L, math.rint(2.0 / 3.0 * 1e6) / 1e6),
      Row(1L, 2L, 2L, 1L, 0.5)))
  }

  test("q101/q103 fixture invariants: total assignment, k clusters, purity bounds") {
    val a = Cluster.kmeansAssign(spark, TestSpark.Sf0001).collect()
    assert(a.length == 500 && a.map(_.getLong(0)).distinct.length == 500)
    assert(a.map(_.getLong(1)).distinct.sorted.toSeq == (0L until Cluster.KmK.toLong))
    assert(a.forall(_.getDouble(2) >= 0.0))
    val p = Cluster.clusterPurity(spark, TestSpark.Sf0001).collect()
    assert(p.length == Cluster.KmK)
    assert(p.map(_.getLong(1)).sum == 500L)
    assert(p.forall(r => r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0))
  }

  test("q148 native simhash kernel equals the column-expression reference, every fixture row") {
    // the reference form the round-14 kernel replaced: per plane i,
    // round-half-up quantize at 6 dp, ±1 dot via zip_with/aggregate,
    // bit i ⇔ dot > 0 — slow but independently derived
    import org.apache.spark.sql.functions._
    val emb = TestSpark.spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
    graft.functions.GraftFunctions.ensureRegistered(TestSpark.spark)
    val b = 9
    val native = graft.functions.GraftFunctions.simhashCode(
      col("embedding"), Cluster.SimhashMaxDim, Cluster.SimhashSeed, b)
    val qv = transform(col("embedding"), x => round(x.cast("double") * lit(1e6), 0).cast("long"))
    val reference = (0 until b).map { i =>
      val dot = aggregate(
        zip_with(qv, typedLit(Cluster.SimhashPlanes(i).toSeq), (a, p) => a * p),
        lit(0L), (acc, x) => acc + x)
      when(dot > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    val diff = emb.select(native.as("k"), reference.as("r")).filter(col("k") =!= col("r")).count()
    assert(diff == 0L, s"$diff rows disagree between the kernel and the reference form")
  }

  test("q102 scale path: at the one-block floor the sign-bit variant IS exact all-pairs semdedup") {
    // target ≥ n ⇒ b = 0 ⇒ a single block: the scaled variant must equal
    // semdedupOf over the trivial all-in-one assignment, row for row
    val emb = TestSpark.spark.read
      .parquet(s"${TestSpark.Sf0001}/embeddings.parquet").limit(100)
    import org.apache.spark.sql.functions._
    val scaled = Cluster.semdedupScaledOf(emb, targetBlockRows = 1000).collect().toSeq
    val exact = Cluster.semdedupOf(emb.select(col("vec_id"),
      graft.functions.VectorFunctions.toDouble(col("embedding")).as("vec"),
      lit(0L).as("cluster"))).collect().toSeq
    assert(scaled == exact)
  }

  test("q102 scale path: block count grows with n and every block's drop quota is honored") {
    val emb = TestSpark.spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
    val out = Cluster.semdedupScaledOf(emb, targetBlockRows = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val clusters = out.map(_._2).distinct
    assert(clusters.length > 1, "500 vectors at target 100 must split into multiple blocks")
    // drops per cluster = floor(size/4): recompute sizes from the same
    // blocking key (the pinned SimHash planes; b = bit_length(4) = 3)
    val (b, code) = Cluster.simhashCode(emb, 100)
    assert(b == 3, s"signBitWidth(500, 100) must be 3, got $b")
    val sizes = emb.select(code.as("cluster"))
      .groupBy("cluster").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dropsPer = out.groupBy(_._2).view.mapValues(_.length).toMap
    sizes.foreach { case (c, n) =>
      assert(dropsPer.getOrElse(c, 0) == (n / Cluster.SemDedupDropDiv).toInt,
        s"cluster $c size $n must drop exactly ${n / 4}")
    }
  }
}
