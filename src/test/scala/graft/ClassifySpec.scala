package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Classify

/** q97_knn_classify / q98_triplet_mining on constructed geometry where the
  * neighbors, votes, and triplet ends are known by hand.
  */
class ClassifySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 2-D unit-circle points: cosine to a query at angle 0 orders corpus
  // points by |angle| — neighbor ranks are readable off the angles.
  private def vec(deg: Double): Array[Float] = {
    val r = math.toRadians(deg)
    Array(math.cos(r).toFloat, math.sin(r).toFloat)
  }

  test("q97 core: majority vote over the k nearest, ties to the smaller label") {
    // query at 0°; corpus angles interleave labels 1 and 2 so k slices
    // produce both a majority and an exact tie
    val queries = Seq((0L, vec(0), 1L)).toDF("qid", "qvec", "true_label")
    val corpus = Seq(
      (100L, vec(5), 2L), (101L, vec(10), 1L), (102L, vec(15), 2L),
      (103L, vec(20), 1L), (104L, vec(25), 1L), (105L, vec(80), 9L))
      .toDF("vec_id", "embedding", "label")
    // k=5 → labels {2,1,2,1,1}: 3 votes label-1 vs 2 label-2
    val out = Classify.knnClassifyOf(queries, corpus, k = 5).collect()
    assert(out.toSeq == Seq(Row(0L, 1L, 3L, 1L)))
    // k=4 → {2,1,2,1}: 2-2 tie, and label 2 owns the NEAREST neighbor —
    // the tie must still break to the smaller label, not the closer one
    val tied = Classify.knnClassifyOf(queries, corpus, k = 4).collect()
    assert(tied.toSeq == Seq(Row(0L, 1L, 2L, 1L)))
  }

  test("q98 core: nearest same-label positive, nearest different-label negative, margin") {
    val anchors = Seq((0L, vec(0), 1L)).toDF("qid", "qvec", "anchor_label")
    val corpus = Seq(
      (0L, vec(0), 1L),            // self — excluded
      (100L, vec(10), 1L),         // nearest same-label → positive
      (101L, vec(30), 1L),
      (200L, vec(20), 2L),         // nearest different-label → negative
      (201L, vec(40), 3L))
      .toDF("vec_id", "embedding", "label")
    val out = Classify.tripletMiningOf(anchors, corpus).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 0L && r.getLong(1) == 1L)
    assert(r.getLong(2) == 100L, "positive must be the nearest same-label point")
    assert(r.getLong(4) == 200L, "negative must be the nearest different-label point")
    val pos = math.cos(math.toRadians(10)); val neg = math.cos(math.toRadians(20))
    assert(math.abs(r.getDouble(3) - math.rint(pos * 1e6) / 1e6) < 1e-9)
    assert(math.abs(r.getDouble(6) - (math.rint(pos * 1e6) / 1e6 - math.rint(neg * 1e6) / 1e6)) < 1e-9)
  }

  test("q98: an anchor whose label has no other member gets a null positive, row kept") {
    val anchors = Seq((0L, vec(0), 7L)).toDF("qid", "qvec", "anchor_label")
    val corpus = Seq(
      (0L, vec(0), 7L),           // self only member of label 7
      (100L, vec(10), 1L), (101L, vec(20), 2L))
      .toDF("vec_id", "embedding", "label")
    val out = Classify.tripletMiningOf(anchors, corpus).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.isNullAt(2) && r.isNullAt(3), "max_by must skip the null-keyed side entirely")
    assert(r.getLong(4) == 100L)
    assert(r.isNullAt(6), "margin is null when a side is missing")
  }

  test("q98: an anchor with NO non-self corpus rows keeps its row, both ends null (ADVICE r11)") {
    // before the keep-anchor left join, filter+groupBy produced no group
    // for such an anchor and the row silently vanished — diverging from
    // the oracle's LEFT-JOIN-from-anchors semantics
    val anchors = Seq((0L, vec(0), 1L)).toDF("qid", "qvec", "anchor_label")
    val corpus = Seq((0L, vec(0), 1L))   // the anchor is the whole corpus
      .toDF("vec_id", "embedding", "label")
    val out = Classify.tripletMiningOf(anchors, corpus).collect()
    assert(out.length == 1, "the anchor must survive an empty non-self corpus side")
    val r = out.head
    assert(r.getLong(0) == 0L && r.getLong(1) == 1L)
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6),
      "all mined ends and the margin are null when nothing can be mined")
  }

  test("q97/q98 declared rows run on the sf0.001 fixtures with sane shapes") {
    val cls = Classify.knnClassify(spark, TestSpark.Sf0001)
    val rows = cls.collect()
    assert(rows.length == Classify.QueryIds)
    assert(rows.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= Classify.K))
    val tri = Classify.tripletMining(spark, TestSpark.Sf0001).collect()
    assert(tri.length == Classify.QueryIds)
    // margins are on the rounded-score lattice and positive ≥ its own negative
    assert(tri.forall(r => r.isNullAt(6) || math.abs(r.getDouble(6) -
      (r.getDouble(3) - r.getDouble(5))) < 2e-6))
  }
}
