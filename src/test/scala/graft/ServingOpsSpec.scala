package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Analytics, Classify, CorpusStats, Knn, Quality, ShardShuffle}

/** q137–q143 — the serving/audit batch: range search, multi-positive
  * recommendation, n-gram novelty, value histogram, shard balance,
  * calibration bins, and the k-anonymity audit — constructed inputs,
  * closed-form or brute-force-mirrored outcomes.
  */
class ServingOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ------------------------------------------------------------------ q137

  test("q137: the radius cut keeps exactly the points at or above tau, best-first") {
    val queries = Seq((0L, Array(1f, 0f))).toDF("qid", "qvec")
    val corpus = Seq(
      (1L, Array(1f, 0f)),     // score 1.0
      (2L, Array(0.5f, 0f)),   // same direction: 1.0
      (3L, Array(0f, 1f)),     // orthogonal: 0.0 — cut
      (4L, Array(1f, 1f)))     // 45°: 0.707107
      .toDF("vec_id", "embedding")
    val out = Knn.rangeSearchOf(queries, corpus, 0.3).collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 1.0), (2L, 1.0), (4L, 0.707107)),
      s"got ${out.toSeq}")
  }

  // ------------------------------------------------------------------ q138

  test("q138: the recommendation queries from the rounded example mean and never returns an example") {
    // group 0 examples: (1,0), (0,1), (1,1) -> mean (0.666667, 0.666667);
    // the non-example diagonal point must rank 1 at score 1.0
    val emb = Seq(
      (0L, Array(1f, 0f)), (10L, Array(0f, 1f)), (20L, Array(1f, 1f)),
      (30L, Array(0.9f, 0.9f)), (31L, Array(1f, 0.5f)), (32L, Array(0f, 2f)))
      .toDF("vec_id", "embedding")
    val examples = Seq((0L, 0L), (0L, 10L), (0L, 20L)).toDF("gid", "ex_id")
    val out = Knn.recommendMultiOf(emb, examples, 3).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.head == ((30L, 1.0, 1L)), s"got ${out.toSeq}")
    assert(!out.map(_._1).toSet.exists(Set(0L, 10L, 20L)),
      "examples are excluded from their own recommendations")
  }

  // ------------------------------------------------------------------ q139

  test("q139: novelty counts exactly the val gram types unseen in train") {
    val docs = Seq(
      (1L, "a b c d e", "en"),   // train: grams {a b c d, b c d e}
      (9L, "a b c d x", "en"),   // val:   {a b c d (seen), b c d x (novel)}
      (19L, "a b c d e", "en"))  // val:   {a b c d, b c d e} both seen
      .toDF("doc_id", "text", "lang")
    val out = CorpusStats.ngramNoveltyOf(docs).collect().head
    assert((out.getLong(1), out.getLong(2), out.getDouble(3)) ==
      ((3L, 1L, r6(1.0 / 3))), s"got $out")
  }

  test("q139: a language whose val grams are all seen reads novelty 0") {
    val docs = Seq((1L, "p q r s t", "it"), (9L, "p q r s t", "it"))
      .toDF("doc_id", "text", "lang")
    val out = CorpusStats.ngramNoveltyOf(docs).collect().head
    assert(out.getLong(2) == 0L && out.getDouble(3) == 0.0)
  }

  // ------------------------------------------------------------------ q140

  test("q140: cent-exact buckets — 20 distinct cents land in 20 distinct buckets") {
    val events = (0 until 20).map(i => ("a", i * 0.01)).toDF("event_type", "value")
    val out = Analytics.valueHistogramOf(events).collect()
    assert(out.length == 20)
    assert(out.map(_.getLong(1)).toSeq == (0L until 20L))
    assert(out.forall(_.getLong(3) == 1L))
    assert(out.head.getDouble(2) == 0.0 && out.last.getDouble(2) == 0.19)
  }

  test("q140: a constant column collapses into bucket 0 without dividing by zero") {
    val events = (1 to 7).map(_ => ("b", 2.5)).toDF("event_type", "value")
    val out = Analytics.valueHistogramOf(events).collect()
    assert(out.length == 1 && out.head.getLong(1) == 0L && out.head.getLong(3) == 7L)
  }

  // ------------------------------------------------------------------ q141

  test("q141: balance stats match a brute-force md5-nibble mirror") {
    val n = 500
    val docs = (0L until n.toLong).map(Tuple1(_)).toDF("doc_id")
    val out = ShardShuffle.shardBalanceOf(docs, ShardShuffle.NumShards).collect().head
    // brute-force mirror of the nibble assignment
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = (0L until n.toLong)
      .map { id =>
        val hex = md.digest(s"shuffle:$id".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        "0123456789abcdef".indexOf(hex.head) % ShardShuffle.NumShards
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val e = n.toDouble / ShardShuffle.NumShards
    val chi2 = counts.values.map(c => (c - e) * (c - e) / e).sum
    assert(out.getLong(0) == counts.size.toLong && out.getLong(1) == n.toLong)
    assert(out.getLong(2) == counts.values.min && out.getLong(3) == counts.values.max)
    assert(out.getDouble(4) == r6(counts.values.max.toDouble / counts.values.min))
    assert(math.abs(out.getDouble(5) - chi2) < 1e-6, s"chi2 ${out.getDouble(5)} vs $chi2")
  }

  // ------------------------------------------------------------------ q142

  test("q142: bins group by exact vote count and read closed-form accuracy") {
    val preds = Seq(
      (1L, 3L, 3L, 10L), (2L, 5L, 5L, 10L),       // votes 10: both correct
      (3L, 1L, 2L, 5L), (4L, 7L, 7L, 5L))         // votes 5: one correct
      .toDF("qid", "pred_label", "true_label", "votes")
    val out = Classify.knnCalibrationOf(preds, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq((5L, 0.5, 2L, 1L, 0.5), (10L, 1.0, 2L, 2L, 1.0)),
      s"got ${out.toSeq}")
  }

  // ------------------------------------------------------------------ q143

  test("q143: small equivalence classes are counted with their populations") {
    val docs = (
      (1 to 6).map(i => ("en", "web", 150L)) ++     // class of 6: safe
      (1 to 2).map(i => ("it", "web", 450L)))       // class of 2: exposed
      .toDF("lang", "source", "n_chars")
    val out = Quality.privacyKanonOf(docs).collect().head
    assert((out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3), out.getLong(4)) ==
      ((2L, 8L, 2L, 1L, 2L)))
    assert(out.getDouble(5) == 0.25)
  }

  test("q143: the length bucket is integer division — 99 and 100 chars split classes") {
    val docs = Seq(("en", "web", 99L), ("en", "web", 100L)).toDF("lang", "source", "n_chars")
    val out = Quality.privacyKanonOf(docs).collect().head
    assert(out.getLong(0) == 2L, "bucket boundary must split deterministically")
  }
}
