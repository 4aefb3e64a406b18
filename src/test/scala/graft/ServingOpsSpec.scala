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

  test("q158: the planted far-out vector ranks first in its label") {
    val tight = (0L to 9L).map(i => (i, Array.fill(4)(1.0f + 0.01f * (i % 3)), 7))
    val planted = Seq((99L, Array(9f, -9f, 9f, -9f), 7))
    val emb = (tight ++ planted).toDF("vec_id", "embedding", "label")
    val top = Analytics.embeddingOutliersOf(emb, 3).collect()
    assert(top.head.getLong(1) == 99L, "the planted outlier must rank first")
    assert(top.map(_.getLong(3)).toSeq == Seq(1L, 2L, 3L), "ranks dense from 1")
  }

  test("q158: scores match a brute-force diagonal Mahalanobis on the fixture") {
    val emb = graft.Tables.embeddings(spark, TestSpark.Sf0001)
    val rows = emb.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byLabel = rows.groupBy(_._3)
    val expect = byLabel.toSeq.flatMap { case (lbl, vs) =>
      val dim = vs.head._2.length
      val mu = (0 until dim).map(d => r6(vs.map(_._2(d)).sum / vs.length))
      val m2 = (0 until dim).map(d => r6(vs.map(x => x._2(d) * x._2(d)).sum / vs.length))
      val den = (0 until dim).map(d => m2(d) - mu(d) * mu(d) + Analytics.OodEps)
      vs.map { case (id, x, _) =>
        (lbl.toLong, id) -> r6((0 until dim).map(d => (x(d) - mu(d)) * (x(d) - mu(d)) / den(d)).sum)
      }
    }.toMap
    val got = Analytics.embeddingOutliersOf(emb, Analytics.OodTopK).collect()
    got.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(math.abs(r.getDouble(2) - expect(key)) < 1e-6, s"score mismatch at $key")
    }
    // and the cut itself: top-k per label by (rounded score desc, vec_id)
    val wantTop = expect.groupBy(_._1._1).toSeq.flatMap { case (lbl, m) =>
      m.toSeq.sortBy { case ((_, id), s) => (-s, id) }.take(Analytics.OodTopK).map(_._1)
    }.toSet
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet == wantTop)
  }
}
