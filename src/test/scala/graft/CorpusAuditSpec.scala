package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Audit, CorpusStats}

/** q106/q107/q108/q109 — perplexity bucketing, matryoshka recall, the
  * LSH-banding audit, and the Zipf fit, on constructed corpora where the
  * expected statistics are known in closed form.
  */
class CorpusAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q106: buckets partition the scored population and order by score") {
    val out = CorpusStats.perplexityBucket(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val langs = out.map(_._1).distinct
    // every language emits head+middle+tail, tertile counts within 1
    langs.foreach { l =>
      val rows = out.filter(_._1 == l)
      assert(rows.map(_._2).sorted.toSeq == Seq("head", "middle", "tail"), s"lang $l buckets")
      val ns = rows.map(_._3)
      assert(ns.max - ns.min <= 1, s"lang $l tertiles must be balanced within 1: ${ns.toSeq}")
      // per-doc mean score must be monotone head ≥ middle ≥ tail
      def mean(b: String) = { val r = rows.find(_._2 == b).get; r._4 / r._3 }
      assert(mean("head") >= mean("middle") && mean("middle") >= mean("tail"),
        s"lang $l bucket means must descend")
    }
  }

  test("q107: full-width recall is exactly 1 and every recall is a valid rate") {
    val out = Audit.matryoshkaRecall(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(out.keySet == Audit.MatryoshkaDims.map(_.toLong).toSet)
    assert(out(Audit.MatryoshkaDims.max.toLong) == 1.0,
      "the full-width prefix IS the exact search — its recall row is the sanity anchor")
    out.values.foreach(r => assert(r >= 0.0 && r <= 1.0))
  }

  test("q108: exact duplicates always band together — recall 1.0 on an exact-dup corpus") {
    // 5 duplicated texts (ids i and 100+i share text) + 20 distinct fillers
    // whose word sets are disjoint: truth = exactly the 5 identical pairs
    // (jaccard 1.0), and identical shingle sets give identical signatures,
    // so the banding must propose every one of them.
    val dupTexts = (0 until 5).map(i => s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i")
    val docs = (
      dupTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      dupTexts.zipWithIndex.map { case (t, i) => (100L + i, t) } ++
      (0 until 20).map(i => (50L + i, s"u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f"))
    ).toDF("doc_id", "text")
    val r = Audit.lshAuditOf(docs).collect().head
    assert(r.getLong(0) == 5, s"truth must be the 5 identical pairs, got ${r.getLong(0)}")
    assert(r.getDouble(4) == 1.0, "exact duplicates share every band key — recall must be 1.0")
    assert(r.getLong(2) <= r.getLong(1) && r.getLong(2) <= r.getLong(0))
  }

  test("q109: a constructed 1/rank corpus fits slope ≈ −1 with high r2") {
    // token w_i appears floor(600/i) times, i = 1..120 — an exact Zipf
    // spectrum; the log-log least-squares line must recover it
    val text = (1 to 120).flatMap(i => Seq.fill(600 / i)(f"w$i%03d")).mkString(" ")
    val docs = Seq((0L, text)).toDF("doc_id", "text")
    val r = CorpusStats.zipfSlopeOf(docs).collect().head
    assert(r.getLong(0) == 120, "n_types must count the full vocabulary")
    val slope = r.getDouble(1)
    assert(slope > -1.1 && slope < -0.9, s"slope must recover ≈ −1, got $slope")
    assert(r.getDouble(3) > 0.95, s"log-log fit of an exact power law must have r2 near 1, got ${r.getDouble(3)}")
  }

  test("q109: ranking truncates at the configured spectrum depth") {
    // more types than ZipfTopN is the production case; here fewer — the
    // fit must use every type and the count must still be the full vocab
    val docs = Seq((0L, "a a a b b c")).toDF("doc_id", "text")
    val r = CorpusStats.zipfSlopeOf(docs).collect().head
    assert(r.getLong(0) == 3)
  }

  test("q115: pair counts and pmi match a brute-force reference on a constructed corpus") {
    val base = Seq("alpha beta gamma alpha delta", "beta gamma beta epsilon alpha zeta")
    val reps = 6 // lift every pair past the CoocMinCount floor
    val texts = Seq.fill(reps)(base).flatten
    val out = CorpusStats.pmiCooccurOf(texts.toDF("text")).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))

    // brute-force reference: all unordered within-window pairs
    val tokss = texts.map(_.split(" ").toSeq)
    val uni = tokss.flatten.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val nTok = tokss.map(_.size).sum.toDouble
    val pairs = tokss.flatMap { t =>
      for { i <- t.indices; d <- 1 to CorpusStats.CoocWindow if i + d < t.size }
        yield { val (x, y) = (t(i), t(i + d)); if (x <= y) (x, y) else (y, x) }
    }
    val nPairs = pairs.size.toDouble
    val expect = pairs.groupBy(identity).view.mapValues(_.size)
      .filter(_._2 >= CorpusStats.CoocMinCount)
      .map { case (k, c) =>
        k -> (c.toLong, BigDecimal(
          math.log((c / nPairs) / ((uni(k._1) / nTok) * (uni(k._2) / nTok))))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toMap
    assert(expect.nonEmpty && expect.size <= CorpusStats.CoocTopK)
    assert(out.toMap == expect)

    // canonical unordered pairs, presentation order (pmi desc, a, b)
    assert(out.forall { case ((a, b), _) => a <= b })
    val keys = out.map { case ((a, b), (_, p)) => (-p, a, b) }
    assert(keys.sameElements(keys.sorted), "rows must order by (pmi desc, a, b)")
  }

  test("q115: the min-count floor drops rare pairs") {
    // every pair occurs exactly once — below the floor, nothing reported
    val docs = Seq("one two three four five six seven").toDF("text")
    assert(CorpusStats.pmiCooccurOf(docs).count() == 0)
  }
}
