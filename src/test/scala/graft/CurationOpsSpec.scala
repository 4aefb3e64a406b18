package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Analytics, Behavior, Cluster, CorpusStats, Gazetteer, Quality, Sampling, Skew}

/** q128–q136 — the round-12 continuation batch: domain-KL audit, PPS
  * sampling, the filter funnel, fuzzy record linkage, power iteration,
  * cluster keywords, rank correlation, key-skew audit, and the
  * late-arrival audit — each on constructed inputs with closed-form or
  * brute-force-mirrored outcomes.
  */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ------------------------------------------------------------------ q128

  test("q128: a source distributed like the corpus has KL 0; a one-sided source reads ln 2") {
    // corpus = {x:4, y:4}; source A = {x:2, y:2} (the corpus mix, KL 0),
    // sources B/C = all-x / all-y: KL = 1·ln(1/0.5) = ln 2
    val docs = Seq(
      (1L, "x y", "A"), (2L, "y x", "A"),
      (3L, "x x", "B"), (4L, "y y", "C"))
      .toDF("doc_id", "text", "source")
    val out = CorpusStats.domainKlOf(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out("A") == ((4L, 2L, 0.0, 1.0)))
    assert(out("B") == ((2L, 1L, r6(math.log(2)), 0.5)))
    assert(out("C") == ((2L, 1L, r6(math.log(2)), 0.5)))
  }

  test("q128: KL is volume-weighted by the source's own distribution, not the corpus'") {
    // source D = {x:3, y:1} inside corpus {x:4, y:4, z:8}:
    // p = (.75, .25), q = (.25, .25, .5) -> KL = .75 ln 3 + .25 ln 1
    val docs = Seq(
      (1L, "x x x y", "D"), (2L, "x y y y", "E"),
      (3L, "z z z z z z z z", "F"))
      .toDF("doc_id", "text", "source")
    val out = CorpusStats.domainKlOf(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("D") == r6(0.75 * math.log(0.75 / 0.25) + 0.25 * math.log(0.25 / 0.25)))
  }

  // ------------------------------------------------------------------ q129

  test("q129: the hash gate reproduces the brute-force PPS keep set exactly") {
    val docs = (0L until 200L).map(i => (i, "l" + (i % 3), 10L + (i * 7) % 90))
    val kept = Sampling.ppsSampleOf(docs.toDF("doc_id", "lang", "n_chars"))
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    // brute-force mirror in exact integer arithmetic
    val wLang = docs.groupBy(_._2).map { case (l, ds) => l -> ds.map(_._3).sum }
    val expect = docs.flatMap { case (id, l, w) =>
      val t = math.min(1048576L, Sampling.PpsTargetK * w * 1048576L / wLang(l))
      if ((id * 2246822519L) % 1048576L < t) Some(id -> t) else None
    }.toMap
    assert(kept == expect)
    assert(kept.nonEmpty && kept.size < docs.size, "a non-degenerate subsample")
  }

  test("q129: a language whose quota exceeds its volume keeps every row at p=1") {
    // 5 docs, K=40 -> K·w/W > 1 for every row -> threshold caps at 2^20
    val docs = (0L until 5L).map(i => (i, "en", 100L))
      .toDF("doc_id", "lang", "n_chars")
    val out = Sampling.ppsSampleOf(docs).collect()
    assert(out.length == 5)
    assert(out.forall(_.getLong(3) == 1048576L))
  }

  // ------------------------------------------------------------------ q130

  test("q130: each planted document drops at exactly its stage and the funnel chains") {
    val filler = (1 to 30).map(i => s"w$i").mkString(" ") // 30 distinct alnum tokens
    val docs = Seq(
      (1L, "too short"),                                   // stage 1: < 20 tokens
      (2L, filler),                                        // stage 2: zero stopwords
      (3L, s"the $filler ! ! ! ! ! ! ! ! ! ! ! ! ! !"),    // stage 3: 14/45 < 30%? no: 14·10 > 45·3 -> punct fail
      (4L, "the " + Seq.fill(40)("dup").mkString(" ")),    // stage 4: 2 distinct / 41
      (5L, "the " + ('a' to 'z').mkString(" ")),             // stage 5: avg token len < 2
      (6L, "the quick brown fox jumps over lazy dogs and " +
        (1 to 15).map(i => s"token$i").mkString(" ")))     // survives
      .toDF("doc_id", "text")
    val out = Quality.filterFunnelOf(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.map(t => (t._1, t._3, t._4, t._5)).toSeq == Seq(
      (1L, 6L, 1L, 5L), (2L, 5L, 1L, 4L), (3L, 4L, 1L, 3L),
      (4L, 3L, 1L, 2L), (5L, 2L, 1L, 1L)),
      s"got ${out.toSeq}")
    assert(out.map(_._2).toSeq == Quality.FunnelRules)
  }

  test("q130: every gate is integer arithmetic — a doc ON a ratio boundary keeps deterministically") {
    // exactly 2% stopwords: 1 stop in 50 tokens -> n_stop·50 == n_tokens,
    // NOT < -> passes stage 2 (boundary is exact, no float compare)
    val doc = "the " + (1 to 49).map(i => s"tok$i").mkString(" ")
    val out = Quality.filterFunnelOf(Seq((1L, doc)).toDF("doc_id", "text")).collect()
    assert(out.map(_.getLong(3)).sum == 0, s"the boundary doc must survive every gate")
  }

  // ------------------------------------------------------------------ q131

  test("q131: every probe resolves to its own source document with dist = corrupted chars") {
    // prefix "markets here todaq zz" has a/e at known spots; doc 37 is
    // textually far so probe 0 must match doc 0
    val t0 = "mostly consonant words fill this doc body"
    val t37 = "zzzz qqqq vvvv wwww xxxx yyyy"
    val docs = Seq((0L, t0), (37L, t37)).toDF("doc_id", "text")
    val out = Gazetteer.fuzzyLinkOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val aeCount0 = t0.take(Gazetteer.LinkKeyLen).count(c => c == 'a' || c == 'e')
    val aeCount37 = t37.take(Gazetteer.LinkKeyLen).count(c => c == 'a' || c == 'e')
    assert(aeCount0 <= Gazetteer.LinkMaxDist && aeCount37 == 0)
    assert(out == Seq((0L, 0L, aeCount0.toLong), (37L, 37L, 0L)), s"got $out")
  }

  test("q131: equidistant candidates tie-break to the smaller doc_id") {
    val shared = "simple found words right okay"
    val docs = Seq((0L, shared), (1L, shared)).toDF("doc_id", "text")
    val out = Gazetteer.fuzzyLinkOf(docs).collect().head
    assert(out.getLong(0) == 0L && out.getLong(1) == 0L && out.getLong(3) == 2L,
      "probe 0 must match doc 0 (not the equidistant doc 1) and see both candidates")
  }

  // ------------------------------------------------------------------ q132

  test("q132: two pinned passes match the brute-force mirror and find the dominant axis") {
    val vs = Seq(Array(2f, 0f), Array(1f, 0f), Array(0f, 1f), Array(3f, 1f))
    val out = Analytics.powerIterationOf(vs.map(v => (1, v)).toDF("label", "embedding"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    // brute-force mirror of the exact pinned arithmetic
    val x = vs.map(_.map(_.toDouble))
    val s1 = x.map(_.sum)
    val w1 = Array.tabulate(2)(d => x.zip(s1).map { case (row, s) => row(d) * s }.sum)
    val n1 = math.sqrt(w1.map(v => v * v).sum)
    val u1 = w1.map(v => r6(v / n1))
    val s2 = x.map(row => row.zip(u1).map { case (a, b) => a * b }.sum)
    val w2 = Array.tabulate(2)(d => x.zip(s2).map { case (row, s) => row(d) * s }.sum)
    val n2 = math.sqrt(w2.map(v => v * v).sum)
    val expect = (1 to 2).map(d => (d.toLong, r6(w2(d - 1) / n2), r6(n2)))
    assert(out.toSeq == expect)
    assert(out(0)._2 > 0.9, "the mass sits on dim 1 — the loading must say so")
  }

  // ------------------------------------------------------------------ q133

  test("q133: each cluster's rank-1 keyword is its own theme; shared filler ranks below") {
    val filler = "common words appear everywhere here" // shared across clusters
    val docs = Seq(
      (0L, s"alpha alpha alpha $filler"), (1L, s"alpha alpha $filler"),
      (2L, s"gamma gamma gamma $filler"), (3L, s"gamma gamma $filler"))
      .toDF("doc_id", "text")
    val classes = Seq((0L, 0L), (1L, 0L), (2L, 1L), (3L, 1L)).toDF("doc_id", "cluster")
    val out = Cluster.clusterKeywordsOf(docs, classes).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getString(2))).toMap
    assert(out((0L, 1L)) == "alpha")
    assert(out((1L, 1L)) == "gamma")
  }

  test("q133: stopwords, short and non-alphabetic tokens never become keywords") {
    val docs = Seq(
      (0L, "the the the x9 ab real keyword content alpha"),
      (1L, "the the x9 ab more keyword content beta"))
      .toDF("doc_id", "text")
    val classes = Seq((0L, 0L), (1L, 0L)).toDF("doc_id", "cluster")
    val toks = Cluster.clusterKeywordsOf(docs, classes).collect().map(_.getString(2)).toSet
    assert(!toks.contains("the") && !toks.contains("x9") && !toks.contains("ab"))
  }

  // ------------------------------------------------------------------ q134

  test("q134: a monotone pair reads spearman 1; an inverse pair reads -1") {
    val up = (1 to 20).map(i => (i.toLong, i * 0.1, i * 0.3))
      .toDF("doc_id", "s1", "s2")
    val r1 = Quality.scoreRankCorrOf(up).collect().head
    assert((r1.getLong(0), r1.getDouble(1), r1.getDouble(2)) == ((20L, 1.0, 1.0)))
    val down = (1 to 20).map(i => (i.toLong, i * 0.1, -i * 0.2))
      .toDF("doc_id", "s1", "s2")
    val r2 = Quality.scoreRankCorrOf(down).collect().head
    assert((r2.getDouble(1), r2.getDouble(2)) == ((-1.0, -1.0)))
  }

  test("q134: ties take fractional mid-ranks — the textbook worked example") {
    // s1 = (1, 2, 2, 3) -> ranks (1, 2.5, 2.5, 4); s2 = (1, 2, 3, 4)
    val scored = Seq((1L, 1.0, 1.0), (2L, 2.0, 2.0), (3L, 2.0, 3.0), (4L, 3.0, 4.0))
      .toDF("doc_id", "s1", "s2")
    val out = Quality.scoreRankCorrOf(scored).collect().head
    val ra = Seq(1.0, 2.5, 2.5, 4.0); val rb = Seq(1.0, 2.0, 3.0, 4.0)
    val n = 4.0
    val num = n * ra.zip(rb).map { case (a, b) => a * b }.sum - ra.sum * rb.sum
    val den = math.sqrt(n * ra.map(v => v * v).sum - ra.sum * ra.sum) *
      math.sqrt(n * rb.map(v => v * v).sum - rb.sum * rb.sum)
    assert(out.getDouble(1) == r6(num / den))
  }

  test("q134: a constant signal has no defined correlation — NULL, not NaN") {
    val scored = (1 to 5).map(i => (i.toLong, 1.0, i * 1.0)).toDF("doc_id", "s1", "s2")
    val out = Quality.scoreRankCorrOf(scored).collect().head
    assert(out.isNullAt(1) && out.isNullAt(2))
  }

  // ------------------------------------------------------------------ q135

  test("q135: closed-form skew stats on a hand-built hot key") {
    // type a: user 1 ×4, user 2 ×1 -> S=5, ss=17, cv=sqrt(2·17-25)/5=0.6,
    // p50 = 2.5, p99 = 1+0.99·3 = 3.97
    val events = (Seq.fill(4)(("a", 1L)) ++ Seq(("a", 2L)) ++
      (1 to 3).map(u => ("b", u.toLong)))
      .toDF("event_type", "user_id")
    val out = Skew.keySkewAuditOf(events, "event_type", "user_id").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getDouble(8))))
      .toMap
    assert(out("a") == ((5L, 2L, 4L, 0.8, 0.6, 2.5, 3.97, 1.588)))
    assert(out("b") == ((3L, 3L, 1L, r6(1.0 / 3), 0.0, 1.0, 1.0, 1.0)))
  }

  // ------------------------------------------------------------------ q136

  test("q136: lateness is measured against the running high-water mark in arrival order") {
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val events = Seq(
      (1L, 1L, ts(10, 0), "view"),   // establishes wm = 10:00
      (1L, 2L, ts(9, 0), "view"),    // 1 h behind -> late, 3600 s
      (1L, 3L, ts(9, 50), "view"),   // 10 min behind -> within tolerance
      (1L, 4L, ts(11, 0), "click"),  // advances its own path, never late
      (2L, 5L, ts(8, 0), "click"))   // first arrival: no wm, never late
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Behavior.lateEventAuditOf(events).collect()
      .map(r => r.getString(0) -> r).toMap
    val v = out("view")
    assert((v.getLong(1), v.getLong(2), v.getDouble(3)) == ((3L, 1L, r6(1.0 / 3))))
    assert(v.getDouble(4) == 3600.0 && v.getDouble(5) == 3600.0)
    val c = out("click")
    assert((c.getLong(1), c.getLong(2)) == ((2L, 0L)))
    assert(c.isNullAt(4) && c.isNullAt(5), "no late rows -> null lateness stats")
  }

  test("q136: the tolerance is a strict interval — exactly 30 minutes behind is NOT late") {
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val events = Seq(
      (1L, 1L, ts(10, 0), "view"),
      (1L, 2L, ts(9, 30), "view"))   // ts == wm - 30min: not strictly less
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Behavior.lateEventAuditOf(events).collect().head
    assert(out.getLong(2) == 0L)
  }
}
