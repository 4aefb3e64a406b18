package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Analytics, Behavior}

/** q113/q114/q117 — windowed funnel conversion, RFM segmentation, and
  * the MAD outlier report, on constructed event streams with
  * hand-checkable outcomes.
  */
class BehaviorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")
  private def tsH(hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:00:00")
  private def tsS(second: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:00:$second%02d".take(19) match {
      case t if second < 60 => t
      case _ => f"2024-01-01 00:${second / 60}%02d:${second % 60}%02d"
    })

  test("q113: order matters — a purchase BEFORE the view chain does not convert") {
    // user 1: view(1) click(2) purchase(3)  → full conversion
    // user 2: purchase(1) view(2) click(3)  → stops at click (no purchase after)
    // user 3: click(1) view(2)              → view only (no click after the view)
    // user 4: only errors                   → not even stage 1
    val events = Seq(
      (1L, 1L, ts(1), "view", 1.0), (1L, 2L, ts(2), "click", 1.0), (1L, 3L, ts(3), "purchase", 1.0),
      (2L, 4L, ts(1), "purchase", 1.0), (2L, 5L, ts(2), "view", 1.0), (2L, 6L, ts(3), "click", 1.0),
      (3L, 7L, ts(1), "click", 1.0), (3L, 8L, ts(2), "view", 1.0),
      (4L, 9L, ts(1), "error", 1.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val r = Behavior.funnelStepsOf(events).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((4L, 3L, 2L, 1L)),
      s"expected (users 4, view 3, click 2, purchase 1), got $r")
    assert(r.getDouble(6) == math.rint(1.0 / 3.0 * 1e6) / 1e6) // conv_total = 1/3 at 6 dp
  }

  test("q113: the conversion window is per-step — a click past the window does not count") {
    // user 1 clicks 13h after the first view: outside the 12h window
    // user 2 clicks 11h after: inside, then purchases 11h after that: inside
    val events = Seq(
      (1L, 1L, tsH(0), "view", 1.0), (1L, 2L, tsH(13), "click", 1.0),
      (2L, 3L, tsH(0), "view", 1.0), (2L, 4L, tsH(11), "click", 1.0),
      (2L, 5L, tsH(22), "purchase", 1.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val r = Behavior.funnelStepsOf(events).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((2L, 1L, 1L)))
  }

  test("q113: the anchor is the FIRST view — a later view cannot restart the window") {
    // view at h0, view again at h20, click at h21: 1h after the second
    // view but 21h after the anchor — no stage-2 conversion
    val events = Seq(
      (1L, 1L, tsH(0), "view", 1.0), (1L, 2L, tsH(20), "view", 1.0),
      (1L, 3L, tsH(21), "click", 1.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val r = Behavior.funnelStepsOf(events).collect().head
    assert((r.getLong(1), r.getLong(2)) == ((1L, 0L)))
  }

  test("q114: scores quantize a constructed spread into the expected segments") {
    // 5 users with strictly increasing frequency/monetary and identical
    // recency: f/m scores must be 1..5 in user order, r_score constant
    val events = (1 to 5).flatMap { u =>
      (1 to u * 2).map(i => (u.toLong, (u * 100 + i).toLong, ts(i), "view", u * 10.0))
    }.toDF("user_id", "event_id", "ts", "event_type", "value")
    val segs = Behavior.rfmSegmentsOf(events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(segs.map(_._4).sum == 5, "every user lands in exactly one segment")
    val fScores = segs.flatMap { case (_, f, _, n) => Seq.fill(n.toInt)(f) }.sorted
    assert(fScores.toSeq == Seq(1L, 2L, 3L, 4L, 5L),
      s"5 strictly increasing frequencies must fill all 5 quintiles, got ${segs.toSeq}")
    assert(segs.map(_._1).distinct.length == 1, "identical recency → one r_score")
    // f and m rank users identically here, so the scores must agree
    assert(segs.forall { case (_, f, m, _) => f == m })
  }

  test("q114: monetary rounds before scoring — summation-order noise cannot flip a segment") {
    // two users with the SAME true 2-dp sum reached via many small values
    // must always share m_score
    val events = (
      (1 to 100).map(i => (1L, i.toLong, ts(1), "view", 0.01)) ++
      Seq((2L, 200L, ts(1), "view", 1.00)) ++
      Seq((3L, 300L, ts(1), "view", 5.00)))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val segs = Behavior.rfmSegmentsOf(events)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // m spread {1.00, 1.00, 5.00}: cuts interpolate to (1, 1, 1.8, 3.4),
    // so both 1.00-sum users score m=3 and the 5.00 user m=5 — users 1
    // and 2 MUST share m_score (same rounded value, same cuts) even
    // though one reached it through 100 float adds
    val mByRow = segs.flatMap { case (_, m, n) => Seq.fill(n.toInt)(m) }.sorted
    assert(mByRow.toSeq == Seq(3L, 3L, 5L), s"got ${segs.toSeq}")
  }

  test("q117: median, MAD, and the outlier cut match closed-form values") {
    // type a: 1..9 plus one wild point. med 5.5; devs sorted
    // [.5 .5 1.5 1.5 2.5 2.5 3.5 3.5 4.5 994.5] -> mad 2.5;
    // cutoff 4.4478*2.5 = 11.1195 -> only the wild point is out.
    // type b: uniform 1..5 -> mad 1, nothing past the cut.
    val events =
      ((1 to 9).map(v => ("a", v.toDouble)) :+ ("a", 1000.0)) ++
        (1 to 5).map(v => ("b", v.toDouble))
    val out = Analytics.madOutliersOf(events.toDF("event_type", "value")).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4), r.getDouble(5))))
      .toMap
    assert(out("a") == ((10L, 5.5, 2.5, 1L, 0.1)))
    assert(out("b") == ((5L, 3.0, 1.0, 0L, 0.0)))
  }

  test("q117: the robust pair is immune to the outlier it hunts") {
    // a mean/stddev z-score on this stream reads z ~ 3.0 for the wild
    // point only because sigma inflated 300x; the MAD cut flags it at
    // dev/mad ~ 400 regardless of how extreme it is
    val events = ((1 to 99).map(v => ("a", (v % 10 + 1).toDouble)) :+ ("a", 1e6)).toSeq
    val out = Analytics.madOutliersOf(events.toDF("event_type", "value")).collect().head
    assert(out.getLong(4) == 1L, "exactly the planted point is out")
    assert(out.getDouble(3) <= 3.0, "MAD must stay at the bulk's scale")
  }

  test("q119: collimated and isotropic label populations hit the closed-form poles") {
    // label 1: four vectors on ONE ray, norms 1..4 -> rbar 1, mean
    // pairwise cos 1, avg_norm 2.5. label 2: the four 2-d axis
    // directions -> resultant 0, mean pairwise cos (0-n)/(n(n-1)) = -1/3.
    // label 3: a zero vector among them is outside the population.
    val emb = Seq(
      (1, Array(1f, 0f)), (1, Array(2f, 0f)), (1, Array(3f, 0f)), (1, Array(4f, 0f)),
      (2, Array(1f, 0f)), (2, Array(-1f, 0f)), (2, Array(0f, 1f)), (2, Array(0f, -1f)),
      (3, Array(0f, 0f)), (3, Array(0f, 5f)), (3, Array(0f, 7f))
    ).toDF("label", "embedding")
    val out = graft.operators.Analytics.isotropyReportOf(emb).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out(1) == ((4L, 2.5, 1.0, 1.0)))
    assert(out(2) == ((4L, 1.0, 0.0, -0.333333)))
    assert(out(3) == ((2L, 6.0, 1.0, 1.0)), "the zero vector must be excluded")
  }

  test("q119: the sum-identity equals the brute-force pairwise mean") {
    val vs = Seq(Array(3f, 1f, 2f), Array(-1f, 4f, 0f), Array(2f, -2f, 5f),
      Array(0f, 1f, 1f), Array(-3f, -1f, 2f))
    val out = graft.operators.Analytics.isotropyReportOf(
      vs.map(v => (9, v)).toDF("label", "embedding")).collect().head
    def dot(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    def cos(a: Array[Float], b: Array[Float]) =
      dot(a, b) / math.sqrt(dot(a, a) * dot(b, b))
    val pairs = for (i <- vs.indices; j <- vs.indices if i != j) yield cos(vs(i), vs(j))
    val expect = BigDecimal(pairs.sum / pairs.size)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out.getDouble(4) - expect) <= 1e-6,
      s"identity ${out.getDouble(4)} vs brute force $expect")
  }

  test("q120: a planted burst hour flags; steady traffic does not") {
    // type a: 2/hour for 10 hours plus 18 extra in hour 5 (n=20);
    // lam_a = 38/10 = 3.8 -> z(20) = 16.2/sqrt(3.8) ~ 8.3, flagged.
    // type b: exactly 2 every hour -> z < 0 everywhere, never flagged.
    val events = (0 until 10).flatMap { h =>
      val base = Seq.fill(2)(("a", tsH(h))) ++ Seq.fill(2)(("b", tsH(h)))
      if (h == 5) base ++ Seq.fill(18)(("a", tsH(h))) else base
    }
    val out = graft.operators.Analytics.rateBurstsOf(
      events.toDF("event_type", "ts")).collect()
    assert(out.length == 1)
    val r = out.head
    val z = BigDecimal((20 - 3.8) / math.sqrt(3.8))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert((r.getString(0), r.getLong(2), r.getDouble(3), r.getDouble(4)) ==
      (("a", 20L, 3.8, z)))
    assert(r.getLong(1) == tsH(5).getTime / 1000, "the flagged bucket is hour 5")
  }

  test("q122: transition counts and row-normalized probabilities on a hand stream") {
    // user 1: view -> click -> view; user 2: view -> view.
    // from view: {click:1, view:1} -> p .5/.5; from click: {view:1} -> 1.0
    val events = Seq(
      (1L, ts(0), 10L, "view"), (1L, ts(1), 11L, "click"), (1L, ts(2), 12L, "view"),
      (2L, ts(0), 20L, "view"), (2L, ts(5), 21L, "view")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = graft.operators.Behavior.eventTransitionsOf(events).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
    assert(out.toMap == Map(
      ("view", "click") -> ((1L, 0.5)), ("view", "view") -> ((1L, 0.5)),
      ("click", "view") -> ((1L, 1.0))))
    val keys = out.map(_._1)
    assert(keys.sameElements(keys.sorted), "ordered by (from_type, to_type)")
  }

  test("q122: same-timestamp ties walk in event_id order") {
    // two events at the identical instant: event_id decides the sequence
    val events = Seq(
      (1L, ts(0), 2L, "click"), (1L, ts(0), 1L, "view")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = graft.operators.Behavior.eventTransitionsOf(events).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("view", "click")))
  }

  test("q123: gap percentiles hit the interpolated closed forms") {
    // user 1 purchases at +10s and +30s after prior events: gaps 10, 20
    // -> mean 15, median 15, p90 = 10 + 0.9*(20-10) = 19
    val events = Seq(
      (1L, tsS(0), 1L, "view"), (1L, tsS(10), 2L, "purchase"),
      (1L, tsS(30), 3L, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = graft.operators.Behavior.interarrivalStatsOf(events).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)) ==
      (("purchase", 2L, 15.0, 15.0, 19.0)))
  }

  test("q167: a hand cohort retains exactly the users who return") {
    import spark.implicits._
    val day = 86400000000L
    def ts(d: Long) = new java.sql.Timestamp(d * day / 1000)
    // users 1,2 first seen day 0; user 2 returns day 1; user 3 first seen day 1
    val ev = Seq((1L, ts(0)), (2L, ts(0)), (2L, ts(1)), (3L, ts(1)))
      .toDF("user_id", "ts")
    val out = graft.operators.Behavior.cohortRetentionOf(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val d0 = out.keys.map(_._1).min
    assert(out((d0, 0L)) == ((2L, 2L, 100.0)), "cohort day 0: both users active at offset 0")
    assert(out((d0, 1L)) == ((2L, 1L, 50.0)), "only user 2 returns on day 1")
    assert(out((d0 + 1, 0L)) == ((1L, 1L, 100.0)), "user 3 forms the day-1 cohort")
  }

  test("q170: the RANGE frame skips calendar gaps a ROWS frame would bridge") {
    import spark.implicits._
    val hour = 3600000000L
    def ts(h: Long) = new java.sql.Timestamp(h * hour / 1000)
    // hours 0, 1, 5: hour 5's trailing [3,5] range holds ONLY hour 5 —
    // a ROWS(2) frame would wrongly reach back to hours 0 and 1
    val ev = Seq((ts(0), 10.0), (ts(1), 20.0), (ts(5), 40.0))
      .map { case (t, v) => ("click", t, v) }.toDF("event_type", "ts", "value")
    val out = graft.operators.Analytics.movingAverageOf(ev).collect()
      .map(r => r.getLong(1) -> r.getDouble(4)).toMap
    val h0 = out.keys.min
    assert(out(h0) == 10.0)
    assert(out(h0 + 1) == 15.0, "hour 1 averages hours 0..1")
    assert(out(h0 + 5) == 40.0, "hour 5 must NOT see hours 0/1 across the gap")
  }

  test("q168: islands split exactly at the missing day") {
    import spark.implicits._
    val day = 86400000000L
    def ts(d: Long) = new java.sql.Timestamp(d * day / 1000)
    // user 1 active days 0,1,2, 4,5 -> streaks 3 and 2; user 2 one day
    val ev = (Seq(0L, 1L, 2L, 4L, 5L).map(d => (1L, ts(d))) :+ ((2L, ts(3L))))
      .toDF("user_id", "ts")
    val out = graft.operators.Behavior.activeStreaksOf(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((5L, 2L, 3L)), "5 active days in 2 streaks, longest 3")
    assert(out(2L) == ((1L, 1L, 1L)))
  }
}
