package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Behavior

/** q113/q114 — windowed funnel conversion and RFM segmentation, on
  * constructed event streams with hand-checkable outcomes.
  */
class BehaviorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")
  private def tsH(hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:00:00")

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
}
