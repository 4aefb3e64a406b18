package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Behavioral analytics over the event stream — the two classic
  * product-analytics reductions (windowed funnel conversion, RFM
  * segmentation) that exercise semantics the relational family
  * (q13/q28/q30/q35/q44) does not: q113 is ORDER- and TIME-constrained
  * stage progression (a GROUP BY per type cannot express "a click that
  * follows the view within the window"), q114 is the
  * percentile-score-and-segment reduction every CRM/growth stack runs.
  */
object Behavior {

  /** q113's ordered stages and per-step conversion window. 12 hours is
    * the measured fixture knee: at 1 h the funnel collapses (150→3→0)
    * and the row carries no signal — the q10/q110 fixture-meaningfulness
    * lesson; at 12 h it steps 150→37→7.
    */
  val FunnelStages = Seq("view", "click", "purchase")
  val FunnelWindow = "12 HOURS"

  /** q113_funnel_steps — WINDOWED funnel conversion (the Amplitude-style
    * semantics): stage 1 anchors at each user's FIRST view; stage 2 is
    * their first click STRICTLY AFTER it and within [[FunnelWindow]];
    * stage 3 their first purchase strictly after that click, again
    * within the window. Sequential AND time-bounded — a user who
    * purchases before viewing, or a day after clicking, is not a
    * conversion. Timestamps compare as exact microsecond integers, so
    * both engines agree bit-for-bit. Emits one report row: stage
    * populations and conversion rates (6 dp; degenerate denominators
    * report 0.0).
    *
    * 100 TB: three hash aggregates over the stream (map-side combined,
    * keyed by user) and two equi-joins whose right side is a per-user
    * single-row frame — AQE broadcasts it when it fits, shuffles on
    * user_id otherwise (the q45 keeper-set discipline). The per-stage
    * filter (type + window bounds) evaluates scan-side against the
    * joined anchor. No window function, no per-user sequence
    * materialization, no driver-side state.
    */
  def funnelSteps(spark: SparkSession, sfDir: String): DataFrame =
    funnelStepsOf(Tables.events(spark, sfDir))

  /** Composable core for ANY (user_id, ts, event_type, …) stream. */
  def funnelStepsOf(events: DataFrame): DataFrame = {
    def firstAfter(prev: DataFrame, prevCol: String, stage: String, outCol: String) =
      events.filter(col("event_type") === stage)
        .join(prev, Seq("user_id"))
        .filter(col("ts") > col(prevCol) &&
          col("ts") <= col(prevCol) + expr(s"INTERVAL $FunnelWindow"))
        .groupBy(col("user_id")).agg(min(col("ts")).as(outCol))
    val t1 = events.filter(col("event_type") === FunnelStages(0))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val t2 = firstAfter(t1, "t1", FunnelStages(1), "t2")
    val t3 = firstAfter(t2, "t2", FunnelStages(2), "t3")
    def cnt(df: DataFrame, name: String) = df.agg(count(lit(1)).as(name))
    def rate(num: String, den: String) =
      round(when(col(den) === 0, 0.0)
        .otherwise(col(num) / col(den).cast("double")), 6)
    cnt(events.select(col("user_id")).distinct(), "n_users")
      .crossJoin(cnt(t1, "n_view"))
      .crossJoin(cnt(t2, "n_click"))
      .crossJoin(cnt(t3, "n_purchase"))
      .select(col("n_users"), col("n_view"), col("n_click"), col("n_purchase"),
        rate("n_click", "n_view").as("conv_click"),
        rate("n_purchase", "n_click").as("conv_purchase"),
        rate("n_purchase", "n_view").as("conv_total"))
  }

  val q113OracleSql: String = {
    val w = FunnelWindow.replace("HOURS", "HOUR")
    s"""WITH t1 AS (
       |  SELECT user_id, MIN(ts) AS t1 FROM events
       |  WHERE event_type = '${FunnelStages(0)}' GROUP BY user_id
       |), t2 AS (
       |  SELECT e.user_id, MIN(e.ts) AS t2
       |  FROM events e JOIN t1 USING (user_id)
       |  WHERE e.event_type = '${FunnelStages(1)}'
       |    AND e.ts > t1.t1 AND e.ts <= t1.t1 + INTERVAL $w
       |  GROUP BY e.user_id
       |), t3 AS (
       |  SELECT e.user_id, MIN(e.ts) AS t3
       |  FROM events e JOIN t2 USING (user_id)
       |  WHERE e.event_type = '${FunnelStages(2)}'
       |    AND e.ts > t2.t2 AND e.ts <= t2.t2 + INTERVAL $w
       |  GROUP BY e.user_id
       |)
       |SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users,
       |       (SELECT COUNT(*) FROM t1) AS n_view,
       |       (SELECT COUNT(*) FROM t2) AS n_click,
       |       (SELECT COUNT(*) FROM t3) AS n_purchase,
       |       round(CASE WHEN (SELECT COUNT(*) FROM t1) = 0 THEN 0.0
       |             ELSE (SELECT COUNT(*) FROM t2) / CAST((SELECT COUNT(*) FROM t1) AS DOUBLE) END, 6) AS conv_click,
       |       round(CASE WHEN (SELECT COUNT(*) FROM t2) = 0 THEN 0.0
       |             ELSE (SELECT COUNT(*) FROM t3) / CAST((SELECT COUNT(*) FROM t2) AS DOUBLE) END, 6) AS conv_purchase,
       |       round(CASE WHEN (SELECT COUNT(*) FROM t1) = 0 THEN 0.0
       |             ELSE (SELECT COUNT(*) FROM t3) / CAST((SELECT COUNT(*) FROM t1) AS DOUBLE) END, 6) AS conv_total""".stripMargin
  }

  /** q114's quintile boundaries, full-literal doubles (the q106
    * discipline).
    */
  val RfmQuantiles = Seq("0.2", "0.4", "0.6", "0.8")

  /** q114_rfm_segments — RFM SEGMENTATION (Hughes '94, the classic CRM
    * reduction): each user scores 1–5 on Recency (days from their last
    * event to the corpus' last day — HIGH r_score = stale), Frequency
    * (event count), and Monetary (summed value, rounded 4 dp BEFORE
    * cuts/comparisons: per-event values are 2-dp decimals, so the
    * per-user true sum is a 2-dp decimal and 4-dp rounding erases the
    * two engines' summation-order ulp noise without touching signal).
    * Scores are quintile indices — 1 + (number of 20/40/60/80-percentile
    * cuts at or below the value), the exact interpolated-percentile
    * aggregate both engines share (q79/q106 discipline) — and the output
    * is the populated segment matrix (r_score, f_score, m_score, users).
    *
    * 100 TB: one per-user hash aggregate over the stream (count, sum,
    * max ts — map-side combined), one 12-value percentile aggregate over
    * the user-scale frame broadcast back, scan-side scoring, and a
    * ≤ 125-row segment count. No window anywhere.
    */
  def rfmSegments(spark: SparkSession, sfDir: String): DataFrame =
    rfmSegmentsOf(Tables.events(spark, sfDir))

  /** Composable core for ANY (user_id, ts, value, …) stream. */
  def rfmSegmentsOf(events: DataFrame): DataFrame = {
    val refDate = events.agg(max(to_date(col("ts"))).as("ref"))
    val users = events.groupBy(col("user_id")).agg(
      max(to_date(col("ts"))).as("last_day"),
      count(lit(1)).cast("double").as("f"),
      round(sum(col("value")), 4).as("m"))
      .crossJoin(broadcast(refDate))
      .select(col("user_id"),
        datediff(col("ref"), col("last_day")).cast("double").as("r"),
        col("f"), col("m"))
    val cutCols = for (d <- Seq("r", "f", "m"); (q, i) <- RfmQuantiles.zipWithIndex)
      yield expr(s"percentile($d, $q)").as(s"${d}_c${i + 1}")
    val cuts = users.agg(cutCols.head, cutCols.tail: _*)
    def score(d: String): Column =
      RfmQuantiles.indices.map(i => when(col(d) >= col(s"${d}_c${i + 1}"), 1).otherwise(0))
        .reduce(_ + _) + 1
    // both consumers of `users` live in this ONE plan — the per-user
    // aggregate's user_id exchange is shared via ReusedExchange
    // (measured: caching it changed nothing across the ladder), so no
    // operator-scoped cache is needed and the returned plan keeps its
    // auditable lineage
    users.crossJoin(broadcast(cuts))
      .select(col("user_id"),
        score("r").cast("long").as("r_score"),
        score("f").cast("long").as("f_score"),
        score("m").cast("long").as("m_score"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("users"))
      .orderBy(col("r_score"), col("f_score"), col("m_score"))
  }

  val q114OracleSql: String = {
    val cutSelect = (for (d <- Seq("r", "f", "m"); (q, i) <- RfmQuantiles.zipWithIndex)
      yield s"quantile_cont($d, $q) AS ${d}_c${i + 1}").mkString(", ")
    def scoreSql(d: String) =
      "1 + " + RfmQuantiles.indices.map(i => s"(CASE WHEN u.$d >= c.${d}_c${i + 1} THEN 1 ELSE 0 END)")
        .mkString(" + ")
    s"""WITH ref AS (
       |  SELECT MAX(CAST(ts AS DATE)) AS ref FROM events
       |), u AS (
       |  SELECT user_id,
       |         CAST(date_diff('day', MAX(CAST(ts AS DATE)), (SELECT ref FROM ref)) AS DOUBLE) AS r,
       |         CAST(COUNT(*) AS DOUBLE) AS f,
       |         round(SUM(value), 4) AS m
       |  FROM events GROUP BY user_id
       |), c AS (
       |  SELECT $cutSelect FROM u
       |), s AS (
       |  SELECT CAST(${scoreSql("r")} AS BIGINT) AS r_score,
       |         CAST(${scoreSql("f")} AS BIGINT) AS f_score,
       |         CAST(${scoreSql("m")} AS BIGINT) AS m_score
       |  FROM u CROSS JOIN c
       |)
       |SELECT r_score, f_score, m_score, COUNT(*) AS users
       |FROM s GROUP BY 1, 2, 3 ORDER BY r_score, f_score, m_score""".stripMargin
  }

  /** The per-user consecutive-event pair stream `(user_id, from_type,
    * to_type, gap_s)` shared by q122/q123: a lag over (user_id, ts,
    * event_id) — the ONE place the behavioral family uses a window
    * function, and the legitimate one: the partition key is user_id, so
    * window state is bounded per user (the q28 sessionize precedent),
    * never a global ordering. Gaps are exact microsecond-integer
    * differences; ties inside a user's stream break on event_id so both
    * engines walk the identical sequence.
    */
  private[graft] def consecutivePairsOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .select(col("user_id"), col("prev_type").as("from_type"),
        col("event_type").as("to_type"),
        (col("ts").cast("double") - col("prev_ts").cast("double")).as("gap_s"))
  }

  /** q122_event_transitions — the first-order MARKOV TRANSITION MATRIX
    * between event types: for every consecutive pair in a user's stream
    * (ordered by ts, event_id), count (from → to) and normalize per
    * from-row. The funnel (q113) asks about ONE path; the transition
    * matrix is the full navigation graph product analytics derives
    * next-step predictions and "where do users go after X" reports from.
    * Probabilities are ratios of exact integer counts, rounded 6 dp.
    *
    * 100 TB: the lag window partitions by user_id — per-user bounded
    * state, map-side sort within hash partitions (the q28 discipline) —
    * then one (from, to) hash aggregate over the pair stream (≤ types²
    * groups, map-side combined) and a broadcast row-total join. Nothing
    * downstream of the lag is corpus-scale.
    */
  def eventTransitions(spark: SparkSession, sfDir: String): DataFrame =
    eventTransitionsOf(Tables.events(spark, sfDir))

  /** Composable core for ANY (user_id, ts, event_id, event_type) stream. */
  def eventTransitionsOf(events: DataFrame): DataFrame = {
    val pairs = consecutivePairsOf(events)
      .groupBy(col("from_type"), col("to_type")).agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_type")).agg(sum(col("n")).as("row_n"))
    pairs.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n") / col("row_n").cast("double"), 6).as("p"))
      .orderBy(col("from_type"), col("to_type"))
  }

  val q122OracleSql: String =
    """WITH o AS (
      |  SELECT user_id, event_type, ts, event_id,
      |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |  FROM events
      |), pr AS (
      |  SELECT prev_type AS from_type, event_type AS to_type, COUNT(*) AS n
      |  FROM o WHERE prev_type IS NOT NULL
      |  GROUP BY 1, 2
      |), tot AS (
      |  SELECT from_type, SUM(n) AS row_n FROM pr GROUP BY from_type
      |)
      |SELECT pr.from_type, pr.to_type, pr.n,
      |       round(pr.n / CAST(tot.row_n AS DOUBLE), 6) AS p
      |FROM pr JOIN tot USING (from_type)
      |ORDER BY pr.from_type, pr.to_type""".stripMargin

  /** q123_interarrival_stats — the POINT-PROCESS report per destination
    * event type: count, mean, median, and p90 of the seconds between a
    * user's consecutive events, keyed by the LATER event's type ("how
    * long does a user dwell before a purchase"). Gaps are exact
    * microsecond-integer differences in seconds (both engines subtract
    * identical epoch values), percentiles are the exact interpolated
    * aggregates (q79/q106 discipline), means round at 6 dp.
    *
    * 100 TB: the q122 lag derivation (per-user bounded window state),
    * then ONE map-side-combined aggregate keyed by type. The exact
    * percentile buffer holds distinct GAP values per type — bounded by
    * the fixture's microsecond grain in practice and swappable for
    * approx_percentile on continuous-time streams, same plan.
    */
  def interarrivalStats(spark: SparkSession, sfDir: String): DataFrame =
    interarrivalStatsOf(Tables.events(spark, sfDir))

  /** Composable core for ANY (user_id, ts, event_id, event_type) stream. */
  def interarrivalStatsOf(events: DataFrame): DataFrame =
    consecutivePairsOf(events)
      .groupBy(col("to_type").as("event_type"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("gap_s")), 6).as("mean_gap_s"),
        round(expr("percentile(gap_s, 0.5)"), 6).as("med_gap_s"),
        round(expr("percentile(gap_s, 0.9)"), 6).as("p90_gap_s"))
      .orderBy(col("event_type"))

  /** q136's out-of-order tolerance — arrivals more than this far behind
    * their stream's high-water mark count as late.
    */
  val LateTolerance = "30 MINUTES"

  /** q136_late_event_audit — the OUT-OF-ORDER ARRIVAL audit, batch-run:
    * replay each user's stream in ARRIVAL order (event_id — the ingest
    * sequence) and flag events whose event TIME sits more than
    * [[LateTolerance]] behind the stream's running high-water mark
    * max(ts) — exactly the rows a Structured Streaming watermark of the
    * same delay would drop from q13's windowed aggregates. The report
    * (per type: volume, late volume, late fraction, worst and mean
    * lateness) is how a pipeline owner CHOOSES the watermark delay:
    * run this offline, read the lateness tail, set the delay. The
    * engine's streaming suite (EventStream) enforces a watermark; this
    * is its sizing tool.
    *
    * Timestamps compare as exact microsecond integers against the
    * interval-shifted high-water mark — no float boundary; only the
    * reported fraction and mean round.
    *
    * 100 TB: ONE window, partitioned by user_id — per-user bounded
    * state in arrival order (the q28/q122 discipline; a GLOBAL
    * high-water mark would serialize the corpus, and per-partition
    * watermarks are what a real stream engine tracks anyway) — then one
    * map-side-combined per-type aggregate. Nothing else is
    * corpus-scale.
    */
  def lateEventAudit(spark: SparkSession, sfDir: String): DataFrame =
    lateEventAuditOf(Tables.events(spark, sfDir))

  /** Composable core for ANY (user_id, ts, event_id, event_type) stream. */
  def lateEventAuditOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val flagged = events
      .withColumn("wm", max(col("ts")).over(w))
      .withColumn("late", col("wm").isNotNull &&
        col("ts") < col("wm") - expr(s"INTERVAL $LateTolerance"))
      .withColumn("late_s",
        when(col("late"), col("wm").cast("double") - col("ts").cast("double")))
    flagged.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("late"), 1L).otherwise(0L)).as("n_late"),
        max(col("late_s")).as("max_late_s"),
        avg(col("late_s")).as("avg_late_s"))
      .select(col("event_type"), col("n"), col("n_late"),
        round(col("n_late") / col("n").cast("double"), 6).as("late_frac"),
        round(col("max_late_s"), 6).as("max_late_s"),
        round(col("avg_late_s"), 6).as("avg_late_s"))
      .orderBy(col("event_type"))
  }

  val q136OracleSql: String = {
    val tol = LateTolerance.replace("MINUTES", "MINUTE")
    s"""WITH o AS (
       |  SELECT event_type, ts,
       |         MAX(ts) OVER (PARTITION BY user_id ORDER BY event_id
       |                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
       |  FROM events
       |), f AS (
       |  SELECT event_type,
       |         (wm IS NOT NULL AND ts < wm - INTERVAL $tol) AS late,
       |         CASE WHEN wm IS NOT NULL AND ts < wm - INTERVAL $tol
       |              THEN epoch(wm) - epoch(ts) END AS late_s
       |  FROM o
       |)
       |SELECT event_type, COUNT(*) AS n,
       |       CAST(SUM(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       |       round(SUM(CASE WHEN late THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 6) AS late_frac,
       |       round(MAX(late_s), 6) AS max_late_s,
       |       round(AVG(late_s), 6) AS avg_late_s
       |FROM f GROUP BY event_type ORDER BY event_type""".stripMargin
  }

  /** Micros per day / days per week for the integer calendar both engines
    * share (no timezone/date-function semantics in the hash path).
    */
  private val DayUs = 86400000000L

  def cohortRetention(spark: SparkSession, sfDir: String): DataFrame =
    cohortRetentionOf(Tables.events(spark, sfDir))

  /** q167_cohort_retention — the COHORT RETENTION MATRIX: users grouped
    * by first-seen DAY, and for each (cohort day, days since) the
    * distinct users still active plus the retention share — the
    * canonical product-analytics report, and the behavioral family's
    * missing classic next to funnel (q113), RFM (q114), and transitions
    * (q122). Days are integer `epoch_us div 86400e6` on both engines —
    * no date/timezone functions in the hash path. Day grain because the
    * fixture spans one month (week grain collapses to a single cohort);
    * the grain is the caller's divisor, nothing else changes.
    *
    * 100 TB: first-seen is one min-aggregate per user (map-side
    * combined); the activity join is user-keyed (co-partitioned with
    * the per-user aggregate's shuffle); the distinct collapses to
    * (cohort × day × user) BEFORE the matrix aggregate, so the output
    * path is horizon²-scale. No windows anywhere.
    */
  def cohortRetentionOf(events: DataFrame): DataFrame = {
    val day = expr(s"unix_micros(ts) div $DayUs")
    val act = events.select(col("user_id"), day.as("day"))
    val first = act.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    val cohortSize = first.groupBy(col("cohort_day")).agg(count(lit(1)).as("n_cohort"))
    val cells = act.join(first, Seq("user_id"))
      .select(col("cohort_day"), (col("day") - col("cohort_day")).as("days_since"),
        col("user_id"))
      .distinct()
      .groupBy(col("cohort_day"), col("days_since"))
      .agg(count(lit(1)).as("n_active"))
    cells.join(broadcast(cohortSize), Seq("cohort_day"))
      .select(col("cohort_day"), col("days_since"), col("n_cohort"), col("n_active"),
        round(col("n_active") / col("n_cohort").cast("double") * 100, 6).as("retention_pct"))
      .orderBy(col("cohort_day"), col("days_since"))
  }

  val q167OracleSql: String =
    s"""WITH act AS (
       |  SELECT user_id, CAST(epoch_us(ts) // $DayUs AS BIGINT) AS day FROM events
       |), first AS (
       |  SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY user_id
       |), size_ AS (
       |  SELECT cohort_day, COUNT(*) AS n_cohort FROM first GROUP BY cohort_day
       |), cells AS (
       |  SELECT cohort_day, days_since, COUNT(*) AS n_active FROM (
       |    SELECT DISTINCT f.cohort_day, a.day - f.cohort_day AS days_since, a.user_id
       |    FROM act a JOIN first f USING (user_id))
       |  GROUP BY cohort_day, days_since
       |)
       |SELECT c.cohort_day, c.days_since, s.n_cohort, c.n_active,
       |       round(c.n_active / CAST(s.n_cohort AS DOUBLE) * 100, 6) AS retention_pct
       |FROM cells c JOIN size_ s USING (cohort_day)
       |ORDER BY cohort_day, days_since""".stripMargin

  def activeStreaks(spark: SparkSession, sfDir: String): DataFrame =
    activeStreaksOf(Tables.events(spark, sfDir))

  /** q168_active_streaks — GAPS-AND-ISLANDS per user: longest run of
    * consecutive active DAYS, active-day count, and island count — the
    * engagement-streak report, and the canonical gaps-and-islands SQL
    * pattern (island key = day − row_number over the per-user day
    * sequence: constant within a run, distinct across gaps) as a
    * declared, hash-checked operator.
    *
    * 100 TB: the stream collapses to DISTINCT (user, day) first — the
    * only corpus-scale step, one exchange with map-side partials — and
    * every window after that partitions by user over that user's
    * ACTIVE-DAY rows (≤ days-in-horizon per user, not events), so the
    * window input is bounded by users × horizon regardless of traffic.
    */
  def activeStreaksOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val day = expr(s"unix_micros(ts) div $DayUs")
    val days = events.select(col("user_id"), day.as("day")).distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val islands = days
      .withColumn("island", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("len"))
    islands.groupBy(col("user_id"))
      .agg(sum(col("len")).as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max(col("len")).as("max_streak"))
      .orderBy(col("user_id"))
  }

  val q168OracleSql: String =
    s"""WITH days AS (
       |  SELECT DISTINCT user_id, CAST(epoch_us(ts) // $DayUs AS BIGINT) AS day FROM events
       |), isl AS (
       |  SELECT user_id,
       |         day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
       |  FROM days
       |), runs AS (
       |  SELECT user_id, island, COUNT(*) AS len FROM isl GROUP BY user_id, island
       |)
       |SELECT user_id,
       |       CAST(SUM(len) AS BIGINT) AS n_active_days,
       |       COUNT(*) AS n_streaks,
       |       MAX(len) AS max_streak
       |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin

  val q123OracleSql: String =
    """WITH o AS (
      |  SELECT user_id, event_type, ts, event_id,
      |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
      |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events
      |), g AS (
      |  SELECT event_type, epoch(ts) - epoch(prev_ts) AS gap_s
      |  FROM o WHERE prev_type IS NOT NULL
      |)
      |SELECT event_type, COUNT(*) AS n,
      |       round(AVG(gap_s), 6) AS mean_gap_s,
      |       round(quantile_cont(gap_s, 0.5), 6) AS med_gap_s,
      |       round(quantile_cont(gap_s, 0.9), 6) AS p90_gap_s
      |FROM g GROUP BY event_type ORDER BY event_type""".stripMargin
}
