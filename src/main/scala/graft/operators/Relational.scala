package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational analytics over the TPC-H-ish fixture tables — the general
  * query surface a user of the engine gets for free from Catalyst
  * (SURVEY.md §2A joins/aggregations: absent in the reference, declared
  * here as engine capability). These also give the benchmark real data
  * volume: `lineitem` and `events` are the only fixture tables that scale
  * with sf.
  *
  * Big sums are rounded to 2 dp (not 6): at sf0.1 the sums reach 1e10,
  * where double accumulation-order noise is ~1e-5 — far below 0.005 but
  * far above round(…,6)'s tolerance at that magnitude.
  */
object Relational {

  /** q26_pricing_summary — TPC-H Q1-shaped pricing summary: scan-heavy
    * filter + 6-way aggregate over lineitem. One hash aggregate with
    * map-side combine over 4 group keys; the parquet scan prunes to 7 of
    * 11 columns and pushes the shipdate predicate.
    */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("2000-12-01 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q26OracleSql: String =
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 2) AS sum_qty,
      |       round(sum(l_extendedprice), 2) AS sum_base_price,
      |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |       round(avg(l_quantity), 6) AS avg_qty,
      |       round(avg(l_discount), 6) AS avg_disc,
      |       COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q27_top_customers — TPC-H Q10-shaped revenue join: lineitem ⋈ orders ⋈
    * customer ⋈ nation, top-20 customers by discounted revenue.
    * Catalyst broadcasts the dimension sides (orders/customer fit under the
    * broadcast threshold at test scale; at 100 TB orders-lineitem becomes a
    * shuffled hash join on o_orderkey while customer/nation stay broadcast)
    * and the final top-20 is a TakeOrderedAndProject.
    */
  def topCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val o  = Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey"))
    val c  = Tables.customer(spark, sfDir).select(col("c_custkey"), col("c_name"), col("c_nationkey"))
    val n  = Tables.nation(spark, sfDir).select(col("n_nationkey"), col("n_name"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q27OracleSql: String =
    """SELECT c.c_custkey, c.c_name, n.n_name,
      |       round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2) AS revenue
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY c.c_custkey, c.c_name, n.n_name
      |ORDER BY revenue DESC, c.c_custkey
      |LIMIT 20""".stripMargin

  /** q28_sessionize — session analytics over the event stream: a new
    * session starts after a >30-minute gap per user. Analytic windows
    * (lag + running sum) partitioned by user_id — the shuffle is by user,
    * so the operator scales with user cardinality, not event count per
    * partition. Gap arithmetic in microseconds on both engines.
    */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val flagged = ev
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull || col("us") - col("prev_us") > 1800L * 1000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    flagged
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("sess_events"))
      .groupBy(col("user_id"))
      .agg(
        sum(col("sess_events")).as("n_events"),
        count(lit(1)).as("n_sessions"),
        max(col("sess_events")).as("max_session_events"))
      .orderBy(col("user_id"))
  }

  /** q30_event_rollup — hierarchical subtotals via ROLLUP(event_type, day):
    * per (type, day), per type, and grand total in one pass (Spark expands
    * to a single Expand + hash aggregate). Rollup null keys are coalesced to
    * 'ALL' so the oracle compare sees no NULL grouping keys; big sums round
    * to 2 dp.
    */
  def eventRollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"), col("value"))
      .rollup(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("day"), lit("ALL")).as("day"),
        col("n_events"), col("sum_value"))
      .orderBy(col("event_type"), col("day"))

  /** q31_asof_join — temporal as-of join: attach to every event its user's
    * most recent purchase at-or-before the event time (events with no prior
    * purchase drop, matching inner ASOF semantics). Spark has no ASOF
    * operator; the scalable composition is the merge-and-carry pattern:
    * union the probe and reference streams with a kind tag, ONE shuffle by
    * user_id, and carry the last reference timestamp forward with
    * `last(_, ignoreNulls)` over (ts, kind, id) — reference rows sort
    * before probe rows at equal timestamps so `>=` matches. O(n log n) per
    * user partition, no range cross join. Oracle: DuckDB's native ASOF JOIN.
    */
  def asofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val probe = ev
      .withColumn("kind", lit(1)).withColumn("ref_us_in", lit(null).cast("long"))
    val refs = ev.filter(col("event_type") === "purchase")
      .withColumn("kind", lit(0)).withColumn("ref_us_in", col("us"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    probe.unionByName(refs)
      .withColumn("ref_us", last(col("ref_us_in"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1 && col("ref_us").isNotNull)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ref_us"), (col("us") - col("ref_us")).as("gap_us"))
      .orderBy(col("event_id"))
  }

  /** Known event-type domain for the q35 pivot (explicit value list keeps
    * the pivot a single pass — no extra distinct-values job — and fixes the
    * output schema for the oracle compare).
    */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** q35_event_type_pivot — per-user event counts pivoted to one column per
    * event type (wide-table feature extraction). `pivot` with an explicit
    * domain compiles to a single hash aggregate with conditional counts.
    */
  def eventTypePivot(spark: SparkSession, sfDir: String): DataFrame = {
    val pivoted = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
    val filled = EventTypes.foldLeft(pivoted) { (df, t) =>
      df.withColumn(t, coalesce(col(s"`$t`"), lit(0L)))
    }
    filled
      .withColumn("total", EventTypes.map(t => col(s"`$t`")).reduce(_ + _))
      .orderBy(col("user_id"))
  }

  val q35OracleSql: String = {
    val cols = EventTypes.map(t => s"""CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS "$t"""").mkString(",\n      |       ")
    s"""SELECT user_id,
       |       $cols,
       |       COUNT(*) AS total
       |FROM events
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin
  }

  /** q36_value_quantiles — exact interpolated quantiles per event type
    * (Spark `percentile` and DuckDB `quantile_cont` share the definition —
    * verified numerically identical on the fixtures). Exact percentile
    * needs the group's values together; at 100 TB switch to
    * `approx_percentile` (t-digest, mergeable partials) at the cost of the
    * oracle guarantee.
    */
  def valueQuantiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        round(min(col("value")), 6).as("v_min"),
        round(max(col("value")), 6).as("v_max"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  val q36OracleSql: String =
    """SELECT event_type,
      |       round(quantile_cont(value, 0.5), 6) AS p50,
      |       round(quantile_cont(value, 0.9), 6) AS p90,
      |       round(min(value), 6) AS v_min,
      |       round(max(value), 6) AS v_max,
      |       COUNT(*) AS n
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  val q31OracleSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us FROM events
      |), ref AS (
      |  SELECT user_id, us AS ref_us FROM e WHERE event_type = 'purchase'
      |)
      |SELECT e.event_id, e.user_id, e.event_type, r.ref_us, e.us - r.ref_us AS gap_us
      |FROM e ASOF JOIN ref r ON e.user_id = r.user_id AND e.us >= r.ref_us
      |ORDER BY e.event_id""".stripMargin

  val q30OracleSql: String =
    """SELECT COALESCE(event_type, 'ALL') AS event_type,
      |       COALESCE(strftime(ts, '%Y-%m-%d'), 'ALL') AS day,
      |       COUNT(*) AS n_events,
      |       round(sum(value), 2) AS sum_value
      |FROM events
      |GROUP BY ROLLUP(event_type, strftime(ts, '%Y-%m-%d'))
      |ORDER BY event_type, day""".stripMargin

  /** q44_event_cube — CUBE over (event_type, weekday): all four grouping
    * combinations — per pair, per type, per weekday, grand total — in one
    * pass (a single Expand + hash aggregate, the same physical shape as
    * rollup but with 2ⁿ grouping sets). `grouping_id` disambiguates rows
    * where a NULL key is a real value vs a subtotal. Completes the
    * rollup/cube/grouping-sets family next to q30.
    */
  def eventCube(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"), date_format(col("ts"), "EEEE").as("weekday"), col("value"))
      .cube(col("event_type"), col("weekday"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"),
        grouping_id().cast("long").as("gid"))
      .select(
        coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("weekday"), lit("ALL")).as("weekday"),
        col("gid"), col("n_events"), col("sum_value"))
      .orderBy(col("gid"), col("event_type"), col("weekday"))

  val q44OracleSql: String =
    """SELECT COALESCE(event_type, 'ALL') AS event_type,
      |       COALESCE(strftime(ts, '%A'), 'ALL') AS weekday,
      |       CAST(GROUPING(event_type) * 2 + GROUPING(strftime(ts, '%A')) AS BIGINT) AS gid,
      |       COUNT(*) AS n_events,
      |       round(sum(value), 2) AS sum_value
      |FROM events
      |GROUP BY CUBE(event_type, strftime(ts, '%A'))
      |ORDER BY gid, event_type, weekday""".stripMargin

  /** Tier boundaries for the q46 range join: [lo, hi) per tier, covering
    * the full value domain.
    */
  val ValueTiers: Seq[(String, Double, Double)] = Seq(
    ("t0_low", -1e18, 20.0), ("t1", 20.0, 40.0), ("t2", 40.0, 60.0),
    ("t3", 60.0, 80.0), ("t4_high", 80.0, 1e18))

  /** q46_range_tier_join — an explicit RANGE join (the non-equi join class
    * SURVEY §2A lists): every event matched to its value tier via
    * `lo <= value < hi`. The tier table is tiny and broadcast, so the plan
    * is a BroadcastNestedLoopJoin with the range predicate evaluated
    * scan-side — the right shape when one side is a handful of interval
    * rows. (For two LARGE interval sets, bucketize both sides to an
    * equi-join on overlapping bucket ids first — same pattern as the LSH
    * band join.)
    */
  def rangeTierJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tiers = ValueTiers.toDF("tier", "lo", "hi")
    Tables.events(spark, sfDir)
      .join(broadcast(tiers), col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("tier"))
  }

  val q46OracleSql: String = {
    val values = ValueTiers.map { case (t, lo, hi) => s"('$t', $lo, $hi)" }.mkString(", ")
    s"""SELECT t.tier, COUNT(*) AS n_events, round(sum(e.value), 2) AS sum_value
       |FROM events e
       |JOIN (VALUES $values) AS t(tier, lo, hi)
       |  ON e.value >= t.lo AND e.value < t.hi
       |GROUP BY t.tier
       |ORDER BY t.tier""".stripMargin
  }

  val q28OracleSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS us FROM events
      |), f AS (
      |  SELECT user_id, us, event_id,
      |         CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800 * 1000000 THEN 1 ELSE 0 END AS new_s
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
      |), s AS (
      |  SELECT user_id,
      |         sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
      |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM f
      |), g AS (
      |  SELECT user_id, session_id, COUNT(*) AS sess_events FROM s GROUP BY user_id, session_id
      |)
      |SELECT user_id,
      |       CAST(sum(sess_events) AS BIGINT) AS n_events,
      |       COUNT(*) AS n_sessions,
      |       max(sess_events) AS max_session_events
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q146's cutoff date and segment (mid-range of the fixture's
    * 1995–2001 order dates).
    */
  val ShipCutoff = "1998-06-15"
  val ShipSegment = "BUILDING"

  /** q146_shipping_priority — the TPC-H Q3 shape: revenue of unshipped
    * orders for one market segment (orders placed before the cutoff
    * whose lineitems ship after it), top-10 by revenue — the classic
    * 3-table selective join + aggregate + top-k every warehouse runs,
    * completing the relational family's Q1 (q26) / Q10 (q27) coverage.
    * Revenue aggregates in FIXED POINT (the q66 lesson at design time):
    * price cents × (100 − discount cents) sums as an exact int64 and
    * ONE IEEE division by 10^4 emits the dollars — no float sum, no
    * round() call, bit-deterministic at every scale.
    *
    * 100 TB: the segment-filtered customer dim broadcasts into orders,
    * the date filters push into both scans (plan-pinned:
    * PushedFilters), the orders side broadcasts into lineitem when it
    * fits (AQE shuffles on orderkey past that), and the top-10 is
    * TakeOrderedAndProject — never a global sort.
    */
  def shippingPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val cutoff = java.sql.Timestamp.valueOf(s"$ShipCutoff 00:00:00")
    val cust = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === ShipSegment).select(col("c_custkey"))
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") < lit(cutoff))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_orderpriority"))
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") > lit(cutoff))
      .select(col("l_orderkey"),
        (round(col("l_extendedprice") * 100, 0).cast("long") *
          (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))).as("rev_e4"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(col("rev_e4")).as("rev_e4"))
      .select(col("l_orderkey"),
        (col("rev_e4").cast("double") / 10000.0).as("revenue"),
        col("o_orderdate"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
      .limit(10)
  }

  val q146OracleSql: String =
    s"""SELECT l.l_orderkey,
       |       CAST(SUM(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
       |                * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))) AS DOUBLE)
       |         / 10000.0 AS revenue,
       |       o.o_orderdate, o.o_orderpriority
       |FROM customer c
       |JOIN orders o ON c.c_custkey = o.o_custkey
       |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       |WHERE c.c_mktsegment = '$ShipSegment'
       |  AND o.o_orderdate < TIMESTAMP '$ShipCutoff 00:00:00'
       |  AND l.l_shipdate > TIMESTAMP '$ShipCutoff 00:00:00'
       |GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
       |ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
       |LIMIT 10""".stripMargin

  /** q149's region and order-date window (two mid-range fixture years). */
  val Q5Region = "ASIA"
  val Q5Start  = "1996-01-01"
  val Q5End    = "1998-01-01"

  /** q149_local_supplier_volume — the TPC-H Q5 shape: per-nation revenue
    * where the CUSTOMER and the SUPPLIER sit in the same nation of one
    * region, over a two-year order window — the 6-table star join that
    * exercises join ordering, dimension broadcasting, and the
    * local-vs-foreign equality (c_nationkey = s_nationkey) that no
    * single pairwise join expresses. Completes the relational family's
    * TPC-H coverage ladder: Q1 (q26), Q10 (q27), Q3 (q146), Q5 (here).
    * Revenue aggregates in FIXED POINT (the q66/q146 discipline):
    * cents × (100 − discount cents) sums exactly in int64, ONE IEEE
    * division emits dollars.
    *
    * 100 TB: region→nation→supplier reduces to a SUPPLIER-side
    * broadcast (suppliers of one region, with their nation name
    * attached); customers project to (custkey, nationkey) and carry NO
    * broadcast hint — AQE arbitrates that join by measured size
    * (VERDICT r13 item 1: customer is fact-proportional, 150k × sf at
    * true TPC-H scale, so a pinned hint would OOM the broadcast path at
    * 100× instead of falling back to a custkey shuffle; at bench scale
    * AQE still picks broadcast on size — plan-pinned in PlanShapeSpec);
    * the date window pushes into the orders scan; lineitem — the 100 TB
    * side — is scanned once, joined by orderkey (its natural
    * co-partition key), and the c=s nation equality prunes rows BEFORE
    * the final nation-keyed aggregate, whose output is nation-scale.
    * The heavy table never shuffles twice.
    */
  def localSupplierVolume(spark: SparkSession, sfDir: String): DataFrame = {
    val start = java.sql.Timestamp.valueOf(s"$Q5Start 00:00:00")
    val end   = java.sql.Timestamp.valueOf(s"$Q5End 00:00:00")
    val nat = Tables.nation(spark, sfDir)
      .join(Tables.region(spark, sfDir).filter(col("r_name") === Q5Region),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val supp = Tables.supplier(spark, sfDir)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey"))
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit(start) && col("o_orderdate") < lit(end))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"),
        (round(col("l_extendedprice") * 100, 0).cast("long") *
          (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))).as("rev_e4"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      // no hint on cust: AQE picks broadcast-by-size here and falls back
      // to a custkey shuffle when customer outgrows the threshold
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("rev_e4")).as("rev_e4"))
      .select(col("n_name"),
        (col("rev_e4").cast("double") / 10000.0).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q149OracleSql: String =
    s"""SELECT n.n_name,
       |       CAST(SUM(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
       |                * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))) AS DOUBLE)
       |         / 10000.0 AS revenue
       |FROM customer c
       |JOIN orders o   ON c.c_custkey = o.o_custkey
       |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       |JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |JOIN nation n   ON s.s_nationkey = n.n_nationkey
       |JOIN region r   ON n.n_regionkey = r.r_regionkey
       |WHERE c.c_nationkey = s.s_nationkey
       |  AND r.r_name = '$Q5Region'
       |  AND o.o_orderdate >= TIMESTAMP '$Q5Start 00:00:00'
       |  AND o.o_orderdate <  TIMESTAMP '$Q5End 00:00:00'
       |GROUP BY n.n_name
       |ORDER BY revenue DESC, n.n_name""".stripMargin

  /** q159's trading blocs and ship-date window (the q149 years). */
  val Q7SuppRegion = "ASIA"
  val Q7CustRegion = "EUROPE"

  /** q159_volume_shipping — the TPC-H Q7 shape, generalized from one
    * nation pair to two TRADING BLOCS: revenue shipped from suppliers of
    * one region to customers of another, per (supplier nation, customer
    * nation, ship year) — the cross-bloc trade report whose join graph
    * (lineitem→orders→customer + lineitem→supplier, nations on BOTH
    * ends) is the canonical two-sided dimension test: no single join
    * carries both nation predicates, so join ORDER decides how early
    * each side prunes. Extends the relational ladder: Q1 (q26), Q10
    * (q27), Q3 (q146), Q5 (q149), Q7 (here). Revenue aggregates in
    * FIXED POINT (the q66/q146/q149 discipline); the ship-date window
    * pushes into the lineitem scan.
    *
    * 100 TB: the supplier side (region-pruned to one bloc, with nation
    * name attached) broadcasts FIRST — it cuts lineitem by ~|bloc|/25
    * before the only fact-fact shuffle (orderkey join against the
    * column-pruned orders projection); the customer side carries NO
    * hint (the q149/VERDICT-r13 lesson: customer is fact-proportional,
    * AQE arbitrates broadcast-vs-shuffle by measured size — at bench
    * scale it picks broadcast, at true TPC-H scale it falls back to a
    * custkey shuffle instead of OOMing a pinned hint). The final
    * aggregate is (nation × nation × year)-scale.
    */
  def volumeShipping(spark: SparkSession, sfDir: String): DataFrame = {
    val start = java.sql.Timestamp.valueOf(s"$Q5Start 00:00:00")
    val end   = java.sql.Timestamp.valueOf(s"$Q5End 00:00:00")
    def blocNations(region: String) = Tables.nation(spark, sfDir)
      .join(Tables.region(spark, sfDir).filter(col("r_name") === region),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val supp = Tables.supplier(spark, sfDir)
      .join(broadcast(blocNations(Q7SuppRegion)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(spark, sfDir)
      .join(broadcast(blocNations(Q7CustRegion)), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val ord = Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit(start) && col("l_shipdate") < lit(end))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast("long").as("l_year"),
        (round(col("l_extendedprice") * 100, 0).cast("long") *
          (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))).as("rev_e4"))
    li.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      // no hint on cust: AQE arbitrates by measured size (q149 lesson)
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(sum(col("rev_e4")).as("rev_e4"))
      .select(col("supp_nation"), col("cust_nation"), col("l_year"),
        (col("rev_e4").cast("double") / 10000.0).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q159OracleSql: String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       |       CAST(SUM(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
       |                * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))) AS DOUBLE)
       |         / 10000.0 AS revenue
       |FROM lineitem l
       |JOIN orders o   ON l.l_orderkey = o.o_orderkey
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
       |JOIN region r1  ON n1.n_regionkey = r1.r_regionkey
       |JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
       |JOIN region r2  ON n2.n_regionkey = r2.r_regionkey
       |WHERE r1.r_name = '$Q7SuppRegion' AND r2.r_name = '$Q7CustRegion'
       |  AND l.l_shipdate >= TIMESTAMP '$Q5Start 00:00:00'
       |  AND l.l_shipdate <  TIMESTAMP '$Q5End 00:00:00'
       |GROUP BY n1.n_name, n2.n_name, l_year
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** q162's excluded priority class (TPC-H Q13's NOT LIKE analogue on the
    * fixture's columns).
    */
  val Q13Excluded = "1-URGENT"

  /** q162_customer_distribution — the TPC-H Q13 shape: how many customers
    * placed exactly k qualifying orders, INCLUDING k = 0 — the
    * left-outer-join + double-aggregation pattern (the join predicate
    * carries the order filter, so non-matching customers survive with
    * count 0; a WHERE would silently drop them — the classic outer-join
    * bug this query exists to test).
    *
    * 100 TB: customer and orders are BOTH fact-proportional, so this is
    * the one relational shape where a shuffle join is simply CORRECT —
    * both sides hash-partition on custkey (orders' natural secondary
    * key), the per-customer count partial-aggregates map-side after the
    * join, and the distribution aggregate is k-scale (≤ max orders per
    * customer). No broadcast anywhere, deliberately; AQE handles skew if
    * a mega-customer appears.
    */
  def customerDistribution(spark: SparkSession, sfDir: String): DataFrame =
    customerDistributionOf(
      Tables.customer(spark, sfDir).select(col("c_custkey")),
      Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") =!= Q13Excluded)
        .select(col("o_custkey"), col("o_orderkey")))

  /** Composable core for ANY (c_custkey) × (o_custkey, o_orderkey) pair —
    * the order filter belongs to the CALLER (it must ride the join
    * predicate or a pre-filter, never a post-join WHERE, which would
    * drop the zero-order customers this query exists to count).
    */
  def customerDistributionOf(cust: DataFrame, ord: DataFrame): DataFrame =
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  val q162OracleSql: String =
    s"""SELECT c_count, COUNT(*) AS custdist FROM (
       |  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
       |  FROM customer c LEFT OUTER JOIN orders o
       |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '$Q13Excluded'
       |  GROUP BY c.c_custkey
       |)
       |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** q163's key-histogram buckets: power of two, orderkey-dense. */
  val JcBuckets = 1024L

  /** q163's exact-audit key stratum: 1-in-[[JcStratumMod]] of DISTINCT
    * join keys via the md5 bucket (q154 discipline) — NOT a raw
    * `k % 64`, because TPC-H orderkeys are SPARSE (8 live keys per 32:
    * dense low-3-bit blocks), so a raw-modulo stratum holds 1/16 of live
    * keys, not 1/64, and the ×64 extrapolation would overshoot ×4. The
    * md5 bucket samples distinct keys uniformly on ANY key layout.
    */
  val JcStratumMod = 64L

  /** q163_join_cardinality — OPTIMIZER-STATISTICS AUDIT: estimate the
    * orders⋈lineitem output size from two bounded KEY HISTOGRAMS (count
    * per `orderkey % 1024` bucket — the equi-height-ish sketch a CBO
    * keeps per join column) as Σ_b nA_b·nB_b, next to a SAMPLE-GATED
    * exact audit and the inflation ratio est/audit — how much the
    * bucket-level upper bound overshoots on this key distribution
    * (collision-free buckets ⇒ exact; skewed keys ⇒ the overshoot a
    * planner must haircut). The q64/q154 audit pattern pointed at the
    * JOIN PLANNER instead of an index.
    *
    * The audit arm (VERDICT r14 item 2 — the r14 row ran the BLIND
    * 15M⋈60M exact join at sf10, 48.3 s, exactly the cost the estimator
    * exists to avoid) joins only the keys of one hash stratum
    * (md5-bucket ∈ {0} of [[JcStratumMod]]) and extrapolates ×mod:
    * key-strata partition the join output exactly, so the scaled count
    * is the textbook hash-stratified estimator, and the emitted
    * `stratum_mod`/`stratum_exact` columns keep the audit's resolution
    * inspectable next to its extrapolation.
    *
    * 100 TB: each histogram is ONE scan-local bucket aggregate (1,024
    * integer cells per side, map-side combined — never a shuffle); the
    * estimate is a 1,024-row broadcast join of the two grids; the audit
    * joins 1/64 of the key space (scan-local md5 filter on both sides,
    * then a stratum-sized shuffle). Nothing in the row touches the full
    * fact⋈fact join.
    */
  def joinCardinality(spark: SparkSession, sfDir: String): DataFrame =
    joinCardinalityOf(
      Tables.orders(spark, sfDir).select(col("o_orderkey").as("k")),
      Tables.lineitem(spark, sfDir).select(col("l_orderkey").as("k")))

  /** Composable core for ANY two (k)-keyed frames. */
  def joinCardinalityOf(left: DataFrame, right: DataFrame): DataFrame = {
    val oh = left.groupBy((col("k") % JcBuckets).as("b")).agg(count(lit(1)).as("n_o"))
    val lh = right.groupBy((col("k") % JcBuckets).as("b")).agg(count(lit(1)).as("n_l"))
    val totals = oh.agg(sum(col("n_o")).as("n_orders"))
      .crossJoin(lh.agg(sum(col("n_l")).as("n_lineitems")))
    val est = totals.crossJoin(
      oh.join(lh, Seq("b")).agg(sum(col("n_o") * col("n_l")).as("est_join")))
    def stratum(df: DataFrame): DataFrame = df.filter(
      conv(substring(md5(concat(lit("jc:"), col("k"))), 1, 8), 16, 10).cast("long")
        % JcStratumMod === 0)
    val exact = stratum(left).join(stratum(right), Seq("k"))
      .agg(count(lit(1)).as("stratum_exact"))
    est.crossJoin(exact)
      .select(col("n_orders"), col("n_lineitems"), col("est_join"),
        lit(JcStratumMod).as("stratum_mod"), col("stratum_exact"),
        (col("stratum_exact") * JcStratumMod).as("exact_scaled"),
        // an empty stratum (only possible on toy inputs) reads NULL, not ∞
        when(col("stratum_exact") === 0, lit(null).cast("double"))
          .otherwise(round(col("est_join").cast("double")
            / (col("stratum_exact") * JcStratumMod), 6)).as("inflation"))
  }

  val q163OracleSql: String =
    s"""WITH oh AS (
       |  SELECT o_orderkey % $JcBuckets AS b, CAST(COUNT(*) AS BIGINT) AS n_o
       |  FROM orders GROUP BY b
       |), lh AS (
       |  SELECT l_orderkey % $JcBuckets AS b, CAST(COUNT(*) AS BIGINT) AS n_l
       |  FROM lineitem GROUP BY b
       |), est AS (
       |  SELECT (SELECT CAST(SUM(n_o) AS BIGINT) FROM oh) AS n_orders,
       |         (SELECT CAST(SUM(n_l) AS BIGINT) FROM lh) AS n_lineitems,
       |         CAST(SUM(n_o * n_l) AS BIGINT) AS est_join
       |  FROM oh JOIN lh USING (b)
       |), so AS (
       |  SELECT o_orderkey AS k FROM orders
       |  WHERE ('0x' || substring(md5('jc:' || o_orderkey), 1, 8))::UBIGINT % $JcStratumMod = 0
       |), sl AS (
       |  SELECT l_orderkey AS k FROM lineitem
       |  WHERE ('0x' || substring(md5('jc:' || l_orderkey), 1, 8))::UBIGINT % $JcStratumMod = 0
       |), exact AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS stratum_exact FROM so JOIN sl USING (k)
       |)
       |SELECT n_orders, n_lineitems, est_join,
       |       CAST($JcStratumMod AS BIGINT) AS stratum_mod, stratum_exact,
       |       stratum_exact * $JcStratumMod AS exact_scaled,
       |       round(CAST(est_join AS DOUBLE) / nullif(stratum_exact * $JcStratumMod, 0), 6) AS inflation
       |FROM est CROSS JOIN exact""".stripMargin

  /** q169's cumulative-share class boundaries (the classic 80/95 ABC). */
  val AbcA = 0.80
  val AbcB = 0.95

  /** q169_nation_abc — PARETO/ABC CLASSIFICATION within each nation:
    * customers ranked by order revenue, classed A/B/C at 80%/95%
    * cumulative revenue share, reported per (nation, class) with
    * populations, revenue, and share — the inventory-management classic
    * ("which 20% of customers carry 80% of revenue"), partitioned the
    * way the scalable version must be: the cumulative window runs WITHIN
    * each nation (the q69/q77 sharding argument — partition count grows
    * with the corpus; a global ABC would be one reducer, and its
    * scalable form is the same computation after a range repartition).
    * Revenue is fixed-point cents (q66 discipline); the class cut
    * compares integer cumulative cents against integer thresholds
    * (cum·100 ≤ ⌊total·share·100⌋ avoided — instead cum ≤ total·0.80
    * evaluated as exact integer × double literal, identical both
    * engines). A customer straddling the boundary belongs to the class
    * its cumulative END falls in (inclusive ≤), ties in revenue broken
    * by custkey.
    *
    * 100 TB: one custkey aggregate over orders (map-side combined), a
    * nation-keyed window over the customer-scale frame, and a
    * (nation × 3)-scale report.
    */
  def nationAbc(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cust = Tables.customer(spark, sfDir).select(col("c_custkey"), col("c_nationkey"))
    val rev = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      .groupBy(col("o_custkey")).agg(sum(col("cents")).as("cents"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, sfDir)), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_custkey"), col("cents"))
    val w = Window.partitionBy(col("n_name"))
      .orderBy(col("cents").desc, col("c_custkey"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = Window.partitionBy(col("n_name"))
    rev
      .withColumn("cum", sum(col("cents")).over(w))
      .withColumn("total", sum(col("cents")).over(tot))
      .withColumn("abc_class",
        when(col("cum") <= col("total") * AbcA, "A")
          .when(col("cum") <= col("total") * AbcB, "B")
          .otherwise("C"))
      .groupBy(col("n_name"), col("abc_class"))
      .agg(count(lit(1)).as("n_cust"),
        sum(col("cents")).as("cents"),
        min(col("total")).as("total"))
      .select(col("n_name"), col("abc_class"), col("n_cust"),
        (col("cents").cast("double") / 100.0).as("revenue"),
        round(col("cents") / col("total").cast("double") * 100, 6).as("revenue_share"))
      .orderBy(col("n_name"), col("abc_class"))
  }

  val q169OracleSql: String =
    s"""WITH rev AS (
       |  SELECT n.n_name, c.c_custkey,
       |         CAST(SUM(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
       |  FROM orders o
       |  JOIN customer c ON o.o_custkey = c.c_custkey
       |  JOIN nation n ON c.c_nationkey = n.n_nationkey
       |  GROUP BY n.n_name, c.c_custkey
       |), cum AS (
       |  SELECT n_name, c_custkey, cents,
       |         SUM(cents) OVER (PARTITION BY n_name ORDER BY cents DESC, c_custkey
       |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |         SUM(cents) OVER (PARTITION BY n_name) AS total
       |  FROM rev
       |), classed AS (
       |  SELECT n_name,
       |         CASE WHEN cum <= total * $AbcA THEN 'A'
       |              WHEN cum <= total * $AbcB THEN 'B'
       |              ELSE 'C' END AS abc_class,
       |         cents, total
       |  FROM cum
       |)
       |SELECT n_name, abc_class,
       |       COUNT(*) AS n_cust,
       |       CAST(SUM(cents) AS DOUBLE) / 100.0 AS revenue,
       |       round(SUM(cents) / CAST(MIN(total) AS DOUBLE) * 100, 6) AS revenue_share
       |FROM classed GROUP BY n_name, abc_class
       |ORDER BY n_name, abc_class""".stripMargin

  /** The q124 column pairs. The fixture generator draws the raw
    * measures INDEPENDENTLY (measured: every raw-raw correlation is
    * |r| < 0.007), so the matrix pairs the derived revenue column
    * l_revenue = l_extendedprice·(1−l_discount) against its drivers —
    * the collinearity a feature-selection pass exists to catch — plus
    * two raw-raw pairs as true-negative controls.
    */
  val CorrPairs: Seq[(String, String)] = Seq(
    ("l_extendedprice", "l_revenue"),
    ("l_discount", "l_revenue"),
    ("l_quantity", "l_discount"),
    ("l_extendedprice", "l_tax"))

  /** q124_numeric_corr — the PEARSON CORRELATION MATRIX over lineitem's
    * measures, computed from EXPLICIT moment sums: r = (n·Σxy − Σx·Σy) /
    * (√(n·Σx²−(Σx)²) · √(n·Σy²−(Σy)²)) — the feature-selection report a
    * training pipeline runs before fitting anything. Spelled as raw
    * moments (never the engines' built-in corr(), whose streaming
    * co-moment updates differ between implementations) so both engines
    * evaluate the IDENTICAL arithmetic tree over the same aggregates;
    * the result rounds at 6 dp where the reduction-order ulp noise
    * (~1e-13 relative on these magnitudes) is invisible.
    *
    * 100 TB: ONE corpus scan computes every pair's five moments in a
    * single aggregate row (2·|pairs| products per row, map-side
    * combined into one partial buffer) — this is the q119 moment-form
    * lesson on the relational axis: the pairwise statistic never needs
    * a second pass, let alone a join.
    */
  def numericCorr(spark: SparkSession, sfDir: String): DataFrame =
    numericCorrOf(Tables.lineitem(spark, sfDir))

  /** Composable core for ANY frame containing the [[CorrPairs]] columns. */
  def numericCorrOf(base: DataFrame): DataFrame = {
    val rows = base.withColumn("l_revenue", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
    val cols = CorrPairs.flatMap { case (a, b) => Seq(a, b) }.distinct
    val momentCols =
      Seq(count(lit(1)).cast("double").as("n")) ++
      cols.map(c => sum(col(c)).as(s"s_$c")) ++
      cols.map(c => sum(col(c) * col(c)).as(s"ss_$c")) ++
      CorrPairs.map { case (a, b) => sum(col(a) * col(b)).as(s"sp_${a}_$b") }
    val m = rows.agg(momentCols.head, momentCols.tail: _*)
    val pairRows = CorrPairs.map { case (a, b) =>
      val num = col("n") * col(s"sp_${a}_$b") - col(s"s_$a") * col(s"s_$b")
      val den = sqrt(col("n") * col(s"ss_$a") - col(s"s_$a") * col(s"s_$a")) *
        sqrt(col("n") * col(s"ss_$b") - col(s"s_$b") * col(s"s_$b"))
      // a zero-variance column has no defined correlation: NULL, the
      // SQL corr() convention (and the ANSI-safe branch)
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col("n").cast("long").as("n"),
        round(when(den === 0, lit(null).cast("double")).otherwise(num / den), 6).as("corr"))
    }
    m.select(explode(array(pairRows: _*)).as("r"))
      .select(col("r.col_a"), col("r.col_b"), col("r.n"), col("r.corr"))
      .orderBy(col("col_a"), col("col_b"))
  }

  val q124OracleSql: String = {
    val arms = CorrPairs.map { case (a, b) =>
      s"""SELECT '$a' AS col_a, '$b' AS col_b, CAST(n AS BIGINT) AS n,
         |       round((n * sp_${a}_$b - s_$a * s_$b) /
         |             nullif(sqrt(n * ss_$a - s_$a * s_$a) * sqrt(n * ss_$b - s_$b * s_$b), 0), 6) AS corr
         |FROM m""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    val cols = CorrPairs.flatMap { case (a, b) => Seq(a, b) }.distinct
    val moments =
      Seq("CAST(COUNT(*) AS DOUBLE) AS n") ++
      cols.map(c => s"SUM($c) AS s_$c") ++
      cols.map(c => s"SUM($c * $c) AS ss_$c") ++
      CorrPairs.map { case (a, b) => s"SUM($a * $b) AS sp_${a}_$b" }
    s"""WITH li AS (
       |  SELECT *, l_extendedprice * (1.0 - l_discount) AS l_revenue FROM lineitem
       |), m AS (
       |  SELECT ${moments.mkString(", ")} FROM li
       |)
       |SELECT * FROM (
       |  $arms
       |) ORDER BY col_a, col_b""".stripMargin
  }

  /** q173's brand scope: 5 of the 25 fixture brands — the Q17
    * selectivity class (TPC-H filters part 1/25 × 1/40; the fixture has
    * no p_container, so brand alone carries the cut). The scoped part
    * side is 1/5 of parts — small at fixture/moderate sf but still
    * sf-growing, so the joins below carry no pinned broadcast hint
    * (ADVICE r15; the q149 lesson): AQE arbitrates by measured size.
    */
  val Q17Brands: Seq[String] =
    Seq("Brand#3", "Brand#7", "Brand#12", "Brand#19", "Brand#23")

  /** q173_small_qty_revenue — the TPC-H Q17 CORRELATED-SCALAR-SUBQUERY
    * shape: revenue sitting in line items whose quantity is below 20% of
    * their part's own average quantity (`l_quantity < (SELECT
    * 0.2*avg(l_quantity) FROM lineitem WHERE l_partkey = p_partkey)`) —
    * the per-row correlated aggregate class the relational family had
    * zero declared rows for (VERDICT r14 gap 1). Extends the TPC-H
    * ladder: Q1 (q26), Q3 (q146), Q5 (q149), Q10 (q27), Q13 (q162),
    * Q17 here.
    *
    * In Spark the subquery DECORRELATES to aggregate-then-join (the
    * textbook Catalyst rewrite): one per-part aggregate over the
    * brand-scoped line items, joined back onto the same scope — never a
    * per-row re-scan of lineitem. The threshold compares in INTEGERS
    * (5·ql·cnt < sum ⟺ ql < 0.2·avg for positive integers — l_quantity
    * is integral), so the boundary case can never float apart across
    * engines; revenue is fixed-point cents (q66/q146 discipline), and
    * the Q17 `/7.0` yearly average is ONE IEEE division at the end.
    *
    * 100 TB: the brand cut drops the part side to 1/5 of parts — still
    * sf-growing, so NEITHER join carries a pinned hint (the q149
    * customer lesson: a pinned broadcast of an sf-growing table OOMs at
    * 100× while AQE falls back to the partkey co-shuffle). AQE
    * arbitrates both by measured size and picks broadcast at fixture /
    * moderate sf (plan-pinned ≥2 BroadcastHashJoin at sf0.001); the
    * per-part aggregate shuffles only (partkey, two longs) partials
    * map-side combined to part-scale. Output is brand-scale.
    */
  def smallQtyRevenue(spark: SparkSession, sfDir: String): DataFrame =
    smallQtyRevenueOf(
      Tables.part(spark, sfDir)
        .filter(col("p_brand").isin(Q17Brands: _*))
        .select(col("p_partkey"), col("p_brand")),
      Tables.lineitem(spark, sfDir)
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice")))

  /** Composable core: `parts` is the PRE-FILTERED (p_partkey, p_brand)
    * scope, `liRaw` any (l_partkey, l_quantity, l_extendedprice) frame.
    */
  def smallQtyRevenueOf(parts: DataFrame, liRaw: DataFrame): DataFrame = {
    val li = liRaw
      .select(col("l_partkey"), col("l_quantity").cast("long").as("ql"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("cents"))
      .join(parts, col("l_partkey") === col("p_partkey"))
    val perPart = li.groupBy(col("l_partkey").as("agg_partkey"))
      .agg(sum(col("ql")).as("sum_q"), count(lit(1)).as("cnt_q"))
    li.join(perPart, col("l_partkey") === col("agg_partkey"))
      .filter(col("ql") * col("cnt_q") * 5 < col("sum_q"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_small"), sum(col("cents")).as("revenue_cents"))
      .select(col("p_brand"), col("n_small"), col("revenue_cents"),
        round(col("revenue_cents").cast("double") / 700.0, 6).as("avg_yearly"))
      .orderBy(col("p_brand"))
  }

  val q173OracleSql: String = {
    val brands = Q17Brands.map(b => s"'$b'").mkString(", ")
    s"""WITH li AS (
       |  SELECT l.l_partkey, CAST(l.l_quantity AS BIGINT) AS ql,
       |         CAST(round(l.l_extendedprice * 100, 0) AS BIGINT) AS cents, p.p_brand
       |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       |  WHERE p.p_brand IN ($brands)
       |), agg AS (
       |  SELECT l_partkey, CAST(SUM(ql) AS BIGINT) AS sum_q,
       |         CAST(COUNT(*) AS BIGINT) AS cnt_q
       |  FROM li GROUP BY l_partkey
       |)
       |SELECT li.p_brand, CAST(COUNT(*) AS BIGINT) AS n_small,
       |       CAST(SUM(li.cents) AS BIGINT) AS revenue_cents,
       |       round(CAST(SUM(li.cents) AS DOUBLE) / 700.0, 6) AS avg_yearly
       |FROM li JOIN agg ON li.l_partkey = agg.l_partkey
       |WHERE 5 * li.ql * agg.cnt_q < agg.sum_q
       |GROUP BY li.p_brand
       |ORDER BY li.p_brand""".stripMargin
  }

  /** q174's having threshold: order quantity above 250 (fixture order
    * totals top out near 460; ~1.4% of orders qualify — the Q18
    * "large-volume customer" cut).
    */
  val Q18MinQty = 250L

  /** q174_big_order_customers — the TPC-H Q18 HAVING-IN shape: orders
    * whose key falls in `(SELECT l_orderkey FROM lineitem GROUP BY 1
    * HAVING sum(l_quantity) > K)`, reported with their customer and
    * total quantity — the semi-join-on-aggregate class, completing the
    * decorrelation pair with q173 (VERDICT r14 item 5).
    *
    * The IN-subquery decorrelates to an INNER join against the
    * post-having aggregate (inner, not semi, because the row carries the
    * subquery's own sum_qty out — the aggregate IS the subquery result).
    * Quantities sum as integers; o_totalprice reports in fixed-point
    * cents (q66 discipline); the top-100 carries a full deterministic
    * tie-break (cents desc, date, orderkey).
    *
    * 100 TB: the lineitem aggregate is the one fact-scale shuffle
    * ((orderkey, long) partials, map-side combined); the HAVING cut
    * drops it to ~1% of orders BEFORE any join, so AQE broadcasts it
    * into orders by measured size (no pinned hint — order-scale grows
    * with sf), the surviving order rows are join-input-scale for the
    * customer join, and the top-100 is a TakeOrderedAndProject, never a
    * global sort.
    */
  def bigOrderCustomers(spark: SparkSession, sfDir: String): DataFrame =
    bigOrderCustomersOf(
      Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_quantity")),
      Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_totalprice")),
      Tables.customer(spark, sfDir).select(col("c_custkey"), col("c_name")),
      Q18MinQty)

  /** Composable core for ANY lineitem/orders/customer-shaped triple. */
  def bigOrderCustomersOf(li: DataFrame, ord: DataFrame, cust: DataFrame,
                          minQty: Long): DataFrame = {
    val big = li
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
      .filter(col("sum_qty") > minQty)
    ord
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        round(col("o_totalprice") * 100, 0).cast("long").as("total_cents"))
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("total_cents"), col("sum_qty"))
      .orderBy(col("total_cents").desc, col("o_orderdate"), col("o_orderkey"))
      .limit(100)
  }

  val q174OracleSql: String =
    s"""SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       |       CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS total_cents, t.sum_qty
       |FROM customer c
       |JOIN orders o ON c.c_custkey = o.o_custkey
       |JOIN (
       |  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
       |  FROM lineitem GROUP BY l_orderkey
       |  HAVING SUM(CAST(l_quantity AS BIGINT)) > $Q18MinQty
       |) t ON o.o_orderkey = t.l_orderkey
       |ORDER BY total_cents DESC, o.o_orderdate, o.o_orderkey
       |LIMIT 100""".stripMargin

  /** q175's lapse cutoff: the NOT-EXISTS scope is "no order since
    * [[Q22Cutoff]]" — the fixture gives EVERY customer orders across the
    * full 1995–2001 date range (TPC-H's one-third orderless customers
    * don't exist here), so the textbook Q22 "no orders at all" predicate
    * is degenerate (0 rows at three decades, measured); the recency
    * scope keeps the identical plan shape with a non-trivial answer
    * (5 / 23 / 25 nation groups at sf0.001 / 0.01 / 0.1).
    */
  val Q22Cutoff = "2000-01-01"

  /** q175_idle_rich_customers — the TPC-H Q22 GLOBAL-SCALAR-SUBQUERY +
    * NOT-EXISTS shape: customers whose account balance sits above the
    * positive-balance average and who have placed no order since
    * [[Q22Cutoff]], reported per nation — the third and last member of
    * the decorrelation trio (q173 correlated scalar, q174 having-in,
    * here uncorrelated scalar + anti-join), closing VERDICT r14 gap 1's
    * query class.
    *
    * The scalar subquery decorrelates to a ONE-ROW aggregate broadcast
    * (crossJoin of a single (sum, count) row); the threshold compares by
    * INTEGER CROSS-MULTIPLICATION (cents·n > sum ⟺ cents > avg for
    * positive n — never a float average whose summation order could
    * differ between engines; the exact-boundary customer is excluded on
    * both, spec-pinned). NOT EXISTS decorrelates to a LEFT ANTI join on
    * custkey.
    *
    * 100 TB: the threshold is one map-side-combined 1-row aggregate
    * broadcast everywhere; the anti join keys both fact-proportional
    * sides by custkey (the q162 argument — no hint, the shuffle IS the
    * plan; the threshold filter prunes the probe side first); output is
    * nation-scale.
    */
  def idleRichCustomers(spark: SparkSession, sfDir: String): DataFrame =
    idleRichCustomersOf(
      Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal")),
      Tables.orders(spark, sfDir)
        .filter(col("o_orderdate") >=
          lit(java.sql.Timestamp.valueOf(s"$Q22Cutoff 00:00:00")))
        .select(col("o_custkey")))

  /** Composable core for ANY (c_custkey, c_nationkey, c_acctbal) ×
    * (o_custkey) pair — the anti-join scope (which orders count as
    * "activity") belongs to the CALLER's ord frame.
    */
  def idleRichCustomersOf(cust: DataFrame, ord: DataFrame): DataFrame = {
    val c = cust.select(col("c_custkey"), col("c_nationkey"),
      round(col("c_acctbal") * 100, 0).cast("long").as("cents"))
    val thr = c.filter(col("cents") > 0)
      .agg(sum(col("cents")).as("s"), count(lit(1)).as("n"))
    c.crossJoin(broadcast(thr))
      .filter(col("cents") * col("n") > col("s"))
      .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), sum(col("cents")).as("totacctbal_cents"))
      .orderBy(col("c_nationkey"))
  }

  val q175OracleSql: String =
    s"""WITH c AS (
       |  SELECT c_custkey, c_nationkey, CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
       |  FROM customer
       |), thr AS (
       |  SELECT CAST(SUM(cents) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM c WHERE cents > 0
       |)
       |SELECT c.c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
       |       CAST(SUM(c.cents) AS BIGINT) AS totacctbal_cents
       |FROM c CROSS JOIN thr
       |WHERE c.cents * thr.n > thr.s
       |  AND NOT EXISTS (
       |    SELECT 1 FROM orders o
       |    WHERE o.o_custkey = c.c_custkey
       |      AND o.o_orderdate >= TIMESTAMP '$Q22Cutoff 00:00:00')
       |GROUP BY c.c_nationkey
       |ORDER BY c.c_nationkey""".stripMargin

  /** q178's scope constants: PROMO parts (1/6 of the catalog — the Q20
    * `forest%` part cut), shipments from 1999 on as "recent" (~40% of
    * the fixture's 1995–2001 span), EUROPE suppliers (1/5 of nations —
    * the Q20 `CANADA` nation cut widened to a region so the sf0.001
    * fixture, 10 suppliers total, still yields rows).
    */
  val Q20PartType = "PROMO"
  val Q20RecentCutoff = "1999-01-01"
  val Q20Region = "EUROPE"

  /** q178_promo_stock_suppliers — the TPC-H Q20 NESTED-SEMI-JOIN shape
    * (VERDICT r15 item 5), the last decorrelation class after Q17
    * (q173), Q18 (q174), Q22 (q175): suppliers in a region whose key
    * falls in a subquery that itself nests a part-scope IN and a
    * correlated per-(supplier, part) aggregate threshold. The fixture
    * has no partsupp/availqty, so the Q20 "stock exceeds half of what
    * was shipped" correlated comparison is re-expressed on shipments
    * alone: a (supplier, part) pair QUALIFIES when its recent shipped
    * quantity is the strict majority of its all-time shipped quantity
    * (2·recent > total, integers — l_quantity is integral) across ≥ 2
    * shipments. The row carries the per-supplier count of qualifying
    * parts out (the q174 discipline: the subquery's aggregate IS part of
    * the answer, making the hash cover it).
    *
    * Decorrelation: the IN-inside-IN collapses to (part-scope SEMI-JOIN
    * into the fact scan) → ONE per-(suppkey, partkey) aggregate → HAVING
    * cut → a supplier-scale count → join to the region-cut supplier dim.
    * Never a per-supplier re-scan of lineitem.
    *
    * 100 TB: the part scope carries no pinned hint (sf-growing — the
    * q149/q173 lesson; AQE picks broadcast at fixture scale); the one
    * fact-scale shuffle is the (suppkey, partkey) aggregate, map-side
    * combined; everything after the HAVING cut is supplier-scale; the
    * nation/region dims broadcast (fixed 25/5 rows).
    */
  def promoStockSuppliers(spark: SparkSession, sfDir: String): DataFrame =
    promoStockSuppliersOf(
      Tables.part(spark, sfDir).filter(col("p_type") === Q20PartType)
        .select(col("p_partkey")),
      Tables.lineitem(spark, sfDir)
        .select(col("l_suppkey"), col("l_partkey"), col("l_quantity"), col("l_shipdate")),
      Tables.supplier(spark, sfDir)
        .join(Tables.nation(spark, sfDir),
          col("s_nationkey") === col("n_nationkey"))
        .join(Tables.region(spark, sfDir),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === Q20Region)
        .select(col("s_suppkey"), col("s_name")))

  /** Composable core: `partScope` is the (p_partkey) scope, `liRaw` any
    * (l_suppkey, l_partkey, l_quantity, l_shipdate) frame, `supp` the
    * PRE-CUT (s_suppkey, s_name) supplier dimension.
    */
  def promoStockSuppliersOf(partScope: DataFrame, liRaw: DataFrame,
                            supp: DataFrame): DataFrame = {
    val cutoff = java.sql.Timestamp.valueOf(s"$Q20RecentCutoff 00:00:00")
    val sp = liRaw
      .join(partScope, col("l_partkey") === col("p_partkey"), "left_semi")
      .select(col("l_suppkey"), col("l_partkey"),
        col("l_quantity").cast("long").as("ql"),
        when(col("l_shipdate") >= lit(cutoff), col("l_quantity").cast("long"))
          .otherwise(0L).as("rq"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("ql")).as("total_q"), sum(col("rq")).as("recent_q"),
        count(lit(1)).as("n"))
      .filter(col("n") >= 2 && col("recent_q") * 2 > col("total_q"))
    val perSupp = sp.groupBy(col("l_suppkey")).agg(count(lit(1)).as("n_parts"))
    supp.join(perSupp, col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_parts"))
      .orderBy(col("s_suppkey"))
  }

  val q178OracleSql: String =
    s"""WITH sp AS (
       |  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_shipments
       |  FROM lineitem
       |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = '$Q20PartType')
       |  GROUP BY l_suppkey, l_partkey
       |  HAVING COUNT(*) >= 2
       |     AND 2 * SUM(CASE WHEN l_shipdate >= TIMESTAMP '$Q20RecentCutoff 00:00:00'
       |                      THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
       |         > SUM(CAST(l_quantity AS BIGINT))
       |), cnt AS (
       |  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_parts FROM sp GROUP BY l_suppkey
       |)
       |SELECT s.s_suppkey, s.s_name, cnt.n_parts
       |FROM supplier s
       |JOIN nation n ON s.s_nationkey = n.n_nationkey
       |JOIN region r ON n.n_regionkey = r.r_regionkey
       |JOIN cnt ON cnt.l_suppkey = s.s_suppkey
       |WHERE r.r_name = '$Q20Region'
       |ORDER BY s.s_suppkey""".stripMargin

  /** q182's scope constants. The fixture carries no
    * l_receiptdate/l_commitdate, so Q21's per-lineitem "kept waiting"
    * predicate (receipt after commit) is re-expressed on the columns it
    * does have: a lineitem is LATE when it ships more than
    * [[Q21LateDays]] days after its order's date — the same
    * re-expression discipline as q178's Q20 adaptation. The supplier cut
    * is q178's EUROPE region (a single-nation cut yields zero rows at
    * sf0.001's 10 suppliers).
    */
  val Q21LateDays = 90
  val Q21Region = "EUROPE"

  /** q182_waiting_suppliers — the TPC-H Q21 shape (VERDICT r16 item 3):
    * suppliers who kept completed orders waiting — for each late
    * lineitem l1 of a finished ('F') order, count it iff the order has
    * at least one OTHER supplier (the EXISTS) and NO other supplier was
    * late on it (the NOT EXISTS) — the double correlated self-join on
    * lineitem, the hardest classic decorrelation after the
    * Q17/Q18/Q20/Q22 family.
    *
    * Decorrelation: never a per-row re-scan. The two correlated
    * subqueries collapse into one per-(orderkey, suppkey) aggregate —
    * the pair's late-row count — plus per-orderkey WINDOW counts over
    * those pairs: supplier count (EXISTS ⇔ n_supp > 1) and late-supplier
    * count (NOT EXISTS ⇔ n_late_supp = 1, since l1's own supplier is
    * late); numwait(s) = Σ qualifying pairs' late-row counts (Q21 counts
    * l1 ROWS, not orders — the per-pair count carries that through the
    * decorrelation). The windows replace a groupBy + pair↔order
    * self-join: same values, one pair-scale shuffle instead of two plus
    * a join, and no join build side for AQE to arbitrate (the r17
    * plan-identity pin needs the plan deterministic).
    *
    * 100 TB: ONE fact-scale shuffle pair (lineitem ⋈ F-orders on
    * orderkey — the status cut prunes the orders side first, and real
    * Q21 pays the same join); everything after is (order, supplier)-PAIR
    * scale: the pair aggregate is map-side combined, the order-window
    * partitions are bounded by suppliers-per-order, and the
    * supplier/nation/region dims broadcast (no pinned hints — the
    * q149/q173 lesson, AQE arbitrates).
    */
  def waitingSuppliers(spark: SparkSession, sfDir: String): DataFrame =
    waitingSuppliersOf(
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate")),
      Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate")),
      Tables.supplier(spark, sfDir)
        .join(Tables.nation(spark, sfDir),
          col("s_nationkey") === col("n_nationkey"))
        .join(Tables.region(spark, sfDir),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === Q21Region)
        .select(col("s_suppkey"), col("s_name")))

  /** Composable core: `li` any (l_orderkey, l_suppkey, l_shipdate)
    * frame, `ordF` the PRE-CUT finished orders (o_orderkey,
    * o_orderdate), `supp` the PRE-CUT (s_suppkey, s_name) dimension.
    */
  def waitingSuppliersOf(li: DataFrame, ordF: DataFrame,
                         supp: DataFrame): DataFrame = {
    val lf = li
      .join(ordF, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        when(col("l_shipdate") >
          col("o_orderdate") + expr(s"INTERVAL $Q21LateDays DAYS"), lit(1L))
          .otherwise(lit(0L)).as("late"))
    val perPair = lf
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(sum(col("late")).as("n_late_rows"))
    // the per-order EXISTS/NOT-EXISTS counts as WINDOWS over the pair
    // table, not a groupBy + self-join: one pair-scale shuffle on
    // l_orderkey (partitions bounded by suppliers-per-order), no join
    // for AQE to arbitrate — deterministic plan, one fewer exchange
    val wOrd = Window.partitionBy(col("l_orderkey"))
    // both counts in ONE select → one Window node (chained withColumns
    // would plan two, with a blocking Project between)
    val qual = perPair
      .select(col("l_orderkey"), col("l_suppkey"), col("n_late_rows"),
        count(lit(1)).over(wOrd).as("n_supp"),
        count(when(col("n_late_rows") > 0, lit(1))).over(wOrd).as("n_late_supp"))
      .filter(col("n_late_rows") > 0 && col("n_supp") > 1 &&
        col("n_late_supp") === 1)
    supp.join(qual, col("s_suppkey") === col("l_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(sum(col("n_late_rows")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
  }

  val q182OracleSql: String =
    s"""WITH lf AS (
       |  SELECT l.l_orderkey, l.l_suppkey,
       |         CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL $Q21LateDays DAY
       |              THEN 1 ELSE 0 END AS late
       |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
       |  WHERE o.o_orderstatus = 'F'
       |), ps AS (
       |  SELECT l_orderkey, l_suppkey, SUM(late) AS n_late_rows
       |  FROM lf GROUP BY 1, 2
       |), po AS (
       |  SELECT l_orderkey, COUNT(*) AS n_supp,
       |         SUM(CASE WHEN n_late_rows > 0 THEN 1 ELSE 0 END) AS n_late_supp
       |  FROM ps GROUP BY 1
       |), qual AS (
       |  SELECT ps.l_suppkey, ps.n_late_rows
       |  FROM ps JOIN po USING (l_orderkey)
       |  WHERE ps.n_late_rows > 0 AND po.n_supp > 1 AND po.n_late_supp = 1
       |)
       |SELECT s.s_suppkey, s.s_name, CAST(SUM(q.n_late_rows) AS BIGINT) AS numwait
       |FROM qual q
       |JOIN supplier s ON s.s_suppkey = q.l_suppkey
       |JOIN nation n ON s.s_nationkey = n.n_nationkey
       |JOIN region r ON n.n_regionkey = r.r_regionkey
       |WHERE r.r_name = '$Q21Region'
       |GROUP BY 1, 2
       |ORDER BY numwait DESC, s.s_suppkey""".stripMargin
}
