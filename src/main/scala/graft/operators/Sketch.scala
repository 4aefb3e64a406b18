package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** q154_heavy_hitters_cms — COUNT-MIN SKETCH heavy hitters with the exact
  * audit column: estimate token frequencies from a fixed
  * [[CmsDepth]]×[[CmsWidth]] counter grid and report, for the exact
  * top-[[HhTopK]] tokens, the exact count next to the sketch estimate and
  * its (always ≥ 0) overestimate — the q64 recall-audit pattern applied to
  * the sketch family.
  *
  * Why this is the 100 TB distinct-count/frequency shape: the sketch
  * aggregate's state is 1,024 cells REGARDLESS of corpus size — each
  * partition partial-aggregates its token stream map-side into the same
  * grid, and the merge is cellwise addition. The exact side (a full
  * token groupBy) exists here as the AUDIT that the fixture gate can
  * afford; at production scale the sketch + a candidate re-scan replaces
  * it entirely (the CMS guarantee: estimate ≥ true, overestimate ≤ εN
  * w.h.p.).
  *
  * Unlike `approx_count_distinct` (HLL — not oracle-declarable, its
  * sketch differs across engines; AnalyticsSpec tests it by relative
  * error), this sketch is EXACTLY reproducible: the row hashes are
  * md5-prefix buckets (`'cms<r>:' || token` → first 8 hex chars →
  * integer % width — the q141 md5-nibble discipline widened), string-
  * identical md5 in both engines, so every cell count, every min, and
  * every overestimate hash-matches the DuckDB oracle. Sketches under the
  * hard hash gate.
  */
object Sketch {

  /** Hash rows (d). 4 rows puts the failure probability at e^-4-ish per
    * the standard CMS bound — and 4 is also the max the one-digest slice
    * scheme supports (32 hex chars / 8 per row).
    */
  val CmsDepth = 4
  require(CmsDepth <= 4, "the one-md5 slice scheme yields at most 4 independent 32-bit rows")

  /** Counters per row (w). 256 keeps fixture-scale collisions real (the
    * sf10 vocabulary is ~3k types, so the audit column shows genuine
    * sketch error at the third decade) while the grid stays trivially
    * broadcastable.
    */
  val CmsWidth = 256

  /** Heavy hitters reported. */
  val HhTopK = 20

  /** Row-r bucket of a token: ONE md5 per token, its 32 hex chars sliced
    * into [[CmsDepth]] ≤ 4 disjoint 8-char words — four independent
    * 32-bit hashes for the price of one digest (the corpus-scale token
    * stream pays the md5; the slice is free).
    */
  private def bucket(r: Int, token: Column): Column =
    conv(substring(md5(concat(lit("cms:"), token)), 1 + 8 * r, 8), 16, 10)
      .cast("long") % CmsWidth

  def heavyHittersCms(spark: SparkSession, sfDir: String): DataFrame =
    heavyHittersCmsOf(Tables.documents(spark, sfDir))

  /** The PRODUCTION sketch build: one scan of the token stream into the
    * fixed d×w grid — map-side combine collapses every partition to
    * ≤ 1,024 partial cells regardless of corpus size; this is the path a
    * sketch-only deployment runs (no exact table anywhere). The declared
    * row derives the same cells from the exact table it must compute
    * anyway (counts are additive — SketchSpec pins the two cell tables
    * equal), saving the second corpus-scale pass.
    */
  def cmsCellsOf(toks: DataFrame): DataFrame =
    toks
      .select(explode(array((0 until CmsDepth).map(r =>
        struct(lit(r).as("r"), bucket(r, col("token")).as("bucket"))): _*)).as("rb"))
      .select(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Composable core for ANY (text, …) corpus. */
  def heavyHittersCmsOf(docs: DataFrame): DataFrame = {
    val toks = docs.select(explode(TextPipeline.tokenArr(col("text"))).as("token"))
    // ONE corpus-scale aggregate (the audit needs exact counts anyway);
    // everything below it is vocabulary-scale
    val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("exact_count"))
    // cells derived from the type table: cell(r,b) = Σ exact_count of the
    // tokens hashing there — identical to the scan-side cmsCellsOf by
    // additivity (spec-pinned), at type-scale instead of token-scale
    val cells = exact
      .select(col("exact_count"),
        explode(array((0 until CmsDepth).map(r =>
          struct(lit(r).as("r"), bucket(r, col("token")).as("bucket"))): _*)).as("rb"))
      .select(col("rb.r").as("r"), col("rb.bucket").as("bucket"), col("exact_count"))
      .groupBy(col("r"), col("bucket"))
      .agg(sum(col("exact_count")).as("cnt"))
    // the audit side: exact top-k by (count desc, token)
    val top = exact
      .orderBy(col("exact_count").desc, col("token"))
      .limit(HhTopK)
    // probe: the k tokens re-hash scan-locally, the ≤1,024-cell grid
    // broadcasts, estimate = min over the d probed cells
    val probes = top
      .select(col("token"), col("exact_count"),
        explode(array((0 until CmsDepth).map(r =>
          struct(lit(r).as("r"), bucket(r, col("token")).as("bucket"))): _*)).as("p"))
      .select(col("token"), col("exact_count"), col("p.r").as("r"), col("p.bucket").as("bucket"))
    probes.join(broadcast(cells), Seq("r", "bucket"))
      .groupBy(col("token"), col("exact_count"))
      .agg(min(col("cnt")).as("cms_estimate"))
      .withColumn("overestimate", col("cms_estimate") - col("exact_count"))
      .select(col("token"), col("exact_count"), col("cms_estimate"), col("overestimate"))
      .orderBy(col("exact_count").desc, col("token"))
  }

  // ---------------------------------------------------------------------
  // q155_hll_distinct — deterministic HyperLogLog registers + exact audit
  // ---------------------------------------------------------------------

  /** HLL registers (m = 2^p, p = 6). 64 keeps the fixture-scale standard
    * error honest (~1.04/√64 ≈ 13%), so the audit column shows genuine
    * sketch error at every decade, while the register table stays
    * trivially broadcastable (64 rows per group).
    */
  val HllM = 64

  /** Max rho: the rank slice is 32 bits, so the leading-zero count of a
    * nonzero word is ≤ 31 → rho ≤ 32; the all-zero word (p = 2^-32) is
    * pinned to 33 per the HLL convention.
    */
  val HllRhoMax = 33

  /** Slice r (0-based) of the one md5 per value — the q154 slice scheme:
    * 8 hex chars → an exact 32-bit word, string-identical md5 in both
    * engines. Slice 0 % m is the register; slice 1 is the rank word.
    */
  private def hllSlice(r: Int, v: Column): Column =
    conv(substring(md5(concat(lit("hll:"), v)), 1 + 8 * r, 8), 16, 10).cast("long")

  def hllDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    hllDistinctOf(ev, "event_type", col("user_id"))
  }

  /** q155_hll_distinct — per-group DISTINCT-COUNT SKETCH with the exact
    * audit column: estimate |{v}| per group from a fixed [[HllM]]-register
    * HyperLogLog and report, next to the exact distinct count, the
    * register-table state (`v_zero`, `s_scaled`) and the estimate
    * (Flajolet et al. 2007, incl. the small-range linear-counting branch).
    *
    * Why this is the 100 TB distinct-count shape: the sketch aggregate's
    * state is [[HllM]] bytes per group REGARDLESS of corpus size — each
    * partition folds its value stream map-side into `max(rho)` per
    * (group, register), and the merge is registerwise max (idempotent, so
    * duplicate values need no pre-distinct: the raw stream and the
    * distinct table produce the SAME registers). The exact side — a
    * corpus-scale `count(distinct)` whose state is the value set itself —
    * exists here as the AUDIT the fixture gate can afford; at production
    * scale the sketch replaces it entirely.
    *
    * Unlike `approx_count_distinct` (whose HLL++ sketch is
    * engine-internal and not reproducible across engines), every quantity
    * here is EXACTLY determined: registers are md5-slice buckets (q154
    * discipline), rho is a string-length bit count (`33 − length(bin(w))`
    * — `bin` is minimal-width in both engines), and the harmonic sum is
    * carried as the INTEGER `s_scaled = Σ 2^(33−M_j)` (≤ 64·2^33 ≪ 2^53,
    * so even its double image is exact). The only floats are the final
    * one-division estimate and `ln` in the linear-counting branch (the
    * q109 ln precedent), both rounded to 6 dp on both sides. Sketches
    * under the hard hash gate, part two.
    */
  /** The PRODUCTION register build from a raw (possibly duplicate-bearing)
    * value stream: scan-local md5 slice, then ONE corpus-scale aggregate —
    * max(rho) per (group, register), map-side combined to ≤ |groups|×64
    * rows per partition. The declared row derives the same registers from
    * the distinct-pair table it must compute for the audit anyway (max is
    * idempotent — SketchSpec pins duplicate-stream equality), saving the
    * second corpus-scale pass; a sketch-only deployment runs THIS.
    */
  def hllRegistersOf(df: DataFrame, grpName: String, v: Column): DataFrame = {
    val rho = when(col("w") === 0L, lit(HllRhoMax))
      .otherwise(lit(HllRhoMax) - length(bin(col("w"))))
    df.select(col(grpName).as("g"), (hllSlice(0, v) % HllM).as("reg"), hllSlice(1, v).as("w"))
      .select(col("g"), col("reg"), rho.cast("int").as("rho"))
      .groupBy(col("g"), col("reg")).agg(max(col("rho")).as("rho"))
  }

  def hllDistinctOf(df: DataFrame, grpName: String, v: Column): DataFrame = {
    val spark = df.sparkSession
    val g = col(grpName)
    // ONE logical distinct (group, value) table feeds both the exact
    // audit and the registers (idempotence — see hllRegistersOf). NOT
    // cached: the three readers live in one returned plan, so AQE's
    // exchange reuse shares the distinct's shuffle, and a corpus-scale
    // cache entry with no unpersist point would leak for the session
    // (ADVICE r14; the repo's unpersist discipline is try/finally or
    // nothing). The sketch-only production path (hllRegistersOf on the
    // raw stream) never materializes this table at all.
    val pairs = df.select(g.as("g"), v.as("v")).distinct()
    val mx = hllRegistersOf(pairs, "g", col("v"))
    // densify to the full 64-register table per group (absent register →
    // M = 0); group count × 64 rows — tiny at any corpus size
    val full = pairs.select(col("g")).distinct()
      .crossJoin(broadcast(spark.range(HllM).select(col("id").as("reg"))))
      .join(mx, Seq("g", "reg"), "left")
      .select(col("g"), coalesce(col("rho"), lit(0)).as("m"))
    val st = full.groupBy(col("g")).agg(
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllRhoMax - m)")).as("s_scaled"),
      sum(when(col("m") === 0, 1L).otherwise(0L)).as("v_zero"))
    // exact audit: the corpus-scale distinct the sketch replaces at scale
    val ex = pairs.groupBy(col("g")).agg(count(lit(1)).as("exact_distinct"))
    // alpha_64 · m² / Σ 2^(-M_j) = 0.709 · 64² · 2^33 / s_scaled; linear
    // counting below 2.5m with empty registers present (Flajolet §4)
    val raw = lit(0.709) * lit(4096.0) * lit(8589934592.0) / col("s_scaled")
    val est = when(raw <= lit(2.5 * HllM) && col("v_zero") > 0,
      lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("v_zero"))).otherwise(raw)
    ex.join(st, Seq("g"))
      .select(col("g").as(grpName), col("exact_distinct"), col("v_zero"), col("s_scaled"),
        round(est, 6).as("hll_estimate"),
        round((est - col("exact_distinct")) / col("exact_distinct") * 100, 6).as("err_pct"))
      .orderBy(col(grpName))
  }

  val q155OracleSql: String =
    s"""WITH hr AS (
       |  SELECT event_type,
       |         CAST(('0x' || substring(md5('hll:' || user_id), 1, 8))::UBIGINT % $HllM AS BIGINT) AS reg,
       |         CAST(('0x' || substring(md5('hll:' || user_id), 9, 8))::UBIGINT AS BIGINT) AS w
       |  FROM events
       |), mx AS (
       |  SELECT event_type, reg,
       |         MAX(CASE WHEN w = 0 THEN $HllRhoMax ELSE $HllRhoMax - length(bin(w)) END) AS rho
       |  FROM hr GROUP BY event_type, reg
       |), dense AS (
       |  SELECT et.event_type, r.range AS reg, coalesce(mx.rho, 0) AS m
       |  FROM (SELECT DISTINCT event_type FROM events) et
       |  CROSS JOIN range($HllM) r
       |  LEFT JOIN mx ON mx.event_type = et.event_type AND mx.reg = r.range
       |), st AS (
       |  SELECT event_type,
       |         CAST(SUM(1::BIGINT << ($HllRhoMax - m)) AS BIGINT) AS s_scaled,
       |         CAST(SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_zero
       |  FROM dense GROUP BY event_type
       |), ex AS (
       |  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
       |  FROM events GROUP BY event_type
       |), est AS (
       |  SELECT ex.event_type, ex.exact_distinct, st.v_zero, st.s_scaled,
       |         CASE WHEN 0.709e0 * 4096e0 * 8589934592e0 / st.s_scaled <= ${2.5 * HllM}e0
       |                   AND st.v_zero > 0
       |              THEN ${HllM}e0 * ln(${HllM}e0 / st.v_zero)
       |              ELSE 0.709e0 * 4096e0 * 8589934592e0 / st.s_scaled END AS e
       |  FROM ex JOIN st USING (event_type)
       |)
       |SELECT event_type, exact_distinct, v_zero, s_scaled,
       |       round(e, 6) AS hll_estimate,
       |       round((e - exact_distinct) / exact_distinct * 100, 6) AS err_pct
       |FROM est ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q161_quantile_sketch — fixed-grid histogram quantiles + exact audit
  // ---------------------------------------------------------------------

  /** Histogram buckets (the sketch's entire state per group). */
  val QsBuckets = 256

  /** Bucket width over the PINNED value domain [0, 512): a production
    * sketch pins its domain like any other serving artifact (the q54/q86
    * pinned-constant convention); out-of-domain values clamp into the
    * NEAREST edge bucket on BOTH sides (bucket 0 below, bucket 255 above
    * — ADVICE r14 caught the lower edge unclamped) and the audit column
    * exposes the resulting error.
    */
  val QsWidth = 2.0

  /** Quantiles reported. */
  val QsQuantiles: Seq[Double] = Seq(0.5, 0.9, 0.99)

  def quantileSketch(spark: SparkSession, sfDir: String): DataFrame =
    quantileSketchOf(Tables.events(spark, sfDir))

  /** q161_quantile_sketch — per-group QUANTILE ESTIMATION from a fixed
    * [[QsBuckets]]-cell equi-width histogram, next to the exact quantile
    * and the signed error — the sketch family's third member (q154
    * frequency, q155 distinct, here rank), same audit shape.
    *
    * Why this is the 100 TB quantile shape: exact quantiles need a sort
    * or a full multiset; the histogram is a 256-INTEGER state per group
    * — scan-local bucketing (one divide + clamp, codegen), map-side
    * combined cell counts, cellwise-additive merge — and the estimate
    * (cumulative walk + linear interpolation inside the target cell) is
    * group×bucket-scale arithmetic. The exact side (a per-group sort to
    * the explicit rank) is the AUDIT the fixture affords; at production
    * scale the histogram replaces it.
    *
    * The audit is the DISCRETE quantile — the data value at rank
    * ⌈q·N⌉, computed from an EXPLICIT row_number on both sides (never
    * the engines' quantile functions, whose rank conventions differ:
    * continuous interpolation can also land arbitrarily far from any
    * data value in a sparse tail, voiding any width bound). With the
    * rank pinned, the guarantee is by construction: the selected cell
    * CONTAINS the rank-⌈q·N⌉ value, both est and exact lie within one
    * cell, |err| ≤ [[QsWidth]] always (SketchSpec pins it).
    *
    * Everything is either integer (cell counts, cumulative sums, ranks)
    * or the IDENTICAL IEEE expression tree on both engines (bucket =
    * floor(v / width) clamped; estimate = width·(b + (qN − cum_before) /
    * c_b)), rounded at 6 dp — deterministic under the hash gate, no
    * t-digest/KLL engine internals anywhere.
    */
  def quantileSketchOf(ev: DataFrame): DataFrame = {
    val bucket = greatest(lit(0.0),
      least(floor(col("value") / QsWidth), lit((QsBuckets - 1).toDouble))).cast("long")
    // the production sketch: one scan → (group × bucket) integer cells
    val cells = ev.select(col("event_type"), bucket.as("b"))
      .groupBy(col("event_type"), col("b")).agg(count(lit(1)).as("cnt"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = cells
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("event_type"))))
    // each quantile's target rank falls in exactly one occupied cell
    val qs = cum.crossJoin(broadcast(
      ev.sparkSession.range(1).select(explode(
        array(QsQuantiles.map(lit): _*)).as("qtile"))))
      .withColumn("target", col("qtile") * col("n"))
      .filter(col("cum") >= col("target") && (col("cum") - col("cnt")) < col("target"))
      .select(col("event_type"), col("qtile"),
        round((col("b") + (col("target") - (col("cum") - col("cnt"))) / col("cnt"))
          * QsWidth, 6).as("est_value"))
    // exact audit: the per-group sort to the explicit rank ⌈q·N⌉ — the
    // pass the sketch replaces at scale
    val wv = Window.partitionBy(col("event_type")).orderBy(col("value"))
    val exact = ev.select(col("event_type"), col("value"))
      .withColumn("rn", row_number().over(wv))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .crossJoin(broadcast(ev.sparkSession.range(1).select(explode(
        array(QsQuantiles.map(lit): _*)).as("qtile"))))
      .filter(col("rn") === ceil(col("qtile") * col("n")))
      .select(col("event_type"), col("qtile"), round(col("value"), 6).as("exact_value"))
    qs.join(exact, Seq("event_type", "qtile"))
      .select(col("event_type"), col("qtile"), col("est_value"), col("exact_value"),
        round(col("est_value") - col("exact_value"), 6).as("err"))
      .orderBy(col("event_type"), col("qtile"))
  }

  val q161OracleSql: String =
    s"""WITH cells AS (
       |  SELECT event_type,
       |         CAST(greatest(0e0, least(floor(value / ${QsWidth}e0), ${QsBuckets - 1}e0)) AS BIGINT) AS b,
       |         COUNT(*) AS cnt
       |  FROM events GROUP BY event_type, b
       |), cum AS (
       |  SELECT event_type, b, cnt,
       |         SUM(cnt) OVER (PARTITION BY event_type ORDER BY b
       |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |         SUM(cnt) OVER (PARTITION BY event_type) AS n
       |  FROM cells
       |), est AS (
       |  SELECT c.event_type, q.qtile,
       |         round((c.b + (q.qtile * c.n - (c.cum - c.cnt)) / c.cnt) * ${QsWidth}e0, 6) AS est_value
       |  FROM cum c CROSS JOIN (VALUES (0.5e0), (0.9e0), (0.99e0)) q(qtile)
       |  WHERE c.cum >= q.qtile * c.n AND (c.cum - c.cnt) < q.qtile * c.n
       |), ranked AS (
       |  SELECT event_type, value,
       |         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
       |         COUNT(*) OVER (PARTITION BY event_type) AS n
       |  FROM events
       |), exact AS (
       |  SELECT event_type, q.qtile, round(value, 6) AS exact_value
       |  FROM ranked CROSS JOIN (VALUES (0.5e0), (0.9e0), (0.99e0)) q(qtile)
       |  WHERE rn = CAST(ceil(q.qtile * n) AS BIGINT)
       |)
       |SELECT e.event_type, e.qtile, e.est_value, x.exact_value,
       |       round(e.est_value - x.exact_value, 6) AS err
       |FROM est e JOIN exact x ON e.event_type = x.event_type AND e.qtile = x.qtile
       |ORDER BY e.event_type, e.qtile""".stripMargin

  val q154OracleSql: String =
    s"""WITH t AS (
       |  SELECT unnest(regexp_extract_all(text, '(\\w+|[^\\w\\s]+)', 1)) AS token FROM documents
       |), exact AS (
       |  SELECT token, COUNT(*) AS exact_count FROM t GROUP BY token
       |), rb AS (
       |  SELECT r.range AS r,
       |         CAST(('0x' || substring(md5('cms:' || token), CAST(1 + 8 * r.range AS INT), 8))::UBIGINT
       |              % $CmsWidth AS BIGINT) AS bucket,
       |         exact_count
       |  FROM exact CROSS JOIN range($CmsDepth) r
       |), cells AS (
       |  SELECT r, bucket, CAST(SUM(exact_count) AS BIGINT) AS cnt FROM rb GROUP BY r, bucket
       |), top AS (
       |  SELECT token, exact_count FROM (
       |    SELECT token, exact_count,
       |           row_number() OVER (ORDER BY exact_count DESC, token) AS rn
       |    FROM exact)
       |  WHERE rn <= $HhTopK
       |), probes AS (
       |  SELECT top.token, top.exact_count, r.range AS r,
       |         CAST(('0x' || substring(md5('cms:' || top.token), CAST(1 + 8 * r.range AS INT), 8))::UBIGINT
       |              % $CmsWidth AS BIGINT) AS bucket
       |  FROM top CROSS JOIN range($CmsDepth) r
       |)
       |SELECT p.token, p.exact_count, MIN(c.cnt) AS cms_estimate,
       |       MIN(c.cnt) - p.exact_count AS overestimate
       |FROM probes p JOIN cells c ON c.r = p.r AND c.bucket = p.bucket
       |GROUP BY p.token, p.exact_count
       |ORDER BY p.exact_count DESC, p.token""".stripMargin
}
