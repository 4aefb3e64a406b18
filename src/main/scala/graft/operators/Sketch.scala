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
