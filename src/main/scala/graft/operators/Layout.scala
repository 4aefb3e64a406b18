package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-LAYOUT planning — the write-side operators a 100 TB lakehouse
  * pipeline runs between curation and training: multi-dimensional
  * clustering (z-order) so point/range predicates on EITHER dimension
  * prune files, and small-file compaction so the file manifest stays
  * scan-efficient. Both are declared as PLANNING queries (cell/shard
  * reports) because the plan is the verifiable artifact; executing it is
  * one `repartitionByRange`/`repartition` write ([[writeZOrdered]]).
  */
object Layout {

  /** Bits interleaved per dimension (8 → 16-bit z values, 256×256 grid). */
  val ZBits = 8

  /** z cells per output file: 256 files of 256 cells each — fixing a
    * file fixes the top [[ZBits]]/2 bits of BOTH dimensions, so every
    * file spans ≤ 16 of the 256 buckets of each dim (the skipping bound
    * LayoutSpec pins).
    */
  val ZCellsPerFile = 256L

  /** Morton/z-order interleave of two [[ZBits]]-bit coordinates: bit b of
    * x lands at position 2b, bit b of y at 2b+1. Pure codegen'd integer
    * bit arithmetic — scan-local at any corpus size.
    */
  def zInterleave(x: Column, y: Column): Column =
    (0 until ZBits).map { b =>
      shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduce(_ + _)

  def zorderLayout(spark: SparkSession, sfDir: String): DataFrame =
    zorderLayoutOf(Tables.events(spark, sfDir))

  /** q156_zorder_layout — Z-ORDER file layout plan for the events table
    * on (user bucket, hour bucket): interleave the two 8-bit bucketed
    * coordinates into a 16-bit Morton code, split the code space into
    * 256-cell files, and report per file the row count plus the min/max
    * of z and of BOTH raw dimensions — the per-file column statistics a
    * format like Parquet/Iceberg/Delta keeps, which are exactly what
    * makes the layout useful: every file's span is ≤ 16/256 of each
    * dimension (vs a time-sorted layout, where user_id spans the full
    * range in every file), so a point predicate on either column prunes
    * ≥ 15/16 of files from the manifest alone.
    *
    * 100 TB: the z code is scan-local codegen'd bit math (no shuffle);
    * the report is one aggregate keyed by file id (≤ 256 groups,
    * map-side combined). EXECUTING the plan is `repartitionByRange(z)` +
    * `sortWithinPartitions(z)` ([[writeZOrdered]]) — one range shuffle,
    * the same cost as any global sort-write, with file count a knob
    * (files ∝ corpus / target-file-size, so cells-per-file scales with
    * the data and the report stays file-count-bounded).
    */
  def zorderLayoutOf(ev: DataFrame): DataFrame = {
    val coords = ev.select(
      (col("user_id") % 256).as("ux"),
      (expr("unix_micros(ts) div 3600000000") % 256).as("tx"))
    coords
      .select(col("ux"), col("tx"), zInterleave(col("ux"), col("tx")).as("z"))
      .groupBy((col("z") / ZCellsPerFile).cast("long").as("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("z")).as("z_min"), max(col("z")).as("z_max"),
        min(col("ux")).as("ux_min"), max(col("ux")).as("ux_max"),
        min(col("tx")).as("tx_min"), max(col("tx")).as("tx_max"))
      .orderBy(col("file_id"))
  }

  /** The plan EXECUTION path: range-partition by the z code into `n`
    * files and sort within each — rows with nearby (x, y) land in the
    * same file, giving the per-file stats q156 reports. Not declared
    * (writes, not a result set); LayoutSpec drives it and checks the
    * produced partition stats against the plan.
    */
  def writeZOrdered(df: DataFrame, z: Column, n: Int): DataFrame =
    df.withColumn("_z", z).repartitionByRange(n, col("_z"))
      .sortWithinPartitions(col("_z"))

  private def duckZ(x: String, y: String): String =
    (0 until ZBits).map { b =>
      s"((($x >> $b) & 1) << ${2 * b}) + ((($y >> $b) & 1) << ${2 * b + 1})"
    }.mkString(" + ")

  val q156OracleSql: String =
    s"""WITH c AS (
       |  SELECT user_id % 256 AS ux, (epoch_us(ts) // 3600000000) % 256 AS tx FROM events
       |), zc AS (
       |  SELECT ux, tx, ${duckZ("ux", "tx")} AS z FROM c
       |)
       |SELECT z // $ZCellsPerFile AS file_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |       MIN(z) AS z_min, MAX(z) AS z_max,
       |       MIN(ux) AS ux_min, MAX(ux) AS ux_max,
       |       MIN(tx) AS tx_min, MAX(tx) AS tx_max
       |FROM zc GROUP BY file_id ORDER BY file_id""".stripMargin

  // ---------------------------------------------------------------------
  // q157_compaction_plan — small-file bin packing to a target shard size
  // ---------------------------------------------------------------------

  /** Target shard payload (chars here; bytes in production). 4,096 makes
    * the sf0.01 plan ~2 shards per source and scales the shard count
    * linearly with the corpus.
    */
  val CompactTarget = 4096L

  def compactionPlan(spark: SparkSession, sfDir: String): DataFrame =
    compactionPlanOf(Tables.documents(spark, sfDir), CompactTarget)

  /** q157_compaction_plan — SIZE-TARGETED COMPACTION plan: within each
    * source, pack id-ordered items into shards by exclusive prefix sum
    * (`shard = floor(running_size / target)`), and report per (source,
    * shard) the item count, payload total, and the id range — the
    * manifest rewrite plan that fixes the small-files problem.
    *
    * Prefix-sum packing (vs first-fit) is the deterministic, massively
    * parallel choice: every shard except a source's last is ≥ target
    * (an item that crosses the boundary lands in the shard its prefix
    * starts in, so a shard overshoots by at most one item), the
    * assignment depends only on (source, id) order — re-runs are
    * bit-identical — and the id ranges are contiguous, so executing the
    * plan preserves id-locality for range scans.
    *
    * 100 TB: the production input is the FILE MANIFEST (one row per
    * file from the table's metadata layer — millions of rows, not the
    * data itself), so planning is metadata-scale; demonstrated here at
    * per-document granularity because the fixture's "files" are rows.
    * The window is a per-source prefix sum (parallel across sources,
    * the q69/q77 sharding argument: source count grows with the corpus,
    * no global window anywhere); executing the plan is one shuffle
    * keyed by (source, shard).
    */
  def compactionPlanOf(docs: DataFrame, target: Long): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("run", coalesce(sum(col("n_chars")).over(w), lit(0L)))
      .withColumn("shard_seq", expr(s"run div $target"))
      .groupBy(col("source"), col("shard_seq"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"))
      .orderBy(col("source"), col("shard_seq"))
  }

  val q157OracleSql: String =
    s"""WITH run AS (
       |  SELECT source, doc_id, n_chars,
       |         coalesce(SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS run
       |  FROM documents
       |)
       |SELECT source, CAST(run // $CompactTarget AS BIGINT) AS shard_seq,
       |       CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       |       MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
       |FROM run GROUP BY source, shard_seq ORDER BY source, shard_seq""".stripMargin
}
