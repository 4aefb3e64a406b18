package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** q164_cdc_chunking — CONTENT-DEFINED CHUNKING (the rsync/LBFS/restic
  * boundary rule): cut a document after every position whose w-char
  * rolling-hash window satisfies `h % divisor == 0`, so chunk boundaries
  * are determined by CONTENT, not offsets — inserting a byte re-aligns
  * at the next boundary and every chunk past it is byte-identical again
  * (CdcSpec pins the realignment), which is what makes chunk-level
  * dedup/delta-storage work where q32's fixed-offset chunking would see
  * every downstream chunk as new.
  *
  * Per doc: chunk count, distinct-chunk count (md5 of the chunk text —
  * within-doc repetition shows here), and mean chunk length. The
  * window hash is q90's Karp-Rabin polynomial ((h·31 + byte) mod
  * 1000003, w = 8) — the convention already hash-proven cross-engine on
  * this corpus — and the expected chunk length is [[CdcDivisor]] chars.
  *
  * 100 TB: everything is ONE scan-local expression chain per row
  * (sequence/transform/aggregate HOFs — window hashes, cut positions,
  * chunk lengths, chunk digests — all codegen-adjacent array ops, no
  * UDF); the only exchange carries the per-doc summary. The cross-doc
  * dedup application (group chunks by digest corpus-wide) is one
  * 16-byte-fingerprint aggregate on top — the q15 discipline at chunk
  * grain — exercised by [[chunkDigestsOf]] + spec, kept out of the
  * declared row so the row stays doc-scale.
  */
object Cdc {

  /** Rolling window width (chars) — q90's winnowing window. */
  val CdcWindow = 8

  /** Boundary divisor: cut where window hash % this == 0; expected chunk
    * length ≈ divisor.
    */
  val CdcDivisor = 64L

  /** q90's Karp-Rabin constants (RollingHash defaults) — the oracle SQL
    * mirrors them.
    */
  private val B = graft.functions.RollingHash.DefaultBase
  private val M = graft.functions.RollingHash.DefaultModulus

  def cdcChunking(spark: SparkSession, sfDir: String): DataFrame =
    cdcChunkingOf(Tables.documents(spark, sfDir))

  /** Internal column names: a window starting at i (1-based) covers
    * [i, i+w-1]; a qualifying window cuts AFTER offset i+w-1; a cut at
    * the very end is dropped (it would create an empty final chunk).
    */
  private val txtName = "graft_cdc_txt"

  /** Composable core for ANY (doc_id, text, …) frame. */
  def cdcChunkingOf(docs: DataFrame): DataFrame =
    withChunks(docs)
      .select(col("doc_id"),
        size(col("chunks")).cast("long").as("n_chunks"),
        size(array_distinct(transform(col("chunks"), c => md5(c)))).cast("long").as("n_unique"),
        round(length(col(txtName)) / size(col("chunks")).cast("double"), 6).as("avg_len"))
      .orderBy(col("doc_id"))

  /** (doc_id, txt, chunks) — the chunk TEXT array per doc, shared by the
    * declared row and [[chunkDigestsOf]]. The boundary scan is the
    * native [[graft.functions.CdcCuts]] loop (the HOF equivalent
    * measured 26 s at sf0.1 — the WinnowFingerprint codegen cliff);
    * splitting at the few cuts per doc stays a cheap HOF.
    */
  def withChunks(docs: DataFrame): DataFrame = {
    val cuts = graft.functions.CdcCuts.cutsCol(docs.sparkSession, CdcWindow, CdcDivisor) _
    val chunks = expr(
      s"""transform(sequence(1, size($boundsName) - 1), k ->
         |  substring($txtName,
         |    CAST(element_at($boundsName, k) + 1 AS INT),
         |    CAST(element_at($boundsName, k + 1) - element_at($boundsName, k) AS INT)))""".stripMargin)
    docs
      .withColumn(txtName, lower(col("text")))
      .withColumn(boundsName,
        concat(array(lit(0L)), cuts(col(txtName)), array(length(col(txtName)).cast("long"))))
      .withColumn("chunks", chunks)
  }

  private val boundsName = "graft_cdc_bounds"

  /** The cross-doc dedup application: every chunk as (digest, length) —
    * group by digest corpus-wide and the duplicate mass is the storage a
    * chunk store saves. 16-byte fingerprints only past the scan.
    */
  def chunkDigestsOf(docs: DataFrame): DataFrame =
    withChunks(docs)
      .select(col("doc_id"), explode(col("chunks")).as("chunk"))
      .select(col("doc_id"), md5(col("chunk")).as("digest"),
        length(col("chunk")).cast("long").as("chunk_len"))

  // ---------------------------------------------------------------------
  // q165_delta_storage — chunk reuse across snapshot versions
  // ---------------------------------------------------------------------

  /** q165_delta_storage — WHY content-defined chunking exists, measured:
    * for every document MODIFIED between q153's two pinned snapshots
    * (the `doc_id % 7 == 0` "v2 " prefix edit, present in both), chunk
    * BOTH versions with q164's boundary rule and report how much of the
    * new version a chunk store already holds — reused chunk instances,
    * reused bytes, and the reuse share. The "v2 " edit is a PREFIX
    * insertion — the exact shift that defeats fixed-offset chunking
    * (every q32 chunk would change) — and CDC realigns at the first
    * content boundary, so everything after chunk one dedups (CdcSpec's
    * realignment property, here as a declared corpus-wide measurement).
    *
    * 100 TB: both versions chunk scan-locally (native cuts); the join is
    * doc-keyed between two change-scale projections (q153's diff gates
    * which docs enter at all — unchanged docs never reach this operator
    * in production); reuse is a per-row HOF over the two digest arrays
    * (chunks-per-doc scale). The store-side variant joins new-chunk
    * digests against the persisted chunk index instead (the q80
    * artifact pattern) — same 16-byte-digest discipline.
    */
  def deltaStorage(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 7 === 0 && col("doc_id") % 11 =!= 3 && col("doc_id") % 13 =!= 5)
      .select(col("doc_id"), col("text"))
    deltaStorageOf(
      docs,
      docs.withColumn("text", concat(lit("v2 "), col("text"))))
  }

  /** Composable core for ANY pair of (doc_id, text) version frames. */
  def deltaStorageOf(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    val oldC = withChunks(oldDocs)
      .select(col("doc_id"), transform(col("chunks"), c => md5(c)).as("old_digs"))
    val newC = withChunks(newDocs)
      .select(col("doc_id"), col("chunks"))
    newC.join(oldC, Seq("doc_id"))
      .withColumn("reused", filter(col("chunks"), c => array_contains(col("old_digs"), md5(c))))
      .select(col("doc_id"),
        size(col("chunks")).cast("long").as("n_chunks"),
        size(col("reused")).cast("long").as("n_reused"),
        aggregate(col("chunks"), lit(0L), (a, c) => a + length(c)).as("bytes_total"),
        aggregate(col("reused"), lit(0L), (a, c) => a + length(c)).as("bytes_reused"))
      .withColumn("reuse_pct",
        round(col("bytes_reused") / col("bytes_total").cast("double") * 100, 6))
      .orderBy(col("doc_id"))
  }

  val q165OracleSql: String = {
    def chunkCtes(src: String, tag: String): String =
      s"""${tag}h AS (
         |  SELECT doc_id, txt,
         |    list_transform(range(1, greatest(len(txt) - ${CdcWindow - 1}, 0) + 1), i ->
         |      list_reduce([CAST(0 AS BIGINT)] || list_transform(range(i, i + $CdcWindow),
         |        j -> CAST(ascii(substring(txt, CAST(j AS INT), 1)) AS BIGINT)),
         |        (h, c) -> (h * $B + c) % $M)) AS hs
         |  FROM $src
         |), ${tag}cut AS (
         |  SELECT doc_id, txt,
         |    [CAST(0 AS BIGINT)] ||
         |    list_filter(list_transform(
         |      list_filter(range(1, len(hs) + 1), i -> hs[CAST(i AS INT)] % $CdcDivisor = 0),
         |      i -> CAST(i + ${CdcWindow - 1} AS BIGINT)), e -> e < len(txt)) ||
         |    [CAST(len(txt) AS BIGINT)] AS bounds
         |  FROM ${tag}h
         |), ${tag}ch AS (
         |  SELECT doc_id,
         |    list_transform(range(1, len(bounds)), k ->
         |      substring(txt, CAST(bounds[CAST(k AS INT)] + 1 AS INT),
         |        CAST(bounds[CAST(k + 1 AS INT)] - bounds[CAST(k AS INT)] AS INT))) AS chunks
         |  FROM ${tag}cut
         |)""".stripMargin
    s"""WITH m AS (
       |  SELECT doc_id, lower(text) AS old_txt, lower('v2 ' || text) AS new_txt
       |  FROM documents
       |  WHERE doc_id % 7 = 0 AND doc_id % 11 <> 3 AND doc_id % 13 <> 5
       |), ot AS (
       |  SELECT doc_id, old_txt AS txt FROM m
       |), nt AS (
       |  SELECT doc_id, new_txt AS txt FROM m
       |), ${chunkCtes("ot", "o")},
       |${chunkCtes("nt", "n")}, j AS (
       |  SELECT n.doc_id, n.chunks,
       |         list_transform(o.chunks, c -> md5(c)) AS old_digs
       |  FROM nch n JOIN och o USING (doc_id)
       |), r AS (
       |  SELECT doc_id, chunks,
       |         list_filter(chunks, c -> list_contains(old_digs, md5(c))) AS reused
       |  FROM j
       |)
       |SELECT doc_id,
       |       CAST(len(chunks) AS BIGINT) AS n_chunks,
       |       CAST(len(reused) AS BIGINT) AS n_reused,
       |       CAST(list_sum(list_transform(chunks, c -> len(c))) AS BIGINT) AS bytes_total,
       |       CAST(coalesce(list_sum(list_transform(reused, c -> len(c))), 0) AS BIGINT) AS bytes_reused,
       |       round(coalesce(list_sum(list_transform(reused, c -> len(c))), 0)
       |             / CAST(list_sum(list_transform(chunks, c -> len(c))) AS DOUBLE) * 100, 6) AS reuse_pct
       |FROM r ORDER BY doc_id""".stripMargin
  }

  val q164OracleSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, lower(text) AS txt FROM documents
       |), h AS (
       |  SELECT doc_id, txt,
       |    list_transform(range(1, greatest(len(txt) - ${CdcWindow - 1}, 0) + 1), i ->
       |      list_reduce([CAST(0 AS BIGINT)] || list_transform(range(i, i + $CdcWindow),
       |        j -> CAST(ascii(substring(txt, CAST(j AS INT), 1)) AS BIGINT)),
       |        (h, c) -> (h * $B + c) % $M)) AS hs
       |  FROM t
       |), cut AS (
       |  SELECT doc_id, txt,
       |    [CAST(0 AS BIGINT)] ||
       |    list_filter(list_transform(
       |      list_filter(range(1, len(hs) + 1), i -> hs[CAST(i AS INT)] % $CdcDivisor = 0),
       |      i -> CAST(i + ${CdcWindow - 1} AS BIGINT)), e -> e < len(txt)) ||
       |    [CAST(len(txt) AS BIGINT)] AS bounds
       |  FROM h
       |), ch AS (
       |  SELECT doc_id, txt, bounds,
       |    list_transform(range(1, len(bounds)), k ->
       |      substring(txt, CAST(bounds[CAST(k AS INT)] + 1 AS INT),
       |        CAST(bounds[CAST(k + 1 AS INT)] - bounds[CAST(k AS INT)] AS INT))) AS chunks
       |  FROM cut
       |)
       |SELECT doc_id,
       |       CAST(len(chunks) AS BIGINT) AS n_chunks,
       |       CAST(len(list_distinct(list_transform(chunks, c -> md5(c)))) AS BIGINT) AS n_unique,
       |       round(len(txt) / CAST(len(chunks) AS DOUBLE), 6) AS avg_len
       |FROM ch ORDER BY doc_id""".stripMargin
}
