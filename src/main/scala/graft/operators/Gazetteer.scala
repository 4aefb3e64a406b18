package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Dictionary-based entity tagging — the gazetteer pass every
  * knowledge-grounded curation pipeline runs (tag documents by mentions
  * of a controlled vocabulary: product names, domains, PII terms,
  * benchmark names…). The reference's payload filters select on stored
  * metadata (`vector_db_query.py:60-67` filter=label match); this
  * operator DERIVES such tags from the text itself, which is how the
  * metadata gets there in the first place.
  *
  * Distinct from the regex family (q52 PII): a gazetteer is a SET of
  * exact terms, so the match is token-level set membership — no
  * backtracking, no pattern compilation per doc — and the semantics are
  * "which entities, how often, in how many docs per language".
  */
object Gazetteer {

  /** The controlled vocabulary, sorted. A literal here (the q88/q101
    * closed-form discipline) so both engines see the identical set; a
    * production gazetteer of thousands of terms ships the same way —
    * inlined into the plan while it fits the expression tree, a
    * broadcast-joined terms table past that (the q94 pattern; the match
    * then becomes explode + broadcast semi-join, same shuffle shape).
    * Multi-token phrases would gate on the q112 gram stream instead of
    * the token stream — same plan, n-gram column.
    */
  val Entities: Seq[String] = Seq(
    "batch", "cache", "customer", "index", "merge",
    "stream", "table", "vector", "window")

  /** q116_entity_tag — per-(entity, lang) mention statistics: documents
    * containing the term and total mentions. The scan-side `filter`
    * cuts each token array to its gazetteer hits BEFORE the explode, so
    * the exploded stream is hit-scale, not token-scale — the corpus'
    * tokens never become rows.
    *
    * 100 TB: one scan; per-token set membership against the inlined
    * dictionary is codegen'd array_contains (O(|dict|) per token, or a
    * broadcast hash semi-join for big dictionaries); the only shuffle
    * carries (entity, lang, doc_id) HIT partials with map-side combine
    * — bounded by |dict| × langs × docs-with-hits, a tiny fraction of
    * the token stream. The distinct-doc count is the standard two-level
    * aggregate expansion, same keys.
    */
  def entityTag(spark: SparkSession, sfDir: String): DataFrame =
    entityTagOf(Tables.documents(spark, sfDir))

  /** Composable core for ANY (doc_id, text, lang, …) corpus. */
  def entityTagOf(docs: DataFrame, terms: Seq[String] = Entities): DataFrame = {
    val dict = array(terms.map(lit): _*)
    docs
      .select(col("doc_id"), col("lang"),
        explode(filter(TextPipeline.tokenArr(col("text")),
          t => array_contains(dict, t))).as("entity"))
      .groupBy(col("entity"), col("lang"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("mentions"))
      .orderBy(col("entity"), col("lang"))
  }

  /** q131's key width and candidate threshold. */
  val LinkKeyLen  = 24
  val LinkMaxDist = 6

  /** q131_fuzzy_link — RECORD LINKAGE by edit distance: a fixed probe
    * list of "dirty" keys (each probe's key is a deterministically
    * corrupted 24-char document prefix — a/e-to-digit substitutions,
    * the classic OCR/typo model) is resolved against the corpus by
    * levenshtein distance; each probe reports its best match (smallest
    * distance, ties to the smaller doc_id) and how many candidates sat
    * within [[LinkMaxDist]]. This is the fuzzy-lookup half of entity
    * resolution (the gazetteer q116 is its exact-match half): dedup
    * against a reference list, "find the canonical record for this
    * scraped title".
    *
    * The best-match argmin is an INTEGER min over dist·10^12 + doc_id —
    * one exact min aggregate with the tie-break built into the number,
    * no window, no argmin/arg_min cross-engine tie ambiguity.
    *
    * 100 TB: the probe list is query-scale and FIXED (ids < 500 — it
    * does not grow with the corpus), so it broadcasts and the distance
    * evaluates scan-side against every corpus row (BroadcastNestedLoop
    * over a ≤ 14-row build side — linear in the corpus, the q95
    * broadcast-query discipline); the aggregate is probe-scale with
    * map-side combine. A production deployment with probe lists past
    * broadcast size blocks both sides on a key prefix or length band
    * first (the q18 blocked-join discipline) — same plan downstream.
    */
  def fuzzyLink(spark: SparkSession, sfDir: String): DataFrame =
    fuzzyLinkOf(Tables.documents(spark, sfDir))

  /** Composable core for ANY (doc_id, text, …) corpus. */
  def fuzzyLinkOf(docs: DataFrame): DataFrame = {
    val key = lower(substring(col("text"), 1, LinkKeyLen))
    val probes = docs
      .filter(col("doc_id") % 37 === 0 && col("doc_id") < 500)
      .select(col("doc_id").as("probe_id"),
        translate(key, "ae", "43").as("probe_key"))
    val corpus = docs.select(col("doc_id"), key.as("doc_key"))
    corpus.join(broadcast(probes),
        levenshtein(col("probe_key"), col("doc_key")) <= LinkMaxDist)
      .select(col("probe_id"), col("doc_id"),
        levenshtein(col("probe_key"), col("doc_key")).cast("long").as("dist"))
      .groupBy(col("probe_id"))
      .agg(min(col("dist") * lit(1000000000000L) + col("doc_id")).as("best"),
        count(lit(1)).as("n_cand"))
      .select(col("probe_id"),
        pmod(col("best"), lit(1000000000000L)).as("match_id"),
        expr("best div 1000000000000").as("dist"),
        col("n_cand"))
      .orderBy(col("probe_id"))
  }

  val q131OracleSql: String =
    s"""WITH p AS (
       |  SELECT doc_id AS probe_id,
       |         translate(lower(substring(text, 1, $LinkKeyLen)), 'ae', '43') AS probe_key
       |  FROM documents WHERE doc_id % 37 = 0 AND doc_id < 500
       |), c AS (
       |  SELECT doc_id, lower(substring(text, 1, $LinkKeyLen)) AS doc_key FROM documents
       |), m AS (
       |  SELECT p.probe_id, c.doc_id,
       |         CAST(levenshtein(p.probe_key, c.doc_key) AS BIGINT) AS dist
       |  FROM c CROSS JOIN p
       |  WHERE levenshtein(p.probe_key, c.doc_key) <= $LinkMaxDist
       |)
       |SELECT probe_id,
       |       MIN(dist * 1000000000000 + doc_id) % 1000000000000 AS match_id,
       |       MIN(dist * 1000000000000 + doc_id) // 1000000000000 AS dist,
       |       COUNT(*) AS n_cand
       |FROM m GROUP BY probe_id ORDER BY probe_id""".stripMargin

  val q116OracleSql: String = {
    val dictSql = Entities.map(e => s"'$e'").mkString("[", ", ", "]")
    s"""WITH d AS (
      |  SELECT doc_id, lang, regexp_extract_all(text, '(\\w+|[^\\w\\s]+)', 1) AS toks
      |  FROM documents
      |), h AS (
      |  SELECT doc_id, lang,
      |         unnest(list_filter(toks, x -> list_contains($dictSql, x))) AS entity
      |  FROM d
      |)
      |SELECT entity, lang, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS mentions
      |FROM h GROUP BY entity, lang ORDER BY entity, lang""".stripMargin
  }
}
