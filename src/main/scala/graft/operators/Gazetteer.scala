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
