package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text CLEANING — the C4-style normalization pass that runs before any
  * other curation stage: strip control characters, collapse whitespace
  * runs, trim. Pure scan-local column expressions (two codegen'd
  * regexp_replace + trim), no shuffle; at 100 TB this rides the ingest
  * scan for free.
  *
  * Regex-dialect note (the oracle must byte-match): Java's `\p{Cntrl}`
  * and RE2's `[[:cntrl:]]` agree ([\x00-\x1f\x7f]); Java's `\s` and
  * RE2's `\s` DISAGREE on vertical tab — but step 1 removes every
  * control char (VT included), so the step-2 collapse only ever sees
  * plain spaces and the dialects are equivalent on its input.
  */
object Cleaning {

  /** The cleaning chain for any string column. */
  def cleanText(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, "[\\p{Cntrl}]", " "), "\\s+", " "))

  /** q85_text_clean — declared fixture: docs with doc_id % 3 == 0 arrive
    * DIRTY (spaces turned to tabs, a trailing BEL + padded tail — the
    * deterministic dirt-planting mirror of q15's copy planting); the
    * cleaner must normalize them and leave already-clean rows byte-
    * identical. Emits (doc_id, clean_text, n_chars_clean, changed).
    */
  def textClean(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val raw = docs.select(col("doc_id"),
      when(col("doc_id") % 3 === 0,
        concat(translate(col("text"), " ", "\t"), lit("\u0007  tail  ")))
        .otherwise(col("text")).as("raw"))
    textCleanOf(raw, col("raw"))
  }

  /** Composable core for ANY frame: cleans `rawCol`, reports change. */
  def textCleanOf(df: DataFrame, rawCol: Column): DataFrame =
    df.select(col("doc_id"),
        cleanText(rawCol).as("clean_text"),
        (cleanText(rawCol) =!= rawCol).cast("long").as("changed"))
      .withColumn("n_chars_clean", length(col("clean_text")))
      .select(col("doc_id"), col("clean_text"), col("n_chars_clean"), col("changed"))
      .orderBy(col("doc_id"))

  val q85OracleSql: String =
    """WITH raw AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 3 = 0
      |              THEN replace(text, ' ', chr(9)) || chr(7) || '  tail  '
      |              ELSE text END AS raw
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, raw,
      |         trim(regexp_replace(regexp_replace(raw, '[[:cntrl:]]', ' ', 'g'), '\s+', ' ', 'g')) AS clean_text
      |  FROM raw
      |)
      |SELECT doc_id, clean_text,
      |       CAST(length(clean_text) AS BIGINT) AS n_chars_clean,
      |       CAST(clean_text <> raw AS BIGINT) AS changed
      |FROM c
      |ORDER BY doc_id""".stripMargin
}
