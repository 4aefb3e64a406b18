package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Point-upsert semantics of the reference's batch ingest
  * (reference: vector_db.py:93-106 `client.upsert` — insert-or-replace by
  * point id). In a columnar immutable store this is append + a
  * last-writer-wins view: `row_number() over (partition by id order by
  * version desc) = 1`.
  *
  * Scale note: the dedup window shuffles by `vec_id` (hash partitioning on
  * the key); at 100 TB this is the standard merge-on-read pattern — the
  * shuffle is unavoidable for a global view, but per-partition pre-rank
  * (map-side partial via the window's rank filter) keeps only candidate
  * winners flowing when versions are file-clustered.
  */
object Upsert {

  /** q03_upsert_latest — re-upsert modified copies of points with
    * vec_id < 100 (label bumped by 100, version 1) over the base collection
    * (version 0) and resolve last-writer-wins.
    */
  def upsertLatest(spark: SparkSession, sfDir: String): DataFrame = {
    val emb  = Tables.embeddings(spark, sfDir)
    val base = emb.select(col("vec_id"), col("label"), lit(0L).as("version"))
    val upd = emb
      .filter(col("vec_id") < 100)
      .select(col("vec_id"), (col("label") + 100).as("label"), lit(1L).as("version"))
    val all = base.unionByName(upd)
    val w   = Window.partitionBy(col("vec_id")).orderBy(col("version").desc)
    all
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("label").cast("long").as("label"), col("version"))
      .orderBy(col("vec_id"))
  }

  val q03OracleSql: String =
    """WITH base AS (
      |  SELECT vec_id, label, 0 AS version FROM embeddings
      |), upd AS (
      |  SELECT vec_id, label + 100 AS label, 1 AS version FROM embeddings WHERE vec_id < 100
      |), all_rows AS (
      |  SELECT * FROM base UNION ALL SELECT * FROM upd
      |)
      |SELECT vec_id, CAST(label AS BIGINT) AS label, CAST(version AS BIGINT) AS version
      |FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY version DESC) AS rn FROM all_rows)
      |WHERE rn = 1
      |ORDER BY vec_id""".stripMargin
}
