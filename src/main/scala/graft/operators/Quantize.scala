package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions._

/** Scalar (int8-range) embedding quantization — the storage-side
  * compression every large vector store applies to float collections
  * (the reference stores raw float32 vectors, vector_db.py:88; scalar
  * quantization is the standard server-side option for exactly that
  * payload). At 100 TB, 4 bytes → 1 byte per dimension is the difference
  * between scanning 100 TB and scanning 25 TB on every probe.
  *
  * Per-VECTOR min/max codebook: `code = round((x - lo) / scale)` with
  * `scale = (hi - lo) / 255`, reconstruction `lo + code * scale`.
  * Entirely scan-local — zero shuffle, zero driver state; each row carries
  * its own 8-byte codebook (lo, hi). Every per-row bound (lo/hi/scale) is
  * bound as a COLUMN in its own projection before any lambda uses it:
  * an aggregate evaluated inside a `transform` lambda re-runs per element
  * (the O(dim²) trap q23 hit in round 1).
  */
object Quantize {

  /** q49_quantize_int8 — quantize each embedding to int8-range codes and
    * report the codebook plus reconstruction-error stats: a checksum over
    * the codes (`code_sum` hash-verifies every code against the oracle),
    * mean absolute error, and max absolute error.
    */
  def quantizeInt8(spark: SparkSession, sfDir: String): DataFrame =
    quantizeStats(Tables.embeddings(spark, sfDir))

  /** The quantize-and-report pipeline over any (vec_id, embedding) frame. */
  def quantizeStats(emb: DataFrame): DataFrame = {
    val bound = emb
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .select(col("vec_id"), col("v"),
        array_min(col("v")).as("lo"), array_max(col("v")).as("hi"))
      .withColumn("scale", (col("hi") - col("lo")) / lit(255.0))
    val coded = bound.select(col("vec_id"), col("v"), col("lo"), col("hi"), col("scale"),
      when(col("scale") === lit(0.0), transform(col("v"), _ => lit(0.0)))
        .otherwise(transform(col("v"), x => round((x - col("lo")) / col("scale"), 0)))
        .as("codes"))
    coded
      .select(col("vec_id"), col("lo"), col("hi"), col("codes"),
        zip_with(col("v"), col("codes"),
          (x, q) => abs(x - (col("lo") + q * col("scale")))).as("err"))
      .select(
        col("vec_id"),
        round(col("lo"), 6).as("lo"),
        round(col("hi"), 6).as("hi"),
        aggregate(col("codes"), lit(0.0), (acc, q) => acc + q).cast("long").as("code_sum"),
        round(aggregate(col("err"), lit(0.0), (acc, e) => acc + e) / size(col("err")), 6).as("mae"),
        round(array_max(col("err")), 6).as("max_err"))
      .orderBy(col("vec_id"))
  }

  val q49OracleSql: String =
    """WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |), b AS (
      |  SELECT vec_id, v, list_min(v) AS lo, list_max(v) AS hi,
      |         (list_max(v) - list_min(v)) / 255.0 AS scale
      |  FROM e
      |), c AS (
      |  SELECT vec_id, v, lo, hi, scale,
      |         CASE WHEN scale = 0 THEN list_transform(v, x -> 0.0)
      |              ELSE list_transform(v, x -> round((x - lo) / scale)) END AS codes
      |  FROM b
      |), r AS (
      |  SELECT vec_id, lo, hi, codes,
      |         list_transform(range(1, len(v) + 1),
      |           i -> abs(v[CAST(i AS INT)] - (lo + codes[CAST(i AS INT)] * scale))) AS err
      |  FROM c
      |)
      |SELECT vec_id,
      |       round(lo, 6) AS lo,
      |       round(hi, 6) AS hi,
      |       CAST(list_aggregate(codes, 'sum') AS BIGINT) AS code_sum,
      |       round(list_aggregate(err, 'sum') / len(err), 6) AS mae,
      |       round(list_max(err), 6) AS max_err
      |FROM r ORDER BY vec_id""".stripMargin
}
