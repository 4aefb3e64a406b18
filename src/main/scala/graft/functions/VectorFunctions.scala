package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType` embedding columns, expressed with built-in
  * higher-order functions so the whole computation stays inside Catalyst and
  * whole-stage codegen (no UDFs on the hot path).
  *
  * Mirrors the reference's per-collection COSINE metric
  * (reference: vector_db.py:23, text_img.py:21); the scoring that Qdrant does
  * server-side (vector_db_query.py:78-86) becomes a scalar column expression
  * here.
  *
  * All math is done in DOUBLE: fixture embeddings are float32 and the DuckDB
  * oracle accumulates in double, so we cast up front (see FIXTURES.md notes).
  *
  * Zero-vector policy: cosine(a, b) = 0.0 when either norm is 0 (documented
  * decision from SURVEY.md §5; unit-tested).
  */
object VectorFunctions {

  /** Cast an array<float> column to array<double> for stable accumulation. */
  def toDouble(a: Column): Column = a.cast("array<double>")

  /** Dot product of two equal-length numeric arrays, accumulated in double. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Squared L2 norm. */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x * x)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity with zero-vector guard (score 0.0). Inputs may be
    * float arrays; they are cast to double internally.
    */
  def cosineSimilarity(a: Column, b: Column): Column = {
    val ad = toDouble(a)
    val bd = toDouble(b)
    val denom = l2Norm(ad) * l2Norm(bd)
    when(denom === lit(0.0), lit(0.0)).otherwise(dotProduct(ad, bd) / denom)
  }

  /** Cosine similarity rounded to 6 dp — the form every declared query emits
    * so Spark and the DuckDB oracle agree bit-for-bit (SURVEY.md §7 risks).
    */
  def cosineSimilarity6(a: Column, b: Column): Column =
    round(cosineSimilarity(a, b), 6)

  /** Squared L2 distance between two arrays (double-accumulated). */
  def l2DistanceSq(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  /** L2-normalize an array column (zero vector stays zero).
    *
    * The norm is bound ONCE per row via `array_repeat` and divided out
    * with `zip_with`: higher-order functions are not codegen'd, so putting
    * `l2Norm(ad)` inside the `transform` lambda would re-evaluate the full
    * aggregate per ELEMENT — O(dim²) per row (measured ~25% of q23 before
    * the fix).
    */
  def normalize(a: Column): Column = {
    val ad = toDouble(a)
    val n  = l2Norm(ad)
    when(n === lit(0.0), ad)
      .otherwise(zip_with(ad, array_repeat(n, size(ad)), (x, nn) => x / nn))
  }
}
