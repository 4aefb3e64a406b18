package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins on hot keys. First line of defense at scale is
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default and enabled in graft.Bench); this helper is the manual fallback
  * for the cases AQE can't split (e.g. a build side too large to broadcast
  * joined on a single pathological key).
  */
object Skew {

  /** Equi-join `left ⋈ right` on `key`, with the left side's hot keys
    * spread over `buckets` salted sub-keys and the right side replicated
    * once per salt. The left salt is a DETERMINISTIC hash of the whole left
    * row (not `rand()`), so results are reproducible run-to-run.
    * Produces exactly the plain inner-join result (property-tested).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, buckets: Int): DataFrame = {
    val leftCols: Seq[Column] = left.columns.map(col).toSeq
    val salted = left.withColumn("_salt", pmod(xxhash64(leftCols: _*), lit(buckets)))
    val replicated = right
      .withColumn("_salt", explode(sequence(lit(0L), lit(buckets - 1L))))
    salted
      .join(replicated, Seq(key, "_salt"))
      .drop("_salt")
  }
}
