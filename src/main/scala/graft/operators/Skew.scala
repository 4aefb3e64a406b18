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

  /** q66_salted_join — [[saltedJoin]] under the oracle via its equivalence
    * contract (round 6): the fact table (events — every row of a type
    * carries the same join key, the canonical hot-key shape) joins a tiny
    * derived per-type dimension through the SALTED plan, then aggregates;
    * the oracle runs the PLAIN join + aggregate. A hash match IS the
    * operator's promise — salting changes the shuffle layout (hot keys
    * spread over `buckets` sub-keys), never the answer. `weighted_value`
    * rounds at 2 dp (large-sum house rule).
    */
  def saltedJoinDeclared(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame = {
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    val dim = ev.select(col("event_type")).distinct()
      .select(col("event_type"), (length(col("event_type")).cast("double") / 10.0).as("weight"))
    saltedJoin(ev, dim, "event_type", buckets = 8)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value") * col("weight")), 2).as("weighted_value"))
      .orderBy(col("event_type"))
  }

  val q66OracleSql: String =
    """WITH dim AS (
      |  SELECT event_type, len(event_type)::DOUBLE / 10.0 AS weight
      |  FROM (SELECT DISTINCT event_type FROM events)
      |)
      |SELECT e.event_type,
      |       COUNT(*) AS n,
      |       round(SUM(e.value * d.weight), 2) AS weighted_value
      |FROM events e JOIN dim d ON d.event_type = e.event_type
      |GROUP BY e.event_type
      |ORDER BY e.event_type""".stripMargin
}
