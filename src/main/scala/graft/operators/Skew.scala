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
    * aggregates in FIXED POINT: value is a 2-dp decimal and the weight
    * is len/10, so (value×100)·len is an exact integer per row, the sum
    * is an exact long, and both engines divide the identical integer by
    * 1000.0 — one IEEE division, NO round() call — bit-deterministic at
    * every scale. (The earlier round-2dp double sum hit a structural
    * half-way boundary at sf0.001: products of 2-dp values and .5-grain
    * weights land EXACTLY on x.xx5, where first summation-order ulp and
    * then the ENGINES' OWN round() implementations — BigDecimal HALF_UP
    * vs scaled-floor on doubles — disagree. Found by this round's
    * small-scale sweep; closed by never rounding a half-way point.)
    */
  def saltedJoinDeclared(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame = {
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"))
    val dim = ev.select(col("event_type")).distinct()
      .select(col("event_type"), (length(col("event_type")).cast("double") / 10.0).as("weight"))
    saltedJoin(ev, dim, "event_type", buckets = 8)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100, 0).cast("long") *
            (col("weight") * 10).cast("long")).cast("double") / 1000.0)
          .as("weighted_value"))
      .orderBy(col("event_type"))
  }

  /** q135_key_skew_audit — the PRE-JOIN SKEW REPORT per event type over
    * the user_id key: row and key cardinalities, the heaviest key's
    * share, the coefficient of variation of per-key counts, and the
    * p50/p99 count quantiles with their ratio — the numbers that decide
    * BEFORE a 100 TB shuffle whether a key needs [[saltedJoin]], an AQE
    * skew split, or nothing (a p99/p50 near 1 and top1_share ≈ 1/keys
    * means the hash partitioning is already balanced). This is the
    * operational audit the q66 mitigation assumes someone ran.
    *
    * CV comes from integer moment sums (n·Σc² − S² under a sqrt — the
    * q124 discipline; per-key counts are exact integers so the moments
    * are exact), quantiles are the exact interpolated aggregates (q36
    * discipline). Only displayed ratios round.
    *
    * 100 TB: one (type, key) count aggregate with map-side combine,
    * then one per-type reduce over the KEY-scale stream — the moment
    * sums and max are plain aggregates; the two quantiles hold per-type
    * value-count buffers (distinct COUNT values — log-bounded in
    * practice; approx_percentile is the drop-in past that). No window,
    * no join, nothing corpus-scale after the first aggregate.
    */
  def keySkewAudit(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame =
    keySkewAuditOf(graft.Tables.events(spark, sfDir), "event_type", "user_id")

  /** Composable core: per-`group` skew stats of the `key` column. */
  def keySkewAuditOf(df: DataFrame, group: String, key: String): DataFrame =
    df.groupBy(col(group), col(key)).agg(count(lit(1)).as("cnt"))
      .groupBy(col(group))
      .agg(sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("cnt")).as("max_cnt"),
        sum(col("cnt") * col("cnt")).as("ss"),
        expr("percentile(cnt, 0.5)").as("p50"),
        expr("percentile(cnt, 0.99)").as("p99"))
      .select(col(group), col("n_rows"), col("n_keys"), col("max_cnt"),
        round(col("max_cnt") / col("n_rows").cast("double"), 6).as("top1_share"),
        round(sqrt(col("n_keys").cast("double") * col("ss") - col("n_rows") * col("n_rows")) /
          col("n_rows"), 6).as("cv"),
        round(col("p50"), 6).as("p50_cnt"),
        round(col("p99"), 6).as("p99_cnt"),
        round(col("p99") / col("p50"), 6).as("p99_over_p50"))
      .orderBy(col(group))

  val q135OracleSql: String =
    """WITH kc AS (
      |  SELECT event_type, user_id, COUNT(*) AS cnt FROM events GROUP BY event_type, user_id
      |), s AS (
      |  SELECT event_type,
      |         CAST(SUM(cnt) AS BIGINT) AS n_rows,
      |         COUNT(*) AS n_keys,
      |         MAX(cnt) AS max_cnt,
      |         CAST(SUM(cnt * cnt) AS BIGINT) AS ss,
      |         quantile_cont(cnt, 0.5) AS p50,
      |         quantile_cont(cnt, 0.99) AS p99
      |  FROM kc GROUP BY event_type
      |)
      |SELECT event_type, n_rows, n_keys, max_cnt,
      |       round(max_cnt / CAST(n_rows AS DOUBLE), 6) AS top1_share,
      |       round(sqrt(CAST(n_keys AS DOUBLE) * ss - CAST(n_rows AS DOUBLE) * n_rows) / n_rows, 6) AS cv,
      |       round(p50, 6) AS p50_cnt,
      |       round(p99, 6) AS p99_cnt,
      |       round(p99 / p50, 6) AS p99_over_p50
      |FROM s ORDER BY event_type""".stripMargin

  val q66OracleSql: String =
    """WITH dim AS (
      |  SELECT event_type, len(event_type)::DOUBLE / 10.0 AS weight
      |  FROM (SELECT DISTINCT event_type FROM events)
      |)
      |SELECT e.event_type,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(round(e.value * 100, 0) AS BIGINT)
      |                * CAST(d.weight * 10 AS BIGINT)) AS DOUBLE) / 1000.0 AS weighted_value
      |FROM events e JOIN dim d ON d.event_type = e.event_type
      |GROUP BY e.event_type
      |ORDER BY e.event_type""".stripMargin
}
