package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions._

/** Collection-level analytics: per-label centroid statistics (the
  * index-build side of a vector store — IVF coarse quantizers are exactly
  * per-cluster centroids) and time-bucketed event aggregation (the batch
  * rendering of the reference's micro-batch ingest loop,
  * reference: vector_db.py:79-106).
  */
object Analytics {

  /** q11_label_centroids — per-label elementwise mean embedding + point
    * count. Implemented as posexplode → two-level hash aggregate: the
    * (label, pos) partial aggregation is map-side combined, so the shuffle
    * carries one partial sum per (label, dim) per partition — independent of
    * row count, which is what survives a 100 TB scan.
    */
  def labelCentroids(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val dims = e
      .select(col("label"), posexplode(toDouble(col("embedding"))))
      .toDF("label", "pos", "v")
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("v")).as("a"), count(lit(1)).as("n"))
    dims
      .groupBy(col("label"))
      .agg(
        // %.6f-serialized for the driver's pandas compare (cannot sort
        // ndarray cells, VERDICT r1 item 1); `+ 0.0` folds -0.0 to +0.0
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("a")))),
            s => format_string("%.6f", round(s.getField("a"), 6) + lit(0.0))),
          ",").as("centroid"),
        first(col("n")).as("n"))
      .select(col("label").cast("long").as("label"), col("centroid"), col("n"))
      .orderBy(col("label"))
  }

  val q11OracleSql: String =
    """WITH e AS (
      |  SELECT label, generate_subscripts(embedding, 1) AS pos, unnest(embedding::DOUBLE[]) AS v
      |  FROM embeddings
      |), m AS (
      |  SELECT label, pos, avg(v) AS a, COUNT(*) AS n FROM e GROUP BY label, pos
      |)
      |SELECT CAST(label AS BIGINT) AS label,
      |       array_to_string(list(printf('%.6f', round(a, 6) + 0.0) ORDER BY pos), ',') AS centroid,
      |       CAST(first(n) AS BIGINT) AS n
      |FROM m GROUP BY label ORDER BY label""".stripMargin

  /** Sketch-based distinct counting: HyperLogLog++ per event type
    * (`approx_count_distinct`) next to the exact count. At 100 TB the
    * sketch is THE distinct-count path — fixed-size partial state per
    * group, mergeable map-side, no distinct shuffle. Not a declared/oracle
    * query (DuckDB's HLL differs numerically); relative-error-tested in
    * AnalyticsSpec.
    */
  def approxDistinctUsers(spark: SparkSession, sfDir: String, rsd: Double = 0.05): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), rsd).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .orderBy(col("event_type"))

  /** q13_event_window_stats — tumbling 1-hour count/sum per event type over
    * the `events` table: the batch form of `groupBy(window($"ts","1h"))`
    * that a Structured Streaming deployment of the same code would run
    * incrementally (SURVEY.md §2A streaming note).
    */
  def eventWindowStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 6).as("sum_value"))
      .select(
        col("window.start").cast("long").as("bucket_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy(col("bucket_start"), col("event_type"))

  val q13OracleSql: String =
    """SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS bucket_start,
      |       event_type,
      |       COUNT(*) AS n_events,
      |       round(sum(value), 6) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin
}
