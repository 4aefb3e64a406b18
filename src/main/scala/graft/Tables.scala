package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture table loaders (see FIXTURES.md). One parquet file per table under
  * the scale-factor directory; column pruning + predicate pushdown reach the
  * parquet scan because these return plain scans that Catalyst can rewrite.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = load(spark, sfDir, "documents")

  /** `events.ts` has shipped under several physical parquet types across
    * fixture regenerations — TIMESTAMP(NANOS) (which Spark 4 only maps via
    * the legacy nanos-as-long flag) and TIMESTAMP(MICROS, isAdjustedToUTC
    * = false) (which Spark reads as TIMESTAMP_NTZ). Branch on the scanned
    * dtype and normalize to a session-zone TimestampType column so every
    * downstream operator sees one stable logical schema. The session is
    * pinned to UTC (build.sbt), so the NTZ→TZ cast reinterprets the naive
    * micros without shifting values — matching how the DuckDB oracle reads
    * the same file.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(spark, load(spark, sfDir, "events"))
  }

  /** The ts-normalization branch of [[events]], factored out so the
    * STREAMING file source over the same fixture (q151) applies the
    * identical dtype policy — one stable logical schema in both
    * execution modes.
    */
  def normalizeEventTs(spark: SparkSession, raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // The NTZ→TZ cast reinterprets naive micros IN THE SESSION ZONE;
        // it is value-preserving only under UTC. Fail loudly rather than
        // silently shift every event timestamp if an entry point ever
        // forgets the UTC pin (the exact bug class fixed in Bench, r10).
        val tz = spark.sessionState.conf.sessionLocalTimeZone
        require(tz == "UTC" || tz == "Etc/UTC" || tz == "Z",
          s"Tables.events: NTZ ts requires spark.sql.session.timeZone=UTC (got '$tz'); " +
            "a non-UTC session would shift every event timestamp in the cast")
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => throw new IllegalStateException(
        s"events.ts: unsupported parquet-surfaced type $other (expected long nanos, timestamp_ntz, or timestamp)")
    }
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = load(spark, sfDir, "supplier")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = load(spark, sfDir, "region")
  def part(spark: SparkSession, sfDir: String): DataFrame       = load(spark, sfDir, "part")
}
