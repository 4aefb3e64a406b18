package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Structured Streaming rendering of the reference's micro-batch ingest
  * loop (reference: vector_db.py:79-106 — accumulate 1000 points, flush,
  * repeat). Batch operator q13 (Analytics.eventWindowStats) is the
  * batch-mode equivalent of [[windowedEventCounts]]; the transformations
  * are identical, only the source/sink binding differs — which is the point
  * of building on the DataFrame API: one declaration, both execution modes.
  */
object EventStream {

  /** Tumbling 1-hour per-type event stats with a 2-hour watermark for late
    * data. Works on a batch OR streaming DataFrame with (ts, event_type,
    * value) columns.
    */
  def windowedEventCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("bucket_start"), col("event_type"), col("n_events"), col("sum_value"))

  /** Batched upsert sink: every micro-batch is appended with its batch id
    * as the upsert version — the streaming counterpart of q03's
    * last-writer-wins view (read side: row_number over (partition by id
    * order by version desc) = 1).
    */
  def upsertWriter(events: DataFrame, outDir: String, checkpointDir: String): DataStreamWriter[Row] =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.withColumn("version", lit(batchId)).write.mode("append").parquet(outDir)
      }

  /** File-source ingest of an events directory (schema required by
    * streaming sources), useful for drills against the fixture files.
    */
  def fileStream(spark: org.apache.spark.sql.SparkSession, srcDir: String): DataFrame = {
    val schema = spark.read.parquet(srcDir).schema
    spark.readStream.schema(schema).parquet(srcDir)
  }

  /** Start the windowed aggregation into an in-memory table (complete mode)
    * — the smoke-drill entry used by tests.
    */
  def startToMemory(events: DataFrame, name: String): StreamingQuery =
    windowedEventCounts(events).writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .start()
}
