package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

case class Ev(ts: Timestamp, event_type: String, value: Double)

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def t(s: String) = Timestamp.valueOf(s)

  test("streaming windowed counts equal the batch computation over the same rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      Ev(t("2024-01-01 00:10:00"), "click", 1.0),
      Ev(t("2024-01-01 00:50:00"), "click", 2.0),
      Ev(t("2024-01-01 01:05:00"), "click", 4.0),
      Ev(t("2024-01-01 00:20:00"), "view", 8.0),
      Ev(t("2024-01-01 02:59:59"), "view", 16.0))

    val input = MemoryStream[Ev]
    val q = EventStream.startToMemory(input.toDF(), "stream_agg")
    try {
      input.addData(rows.take(3))
      q.processAllAvailable()
      input.addData(rows.drop(3))
      q.processAllAvailable()

      val streamed = spark.table("stream_agg")
        .orderBy("bucket_start", "event_type")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
      val batch = EventStream.windowedEventCounts(rows.toDF())
        .orderBy("bucket_start", "event_type")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq

      assert(streamed == batch)
      assert(streamed.map(_._3).sum == rows.size)
      assert(streamed.contains((t("2024-01-01 00:00:00"), "click", 2L, 3.0)))
    } finally q.stop()
  }

  test("foreachBatch upsert sink: last-writer-wins view resolves re-ingested ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val ckp = java.nio.file.Files.createTempDirectory("graft_ckp").toString

    val input = MemoryStream[(Long, String)]
    // two batches re-ingesting id 1 with a new payload
    input.addData(Seq((1L, "v0"), (2L, "v0")))
    val q1 = EventStream.upsertWriter(input.toDF().toDF("id", "payload"), dir, ckp).start()
    q1.awaitTermination()
    input.addData(Seq((1L, "v1")))
    val q2 = EventStream.upsertWriter(input.toDF().toDF("id", "payload"), dir, ckp).start()
    q2.awaitTermination()

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("version").desc)
    val latest = spark.read.parquet(dir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("id"), col("payload")).as[(Long, String)].collect().toMap
    assert(latest == Map(1L -> "v1", 2L -> "v0"))
  }
}
