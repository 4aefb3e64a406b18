package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.RawDoc

/** Multimodal plumbing beyond the oracle-checked decode (q25): resize and
  * frame-sample stages — stubbed codec bodies, real Spark shapes (typed
  * mapPartitions / flatMap generators, bounded memory).
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def raw = {
    import spark.implicits._
    Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), col("text").cast("binary").as("data"))
      .as[RawDoc]
  }

  test("resizeTo caps every payload at w*h bytes with declared dimensions") {
    import spark.implicits._
    val out = Multimodal.resizeTo(raw, 8, 4).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.width == 8 && r.height == 4)
      assert(r.data.length <= 32 && r.data.length > 0)
    }
    // deterministic: same input -> same bytes
    val again = Multimodal.resizeTo(raw, 8, 4).collect()
    assert(out.map(_.data.toSeq).toSeq == again.map(_.data.toSeq).toSeq)
  }

  test("pixel normalize and channel triple match the reference arithmetic") {
    import spark.implicits._
    val px = Seq((1L, Seq(0, 128, 255))).toDF("id", "pix")
    val out = px.select(
      Multimodal.normalizePixels(col("pix")).as("norm"),
      Multimodal.channelTriple(col("pix")).as("rgb")).head()
    assert(out.getSeq[Double](0) == Seq(0.0, 128.0 / 255.0, 1.0))
    assert(out.getSeq[Int](1) == Seq(0, 0, 0, 128, 128, 128, 255, 255, 255))
  }

  test("sampleFrames emits every stride-th fixed-size frame") {
    import spark.implicits._
    val frames = Multimodal.sampleFrames(raw, frameBytes = 16, stride = 2)
    val byDoc = frames.collect().groupBy(_.doc_id)
    assert(byDoc.nonEmpty)
    val lens = raw.collect().map(d => d.doc_id -> d.data.length).toMap
    byDoc.foreach { case (id, fs) =>
      val expected = (0 until lens(id) / 16 by 2).map(_.toLong)
      assert(fs.map(_.frame_no).sorted.toSeq == expected)
      fs.foreach(f => assert(f.frame.length == 16))
    }
  }
}
