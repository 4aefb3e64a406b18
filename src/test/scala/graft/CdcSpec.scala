package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cdc

/** q164 content-defined chunking: lossless reconstruction, the
  * shift-resistance property the boundary rule exists for, and the
  * cross-doc dedup application.
  */
class CdcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("chunks reconstruct the text exactly and bounds are strictly monotone") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val bad = Cdc.withChunks(docs)
      .select(col("doc_id"),
        (concat_ws("", col("chunks")) === col("graft_cdc_txt")).as("ok"),
        col("graft_cdc_bounds").as("bounds"))
      .collect()
    assert(bad.nonEmpty)
    bad.foreach { r =>
      assert(r.getBoolean(1), s"doc ${r.getLong(0)}: chunks must concatenate back to the text")
      val b = r.getSeq[Long](2)
      assert(b.zip(b.tail).forall { case (x, y) => x < y },
        s"doc ${r.getLong(0)}: bounds must be strictly increasing (no empty chunks)")
    }
  }

  test("shift-resistance: a prefix insertion leaves the post-realignment chunks identical") {
    import spark.implicits._
    val base = Tables.documents(spark, TestSpark.Sf0001)
      .orderBy(col("n_chars").desc).select(col("text")).head().getString(0)
    val docs = Seq((1L, base), (2L, "zzzz " + base)).toDF("doc_id", "text")
    val dig = Cdc.chunkDigestsOf(docs).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val d1 = dig.filter(_._1 == 1L).map(_._2)
    val d2 = dig.filter(_._1 == 2L).map(_._2).toSet
    assert(d1.length >= 3, "fixture doc must produce several chunks at divisor 64")
    // all chunks of the original except (at most) the first are cut at
    // content-determined positions, so the prefixed copy re-aligns and
    // shares them byte-for-byte — the property fixed-offset chunking lacks
    val shared = d1.tail.count(d2.contains)
    assert(shared == d1.tail.length,
      s"expected full realignment after the first boundary; shared $shared of ${d1.tail.length}")
  }

  test("q165: the prefix edit reuses every chunk after the first boundary; a rewrite reuses none") {
    import spark.implicits._
    val base = Tables.documents(spark, TestSpark.Sf0001)
      .orderBy(col("n_chars").desc).select(col("text")).head().getString(0)
    val olds = Seq((1L, base), (2L, base)).toDF("doc_id", "text")
    val news = Seq((1L, "v2 " + base), (2L, base.reverse)).toDF("doc_id", "text")
    val out = Cdc.deltaStorageOf(olds, news).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(5)))).toMap
    val (n1, reused1, pct1) = out(1L)
    assert(reused1 >= n1 - 1, s"prefix edit: all but the first chunk must dedup ($reused1/$n1)")
    assert(pct1 > 50.0)
    assert(out(2L)._2 == 0L, "a full rewrite shares no chunk")
  }

  test("within-doc repetition surfaces as n_unique < n_chunks on a repeated segment") {
    import spark.implicits._
    val base = Tables.documents(spark, TestSpark.Sf0001)
      .orderBy(col("n_chars").desc).select(col("text")).head().getString(0)
    val docs = Seq((1L, (base + " ") * 4)).toDF("doc_id", "text")
    val r = Cdc.cdcChunkingOf(docs).collect().head
    assert(r.getLong(1) > r.getLong(2),
      "a 4x-repeated segment must produce duplicate chunk digests")
  }
}
