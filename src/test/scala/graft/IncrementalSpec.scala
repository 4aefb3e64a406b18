package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Incremental

/** q80 incremental dedup: the batch-vs-store classification must catch
  * verbatim re-crawls (exact), appended-boilerplate re-crawls (near), and
  * let genuinely novel docs through — with deterministic matched ids.
  */
class IncrementalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q153: every diff status matches its closed-form id derivation, unchanged docs absent") {
    val out = Incremental.snapshotDiff(spark, TestSpark.Sf0001)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.nonEmpty)
    val n = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet").count()
    (0L until n).foreach { id =>
      val inOld = id % 11 != 3
      val inNew = id % 13 != 5
      val edited = id % 7 == 0
      val expected =
        if (inOld && !inNew) Some("removed")
        else if (!inOld && inNew) Some("added")
        else if (inOld && inNew && edited) Some("modified")
        else None // unchanged or in neither snapshot: absent from the diff
      assert(out.get(id) == expected, s"doc $id: got ${out.get(id)}, expected $expected")
    }
  }

  test("hand corpus: exact re-crawl, near variant, novel doc, short doc") {
    import spark.implicits._
    val store = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "completely different content about distributed query engines and shuffles"),
      (3L, "the quick brown fox jumps over the lazy dog near the river bank today"), // store-internal dup of 1
      (4L, "hi there")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (101L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact copy of 1/3
      (102L, "completely different content about distributed query engines and shuffles " +
        "please subscribe"), // near variant of 2 (2 appended tokens)
      (103L, "entirely fresh material never seen in any snapshot of this corpus before now"),
      (104L, "hi")
    ).toDF("doc_id", "text")

    val out = Incremental.incrementalDedupOf(batch, store)
      .as[(Long, String, Long)].collect().toList
    assert(out == List(
      (101L, "exact_dup", 1L), // min store id wins across the internal dup pair
      (102L, "near_dup", 2L),
      (103L, "new", -1L),
      (104L, "new", -1L)       // < 3 tokens: no shingles, cannot near-match
    ))
  }

  test("a batch equal to the store is entirely exact_dup against it") {
    import spark.implicits._
    val store = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five six")
    ).toDF("doc_id", "text")
    val batch = store.select((org.apache.spark.sql.functions.col("doc_id") + 100).as("doc_id"),
      org.apache.spark.sql.functions.col("text"))
    val out = Incremental.incrementalDedupOf(batch, store)
      .as[(Long, String, Long)].collect().toList
    assert(out == List((101L, "exact_dup", 1L), (102L, "exact_dup", 2L)))
  }

  test("artifact path: classification against persisted store artifacts equals the inline path") {
    import spark.implicits._
    val store = Tables.documents(spark, TestSpark.Sf0001).select("doc_id", "text")
    val batch = Incremental.batchOf(store)
    val dir = java.nio.file.Files.createTempDirectory("graft_store_art").toString
    Incremental.buildStoreArtifacts(store, dir)
    val inline = Incremental.incrementalDedupOf(batch, store)
      .as[(Long, String, Long)].collect().toList
    val viaArtifacts = Incremental.incrementalDedupAgainstArtifacts(batch, dir)
      .as[(Long, String, Long)].collect().toList
    assert(inline == viaArtifacts,
      s"${inline.size} inline rows vs ${viaArtifacts.size} artifact rows")
    // a SECOND batch probes the same artifacts without rebuilding them —
    // the amortization the docs promise
    val batch2 = batch.limit(50)
    val again = Incremental.incrementalDedupAgainstArtifacts(batch2, dir)
    assert(again.count() == 50)
  }

  test("declared q80 runs on the fixture with all three dispositions present") {
    val out = Incremental.incrementalDedup(spark, TestSpark.Sf0001).cache()
    try {
      val n = out.count()
      assert(n > 0)
      import spark.implicits._
      val byDisp = out.groupBy("disposition").count()
        .as[(String, Long)].collect().toMap
      assert(byDisp.getOrElse("exact_dup", 0L) > 0, s"no exact dups: $byDisp")
      assert(byDisp.getOrElse("new", 0L) > 0, s"no novel docs: $byDisp")
      // exact re-crawls (doc_id % 5 == 0 slice) must ALL be exact_dup
      val exactSlice = out.filter("doc_id % 5 = 0 AND doc_id >= 3000000")
      assert(exactSlice.filter("disposition <> 'exact_dup'").count() == 0)
    } finally out.unpersist()
  }
}
