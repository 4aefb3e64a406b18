package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cleaning

/** q85 text cleaning: control chars stripped, whitespace collapsed,
  * clean rows untouched byte-for-byte.
  */
class CleaningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("hand rows: tabs/newlines/BEL collapse to single spaces; clean rows pass through") {
    import spark.implicits._
    val df = Seq(
      (1L, "already clean text"),
      (2L, "tab\there\tandbell"),
      (3L, "  leading and trailing  "),
      (4L, "line\nbreaks\r\nandvertical\ftabs"),
      (5L, "")
    ).toDF("doc_id", "raw")
    val out = Cleaning.textCleanOf(df, col("raw"))
      .select("doc_id", "clean_text", "changed").as[(Long, String, Long)].collect().toList
    assert(out == List(
      (1L, "already clean text", 0L),
      (2L, "tab here and bell", 1L), // BEL → space → collapsed
      (3L, "leading and trailing", 1L),
      (4L, "line breaks and vertical tabs", 1L),
      (5L, "", 0L)))
  }

  test("declared q85: every planted-dirty row is changed, every clean row is not") {
    val out = Cleaning.textClean(spark, TestSpark.Sf0001).cache()
    try {
      assert(out.filter("doc_id % 3 = 0 AND changed = 0").count() == 0,
        "all planted-dirty rows must report changed")
      assert(out.filter("doc_id % 3 <> 0 AND changed = 1").count() == 0,
        "fixture clean rows must pass through unchanged")
      // idempotence: cleaning the cleaned column is the identity
      import spark.implicits._
      val re = Cleaning.textCleanOf(
        out.select(col("doc_id"), col("clean_text").as("raw")), col("raw"))
      assert(re.filter("changed = 1").count() == 0, "clean must be idempotent")
    } finally out.unpersist()
  }
}
