package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextPipeline

/** Source/sink surface beyond parquet (SURVEY.md §2A S7/S8): the JSON vocab
  * artifact round-trip (reference: transformer_sample.py:395-411 tokenizer
  * JSON save/load), binary-file ingestion (reference: text_img.py:32 local
  * image load), and CSV interchange.
  */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("vocab JSON artifact round-trips losslessly (tokenizer save/load)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vocab_json").toString
    val vocab = TextPipeline.vocabBuild(spark, TestSpark.Sf0001)
    TextPipeline.saveVocab(vocab, dir)
    val back = TextPipeline.loadVocab(spark, dir)
    // JSON carries no nullability metadata, so compare names + types only
    assert(back.schema.map(f => (f.name, f.dataType)) == vocab.schema.map(f => (f.name, f.dataType)))
    val a = vocab.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val b = back.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("binaryFile source reads raw files with metadata") {
    val df = spark.read.format("binaryFile")
      .load(s"${TestSpark.Sf0001}/documents.parquet")
    val row = df.select("path", "length", "content").head()
    assert(row.getAs[Long]("length") > 0)
    assert(row.getAs[Array[Byte]]("content").length == row.getAs[Long]("length"))
  }

  test("csv sink/source round-trips the text-stats table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val stats = TextPipeline.textStats(spark, TestSpark.Sf0001)
    stats.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(dir)
    assert(back.count() == stats.count())
    assert(back.columns.sorted.toSeq == stats.columns.sorted.toSeq)
    val origSum = stats.agg(sum("n_tokens")).head().getLong(0)
    val backSum = back.agg(sum("n_tokens")).head().getLong(0)
    assert(origSum == backSum)
  }
}
