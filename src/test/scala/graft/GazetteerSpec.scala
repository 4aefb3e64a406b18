package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Gazetteer

/** q116 — dictionary entity tagging on constructed corpora with
  * closed-form expected counts.
  */
class GazetteerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q116: mention and doc counts match a brute-force reference") {
    val docs = Seq(
      (1L, "the vector index beats the table scan", "en"),
      (2L, "vector vector vector", "en"),
      (3L, "no hits here at all", "en"),
      (4L, "merge the stream into the table", "de"),
      (5L, "table table merge", "de")).toDF("doc_id", "text", "lang")
    val out = Gazetteer.entityTagOf(docs).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))

    val rows = Seq(
      (1L, "the vector index beats the table scan", "en"),
      (2L, "vector vector vector", "en"),
      (4L, "merge the stream into the table", "de"),
      (5L, "table table merge", "de"))
    val hits = rows.flatMap { case (id, text, lang) =>
      text.split(" ").filter(Gazetteer.Entities.contains).map(e => (e, lang, id)) }
    val expect = hits.groupBy(h => (h._1, h._2)).map { case (k, hs) =>
      k -> (hs.map(_._3).distinct.size.toLong, hs.size.toLong) }
    assert(out.toMap == expect)
    // doc 3 contributes nowhere; multiplicity counts (doc 2: 1 doc, 3 mentions)
    assert(out.toMap.apply(("vector", "en")) == (2L, 4L))
    // presentation order (entity, lang)
    val keys = out.map(_._1)
    assert(keys.sameElements(keys.sorted))
  }

  test("q116: a custom gazetteer replaces the default dictionary") {
    val docs = Seq((1L, "alpha beta alpha", "en")).toDF("doc_id", "text", "lang")
    val out = Gazetteer.entityTagOf(docs, Seq("alpha")).collect()
    assert(out.length == 1)
    assert((out.head.getString(0), out.head.getLong(2), out.head.getLong(3)) == ("alpha", 1L, 2L))
  }
}
