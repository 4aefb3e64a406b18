package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketch

/** q154 count-min heavy hitters: the CMS one-sided error guarantee and a
  * brute-force grid mirror on a hand corpus.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q154 fixture run: estimate >= exact for every hitter, top-k dense and sorted") {
    val out = Sketch.heavyHittersCms(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == Sketch.HhTopK)
    out.foreach { case (tok, exact, est, over) =>
      assert(est >= exact, s"CMS must never underestimate: $tok est=$est exact=$exact")
      assert(over == est - exact, s"audit column must be the difference: $tok")
    }
    val exacts = out.map(_._2)
    assert(exacts.zip(exacts.tail).forall { case (a, b) => a >= b },
      "rows must sort by exact count descending")
  }

  test("cells derived from the type table equal the scan-side fixed-state sketch, cell for cell") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextPipeline
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val toks = docs.select(explode(TextPipeline.tokenArr(col("text"))).as("token"))
    val scanSide = Sketch.cmsCellsOf(toks)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("exact_count"))
    // re-derive the declared row's cells independently: brute-force over
    // the collected type table
    val types = exact.collect().map(r => (r.getString(0), r.getLong(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def buckets(tok: String): Seq[Long] = {
      val hex = md.digest(s"cms:$tok".getBytes("UTF-8")).map("%02x".format(_)).mkString
      (0 until Sketch.CmsDepth).map(r =>
        java.lang.Long.parseLong(hex.substring(8 * r, 8 * r + 8), 16) % Sketch.CmsWidth)
    }
    val derived = types.flatMap { case (tok, n) =>
      buckets(tok).zipWithIndex.map { case (b, r) => (r, b) -> n }
    }.groupBy(_._1).map { case ((r, b), xs) => (r, b, xs.map(_._2).sum) }.toSet
    assert(scanSide == derived, "additivity: type-table cells must equal token-stream cells")
  }

  test("hand corpus: a collision-free sketch estimates every type exactly") {
    import spark.implicits._
    // with w=256 and 3 types, some hash ROW is collision-free, and the
    // min over rows therefore reads the exact count for every type
    val docs = Seq((1L, "aa bb aa"), (2L, "cc aa bb")).toDF("doc_id", "text")
    val out = Sketch.heavyHittersCmsOf(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out.toSet == Set(("aa", 3L, 3L), ("bb", 2L, 2L), ("cc", 1L, 1L)))
  }
}
