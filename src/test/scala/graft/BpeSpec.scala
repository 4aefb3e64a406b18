package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/** q84 BPE pair counting and the full training loop, checked against an
  * imperative reference implementation of Sennrich-style BPE.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Imperative reference: greedy-left single-pair merge over a list. */
  private def mergeRef(cs: List[String], a: String, b: String): List[String] = cs match {
    case x :: y :: rest if x == a && y == b => (a + b) :: mergeRef(rest, a, b)
    case x :: rest                          => x :: mergeRef(rest, a, b)
    case Nil                                => Nil
  }

  /** Imperative reference BPE train over token char lists. */
  private def trainRef(tokens: Seq[String], merges: Int): Seq[(Int, String, String, Long)] = {
    var seqs = tokens.filter(_.length >= 2).map(_.map(_.toString).toList)
    (1 to merges).flatMap { rank =>
      val counts = seqs.flatMap(cs => cs.zip(cs.drop(1)))
        .groupBy(identity).map { case (p, v) => (p, v.size.toLong) }
      if (counts.isEmpty) None
      else {
        val ((a, b), n) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        seqs = seqs.map(cs => mergeRef(cs, a, b))
        Some((rank, a, b, n))
      }
    }
  }

  test("hand corpus: pair counts match the reference count exactly") {
    import spark.implicits._
    val docs = Seq((1L, "low lower lowest"), (2L, "new newer newest")).toDF("doc_id", "text")
    val got = Bpe.bpePairCountsOf(docs).as[(String, String, Long)].collect().toList
    // tokens: low lower lowest new newer newest
    val ref = trainRef(Seq("low", "lower", "lowest", "new", "newer", "newest"), 1)
    // the top-1 of the declared query must equal the reference argmax
    assert((got.head._1, got.head._2, got.head._3) == (ref.head._2, ref.head._3, ref.head._4))
    // hand count: "we" appears in lower/lowest/newer/newest = 4, the argmax
    assert(got.head == ("w", "e", 4L))
    val all = got.map(r => ((r._1, r._2), r._3)).toMap
    assert(all(("l", "o")) == 3L && all(("o", "w")) == 3L && all(("n", "e")) == 3L)
  }

  test("bpeTrainOf equals the imperative reference on 10 merges, including run semantics") {
    import spark.implicits._
    val tokens = Seq(
      "low", "low", "lower", "lowest", "new", "newer", "newest", "newest",
      "wider", "wide", "widest", "aaaa", "aaab", "banana", "bananas")
    val docs = Seq((1L, tokens.mkString(" "))).toDF("doc_id", "text")
    val got = Bpe.bpeTrainOf(docs, merges = 10)
    val ref = trainRef(tokens, merges = 10)
    assert(got == ref, s"\nengine: $got\nref:    $ref")
  }

  test("property: bpeTrainOf equals the reference on a random run-heavy two-letter corpus") {
    import spark.implicits._
    // a, b alphabet maximizes merge-run edge cases ("aaaa" under (a,a));
    // seeded so the case set is reproducible
    val rnd = new scala.util.Random(84)
    val tokens = Seq.fill(40)((0 until (2 + rnd.nextInt(5))).map(_ => if (rnd.nextBoolean()) "a" else "b").mkString)
    val docs = Seq((1L, tokens.mkString(" "))).toDF("doc_id", "text")
    val got = Bpe.bpeTrainOf(docs, merges = 6)
    val ref = trainRef(tokens, merges = 6)
    assert(got == ref, s"\nengine: $got\nref:    $ref\ntokens: $tokens")
  }

  test("per-merge work scans the checkpointed type table, never the corpus files") {
    import spark.implicits._
    // the loop's invariant re-stated as a plan assertion: after the one
    // corpus aggregate is checkpointed, a merge round's count plan must
    // contain no file scan — its cost is |types|, independent of corpus
    val docs = Seq((1L, "low lower lowest new newer newest")).toDF("doc_id", "text")
    val types = Bpe.typeSymbols(Bpe.wordTypesOf(docs)).localCheckpoint(true)
    try {
      val p = Bpe.pairCounts(types).queryExecution.executedPlan.toString
      assert(!p.contains("FileScan") && !p.contains("Scan parquet"),
        s"merge-round count must not rescan the corpus;\n$p")
    } finally types.unpersist()
  }

  test("wordTypesOf weights factor the instance-level pair counts exactly") {
    import spark.implicits._
    // "low low low new" — type table (low,3),(new,1); weighted pair counts
    // must equal counting over every instance
    val docs = Seq((1L, "low low low new")).toDF("doc_id", "text")
    val tp = Bpe.pairCounts(Bpe.typeSymbols(Bpe.wordTypesOf(docs)))
      .as[(String, String, Long)].collect().map(r => ((r._1, r._2), r._3)).toMap
    assert(tp(("l", "o")) == 3L && tp(("o", "w")) == 3L && tp(("n", "e")) == 1L && tp(("e", "w")) == 1L)
  }

  test("q84 plans the top-50 as a merged partial top-k, not a global sort") {
    val p = Bpe.bpePairCounts(spark, TestSpark.Sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"ranked limit must merge per-partition;\n$p")
    assert(!p.contains("WindowExec"), s"no window in the count path;\n$p")
  }

  test("declared q84 runs on the fixture, ranks deterministically, pairs are single chars") {
    import spark.implicits._
    val out = Bpe.bpePairCounts(spark, TestSpark.Sf0001).as[(String, String, Long)].collect()
    assert(out.length == 50)
    assert(out.sliding(2).forall { case Array(x, y) =>
      x._3 > y._3 || (x._3 == y._3 && (x._1 < y._1 || (x._1 == y._1 && x._2 < y._2)))
    }, "rows must be strictly ordered by (n desc, c1, c2)")
    assert(out.forall(r => r._1.length == 1 && r._2.length == 1))
  }
}
