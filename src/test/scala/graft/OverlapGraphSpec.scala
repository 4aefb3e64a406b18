package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusStats, DedupExtras, OverlapGraph}

/** q110/q111/q112/q118 — overlap PageRank, containment dedup, the
  * distinct-n diversity report, and triangle participation, on
  * constructed corpora with closed-form expectations.
  */
class OverlapGraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q110 core: a star graph concentrates rank on the hub") {
    // hub 0 connected to leaves 1..4 with equal weights: by symmetry all
    // leaves tie, and the hub's rank strictly exceeds any leaf's (it
    // receives every leaf's full mass each round)
    val edges = (1L to 4L).map(l => (0L, l, 5L)).toDF("a_id", "b_id", "n_shared")
    val pr = OverlapGraph.pagerankOverEdges(edges)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.keySet == (0L to 4L).toSet)
    val leaves = (1L to 4L).map(pr)
    assert(leaves.distinct.size == 1, s"symmetric leaves must tie: $leaves")
    assert(pr(0L) > leaves.head, "the hub must out-rank every leaf")
    // conservation: total mass stays n (0.15·n base + 0.85·n circulated)
    assert(math.abs(pr.values.sum - 5.0) < 1e-4)
  }

  test("q110 core: rank is invariant to edge-list orientation") {
    val e1 = Seq((0L, 1L, 3L), (1L, 2L, 7L)).toDF("a_id", "b_id", "n_shared")
    val e2 = Seq((1L, 0L, 3L), (2L, 1L, 7L)).toDF("a_id", "b_id", "n_shared")
    val p1 = OverlapGraph.pagerankOverEdges(e1).collect().toSeq
    val p2 = OverlapGraph.pagerankOverEdges(e2).collect().toSeq
    assert(p1 == p2, "symmetrization must erase the (a,b) vs (b,a) choice")
  }

  test("q110 core: driver-local fold agrees with the distributed star-round loop") {
    // random weighted graphs: the local fold (deterministic sorted-order
    // sums) and the distributed join+agg loop (partition-order sums) must
    // agree exactly — the PrCarryDp carry round absorbs reduction-order
    // ulp noise by design (the same contract the DuckDB oracle relies on)
    // widened seed/density coverage (ADVICE r17): the fold introduces a
    // third summation order, so sample more graphs — including denser
    // ones, where per-iteration in-sums land nearer rounding boundaries
    for (seed <- Seq(7, 8, 21, 34, 55, 89)) {
      val rnd = new scala.util.Random(seed)
      val nEdges = if (seed % 2 == 0) 120 else 600
      val edges = Seq.fill(nEdges)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong,
        (rnd.nextInt(9) + 1).toLong))
        .filter { case (a, b, _) => a != b }
        .toDF("a_id", "b_id", "n_shared")
      val local = OverlapGraph.pagerankOverEdges(edges).collect().toSeq
      val dist = OverlapGraph.pagerankOverEdges(edges, localEdgeBound = 0).collect().toSeq
      assert(local == dist, s"seed=$seed: local fold diverges from the distributed loop")
    }
  }

  test("q111: containment finds the quote-inclusion pair Jaccard banding is blind to") {
    // doc 1 = a 6-token "short post"; doc 0 = a long doc QUOTING doc 1
    // verbatim inside ~60 tokens of its own text: containment(1 in 0) = 1.0
    // while Jaccard ≈ 4/62 ≈ 0.06 — far below any q16 threshold
    val quoted = "alpha beta gamma delta epsilon zeta"
    val host = (0 until 30).map(i => s"h${i}a h${i}b").mkString(" ") + " " + quoted
    val docs = (Seq((0L, host), (1L, quoted)) ++
      (2 until 20).map(i => (i.toLong, (0 until 8).map(j => s"u${i}x$j").mkString(" "))))
      .toDF("doc_id", "text")
    val rows = DedupExtras.containmentDedupOf(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.exists { case (a, b, _, cb) => a == 0L && b == 1L && cb == 1.0 },
      s"the quoted doc must surface with containment 1.0 in its host; got ${rows.toSeq}")
    // and the exact-Jaccard floor q16 uses would never have kept it
    val j = 4.0 / 62.0
    assert(j < DedupExtras.JaccardThreshold)
  }

  test("q111: boilerplate-only shingles are culled — no pair from >maxDf grams") {
    // every doc shares the same 5-token boilerplate banner; pairwise
    // containment through it is real but the banner's df = 30 > maxDf,
    // so no candidate forms (the template is a CLASS, not a pair)
    val docs = (0 until 30)
      .map(i => (i.toLong, s"banner one two three four unique${i}a unique${i}b unique${i}c"))
      .toDF("doc_id", "text")
    assert(DedupExtras.containmentDedupOf(docs).collect().isEmpty)
  }

  test("q112: closed-form counts on a two-doc corpus") {
    // "a b a b" per doc, two docs, one lang: unigrams 8 instances/2 types,
    // bigrams 6/2 ("a b","b a"), trigrams 4/2 ("a b a","b a b")
    val docs = Seq((0L, "a b a b", "en"), (1L, "a b a b", "en"))
      .toDF("doc_id", "text", "lang")
    val out = CorpusStats.ngramDiversityOf(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("en", 1L, 2L, 8L), ("en", 2L, 2L, 6L), ("en", 3L, 2L, 4L)))
  }

  test("q112: docs shorter than n contribute no order-n grams, and langs stay separate") {
    val docs = Seq((0L, "x y", "en"), (1L, "p", "fr")).toDF("doc_id", "text", "lang")
    val out = CorpusStats.ngramDiversityOf(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // en: 1-grams 2/2, 2-grams 1/1 — no 3-gram row; fr: only 1-grams 1/1
    assert(out.toSeq == Seq(("en", 1L, 2L, 2L), ("en", 2L, 1L, 1L), ("fr", 1L, 1L, 1L)))
  }

  test("q118 core: cliques close, wedges and isolated edges do not") {
    // a 4-clique (each node in C(3,2)=3 triangles), an isolated edge,
    // and an open wedge 7-8-9 (no closing edge -> no triangle)
    val edges = (Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L)) ++
      Seq((5L,6L),(7L,8L),(8L,9L))).map { case (a,b) => (a,b,9L) }
      .toDF("a_id", "b_id", "n_shared")
    val out = OverlapGraph.trianglesOverEdges(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.toMap == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // ordering: triangles desc, then doc_id
    val keys = out.map { case (id, n) => (-n, id) }
    assert(keys.sameElements(keys.sorted))
  }

  test("q118: the declared row is non-degenerate and heap-cut") {
    val df = OverlapGraph.overlapTriangles(spark, TestSpark.Sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Scan parquet"),
      s"the triangle closure must read the checkpointed edges, not re-run the winnow scan;\n$p")
    assert(!p.contains("CartesianProduct"), s"oriented closure joins are equi-joins;\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"the top-N cut must be heap-based;\n$p")
    val rows = df.collect()
    assert(rows.nonEmpty, "the sf0.001 fixture graph must contain triangles")
    assert(rows.length <= OverlapGraph.TriTopN)
  }
}
