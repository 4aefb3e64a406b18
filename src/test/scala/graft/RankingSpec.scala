package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ranking

/** q104/q105 — retrieval evaluation and MMR diversification: the greedy
  * math on hand frames, the closed-form ndcg=1 case, and fixture
  * invariants.
  */
class RankingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q105 core: step 2 trades relevance for diversity; selection order is by marginal gain") {
    // doc 2 is nearly as relevant as doc 1 but redundant with it; doc 3 is
    // less relevant but novel — MMR must pick 1, then 3, then 2
    val cand = Seq((0L, 1L, 0.9), (0L, 2L, 0.89), (0L, 3L, 0.5))
      .toDF("qid", "doc_id", "rel")
    val sims = Seq(
      (0L, 1L, 2L, 0.99), (0L, 2L, 1L, 0.99),
      (0L, 1L, 3L, 0.0), (0L, 3L, 1L, 0.0),
      (0L, 2L, 3L, 0.0), (0L, 3L, 2L, 0.0))
      .toDF("qid", "a_id", "b_id", "sim")
    val out = Ranking.mmrSelectFrom(cand, sims).collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 1L), (2L, 3L), (3L, 2L)))
    // step 1: 0.7·0.9 = 0.63; step 2 rejects doc 2 (0.7·0.89 − 0.3·0.99 =
    // 0.326) for doc 3 (0.35); step 3 takes doc 2 at its penalized score
    assert(out.map(_.getDouble(3)).toSeq == Seq(0.63, 0.35, 0.326))
  }

  test("q105: fewer candidates than MmrSelect yields exactly the candidate count, no padding") {
    val cand = Seq((0L, 1L, 0.9), (0L, 2L, 0.5)).toDF("qid", "doc_id", "rel")
    val sims = Seq((0L, 1L, 2L, 0.1), (0L, 2L, 1L, 0.1)).toDF("qid", "a_id", "b_id", "sim")
    assert(Ranking.mmrSelectFrom(cand, sims).collect().length == 2)
  }

  test("q105 greedy fold: driver-local and distributed paths agree on random inputs") {
    // the round-18 cutover (MmrLocalBound) must be BIT-identical to the
    // unrolled distributed loop: same 7-dp HALF_UP round, same
    // (mmr desc, doc_id asc) argmax, same inner-join exclusion of
    // candidates without a sim edge to the selected set
    for (seed <- Seq(3, 17, 92)) {
      val rnd = new scala.util.Random(seed)
      val cand = (for (q <- 0L until 4L; d <- 1L to 20L) yield
        (q, d, math.rint(rnd.nextDouble() * 1e6) / 1e6)).toDF("qid", "doc_id", "rel")
      // ~80% of ordered pairs present, values 6-dp like the production sims
      val sims = (for {
        q <- 0L until 4L; a <- 1L to 20L; b <- 1L to 20L
        if a != b && rnd.nextDouble() < 0.8
      } yield (q, a, b, math.rint(rnd.nextDouble() * 1e6) / 1e6))
        .toDF("qid", "a_id", "b_id", "sim")
      val local = Ranking.mmrSelectFrom(cand, sims).collect().map(_.toSeq).toSeq
      val dist = Ranking.mmrSelectFrom(cand, sims, localBound = -1L)
        .collect().map(_.toSeq).toSeq
      assert(local == dist, s"seed $seed: local fold diverged from the distributed unroll")
      assert(local.nonEmpty)
    }
  }

  test("q104: identical documents make every ranking ideal — ndcg is exactly 1") {
    // every doc holds the same 12 alphabetic terms once → all rel equal,
    // all BM25 scores equal → any top-10 is an ideal ordering
    val text = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    val docs = (0L until 20L).map(i => (i, text)).toDF("doc_id", "text")
    val out = Ranking.ndcgEvalOf(docs).collect()
    assert(out.length == 4)
    assert(out.forall(r => r.getDouble(3) == 1.0))
    assert(out.forall(r => r.getDouble(1) == r.getDouble(2)))
  }

  test("q104/q105 fixture invariants: ndcg bounds, full selections, members from the shortlist") {
    val ndcg = Ranking.ndcgEval(spark, TestSpark.Sf0001).collect()
    assert(ndcg.length == 4)
    assert(ndcg.forall(r => r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0))
    assert(ndcg.forall(r => r.getDouble(2) >= r.getDouble(1)))

    val mmr = Ranking.mmrDiversify(spark, TestSpark.Sf0001).collect()
    assert(mmr.length == 4 * Ranking.MmrSelect)
    val byQ = mmr.groupBy(_.getLong(0))
    assert(byQ.forall { case (_, rs) =>
      rs.map(_.getLong(1)).sorted.toSeq == (1L to Ranking.MmrSelect.toLong) &&
        rs.map(_.getLong(2)).distinct.length == Ranking.MmrSelect
    })
  }
}
