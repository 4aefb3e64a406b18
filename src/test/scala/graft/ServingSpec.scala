package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Hybrid, Ranking, Serving}

/** q152 serving-composition invariants. The real correctness signal is
  * the DuckDB oracle hash (q96's fusion CTEs + q105's step CTEs); these
  * pin the structural contract between the stages.
  */
class ServingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q152: dense greedy steps, distinct picks, all drawn from the fused top-10") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val out = Serving.servingPipelineOf(spark, docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    // the artifact-backed fused list is spec-pinned row-identical to the
    // inline q96 (HybridSpec), so the inline path defines the candidate set
    val fusedTop = Hybrid.hybridRrfOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    out.groupBy(_._1).foreach { case (qid, rows) =>
      val steps = rows.map(_._2).sorted.toSeq
      assert(steps == (1L to Ranking.MmrSelect.toLong),
        s"qid $qid: steps must be dense 1..${Ranking.MmrSelect}, got $steps")
      val docsPicked = rows.map(_._3)
      assert(docsPicked.distinct.length == docsPicked.length,
        s"qid $qid: a doc may be selected once")
      assert(docsPicked.forall(fusedTop(qid)),
        s"qid $qid: every pick must come from the fused top-${Serving.ServeTopK}")
    }
    // step 1 carries round(λ·rel, 7) of the query's best-rrf candidate:
    // mmr at step 1 must equal λ · (max rrf) rounded at 7 dp
    val bestRrf = Hybrid.hybridRrfOf(docs).collect()
      .map(r => (r.getLong(0), r.getDouble(3))).groupBy(_._1)
      .view.mapValues(_.map(_._2).max).toMap
    out.filter(_._2 == 1L).foreach { case (qid, _, _, mmr) =>
      val exp = BigDecimal(Ranking.MmrLambda * bestRrf(qid))
        .setScale(7, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(mmr == exp, s"qid $qid: step-1 mmr $mmr != λ·max(rrf) $exp")
    }
  }
}
