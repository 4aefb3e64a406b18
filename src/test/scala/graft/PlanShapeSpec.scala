package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Knn, Relational}

/** Codifies the plan-shape claims from SCALE.md/README as assertions, so a
  * regression that silently changes a physical plan (lost pushdown, a
  * window sneaking in for top-k, a missing broadcast) fails the build, not
  * a benchmark review.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q01 k-NN ranks with the bounded-heap aggregator, not a window") {
    val p = plan(Knn.knnTopkCosine(spark, TestSpark.Sf0001))
    assert(p.contains("ObjectHashAggregate"), "TopK aggregator must plan as ObjectHashAggregate")
    assert(!p.contains("WindowExec") && !p.contains("Window "),
      s"no window may appear in the k-NN ranking path;\n$p")
  }

  test("q26 pushes the date filter and prunes columns into the parquet scan") {
    val df = Relational.pricingSummary(spark, TestSpark.Sf0001)
    val p  = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull") || p.contains("PushedFilters: [LessThan"),
      s"expected non-empty PushedFilters in the lineitem scan;\n$p")
    val readSchema = "ReadSchema: struct<"
    assert(p.contains(readSchema))
    val schema = p.substring(p.indexOf(readSchema) + readSchema.length)
    assert(!schema.takeWhile(_ != '>').contains("l_comment"),
      "untouched wide columns must be pruned from the scan")
  }

  test("q27 joins dimensions by broadcast and takes top-20 without a global sort") {
    val p = plan(Relational.topCustomers(spark, TestSpark.Sf0001))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"dimension joins must broadcast;\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must compile to TakeOrderedAndProject, not Sort+Limit;\n$p")
  }

  test("q30 rollup compiles to a single Expand") {
    val p = plan(Relational.eventRollup(spark, TestSpark.Sf0001))
    assert("Expand".r.findAllIn(p).size == 1, s"rollup must be one Expand;\n$p")
  }

  test("q49 quantization is scan-local: the only exchange is the final presentation sort") {
    val p = plan(graft.operators.Quantize.quantizeInt8(spark, TestSpark.Sf0001))
    assert(!p.contains("Join"), s"quantization must not join;\n$p")
    assert("Exchange".r.findAllIn(p).size == 1,
      s"per-vector codebooks need no shuffle — only the ORDER BY may exchange;\n$p")
  }

  test("q47 decode joins the vocab by broadcast on both encode and decode sides") {
    val p = plan(graft.operators.TextPipeline.detokenize(spark, TestSpark.Sf0001))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"vocab (dictionary-sized) must broadcast in encode AND decode;\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the token stream must never shuffle for a dictionary lookup;\n$p")
  }
}
