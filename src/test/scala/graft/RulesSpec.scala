package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.Cast
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftFunctions, RollingHash}
import graft.plans.StripCosineCasts

class RulesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("StripCosineCasts removes float->double casts under graft_cosine only") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val df = Seq((Array(1.0f, 2.0f), Array(2.0f, 1.0f))).toDF("a", "b")
      .select(
        GraftFunctions.cosine($"a".cast("array<double>"), $"b".cast("array<double>")).as("score"),
        $"a".cast("array<double>").as("untouched"))
    val before = df.queryExecution.analyzed
    val after  = StripCosineCasts(before)

    def castsUnderCosine(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int =
      p.expressions
        .flatMap(_.collect { case c: graft.functions.CosineSimilarity => c })
        .map(c => c.collect { case _: Cast => 1 }.size)
        .sum

    assert(castsUnderCosine(before) == 2, "analyzed plan has the two casts")
    assert(castsUnderCosine(after) == 0, "rule strips both")
    // the cast OUTSIDE the cosine must survive
    assert(after.expressions.flatMap(_.collect { case c: Cast => c }).nonEmpty)

    // results are bit-identical with and without the rule
    val raw  = Seq((Array(1.0f, 2.0f), Array(2.0f, 1.0f))).toDF("a", "b")
      .select(GraftFunctions.cosine($"a", $"b")).as[Double].head()
    val cast = df.select($"score").as[Double].head()
    assert(raw == cast)
  }

  test("RollingHash expression matches a straightforward Scala fold") {
    import spark.implicits._
    RollingHash.ensureRegistered(spark)
    val inputs = Seq("", "a", "hello world", "the fast key order sort", "x" * 500)
    val got = inputs.toDF("s").select(RollingHash.rollingHash($"s")).as[Long].collect().toSeq
    val want = inputs.map(_.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % 1000003L))
    assert(got == want)
  }
}
