package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.Cast
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftFunctions, RollingHash, VectorFunctions}
import graft.plans.{StripCosineCasts, StripRedundantNormalize}

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

  test("native L2Normalize is bit-identical to the expression form") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val rng = new scala.util.Random(7)
    val vecs = Seq.fill(50)(Array.fill(16)(rng.nextFloat() * 4 - 2)) :+ Array.fill(16)(0.0f)
    val df = vecs.toDF("v")
    val native = df.select(GraftFunctions.normalize($"v")).as[Seq[Double]].collect()
    val hof    = df.select(VectorFunctions.normalize($"v")).as[Seq[Double]].collect()
    assert(native.toSeq == hof.toSeq)
  }

  test("StripRedundantNormalize drops normalize under cosine (scale invariance)") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val df = Seq((Array(1.0f, 2.0f, -0.5f), Array(2.0f, 1.0f, 3.0f))).toDF("a", "b")
      .select(
        GraftFunctions.cosine(GraftFunctions.normalize($"a"), GraftFunctions.normalize($"b")).as("s"),
        GraftFunctions.normalize($"a").as("untouched"))
    val before = df.queryExecution.analyzed
    val after  = StripRedundantNormalize(before)

    def normsUnderCosine(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int =
      p.expressions
        .flatMap(_.collect { case c: graft.functions.CosineSimilarity => c })
        .map(c => c.collect { case _: graft.functions.L2Normalize => 1 }.size)
        .sum

    assert(normsUnderCosine(before) == 2, "analyzed plan wraps both inputs")
    assert(normsUnderCosine(after) == 0, "rule strips both")
    // the normalize OUTSIDE the cosine must survive
    assert(after.expressions.flatMap(_.collect { case n: graft.functions.L2Normalize => n }).nonEmpty)

    // algebraically equal; FP association differs only in the last ulp
    val wrapped  = df.select($"s").as[Double].head()
    val stripped = Seq((Array(1.0f, 2.0f, -0.5f), Array(2.0f, 1.0f, 3.0f))).toDF("a", "b")
      .select(GraftFunctions.cosine($"a", $"b")).as[Double].head()
    assert(math.abs(wrapped - stripped) < 1e-9)
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
