package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftFunctions, VectorFunctions}

class CosineSimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairsDf(pairs: Seq[(Array[Double], Array[Double])]) =
    pairs.toDF("a", "b")

  test("native expression matches hand-computed values") {
    GraftFunctions.ensureRegistered(spark)
    val df = pairsDf(Seq(
      (Array(1.0, 0.0), Array(0.0, 1.0)),   // orthogonal -> 0
      (Array(1.0, 2.0), Array(2.0, 4.0)),   // parallel -> 1
      (Array(1.0, 0.0), Array(-1.0, 0.0)),  // opposite -> -1
      (Array(3.0, 4.0), Array(4.0, 3.0))    // 24/25
    ))
    val got = df.select(GraftFunctions.cosine($"a", $"b")).as[Double].collect()
    val want = Seq(0.0, 1.0, -1.0, 24.0 / 25.0)
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12, s"$g vs $w") }
  }

  test("zero-vector policy: score is 0.0, not NaN") {
    GraftFunctions.ensureRegistered(spark)
    val df = pairsDf(Seq(
      (Array(0.0, 0.0), Array(1.0, 2.0)),
      (Array(0.0, 0.0), Array(0.0, 0.0))
    ))
    assert(df.select(GraftFunctions.cosine($"a", $"b")).as[Double].collect().toSeq == Seq(0.0, 0.0))
    assert(df.select(VectorFunctions.cosineSimilarity($"a", $"b")).as[Double].collect().toSeq == Seq(0.0, 0.0))
  }

  test("native expression is bit-identical to the zip_with/aggregate form on random vectors") {
    GraftFunctions.ensureRegistered(spark)
    val rnd  = new Random(42)
    val dims = Seq(1, 2, 7, 64, 301)
    val pairs = for { d <- dims; _ <- 1 to 20 } yield
      (Array.fill(d)(rnd.nextGaussian()), Array.fill(d)(rnd.nextGaussian()))
    val df = pairsDf(pairs)
    val rows = df
      .select(
        GraftFunctions.cosine($"a", $"b").as("native"),
        VectorFunctions.cosineSimilarity($"a", $"b").as("expr"))
      .as[(Double, Double)]
      .collect()
    rows.foreach { case (n, e) => assert(n == e, s"native $n != expr $e") }
  }

  test("float arrays widen exactly: raw float input equals cast-to-double input") {
    GraftFunctions.ensureRegistered(spark)
    val rnd = new Random(5)
    val pairs = Seq.fill(30)((Array.fill(64)(rnd.nextFloat()), Array.fill(64)(rnd.nextFloat())))
    val df = pairs.toDF("a", "b") // array<float> columns
    val rows = df.select(
      GraftFunctions.cosine($"a", $"b").as("raw"),
      GraftFunctions.cosine($"a".cast("array<double>"), $"b".cast("array<double>")).as("cast"),
      GraftFunctions.cosine($"a", $"b".cast("array<double>")).as("mixed"))
      .as[(Double, Double, Double)].collect()
    rows.foreach { case (r, c, m) => assert(r == c && r == m) }
  }

  test("null array elements null the result instead of reading garbage") {
    GraftFunctions.ensureRegistered(spark)
    // SQL literals carry containsNull=true, exercising the codegen null scan
    val r = spark.sql(
      """SELECT graft_cosine(array(1.0D, NULL), array(1.0D, 2.0D)) AS c1,
        |       graft_cosine(array(1.0D, 2.0D), array(NULL, 2.0D)) AS c2,
        |       graft_cosine(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS c3,
        |       graft_l2_normalize(array(3.0D, NULL)) AS n1,
        |       graft_l2_normalize(array(3.0D, 4.0D)) AS n2
        |""".stripMargin).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(math.abs(r.getDouble(2) - 11.0 / (math.sqrt(5.0) * math.sqrt(25.0))) < 1e-12)
    assert(r.isNullAt(3))
    assert(r.getSeq[Double](4) == Seq(0.6, 0.8))
    // a null BEYOND the shorter array's length still nulls the score —
    // the scan covers each array's full extent, not the common prefix
    val r2 = spark.sql(
      "SELECT graft_cosine(array(1.0D, NULL), array(2.0D)) AS c").collect().head
    assert(r2.isNullAt(0))
  }

  test("symmetry and self-similarity properties") {
    GraftFunctions.ensureRegistered(spark)
    val rnd = new Random(7)
    val vs  = Seq.fill(50)(Array.fill(16)(rnd.nextGaussian()))
    val sym = pairsDf(vs.zip(vs.reverse))
      .select(GraftFunctions.cosine($"a", $"b").as("ab"), GraftFunctions.cosine($"b", $"a").as("ba"))
      .as[(Double, Double)].collect()
    sym.foreach { case (ab, ba) => assert(ab == ba) }
    val self = pairsDf(vs.zip(vs)).select(GraftFunctions.cosine($"a", $"b")).as[Double].collect()
    self.foreach(s => assert(math.abs(s - 1.0) < 1e-9))
  }
}
