package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** q124 — the moment-sum Pearson matrix against a brute-force reference
  * and the closed-form collinearity pole.
  */
class RelationalStatSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rows = Seq(
    (2.0, 100.0, 0.00, 0.02),
    (5.0, 210.0, 0.10, 0.04),
    (1.0, 330.0, 0.05, 0.01),
    (7.0, 440.0, 0.00, 0.08),
    (3.0, 150.0, 0.10, 0.03))

  private def df = rows.toDF("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  test("q124: every pair matches the brute-force Pearson formula") {
    val out = Relational.numericCorrOf(df).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    val cols: Map[String, Seq[Double]] = Map(
      "l_quantity" -> rows.map(_._1), "l_extendedprice" -> rows.map(_._2),
      "l_discount" -> rows.map(_._3), "l_tax" -> rows.map(_._4),
      "l_revenue" -> rows.map(r => r._2 * (1.0 - r._3)))
    def pearson(a: Seq[Double], b: Seq[Double]): Double = {
      val n = a.size.toDouble
      val (sx, sy) = (a.sum, b.sum)
      val (sxx, syy) = (a.map(x => x * x).sum, b.map(y => y * y).sum)
      val sxy = a.zip(b).map { case (x, y) => x * y }.sum
      BigDecimal((n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    Relational.CorrPairs.foreach { case (a, b) =>
      val (n, r) = out((a, b))
      assert(n == rows.size)
      assert(math.abs(r - pearson(cols(a), cols(b))) <= 1e-6, s"pair ($a, $b)")
    }
  }

  test("q124: an exact linear relation hits r = 1") {
    // discount 0 everywhere makes revenue == extendedprice exactly
    val lin = rows.map { case (q, p, _, t) => (q, p, 0.0, t) }
      .toDF("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val out = Relational.numericCorrOf(lin).collect()
      .map(r => ((r.getString(0), r.getString(1)), Option(r.getAs[java.lang.Double](3)))).toMap
    assert(out(("l_extendedprice", "l_revenue")).map(_.doubleValue) == Some(1.0))
    // the constant column's pair is UNDEFINED, not garbage: the SQL
    // corr() NULL convention under the zero-variance guard
    assert(out(("l_discount", "l_revenue")).isEmpty)
  }

  test("q124: one aggregate, no join, no window") {
    val p = Relational.numericCorr(spark, TestSpark.Sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"all moments come from ONE scan's aggregate;\n$p")
    assert(!p.contains("WindowExec") && !p.contains("Window "), s"no window;\n$p")
    assert("Scan parquet".r.findAllIn(p).length == 1, s"exactly one corpus scan;\n$p")
  }
}
