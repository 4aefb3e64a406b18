package graft

import org.scalatest.funsuite.AnyFunSuite

class SmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query has an oracle and returns rows at sf0.001") {
    val qs = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet == qs.keySet)
    qs.foreach { case (name, fn) =>
      val n = fn(spark, TestSpark.Sf0001).count()
      assert(n > 0, s"$name returned no rows")
    }
  }
}
