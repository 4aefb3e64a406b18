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
    qs.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = fn(spark, TestSpark.Sf0001).count()
      assert(n > 0, s"$name returned no rows")
      // Cache-hygiene guard (VERDICT r15 #2): no declared row may leave an
      // entry in the session cache manager after executing — Verify runs
      // all rows in ONE session, so a leaked corpus-scale cache compounds
      // per invocation. The repo's unpersist discipline is try/finally or
      // nothing (q79's leaked `scored` cache is the defect this pins).
      assert(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
               .sharedState.cacheManager.isEmpty,
        s"$name left entries in the session cache manager")
    }
  }
}
