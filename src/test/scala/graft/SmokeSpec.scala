package graft

import org.scalatest.funsuite.AnyFunSuite

class SmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Queries allowed a global (unpartitioned) window AT sf0.001 ONLY
    * because the key provably degenerates at fixture scale, with the
    * keyed shape pinned elsewhere:
    *  - q148: the sign-bit width formula sits at its b=0 single-block
    *    floor for 200 vectors, so `cluster` folds to a literal and
    *    Catalyst drops the partition spec; past the floor the windows
    *    partition per block (PlanShapeSpec's q148 pin forces 2^b > 1
    *    and asserts `hashpartitioning(cluster`).
    * Anything else appearing here is a real scale bug — fix it, don't
    * whitelist it.
    */
  private val GlobalWindowWhitelist: Set[String] = Set("q148_semdedup_scaled")

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query has an oracle and returns rows at sf0.001") {
    val qs = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet == qs.keySet)
    qs.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, TestSpark.Sf0001)
      val n = df.count()
      assert(n > 0, s"$name returned no rows")
      // Unpartitioned-window sweep: a windowspec with no partition key
      // serializes its whole input on one task — at 100 TB that is a
      // stall, so every window in a declared plan must be keyed unless
      // the input is provably bounded (whitelist below, each entry
      // documented at its operator).
      // first element ordered (ASC/DESC) or the frame itself ⇒ the spec
      // has NO partition columns (they would precede either)
      val unpartitioned = """windowspecdefinition\((\S+ (?:ASC|DESC)|specifiedwindowframe)"""
        .r.findAllIn(df.queryExecution.executedPlan.toString).toList
      assert(unpartitioned.isEmpty || GlobalWindowWhitelist.contains(name),
        s"$name plans an UNPARTITIONED window over: ${unpartitioned.mkString("; ")}")
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
