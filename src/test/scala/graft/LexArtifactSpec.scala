package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** q183 — the build-once/serve-many lexical index (VERDICT r16 item 4):
  * the persisted (tf, dl, df, stats) artifacts must serve q95's exact
  * ranking with NO corpus text and NO corpus-scale aggregate at query
  * time.
  */
class LexArtifactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q183: artifact-served BM25 is row-identical to the live fit, with no corpus text at query time") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_lexart").toString
    TextAnalysis.buildBm25Artifacts(docs, dir)
    val served = TextAnalysis.bm25ServeFromArtifacts(spark, dir)
    val live = TextAnalysis.bm25RankOf(docs).collect().toSeq
    val rows = served.collect().toSeq
    assert(rows.nonEmpty && rows == live,
      "artifact-served ranking must reproduce the oracle-verified live q95 rows exactly")
    // serve-plan pin: every input reads from the four artifact tables;
    // the documents table (corpus text) never appears
    val p = served.queryExecution.executedPlan.toString
    Seq("tf.parquet", "dl.parquet", "df.parquet", "stats.parquet").foreach { a =>
      assert(p.contains(a), s"serving plan must read the persisted $a;\n$p")
    }
    assert(!p.contains("documents.parquet"),
      s"serving plan must never scan corpus text;\n$p")
    // and the artifact build leaves no cache entries behind (the suite's
    // cache-hygiene discipline)
    assert(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty,
      "buildBm25Artifacts/serve must not leak cache entries")
  }

  test("rebuilding after a corpus change serves the CHANGED ranking (artifacts track snapshots)") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val half = docs.filter(col("doc_id") % 2 === 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_lexart2").toString
    TextAnalysis.buildBm25Artifacts(half, dir)
    val served = TextAnalysis.bm25ServeFromArtifacts(spark, dir).collect().toSeq
    val live = TextAnalysis.bm25RankOf(half).collect().toSeq
    assert(served == live, "a rebuilt artifact set must serve the new snapshot's ranking")
    assert(served.forall(_.getLong(2) % 2 == 0), "only the snapshot's docs may be ranked")
  }
}
