package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Embed, Hybrid, Knn, TextAnalysis}

/** q96 hybrid RRF: the fusion layer must reproduce a driver-side
  * reciprocal-rank-fusion reference computed from the two independently
  * oracle-verified halves (q95 BM25 lexical, q41/q59-family trigram
  * cosine vector), and the workload derivation must agree between the
  * halves.
  */
class HybridSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q96 fusion matches a brute-force RRF over the two halves' own rankings") {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.Sf0001)

    // lexical half: the oracle-verified q95 ranking
    val lex = TextAnalysis.bm25Rank(spark, TestSpark.Sf0001)
      .select(col("qid"), col("doc_id"), col("rank"))
      .as[(Long, Long, Long)].collect().toSeq

    // vector half rebuilt from its verified components: query text from
    // the shared workload table, both sides through the q41 encoder
    val qtext = TextAnalysis.bm25QueryTableOf(docs)
      .as[(Long, Int, String, Long)].collect().toSeq
      .groupBy(_._1).map { case (qid, ts) =>
        qid -> ts.sortBy(_._2).map(_._3).mkString(" ")
      }
    val qvecs = qtext.toSeq.map { case (qid, t) =>
      (qid, Embed.md5CountEncoder(Hybrid.HybridDim)()(t).toSeq)
    }.toDF("qid", "qvec")
    val dvecs = Embed.embedColumn[String](
      docs.select(col("doc_id"), col("text")), "text", "emb",
      Embed.md5CountEncoder(Hybrid.HybridDim))
      .select(col("doc_id").as("vec_id"), col("emb").as("embedding"))
    val vec = Knn.topK(qvecs, dvecs, Hybrid.HybridTopK)
      .select(col("qid"), col("vec_id"), col("rank"))
      .as[(Long, Long, Long)].collect().toSeq

    // driver-side RRF reference (k0 = 60, round 6 dp HALF_UP pre-rank,
    // ties to smaller doc_id)
    val lexR = lex.map { case (q, d, r) => (q, d) -> r }.toMap
    val vecR = vec.map { case (q, d, r) => (q, d) -> r }.toMap
    val expected = (lexR.keySet ++ vecR.keySet).groupBy(_._1).toSeq.flatMap {
      case (qid, keys) =>
        val scored = keys.toSeq.map { k =>
          val s = lexR.get(k).map(r => 1.0 / (Hybrid.RrfK0 + r)).getOrElse(0.0) +
            vecR.get(k).map(r => 1.0 / (Hybrid.RrfK0 + r)).getOrElse(0.0)
          (k._2, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        scored.sortBy { case (d, s) => (-s, d) }.take(Hybrid.HybridTopK)
          .zipWithIndex.map { case ((d, s), i) =>
            (qid, (i + 1).toLong, d, s,
              lexR.get((qid, d)).map(Long.box).orNull,
              vecR.get((qid, d)).map(Long.box).orNull)
          }
    }.toSet

    val got = Hybrid.hybridRrf(spark, TestSpark.Sf0001).collect().toSet.map {
      (r: org.apache.spark.sql.Row) =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
          if (r.isNullAt(4)) null else Long.box(r.getLong(4)),
          if (r.isNullAt(5)) null else Long.box(r.getLong(5)))
    }
    assert(got.size == expected.size && got.size == 4 * Hybrid.HybridTopK,
      s"4 queries x top-10 expected, got ${got.size} vs ref ${expected.size}")
    assert(got == expected,
      s"diff: spark-only=${(got -- expected).toSeq.sortBy(r => (r._1, r._2))}, " +
        s"ref-only=${(expected -- got).toSeq.sortBy(r => (r._1, r._2))}")
  }

  test("q96 carries both source ranks and a both-halves doc outranks equal single-half docs") {
    val out = Hybrid.hybridRrf(spark, TestSpark.Sf0001).collect().toSeq
    // every row has at least one source rank; rrf is consistent with them
    out.foreach { r =>
      val lexT = if (r.isNullAt(4)) None else Some(r.getLong(4))
      val vecT = if (r.isNullAt(5)) None else Some(r.getLong(5))
      assert(lexT.nonEmpty || vecT.nonEmpty, s"orphan fused row: $r")
      val s = lexT.map(x => 1.0 / (Hybrid.RrfK0 + x)).getOrElse(0.0) +
        vecT.map(x => 1.0 / (Hybrid.RrfK0 + x)).getOrElse(0.0)
      val exp = BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) == exp, s"rrf mismatch on $r: expected $exp")
    }
    // ranks are 1..k per qid, rrf non-increasing within qid
    out.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)) == (1L to sorted.size).toSeq,
        s"ranks not dense for qid $qid")
      val rrfs = sorted.map(_.getDouble(3))
      assert(rrfs.zip(rrfs.tail).forall { case (a, b) => a >= b },
        s"rrf not non-increasing for qid $qid: $rrfs")
    }
  }

  test("artifact-backed hybrid is row-identical to inline, with NO corpus text in its plan") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_hybrid_artifacts").toString
    Hybrid.buildHybridArtifacts(docs, dir)
    val viaArtifacts = Hybrid.hybridRrfAgainstArtifacts(spark, dir)
    // parity: the serving path must reproduce the oracle-verified inline
    // rows exactly (same workload, same ranks, same rrf values)
    val inline  = Hybrid.hybridRrfOf(docs).collect().toSeq
    val artRows = viaArtifacts.collect().toSeq
    assert(artRows == inline,
      "encode-once serving path must be row-identical to the inline q96")
    // no corpus re-encode, no corpus text: the plan reads ONLY the two
    // artifact tables (tf + doc_embs) — the documents table never appears
    val p = viaArtifacts.queryExecution.executedPlan.toString
    assert(p.contains("tf.parquet") && p.contains("doc_embs.parquet"),
      s"artifact path must rank from the persisted tables;\n$p")
    assert(!p.contains("documents.parquet"),
      s"artifact path must never scan corpus text;\n$p")
  }
}
