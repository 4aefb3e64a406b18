package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Analytics, Skew}

/** Scale-path tools: salted-join equivalence, HLL sketch accuracy, and
  * partition-pruned storage layout.
  */
class ScaleToolsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("saltedJoin returns exactly the plain inner-join result on skewed keys") {
    import spark.implicits._
    // 90% of left rows share one hot key
    val left = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 42L, i.toLong)).toDF("k", "lv")
    val right = (0L to 50L).map(k => (k, s"r$k")).toDF("k", "rv")
    val plain  = left.join(right, Seq("k")).select("k", "lv", "rv").collect().toSet
    val salted = Skew.saltedJoin(left, right, "k", 8).select("k", "lv", "rv").collect().toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("bucketed tables co-locate the join: no Exchange on either side") {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.Sf0001).select("doc_id", "lang")
    val meta = Tables.documents(spark, TestSpark.Sf0001).select(col("doc_id"), col("n_chars"))
    docs.write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable("docs_bkt")
    meta.write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable("meta_bkt")

    // disable broadcast so the planner must consider the shuffle join the
    // bucketing exists to avoid (at scale neither side would broadcast)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("docs_bkt").join(spark.table("meta_bkt"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join; plan:\n$plan")
      assert(plan.contains("Bucketed: true"), s"expected bucketed scans; plan:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side; plan:\n$plan")
      assert(joined.count() == docs.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("HLL approx distinct stays within advertised error vs exact") {
    import spark.implicits._
    val r = Analytics.approxDistinctUsers(spark, TestSpark.Sf0001)
      .as[(String, Long, Long)].collect()
    assert(r.nonEmpty)
    r.foreach { case (t, approx, exact) =>
      val rel = math.abs(approx - exact).toDouble / exact
      assert(rel <= 0.15, s"$t: approx $approx vs exact $exact (rel err $rel)")
    }
  }

  test("partitionBy layout gives partition-pruned scans") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.embeddings(spark, TestSpark.Sf0001)
      .write.mode("overwrite").partitionBy("label").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("label") === 3)
    val plan = q.queryExecution.executedPlan.toString
    assert("""PartitionFilters: \[[^\]]*label""".r.findFirstIn(plan).isDefined,
      "label must appear INSIDE a non-empty partition filter (the key prints even when empty)")
    // pruning actually limits files read: only the label=3 directory
    val scanned = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(!scanned.contains("label=1") || scanned.contains("label=3"))
    assert(q.count() ==
      Tables.embeddings(spark, TestSpark.Sf0001).filter(col("label") === 3).count())
  }

  test("GenScale replicas never alias: 30 copies yield 30 distinct texts and vectors per base row") {
    // regression for the r4-advice aliasing bugs: a plain Caesar rotation
    // is the identity at rep 26 (exact duplicate texts), and a stride-7
    // vector rotation is the identity whenever dim | rep*7 — either one
    // manufactures the artificial cross-replica duplicates the generator
    // exists to avoid. 30 copies crosses the old 26-period boundary.
    val out = java.nio.file.Files.createTempDirectory("graft_genscale").toString
    GenScale.run(spark, TestSpark.Sf0001, out, copies = 30)

    val baseDocs = Tables.documents(spark, TestSpark.Sf0001)
    val dOff = baseDocs.agg(max("doc_id")).head().getLong(0) + 1L
    val scaledDocs = spark.read.parquet(s"$out/documents.parquet")
    assert(scaledDocs.count() == 30 * baseDocs.count())
    // replicas of base doc 0 live at doc_id = rep*dOff: all 30 texts distinct
    val texts = scaledDocs.filter(col("doc_id") % dOff === 0)
      .select("text").collect().map(_.getString(0))
    assert(texts.length == 30 && texts.distinct.length == 30,
      "every replica must carry a distinct substitution of the base text")

    val baseEmb = Tables.embeddings(spark, TestSpark.Sf0001)
    val eOff = baseEmb.agg(max("vec_id")).head().getLong(0) + 1L
    val vecs = spark.read.parquet(s"$out/embeddings.parquet")
      .filter(col("vec_id") % eOff === 0)
      .select("embedding").collect().map(_.getSeq[Float](0).toSeq)
    assert(vecs.length == 30 && vecs.distinct.length == 30,
      "every replica must carry a distinct permutation of the base vector")

    // the alias guard fails FAST when copies exceed the substitution period
    val e = intercept[IllegalArgumentException] {
      GenScale.run(spark, TestSpark.Sf0001, out, copies = 313)
    }
    assert(e.getMessage.contains("alias"))
  }

  test("GenScale heaps mode: shared vocabulary, preserved per-doc token multisets, distinct texts") {
    val out = java.nio.file.Files.createTempDirectory("graft_genscale_heaps").toString
    GenScale.run(spark, TestSpark.Sf0001, out, copies = 5, mode = "heaps")

    val base = Tables.documents(spark, TestSpark.Sf0001)
    val dOff = base.agg(max("doc_id")).head().getLong(0) + 1L
    val scaled = spark.read.parquet(s"$out/documents.parquet")
    assert(scaled.count() == 5 * base.count())

    import graft.operators.TextPipeline.tokenArr
    def vocab(df: org.apache.spark.sql.DataFrame): Set[String] = df
      .select(explode(tokenArr(col("text"))).as("t")).distinct()
      .collect().map(_.getString(0)).toSet
    // the Heaps property: replication must not grow the token vocabulary
    assert(vocab(scaled) == vocab(base),
      "heaps mode must share the base vocabulary across every replica")

    // per-doc token MULTISET preserved (the shuffle only reorders), and
    // replica texts distinct from the base for multi-token docs
    val rows = scaled.filter(col("doc_id") % dOff === 0)
      .orderBy(col("doc_id"))
      .select(col("text")).collect().map(_.getString(0))
    assert(rows.length == 5)
    def multiset(s: String): Map[String, Int] =
      raw"(\w+|[^\w\s]+)".r.findAllIn(s).toSeq.groupBy(identity).map { case (k, v) => (k, v.size) }
    val baseMs = multiset(rows.head)
    assert(rows.tail.forall(multiset(_) == baseMs),
      "every replica must carry the same token multiset as the base doc")
    if (baseMs.values.sum > 1)
      assert(rows.distinct.length > 1, "multi-token replicas must be reshuffled, not copied")

    // mode guard fails fast on a typo rather than silently running affine
    val e = intercept[IllegalArgumentException] {
      GenScale.run(spark, TestSpark.Sf0001, out, copies = 2, mode = "heapz")
    }
    assert(e.getMessage.contains("unknown mode"))
  }
}
