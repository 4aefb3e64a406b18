package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DupClusters, Sampling}

/** q82 hash-rank sampling and q83 leakage-safe splitting. */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q82: exact K per language, dense ranks, deterministic") {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val out = Sampling.sampleByOf(docs, Seq("lang"), 25)
      .as[(String, Long, Long)].collect()
    val sizes = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    out.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.length == math.min(25L, sizes(lang)),
        s"$lang: ${rows.length} sampled of ${sizes(lang)}")
      assert(rows.map(_._2).sorted.sameElements(1L to rows.length.toLong))
    }
    val again = Sampling.sampleByOf(docs, Seq("lang"), 25)
      .as[(String, Long, Long)].collect()
    assert(out.sameElements(again))
  }

  test("q82: the sample is hash-ordered, not id-ordered (it is a random draw)") {
    import spark.implicits._
    val ids = Sampling.sampleByOf(Tables.documents(spark, TestSpark.Sf0001), Seq("lang"), 25)
      .filter(col("rank") <= 25).as[(String, Long, Long)].collect()
      .filter(_._1 == "en").sortBy(_._2).map(_._3)
    assert(!ids.sorted.sameElements(ids), "rank order must not equal id order")
  }

  test("q82 plans as a bounded-heap aggregate, never a window") {
    val p = Sampling.sampleByOf(Tables.documents(spark, TestSpark.Sf0001), Seq("lang"), 25)
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), s"TopK must plan as ObjectHashAggregate;\n$p")
    assert(!p.contains("WindowExec"), s"no window may appear in the sampling path;\n$p")
  }

  test("q83: no verified near-dup pair straddles train and val") {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val split = DupClusters.leakageSafeSplitOf(docs).cache()
    try {
      val pairs = graft.operators.DedupExtras.minhashVerifiedPairsOf(docs)
        .select(col("a_id"), col("b_id"))
      val sides = split.select(col("doc_id"), col("side"))
      val straddling = pairs
        .join(sides.withColumnRenamed("doc_id", "a_id").withColumnRenamed("side", "sa"), Seq("a_id"))
        .join(sides.withColumnRenamed("doc_id", "b_id").withColumnRenamed("side", "sb"), Seq("b_id"))
        .filter(col("sa") =!= col("sb"))
        .count()
      assert(straddling == 0, s"$straddling near-dup pairs straddle the split")
      // both sides must exist, and same-cluster docs share a side by construction
      val bySide = split.groupBy("side").count().as[(String, Long)].collect().toMap
      assert(bySide.getOrElse("train", 0L) > 0 && bySide.getOrElse("val", 0L) > 0, bySide.toString)
      val mixedClusters = split.groupBy("cluster_id")
        .agg(countDistinct(col("side")).as("ns")).filter(col("ns") > 1).count()
      assert(mixedClusters == 0)
    } finally split.unpersist()
  }

  test("q88: rates are sqrt(n_min/n_l), smallest lang passes whole, realized counts track targets") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01").select(col("doc_id"), col("lang"))
    val natural = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val minN = natural.values.min
    val kept = Sampling.temperatureResampleOf(docs)
    val keptN = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    // the smallest language is never downsampled (rate exactly 1)
    val smallest = natural.minBy(_._2)._1
    assert(keptN(smallest) == natural(smallest), s"smallest lang $smallest must pass whole")
    // every language's realized count is within the hash gate's Bernoulli
    // noise of its target sqrt(n_min * n_l) (3 sigma)
    natural.foreach { case (l, nl) =>
      val rate = math.sqrt(minN.toDouble / nl)
      val target = rate * nl
      val sigma = math.sqrt(nl * rate * (1 - rate))
      assert(math.abs(keptN(l) - target) <= 3 * sigma + 1,
        s"$l: kept ${keptN(l)} vs target $target (sigma $sigma)")
    }
    // deterministic: re-run is row-identical
    assert(kept.collect().toSeq == Sampling.temperatureResampleOf(docs).collect().toSeq)
  }

  test("q88: the gate is scan-local — broadcast rate join, no corpus shuffle") {
    val p = Sampling.temperatureResample(spark, TestSpark.Sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"rate table must broadcast;\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the corpus must not shuffle for the rate join;\n$p")
  }

  test("q83 hand corpus: a planted dup family moves together") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the river bank"
    val docs = Seq(
      (1L, base), (2L, base + " today"), (3L, base + " again"),
      (10L, "completely unrelated text about catalyst optimizer rules and codegen stages here")
    ).toDF("doc_id", "text")
    val out = DupClusters.leakageSafeSplitOf(docs).as[(Long, Long, String)].collect().toList
    val family = out.filter(r => Set(1L, 2L, 3L).contains(r._1))
    assert(family.map(_._2).distinct == List(1L), s"family must share cluster 1: $out")
    assert(family.map(_._3).distinct.size == 1, s"family must share a side: $out")
    assert(out.find(_._1 == 10L).get._2 == 10L)
  }
}
