package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, IvfIndex}

/** Embedding near-dup: the exhaustive within-label q10 (the engine's one
  * measured-quadratic query, BASELINE.md sf1 table) vs its 100 TB path —
  * candidate pairs bucketed by the IVF index's nearest-centroid lists,
  * where nlist tunes the pair count down.
  *
  * The fixture corpus has NO true near-duplicates (its top pairs sit near
  * cosine 0.45 — verified: bucketing legitimately cannot co-locate pairs
  * that are not near), so the recall guarantee is tested on a corpus with
  * PLANTED near-dups: genuinely similar vectors must land in the same
  * list and surface. That is the operator's actual promise — near
  * duplicates co-bucket; unrelated mid-similarity pairs are exactly what
  * it prunes away.
  */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("index-blocked near-dup recovers planted near-duplicates at a fraction of the pair count") {
    import spark.implicits._
    // 300 deterministic base vectors + 40 near-duplicates (tiny rotation
    // of bases 0..39): the true near-dup pairs are (i, 1000+i)
    val rnd = new scala.util.Random(7)
    val dim = 16
    val base = Array.fill(300)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    val dups = (0 until 40).map { i =>
      val v = base(i).clone()
      v(i % dim) = v(i % dim) + 0.01f
      (1000L + i, v)
    }
    val corpus = (base.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++ dups).toSeq
      .toDF("vec_id", "embedding")

    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_idx").toString
    IvfIndex.buildUnsupervised(spark, corpus, dir, nlist = 12, seed = 11L)

    // candidate-pair budget: Σ |list|·(|list|-1)/2 well under the global n²/2
    val blockedPairs = spark.read.parquet(IvfIndex.pointsPath(dir))
      .groupBy("list_id").count()
      .select(sum((col("count") * (col("count") - 1) / 2).cast("long")).as("s"))
      .head().getLong(0)
    val n = corpus.count()
    val allPairs = n * (n - 1) / 2
    info(s"candidate pairs: index-blocked $blockedPairs vs exhaustive $allPairs")
    assert(blockedPairs < allPairs / 3,
      s"12 lists must cut the pair budget to a fraction of n^2/2 ($blockedPairs vs $allPairs)")

    // every planted near-dup pair must co-bucket and surface in the top-k
    val top = Dedup.nearDupPairsViaIndex(spark, dir, k = 60)
      .select($"a_id", $"b_id", $"score").as[(Long, Long, Double)].collect()
    val found = top.collect { case (a, b, _) if b == a + 1000L => a }.toSet
    val recall = found.size / 40.0
    info(f"planted-pair recall in blocked top-60: $recall%.2f")
    assert(recall >= 0.95,
      s"a genuinely-near pair must co-bucket under the coarse quantizer, got $recall")
    // and the planted pairs dominate the ranking (scores ~1.0 vs random ~0)
    assert(top.take(40).count { case (a, b, _) => b == a + 1000L } >= 38)

    // output shape matches q10's: (a_id, b_id, label, score), ranked
    val r = Dedup.nearDupPairsViaIndex(spark, dir, k = 10)
    assert(r.columns.toSeq == Seq("a_id", "b_id", "label", "score"))
    assert(r.count() == 10)
  }

  test("pair label is the COMMON label — null when a list-blocked pair spans labels") {
    import spark.implicits._
    // list blocking (unlike q10's label blocking) can pair vectors whose
    // payload labels differ; the contract is common-or-null, never a
    // one-sided claim. Plant a near-identical pair with DIFFERENT labels
    // and one with the SAME label among orthogonal fillers.
    val dim = 8
    def unit(i: Int): Array[Float] = Array.tabulate(dim)(j => if (j == i) 1f else 0f)
    def nudge(v: Array[Float], eps: Float): Array[Float] = {
      val w = v.clone(); w(dim - 1) += eps; w
    }
    val rows = Seq(
      (1L, 10L, unit(0)), (2L, 20L, nudge(unit(0), 0.01f)), // near pair, labels differ
      (3L, 30L, unit(1)), (4L, 30L, nudge(unit(1), 0.01f)), // near pair, same label
      (5L, 40L, unit(2)), (6L, 50L, unit(3))                // fillers
    ).toDF("vec_id", "label", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_lbl").toString
    IvfIndex.buildUnsupervised(spark, rows, dir, nlist = 4, seed = 3L)

    val top = Dedup.nearDupPairsViaIndex(spark, dir, k = 2)
      .select($"a_id", $"b_id", $"label").collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toSet
    assert(top == Set((1L, 2L, None), (3L, 4L, Some(30L))),
      s"cross-label pair must carry null, same-label pair its common label; got $top")
  }

  test("sign-bit scaled near-dup: pair budget grows linearly with the corpus, planted dups co-bucket") {
    import spark.implicits._
    val dim = 16
    def corpus(n: Int, seed: Int) = {
      val rnd = new scala.util.Random(seed)
      (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2f - 1f)))
        .toDF("vec_id", "embedding")
    }
    def pairBudget(dir: String): Long = spark.read.parquet(IvfIndex.pointsPath(dir))
      .groupBy("list_id").count()
      .agg(sum((col("count") * (col("count") - 1) / 2).cast("long")))
      .head().getLong(0)

    // 4x the data: the scaled quantizer adds 2 sign bits (4x the lists),
    // holding per-list occupancy ~constant — pair budget grows ~4x where a
    // FIXED-nlist blocking would grow 16x (that gap is q56 vs q62 at 100 TB)
    val dS = java.nio.file.Files.createTempDirectory("graft_sb_s").toString
    val dB = java.nio.file.Files.createTempDirectory("graft_sb_b").toString
    IvfIndex.buildSignBit(spark, corpus(1600, 1), dS)
    IvfIndex.buildSignBit(spark, corpus(6400, 1), dB)
    val (bs, bb) = (pairBudget(dS), pairBudget(dB))
    info(f"pair budget: n=1600 -> $bs, n=6400 -> $bb (x${bb.toDouble / bs}%.1f; quadratic would be x16)")
    assert(bb.toDouble / bs < 8.0,
      s"4x data must grow the pair budget ~4x under the scaled quantizer, got ${bb.toDouble / bs}")

    // planted near-dups: clones nudged on the LAST dim — never a sign dim
    // at this corpus size — MUST share all sign bits and surface on top
    val base = corpus(500, 2)
    val dups = base.filter(col("vec_id") < 30)
      .select((col("vec_id") + 1000L).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i === dim - 1, x + 0.01f).otherwise(x)).as("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("graft_sb_planted").toString
    IvfIndex.buildSignBit(spark, base.unionByName(dups), dir)
    val top = Dedup.nearDupPairsViaIndex(spark, dir, k = 30)
      .select($"a_id", $"b_id").as[(Long, Long)].collect()
    assert(top.count { case (a, b) => b == a + 1000L } == 30,
      s"all 30 planted pairs must co-bucket under sign bits and dominate the top-30; got ${top.toSeq}")
  }

  test("q73 simhash banding is EXHAUSTIVE for its radius: equals brute-force all-pairs hamming <= 3") {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.Sf0001).select("doc_id", "text")
    // pigeonhole (<=3 flips cannot touch all 4 bands) is width-independent:
    // verify at the declared production width AND the dense 16-bit space
    // where collisions make the candidate graph heavy
    for (bits <- Seq(16, graft.operators.DedupExtras.DeclaredSimhashBits)) {
      val banded = graft.operators.DedupExtras.simhashNearDupOf(docs, bits)
        .as[(Long, Long, Long)].collect().toSeq
      val fps = graft.operators.DedupExtras.simhashOf(docs, bits)
        .as[(Long, Long)].collect().sortBy(_._1)
      val brute = (for {
        (a, fa) <- fps; (b, fb) <- fps if a < b
        h = java.lang.Long.bitCount(fa ^ fb) if h <= graft.operators.DedupExtras.MaxHamming
      } yield (a, b, h.toLong))
        .sortBy(t => (t._3, t._1, t._2)).take(100).toSeq
      assert(banded == brute,
        s"bits=$bits: banded must find every pair in radius; banded=${banded.size} brute=${brute.size}")
    }
  }
}
