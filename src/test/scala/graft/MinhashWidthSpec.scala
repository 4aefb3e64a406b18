package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupExtras

/** Production-width MinHash property test (round-11 verdict item 3).
  *
  * The declared rows run 8 permutations / 4 bands — correct and cheap to
  * oracle, but the banding S-curve at that width is coarse. Production
  * dedup (SlimPajama, RefinedWeb) runs ~100+ permutations. This spec
  * proves the SAME machinery carries a production width: at 64 perms / 16
  * bands (r = 4 rows per band) the measured candidate probability follows
  * the theoretical S-curve P(candidate) = 1 − (1 − J^r)^b against
  * BRUTE-FORCE shingle Jaccard on a seeded corpus, and the wide family's
  * curve is strictly SHARPER than 8/4's — near-total recall above the 0.7
  * Jaccard knee with a much lower false-candidate rate below 0.35.
  *
  * The corpus plants 300 document pairs at 10 overlap levels (seeded RNG,
  * fully deterministic): pair docs share a token prefix and diverge after
  * it, sweeping the shingle-Jaccard axis from ~0 to ~0.9. Jaccard is
  * computed exactly in Scala from the operator's own shingling definition
  * (distinct word 3-grams), so the reference needs no Spark.
  */
class MinhashWidthSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val PairsPerLevel = 30
  private val DocTokens = 30
  private val Levels = Vector(0.95, 0.85, 0.75, 0.65, 0.55, 0.45, 0.35, 0.25, 0.15, 0.05)

  /** (a_id, b_id, textA, textB) planted pairs; every token is globally
    * unique to its (pair, side, position) except the shared prefix.
    */
  private lazy val plantedPairs: Vector[(Long, Long, String, String)] = {
    var n = 0
    (for ((f, li) <- Levels.zipWithIndex; p <- 0 until PairsPerLevel) yield {
      val pairIdx = li * PairsPerLevel + p
      val shared = math.round(f * DocTokens).toInt
      val aToks = Vector.tabulate(DocTokens) { i => n += 1; s"w${pairIdx}x${n}" }
      val bToks = aToks.take(shared) ++ Vector.tabulate(DocTokens - shared) { i =>
        n += 1; s"y${pairIdx}x${n}"
      }
      (pairIdx * 2L, pairIdx * 2L + 1, aToks.mkString(" "), bToks.mkString(" "))
    }).toVector
  }

  /** Exact 3-gram-shingle Jaccard — the operator's own shingle definition. */
  private def jaccardOf(a: String, b: String): Double = {
    def sh(t: String) = t.split(" ").toSeq.sliding(3).filter(_.length == 3)
      .map(_.mkString(" ")).toSet
    val (sa, sb) = (sh(a), sh(b))
    if (sa.isEmpty || sb.isEmpty) 0.0
    else sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  test("64/16 banding follows the theoretical S-curve and sharpens 8/4 on both flanks") {
    val sess = spark
    import sess.implicits._
    val docs = plantedPairs.flatMap { case (aId, bId, ta, tb) =>
      Seq((aId, ta), (bId, tb))
    }.toDF("doc_id", "text")

    def candidatePairs(numHashes: Int, bands: Int): Set[(Long, Long)] =
      DedupExtras.bandCandidatesOf(docs, numHashes, bands)
        .as[(Long, Long)].collect().toSet

    val wide = candidatePairs(64, 16) // r = 4
    val narrow = candidatePairs(8, 4) // r = 2 (the declared width)

    val scored = plantedPairs.map { case (aId, bId, ta, tb) =>
      (jaccardOf(ta, tb), wide((aId, bId)), narrow((aId, bId)))
    }

    def theory(j: Double, r: Int, b: Int): Double = 1 - math.pow(1 - math.pow(j, r), b)

    // 1) per-bucket S-curve fit, both widths: bucket the 300 pairs by
    //    measured Jaccard and compare empirical candidate rate to the mean
    //    theoretical probability of the bucket's pairs
    val buckets = scored.groupBy { case (j, _, _) => math.min(9, (j * 10).toInt) }
    buckets.toSeq.sortBy(_._1).foreach { case (bk, ps) =>
      if (ps.size >= 10) {
        val rateW = ps.count(_._2).toDouble / ps.size
        val rateN = ps.count(_._3).toDouble / ps.size
        val thW = ps.map(p => theory(p._1, 4, 16)).sum / ps.size
        val thN = ps.map(p => theory(p._1, 2, 4)).sum / ps.size
        assert(math.abs(rateW - thW) <= 0.25,
          f"64/16 bucket J~0.$bk: empirical $rateW%.2f vs theory $thW%.2f (n=${ps.size})")
        assert(math.abs(rateN - thN) <= 0.25,
          f"8/4 bucket J~0.$bk: empirical $rateN%.2f vs theory $thN%.2f (n=${ps.size})")
      }
    }

    // 2) recall flank: above the production knee the wide family must be
    //    essentially total (theory ≥ 0.9996 at J = 0.8)
    val high = scored.filter(_._1 >= 0.72)
    assert(high.size >= 30, s"seeded corpus must populate the high-J flank: ${high.size}")
    val recallW = high.count(_._2).toDouble / high.size
    val recallN = high.count(_._3).toDouble / high.size
    assert(recallW >= 0.97, f"64/16 recall at J>=0.72 must be near-total: $recallW%.3f")
    assert(recallW >= recallN - 0.02,
      f"widening must not lose the recall flank: wide $recallW%.3f vs narrow $recallN%.3f")

    // 3) precision flank: below the knee the wide family must generate
    //    FEWER false candidates than the narrow one (the sharper S)
    val low = scored.filter(_._1 <= 0.35)
    assert(low.size >= 60, s"seeded corpus must populate the low-J flank: ${low.size}")
    val falseW = low.count(_._2)
    val falseN = low.count(_._3)
    assert(falseW < falseN,
      s"64/16 must suppress sub-threshold candidates vs 8/4: wide $falseW vs narrow $falseN of ${low.size}")
    assert(falseW.toDouble / low.size <= 0.12,
      s"64/16 false-candidate rate at J<=0.35 must stay low: $falseW of ${low.size}")

    // 4) unplanted cross-pairs (J = 0) must not collide at either width:
    //    anything outside the planted id pairing is a hash accident
    val plantedIds = plantedPairs.map { case (a, b, _, _) => (a, b) }.toSet
    assert((wide -- plantedIds).isEmpty && (narrow -- plantedIds).isEmpty,
      s"zero-Jaccard cross pairs must never co-bucket: ${(wide -- plantedIds).take(5)}")
  }

  test("the xxhash64 fast family carries the same 64/16 S-curve flanks as md5") {
    val sess = spark
    import sess.implicits._
    // The production-width escape from md5's digest cost (BASELINE.md
    // width ladder): seeded xxhash64 signatures must behave as an
    // independent MinHash family — same near-total recall above the knee,
    // same suppressed false-candidate rate below it.
    val docs = plantedPairs.flatMap { case (aId, bId, ta, tb) =>
      Seq((aId, ta), (bId, tb))
    }.toDF("doc_id", "text")
    val fast = DedupExtras.bandCandidatesOf(docs, 64, 16, fastHash = true)
      .as[(Long, Long)].collect().toSet
    val scored = plantedPairs.map { case (aId, bId, ta, tb) =>
      (jaccardOf(ta, tb), fast((aId, bId)))
    }
    val high = scored.filter(_._1 >= 0.72)
    assert(high.count(_._2).toDouble / high.size >= 0.97,
      s"xxhash64 64/16 recall at J>=0.72: ${high.count(_._2)} of ${high.size}")
    val low = scored.filter(_._1 <= 0.35)
    assert(low.count(_._2).toDouble / low.size <= 0.12,
      s"xxhash64 64/16 false-candidate rate at J<=0.35: ${low.count(_._2)} of ${low.size}")
    val plantedIds = plantedPairs.map { case (a, b, _, _) => (a, b) }.toSet
    assert((fast -- plantedIds).isEmpty,
      s"zero-Jaccard cross pairs must never co-bucket: ${(fast -- plantedIds).take(5)}")
  }

  test("width changes candidate generation, never the verified answer: diffs are banding misses only") {
    val sess = spark
    import sess.implicits._
    // Verification is EXACT Jaccard on the same shingle sets, so two
    // widths can only differ where banding itself missed a candidate:
    // every pair verified at one width but not the other must be absent
    // from the other width's CANDIDATE set (never dropped by a
    // disagreeing verification), the Jaccard values must agree exactly on
    // the intersection, and the wide family must recall nearly all of the
    // 60 planted pairs above the 0.7 knee.
    val docs = plantedPairs.flatMap { case (aId, bId, ta, tb) =>
      Seq((aId, ta), (bId, tb))
    }.toDF("doc_id", "text")
    def verifiedMap(numHashes: Int, bands: Int): Map[(Long, Long), Double] =
      DedupExtras.minhashVerifiedPairsOf(docs, numHashes = numHashes, bands = bands)
        .as[(Long, Long, Double)].collect().map { case (a, b, j) => (a, b) -> j }.toMap
    val wideV = verifiedMap(64, 16)
    val narrowV = verifiedMap(8, 4)
    val wideC = DedupExtras.bandCandidatesOf(docs, 64, 16).as[(Long, Long)].collect().toSet
    val narrowC = DedupExtras.bandCandidatesOf(docs, 8, 4).as[(Long, Long)].collect().toSet
    (wideV.keySet -- narrowV.keySet).foreach { p =>
      assert(!narrowC(p), s"pair $p verified wide but candidate-and-unverified narrow")
    }
    (narrowV.keySet -- wideV.keySet).foreach { p =>
      assert(!wideC(p), s"pair $p verified narrow but candidate-and-unverified wide")
    }
    (wideV.keySet & narrowV.keySet).foreach { p =>
      assert(wideV(p) == narrowV(p), s"pair $p: jaccard ${wideV(p)} vs ${narrowV(p)}")
    }
    val highJ = plantedPairs.filter { case (_, _, ta, tb) => jaccardOf(ta, tb) >= 0.7 }
      .map { case (a, b, _, _) => (a, b) }
    assert(highJ.size == 60, s"construction drift: ${highJ.size} high-J planted pairs")
    val recalled = highJ.count(wideV.keySet)
    assert(recalled >= 58, s"64/16 must verify nearly all high-J planted pairs: $recalled of 60")
  }

  test("q16 declared row IS the (NumHashes, Bands, md5) parameterization — defaults cannot drift") {
    // The declared q16 row is oracle-checked at the 8/4 md5 width; now
    // that width and hash family are constructor parameters, this pin
    // asserts the declared entry point equals the explicit
    // parameterization, so a future default change (e.g. flipping
    // fastHash on) cannot silently move the oracle row (VERDICT r11
    // item 7).
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val docs = graft.Tables.documents(spark, TestSpark.Sf0001)
    val declared = DedupExtras.minhashLshDedupOf(docs)
      .as[(Long, Long, Double)].collect().toSeq
    val explicit0 = DedupExtras.minhashVerifiedPairsOf(
        docs, threshold = DedupExtras.JaccardThreshold,
        numHashes = DedupExtras.NumHashes, bands = DedupExtras.Bands,
        fastHash = false)
      .orderBy(col("jaccard").desc, col("a_id"), col("b_id")).limit(50)
      .as[(Long, Long, Double)].collect().toSeq
    assert(declared == explicit0,
      "the declared q16 row must equal minhashVerifiedPairsOf(docs, 0.5, NumHashes, Bands, fastHash=false) top-50")
  }

  test("q127: removal concentrates in the duplicated slice; clean slices keep retention 1.0") {
    import spark.implicits._
    val dup = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, dup, "a", "s1"), (2L, dup, "a", "s1"), (3L, dup, "a", "s1"),
      (4L, "a completely different first clean document body here", "a", "s2"),
      (5L, "another unrelated clean text with its own words entirely", "b", "s1"),
      (6L, "yet one more unique document nothing shared with others", "b", "s1")
    ).toDF("doc_id", "text", "lang", "source")
    val out = graft.operators.DedupExtras.dedupBiasAuditOf(docs).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // pairs (1,2) (1,3) (2,3): larger ids 2 and 3 drop, keeper 1 stays
    assert(out(("a", "s1")) == ((3L, 2L, BigDecimal(1.0 / 3).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(out(("a", "s2")) == ((1L, 0L, 1.0)))
    assert(out(("b", "s1")) == ((2L, 0L, 1.0)))
  }
}
