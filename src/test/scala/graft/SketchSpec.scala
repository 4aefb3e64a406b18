package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketch

/** q154 count-min heavy hitters: the CMS one-sided error guarantee and a
  * brute-force grid mirror on a hand corpus.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q154 fixture run: estimate >= exact for every hitter, top-k dense and sorted") {
    val out = Sketch.heavyHittersCms(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == Sketch.HhTopK)
    out.foreach { case (tok, exact, est, over) =>
      assert(est >= exact, s"CMS must never underestimate: $tok est=$est exact=$exact")
      assert(over == est - exact, s"audit column must be the difference: $tok")
    }
    val exacts = out.map(_._2)
    assert(exacts.zip(exacts.tail).forall { case (a, b) => a >= b },
      "rows must sort by exact count descending")
  }

  test("cells derived from the type table equal the scan-side fixed-state sketch, cell for cell") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextPipeline
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val toks = docs.select(explode(TextPipeline.tokenArr(col("text"))).as("token"))
    val scanSide = Sketch.cmsCellsOf(toks)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("exact_count"))
    // re-derive the declared row's cells independently: brute-force over
    // the collected type table
    val types = exact.collect().map(r => (r.getString(0), r.getLong(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def buckets(tok: String): Seq[Long] = {
      val hex = md.digest(s"cms:$tok".getBytes("UTF-8")).map("%02x".format(_)).mkString
      (0 until Sketch.CmsDepth).map(r =>
        java.lang.Long.parseLong(hex.substring(8 * r, 8 * r + 8), 16) % Sketch.CmsWidth)
    }
    val derived = types.flatMap { case (tok, n) =>
      buckets(tok).zipWithIndex.map { case (b, r) => (r, b) -> n }
    }.groupBy(_._1).map { case ((r, b), xs) => (r, b, xs.map(_._2).sum) }.toSet
    assert(scanSide == derived, "additivity: type-table cells must equal token-stream cells")
  }

  test("q155 fixture run: register state well-formed, estimate inside the HLL error envelope") {
    val out = Sketch.hllDistinct(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out.nonEmpty)
    out.foreach { case (g, exact, vZero, sScaled, est) =>
      assert(exact > 0, s"$g: audit distinct must be positive")
      assert(vZero >= 0 && vZero <= Sketch.HllM, s"$g: v_zero out of register range")
      assert(sScaled >= Sketch.HllM.toLong
        && sScaled <= (Sketch.HllM.toLong << Sketch.HllRhoMax), s"$g: s_scaled out of range")
      // m=64 → standard error ~13%; linear counting tighter. 3σ-ish envelope.
      assert(math.abs(est - exact) <= 0.5 * exact + 3,
        s"$g: estimate $est too far from exact $exact for m=${Sketch.HllM}")
    }
  }

  test("q155 registers equal a brute-force md5 mirror over the distinct value set") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, TestSpark.Sf0001)
    val got = Sketch.hllDistinctOf(ev, "event_type", col("user_id"))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSet
    val pairs = ev.select(col("event_type"), col("user_id")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def slices(v: Long): (Long, Long) = {
      val hex = md.digest(s"hll:$v".getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.substring(0, 8), 16) % Sketch.HllM,
        java.lang.Long.parseLong(hex.substring(8, 16), 16))
    }
    def rho(w: Long): Int =
      if (w == 0L) Sketch.HllRhoMax else Sketch.HllRhoMax - (64 - java.lang.Long.numberOfLeadingZeros(w))
    val regs = pairs.map { case (g, u) => val (r, w) = slices(u); (g, r) -> rho(w) }
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).max }
    val derived = pairs.map(_._1).distinct.map { g =>
      val ms = (0L until Sketch.HllM.toLong).map(r => regs.getOrElse((g, r), 0))
      (g, ms.count(_ == 0).toLong, ms.map(m => 1L << (Sketch.HllRhoMax - m)).sum)
    }.toSet
    assert(got == derived, "v_zero/s_scaled must equal the brute-force register table")
  }

  test("q155 max-idempotence: duplicated input stream yields the identical sketch row set") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.events(spark, TestSpark.Sf0001)
    val once = Sketch.hllDistinctOf(ev, "event_type", col("user_id")).collect().toSeq
    val twice = Sketch.hllDistinctOf(ev.union(ev), "event_type", col("user_id")).collect().toSeq
    assert(once == twice, "registers are max-folded: duplicates must not move any column")
  }

  test("q161 fixture run: every estimate inside the width-driven error bound") {
    val out = Sketch.quantileSketch(spark, TestSpark.Sf0001).collect()
    assert(out.length >= 3)
    out.foreach { r =>
      val (g, q, err) = (r.getString(0), r.getDouble(1), r.getDouble(4))
      assert(math.abs(err) <= Sketch.QsWidth,
        s"$g q=$q: histogram error $err exceeds the bucket-width bound")
      assert(math.abs(r.getDouble(2) - r.getDouble(3) - err) < 1e-9, s"$g q=$q: err column")
    }
  }

  test("q161 hand corpus: estimate, discrete-rank audit, and error are the hand-computed values") {
    import spark.implicits._
    // values one per bucket; q=0.5 → target rank ⌈2⌉: exact = 3.0 (the
    // rank-2 value), est = bucket-1 end (frac (2−1)/1 = 1) = 4.0, err 1.0
    val ev = Seq(1.0, 3.0, 5.0, 7.0).map(v => ("t", v)).toDF("event_type", "value")
    val row = Sketch.quantileSketchOf(ev).collect().find(_.getDouble(1) == 0.5).get
    assert(row.getDouble(2) == 4.0 && row.getDouble(3) == 3.0 && row.getDouble(4) == 1.0)
  }

  test("q161 domain clamp: out-of-range values land in the edge bucket, never off-grid") {
    import spark.implicits._
    val ev = Seq(100000.0, 99999.0, 3.0).map(v => ("t", v)).toDF("event_type", "value")
    val out = Sketch.quantileSketchOf(ev).collect()
    out.foreach { r =>
      assert(r.getDouble(2) <= Sketch.QsBuckets * Sketch.QsWidth,
        "estimates must stay inside the pinned domain")
    }
    // the LOWER edge clamps too (ADVICE r14: a negative value used to
    // index bucket floor(v/w) < 0 — off the grid, negative est_value)
    val neg = Seq(-50.0, -3.0, 5.0).map(v => ("t", v)).toDF("event_type", "value")
    val nout = Sketch.quantileSketchOf(neg).collect()
    assert(nout.length >= 3, "negative values must still land in an occupied cell")
    nout.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= Sketch.QsBuckets * Sketch.QsWidth,
        "estimates from below-domain values must clamp into bucket 0")
    }
  }

  test("hand corpus: a collision-free sketch estimates every type exactly") {
    import spark.implicits._
    // with w=256 and 3 types, some hash ROW is collision-free, and the
    // min over rows therefore reads the exact count for every type
    val docs = Seq((1L, "aa bb aa"), (2L, "cc aa bb")).toDF("doc_id", "text")
    val out = Sketch.heavyHittersCmsOf(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out.toSet == Set(("aa", 3L, 3L), ("bb", 2L, 2L), ("cc", 1L, 1L)))
  }
}
