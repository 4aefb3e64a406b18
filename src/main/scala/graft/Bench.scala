package graft


/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints the record JSON line with per-query and total wall-clock seconds
  * — twice (first and last), with a one-line-per-query ledger between, so
  * a truncated capture from either side still yields the data (VERDICT r5
  * item 7: BENCH_r05 lost q01–q09 to a head-truncated capture).
  *
  * Queries are forced through the `noop` datasource sink rather than
  * `count()`: count() lets Catalyst prune expensive projected columns
  * (a normalize/fingerprint query would measure only its scan), while the
  * noop sink materializes every output column without write-side cost.
  * One warmup query runs first so JVM/codegen startup is not charged to
  * the first measured query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // UTC pinned like Verify: the events NTZ->timestamp normalization and
    // window bucketing must shape queries identically under any runner,
    // not only sbt-forked JVMs that inherit build.sbt's -D flag
    val spark = MainSupport.localSession(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.session.timeZone" -> "UTC")

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // warmup: JVM + codegen + parquet footer caches
    try force(SparkEntry.entry(spark)) catch { case _: Throwable => () }

    // Median of 3 samples per query: one sample is not a measurement — a
    // co-located load spike on the driver machine poisoned a whole round's
    // record (r2: 59.8 s recorded vs 38.4 s on a quiet machine, unchanged
    // code). The median self-corrects a single contended run.
    val Samples = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_SAMPLES", "3").toInt)
    // Optional subset filter (comma-separated keys) for spot checks at
    // large scale factors where the full set would take hours (the q10
    // pair count is quadratic by semantics). The driver never sets this;
    // a filtered total is a spot check, not a round record.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val splitKeys = Set("q38_build", "q38_probe", "q48_probe", "q53_probe",
      "q55_graphbuild", "q55_probe", "q57_codes", "q57_probe",
      "q62_build", "q62_pairs")
    only.foreach { keys =>
      // fail LOUD on empty/unknown keys: a typo'd filter would otherwise
      // print a 0-second "benchmark" that looks like a perfect result
      val unknown = keys -- SparkEntry.queries.keySet -- splitKeys
      require(keys.nonEmpty && unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY: empty or unknown keys [${unknown.mkString(",")}] — " +
          s"valid keys are the declared query names and ${splitKeys.mkString("/")}")
    }
    val selected = only.fold(SparkEntry.queries)(keys => SparkEntry.queries.filter(q => keys(q._1)))
    // A failing query records -1 and the run CONTINUES: round 9 lost the
    // timings of 90 healthy queries because one broken fixture read
    // aborted the whole record (VERDICT r9 item 2). Fail-loud stays (the
    // error prints, the process exits nonzero at the end, the record is
    // marked partial) — fail-empty does not.
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to Samples).flatMap { _ =>
        val t0 = System.nanoTime()
        val ok = try { force(fn(spark, sfDir)); true } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[bench] $name FAILED: $e"); false
        }
        // elapsed captured BEFORE cache teardown: clearCache scopes the
        // per-query cached subtrees (q16/q18 shingles, q04/q05 vocab) to
        // this sample but its cost is not part of the query.
        val elapsed = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        if (ok) Some(elapsed) else None
      }
      if (times.size < Samples) failed += name
      name -> (if (times.isEmpty) -1.0 else median(times))
    }
    // Attributable index timing (VERDICT r3 item 5): q38/q48/q53/q55 time
    // build+persist+probe inside one closure by design, so their headline
    // numbers track write-path noise. These EXTRA keys split the phases —
    // one timed build, then median-of-Samples probes against the prebuilt
    // index — and are NOT added to `total`, which stays the comparable
    // sum of the declared queries.
    // Each split key is gated INDIVIDUALLY on a filtered run (ADVICE r4):
    // selecting q38_probe times the IVF build (the unavoidable shared
    // prerequisite) but runs/prints no other probe, and the graph
    // construction runs only when a q55 split key asked for it.
    val wantedSplit: Set[String] = only.fold(splitKeys)(keys => splitKeys.intersect(keys))
    val split: Seq[(String, Double)] =
      if (wantedSplit.isEmpty) Seq.empty
      else try {
        import graft.operators.{GraphAnn, IvfIndex, Pq}
        import org.apache.spark.sql.functions.col
        import MainSupport.timed
        def medOf(f: => Unit): Double = median(
          (1 to Samples).map { _ => val t = timed(f); spark.catalog.clearCache(); t })
        val emb      = Tables.embeddings(spark, sfDir)
        val indexDir = java.nio.file.Files.createTempDirectory("graft_bench_ivf").toString
        val buildSec = timed(IvfIndex.build(spark, emb, indexDir))
        val q  = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
        val qf = emb.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec"), col("label").as("qlabel"))
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
        if (wantedSplit("q38_build")) out += "q38_build" -> buildSec
        if (wantedSplit("q38_probe"))
          out += "q38_probe" -> medOf(force(IvfIndex.probe(spark, indexDir, q, k = 3, nprobe = 1)))
        if (wantedSplit("q48_probe"))
          out += "q48_probe" -> medOf(force(IvfIndex.probeFiltered(spark, indexDir, qf, k = 3, nprobe = 1, pushLabelFilter = true)))
        if (wantedSplit("q53_probe"))
          out += "q53_probe" -> medOf(force(IvfIndex.probe(spark, indexDir, q, k = 3, nprobe = 2)))
        if (wantedSplit("q55_graphbuild") || wantedSplit("q55_probe")) {
          // NSW construction is the engine's most expensive single
          // component (VERDICT r4) — timed separately so a construction
          // regression cannot hide inside q55's lifecycle number
          val graphSec = timed(GraphAnn.buildGraphs(spark, indexDir, m = 8, efConstruction = 32))
          if (wantedSplit("q55_graphbuild")) out += "q55_graphbuild" -> graphSec
          if (wantedSplit("q55_probe"))
            out += "q55_probe" -> medOf(force(GraphAnn.probeGraph(spark, indexDir, q, k = 3, nprobe = 1, ef = Int.MaxValue)))
        }
        if (wantedSplit("q62_build") || wantedSplit("q62_pairs")) {
          // sign-bit near-dup lifecycle split: the scan-local quantizer
          // build (no training pass) vs the co-bucketed pair ranking —
          // separately attributable so a regression in either half of the
          // 100 TB dedup path cannot hide inside q62's lifecycle number
          val sbDir = java.nio.file.Files.createTempDirectory("graft_bench_signbit").toString
          val sbBuildSec = timed(IvfIndex.buildSignBit(spark, emb, sbDir))
          if (wantedSplit("q62_build")) out += "q62_build" -> sbBuildSec
          if (wantedSplit("q62_pairs"))
            out += "q62_pairs" -> medOf(force(graft.operators.Dedup.nearDupPairsViaIndex(spark, sbDir, k = 100)))
        }
        if (wantedSplit("q57_codes") || wantedSplit("q57_probe")) {
          // PQ lifecycle split: codebook train + code layout write vs the
          // ADC probe alone — SAME training bound and covering shortlist
          // as the declared q57 (shared helpers, so the bench cannot
          // silently time a different probe than the query it attributes)
          val cb = Pq.lifecycleTrain(spark, emb)
          val codesSec = timed(Pq.buildCodes(spark, indexDir, cb))
          if (wantedSplit("q57_codes")) out += "q57_codes" -> codesSec
          if (wantedSplit("q57_probe"))
            out += "q57_probe" -> medOf(force(Pq.probeCompressed(spark, indexDir, cb, q, k = 3, nprobe = 1,
              shortlist = Pq.coveringShortlist(spark, indexDir))))
        }
        out.toSeq
      } catch {
        // NonFatal only, and LOUD: silently missing split keys would hide
        // exactly the probe regression this block exists to attribute
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] split index timing failed: $e")
          Seq.empty
      }
    // seconds at 4 dp: sub-0.1ms digits are noise, and halving the record
    // line's length doubles what survives a truncated capture
    def fmt(v: Double): String = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = (results ++ split).map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    // total sums only the FULLY-healthy rows: -1 sentinels must not
    // subtract from the comparable total, and a query that failed SOME of
    // its samples (ADVICE r10) is excluded too — its surviving-sample
    // median still prints per-query, but a degraded-sampling median must
    // not blend into a total that looks like a clean round record
    val total = fmt(results.collect { case (n, v) if v >= 0 && !failed.contains(n) => v }.sum)
    // a filtered or partially-failed run is marked IN THE DATA — its
    // total must never be mistakable for a full clean round record
    val tag = (if (only.isDefined) ""","filtered":true""" else "") +
      (if (failed.nonEmpty) s""","failed":[${failed.map("\"" + _ + "\"").mkString(",")}]""" else "")
    val record =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"$tag,"total_sec":$total}"""
    // The record prints FIRST and LAST with a per-query ledger between:
    // BENCH_r05 lost q01-q09 to a head-truncated capture, so one copy at
    // either end survives truncation from either side, and the one-line-
    // per-query ledger recovers individual numbers even if both copies
    // are cut. Identical copies: any parser taking first or last match
    // reads the same record.
    println(record)
    (results ++ split).foreach { case (k, v) => println(s"""{"bench_query":"$k","sec":${fmt(v)}}""") }
    println(record)
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }

  /** True median: average the two middles on an even sample count
    * (upper-middle alone would bias a 2-sample run toward the worse run).
    * ONE definition shared by the declared-query loop, the split index
    * timing, and the measurement benches (CurationBoundaryBench), so all
    * recorded medians stay methodologically identical (ADVICE r11).
    */
  private[graft] def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

}
