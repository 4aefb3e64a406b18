package graft

/** Fork-per-query benchmark mode (VERDICT r11 item 2): one FRESH JVM per
  * declared query, each child being a single-key `graft.Bench` run
  * (`SPARK_GRAFT_BENCH_ONLY=<key>`), aggregated into the same record JSON
  * shape with `"mode":"fork"`.
  *
  * Why: the round-11 boundary study proved in-suite per-row numbers
  * inflate ×2–3 from JVM aging (repeated heavy executions degrade
  * uniformly inside one JVM — q92 measured 61.9 s in-suite vs 21.1 s
  * solo at sf1), and every round since has paid a noise-reconciliation
  * tax re-litigating outlier rows. A production pipeline runs one job
  * per JVM; this mode makes per-row records production-shaped. Each
  * child still runs Bench's warmup (`SparkEntry.entry`) first, so
  * JVM/codegen startup is charged to the warmup, not the measured query
  * — the numbers isolate "a warm single-purpose JVM running THIS query".
  *
  * Cost: ~10–15 s of JVM+Spark startup per query on this machine —
  * the certification mode, not the dev loop (the in-suite total remains
  * the comparable cross-round headline; fork mode makes the PER-ROW
  * numbers trustworthy).
  *
  * Env: `SPARK_GRAFT_SF_DIR`, `SPARK_GRAFT_BENCH_SAMPLES`,
  * `SPARK_GRAFT_BENCH_ONLY` pass through to the children (the only
  * filter also gates which children spawn).
  */
object ForkBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { keys =>
      val unknown = keys -- SparkEntry.queries.keySet
      require(keys.nonEmpty && unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY: empty or unknown keys [${unknown.mkString(",")}]")
    }
    val selected = only.fold(SparkEntry.queries.keySet)(SparkEntry.queries.keySet.intersect)
      .toSeq.sorted

    // reproduce this JVM's launch configuration for the children: same
    // classpath, same --add-opens/-Xmx/-D flags (sbt's fork options)
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
      .filterNot(a => a.startsWith("-agentlib") || a.startsWith("-javaagent"))
    val classpath = System.getProperty("java.class.path")

    val ledger = new scala.util.matching.Regex(
      """\{"bench_query":"([^"]+)","sec":(-?[0-9.]+)\}""", "key", "sec")
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = selected.map { name =>
      val cmd = Seq(javaBin) ++ jvmArgs ++ Seq("-cp", classpath, "graft.Bench")
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_GRAFT_BENCH_ONLY", name)
      pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
      sys.env.get("SPARK_GRAFT_BENCH_SAMPLES")
        .foreach(pb.environment().put("SPARK_GRAFT_BENCH_SAMPLES", _))
      pb.redirectErrorStream(false)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val proc = pb.start()
      val out = scala.io.Source.fromInputStream(proc.getInputStream).mkString
      val rc = proc.waitFor()
      val sec = ledger.findAllMatchIn(out)
        .collectFirst { case m if m.group("key") == name => m.group("sec").toDouble }
      (rc, sec) match {
        case (0, Some(s)) if s >= 0 =>
          println(s"""{"fork_query":"$name","sec":$s}""")
          name -> s
        case _ =>
          failed += name
          System.err.println(s"[forkbench] $name FAILED (rc=$rc, parsed=$sec)")
          println(s"""{"fork_query":"$name","sec":-1.0}""")
          name -> -1.0
      }
    }
    def fmt(v: Double): String =
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val total = fmt(results.collect { case (_, v) if v >= 0 => v }.sum)
    val tag = (if (only.isDefined) ""","filtered":true""" else "") +
      (if (failed.nonEmpty) s""","failed":[${failed.map("\"" + _ + "\"").mkString(",")}]""" else "")
    println(s"""{"metric":"total","value":$total,"unit":"sec","mode":"fork","queries":$qs,"sf":"$sfDir"$tag,"total_sec":$total}""")
    if (failed.nonEmpty) sys.exit(1)
  }
}
