package graft.operators

import org.apache.spark.sql.functions.col

/** Per-stage wall-clock attribution for the streaming trio q179/q180/q181
  * (`runMain graft.operators.StreamStageBench <sfDir>`) — the declared
  * rows time staging + N micro-batches + engine lifecycle in one closure;
  * this dev main separates them so an optimization round knows whether
  * the seconds sit in the batch QUERY work (artifact builds, appends,
  * classification probes), the replay STAGING (bounds + two ordered
  * coalesce(1) writes), or the streaming ENGINE itself (source listing,
  * offset/commit logs, state store, trailing batch). Evidence for
  * OPTIMIZATION_r18.md.
  */
object StreamStageBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.MainSupport.localSession(
      "spark.sql.session.timeZone" -> "UTC")
    import graft.MainSupport.timed
    import graft.streaming.EventStream

    // warmup
    spark.read.parquet(s"$sfDir/documents.parquet").count()

    // ---- q181 ----
    val store = graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val artDir = java.nio.file.Files.createTempDirectory("graft_ssb_art").toString
    val tArt = timed(Incremental.buildStoreArtifacts(store, artDir))
    val batch = Incremental.batchOf(store)
    val srcDir = java.nio.file.Files.createTempDirectory("graft_ssb_src").toString
    val tStage = timed {
      batch.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(srcDir)
      batch.filter(col("doc_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(srcDir)
    }
    // the two batch classifications, BATCH transport (no streaming engine)
    val outDirB = java.nio.file.Files.createTempDirectory("graft_ssb_outb").toString
    val tClassify = timed {
      Incremental.incrementalDedupAgainstArtifacts(
        batch.filter(col("doc_id") % 2 === 0), artDir)
        .write.mode("append").parquet(outDirB)
      Incremental.incrementalDedupAgainstArtifacts(
        batch.filter(col("doc_id") % 2 =!= 0), artDir)
        .write.mode("append").parquet(outDirB)
    }
    // the same two classifications THROUGH the streaming engine
    val outDir = java.nio.file.Files.createTempDirectory("graft_ssb_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ssb_ckpt").toString
    val tStream = timed {
      val stream = spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
      val q = EventStream.classifyAgainstStore(stream, artDir, outDir, ckpt).start()
      q.awaitTermination()
    }
    val tRead = timed {
      spark.read.parquet(outDir)
        .select(col("doc_id"), col("disposition"), col("matched_store_id"))
        .orderBy(col("doc_id"))
        .write.mode("overwrite").format("noop").save()
    }
    println(f"[q181] artifacts=$tArt%.2f stage=$tStage%.2f classify_batch2x=$tClassify%.2f " +
      f"stream2x=$tStream%.2f readback=$tRead%.2f engine_overhead=${tStream - tClassify}%.2f")

    // ---- q180 ----
    val emb = graft.Tables.embeddings(spark, sfDir)
    val indexDir = java.nio.file.Files.createTempDirectory("graft_ssb_idx").toString
    val tBuild = timed(IvfIndex.build(spark, emb, indexDir))
    val modified = IvfIndex.upsertStratumOf(emb)
    val half = IvfIndex.UpsertStratumMod * 2
    val src2 = java.nio.file.Files.createTempDirectory("graft_ssb_src2").toString
    val tStage2 = timed {
      modified.filter(col("vec_id") % half === 0).coalesce(1).write.mode("append").parquet(src2)
      modified.filter(col("vec_id") % half =!= 0).coalesce(1).write.mode("append").parquet(src2)
    }
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_ssb_ckpt2").toString
    val tStream2 = timed {
      val stream = spark.readStream.schema(modified.schema)
        .option("maxFilesPerTrigger", 1).parquet(src2)
      val q = EventStream.vectorIngest(stream, indexDir, ckpt2).start()
      q.awaitTermination()
    }
    val tMaintain = timed(IvfIndex.maintain(spark, indexDir, debtRatio = 1.0))
    val tProbe = timed {
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      IvfIndex.probe(spark, indexDir, queries, k = 3, nprobe = 1)
        .write.mode("overwrite").format("noop").save()
    }
    println(f"[q180] build=$tBuild%.2f stage=$tStage2%.2f stream_appends=$tStream2%.2f " +
      f"maintain=$tMaintain%.2f probe=$tProbe%.2f")

    // ---- q179 ----
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$sfDir/events.parquet"
    val batchEv = graft.Tables.normalizeEventTs(spark, spark.read.parquet(path))
    val tBounds = timed(batchEv.agg(org.apache.spark.sql.functions.min(col("ts")),
      org.apache.spark.sql.functions.max(col("ts"))).head())
    val bounds = batchEv.agg(org.apache.spark.sql.functions.min(col("ts")),
      org.apache.spark.sql.functions.max(col("ts"))).head()
    val mid = new java.sql.Timestamp(
      (bounds.getTimestamp(0).getTime + bounds.getTimestamp(1).getTime) / 2)
    val src3 = java.nio.file.Files.createTempDirectory("graft_ssb_src3").toString
    val tStage3 = timed {
      batchEv.filter(col("ts") < org.apache.spark.sql.functions.lit(mid))
        .coalesce(1).write.mode("append").parquet(src3)
      batchEv.filter(col("ts") >= org.apache.spark.sql.functions.lit(mid))
        .coalesce(1).write.mode("append").parquet(src3)
    }
    def runQ179Stream(tag: String): Double = timed {
      val events = spark.readStream
        .schema(batchEv.select(col("ts"), col("event_type"), col("value")).schema)
        .option("maxFilesPerTrigger", 1).parquet(src3)
      val q = EventStream.windowedEventCounts(events).writeStream
        .format("memory").queryName(s"ssb_q179_$tag")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val tStream3 = runQ179Stream("a")
    val tStream3b = runQ179Stream("b")
    val tStream3c = runQ179Stream("c")
    // EXPERIMENT (dev-only): is the per-batch floor the 32-partition state
    // store, or fixed per-batch machinery (listing, offset/commit logs,
    // incremental replanning)? Shrink shuffle partitions for one run.
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    val tStream3d = try runQ179Stream("d") finally
      spark.conf.set("spark.sql.shuffle.partitions", saved)
    println(f"[q179] bounds=$tBounds%.2f stage=$tStage3%.2f " +
      f"stream3batches=$tStream3%.2f warm=$tStream3b%.2f warm2=$tStream3c%.2f p4=$tStream3d%.2f")
    spark.stop()
  }
}
