package graft.operators

/** Measures q86's two encode paths (`runMain graft.operators.BpeEncodeBench
  * <sfDir> [chainRepeat=1]`): the scan-local native-expression encode vs
  * the type-factorized broadcast-join path, at the pinned 12-merge table
  * and at `chainRepeat`× that depth (the production-vocab regime the
  * type path exists for — per-token cost is O(depth × len), so depth is
  * the knob that flips the winner).
  */
object BpeEncodeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val repeat = args.lift(1).map(_.toInt).getOrElse(1)
    val spark = graft.MainSupport.localSession()
    import graft.MainSupport.timed
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    // repeating the pinned table re-applies already-exhausted merges:
    // identical output, depth×repeat per-token work — a clean depth knob
    val merges = Seq.fill(repeat)(Bpe.PinnedMerges).flatten
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    force(Bpe.bpeEncodeOf(docs.limit(500), merges)) // warmup
    val scanLocal = timed(force(Bpe.bpeEncodeOf(docs, merges)))
    val viaTypes = timed(force(Bpe.bpeEncodeViaTypes(docs, merges)))
    println(f"[bpeencode] dir=$sfDir depth=${merges.size} scan_local=$scanLocal%.2fs via_types=$viaTypes%.2fs")
    spark.stop()
  }
}
