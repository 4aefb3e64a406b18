package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextPipeline.tokenArr

/** Measures the re-architected BPE training loop (`runMain
  * graft.operators.BpeTrainBench <sfDir> [merges=20]`): the one corpus
  * aggregate into the word-type frequency table, then per-merge cost
  * over that table — the BASELINE.md evidence that per-merge cost is a
  * function of |types| (Heaps-bounded), not |corpus|. For contrast it
  * also times ONE count+merge round at token-INSTANCE level (the
  * round-7 architecture), which rescans the corpus every merge and
  * grows linearly with it.
  *
  * Caveat the ladder honestly: GenScale replicates text through affine
  * substitution, so type counts grow faster here (near-linearly) than a
  * real corpus' Heaps curve — the measured per-merge cost at sfN is an
  * UPPER bound on a real corpus of the same size.
  */
object BpeTrainBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val merges = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = graft.MainSupport.localSession()
    import graft.MainSupport.timed
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")

    val instances = docs.select(explode(tokenArr(col("text"))).as("t"))
      .filter(length(col("t")) >= 2).count()

    // the ONE corpus aggregate (timed with its checkpoint materialization)
    var types: DataFrame = null
    val tTable = timed {
      types = Bpe.typeSymbols(Bpe.wordTypesOf(docs)).localCheckpoint(true)
    }
    val nTypes = types.count()

    // merge loop over the type table, per-round wall clock
    val perMerge = Array.newBuilder[Double]
    for (_ <- 1 to merges) {
      val t = timed {
        val top = Bpe.pairCounts(types)
          .orderBy(col("n").desc, col("c1"), col("c2"))
          .limit(1).collect()
        val (c1, c2) = (top(0).getString(0), top(0).getString(1))
        val next = types
          .select(expr(Bpe.mergePairExpr(c1, c2)).as("cs"), col("freq"))
          .localCheckpoint(true)
        types.unpersist()
        types = next
      }
      perMerge += t
    }
    val ts = perMerge.result().sorted
    val med = ts(ts.length / 2)
    val total = ts.sum

    // round-7 architecture floor: ONE instance-level count+merge round
    var inst: DataFrame = null
    val tInstTable = timed {
      inst = docs.select(explode(tokenArr(col("text"))).as("token"))
        .filter(length(col("token")) >= 2)
        .select(expr("regexp_extract_all(token, '(.)', 1)").as("cs"), lit(1L).as("freq"))
        .localCheckpoint(true)
    }
    val tInstMerge = timed {
      val top = Bpe.pairCounts(inst)
        .orderBy(col("n").desc, col("c1"), col("c2"))
        .limit(1).collect()
      val (c1, c2) = (top(0).getString(0), top(0).getString(1))
      inst.select(expr(Bpe.mergePairExpr(c1, c2)).as("cs"), col("freq"))
        .localCheckpoint(true).unpersist()
    }
    inst.unpersist()
    types.unpersist()

    println(f"[bpetrain] dir=$sfDir instances=$instances types=$nTypes " +
      f"table=$tTable%.2fs merges=$merges merge_total=$total%.2fs merge_med=$med%.3fs " +
      f"legacy_table=$tInstTable%.2fs legacy_per_merge=$tInstMerge%.2fs")
    spark.stop()
  }
}
