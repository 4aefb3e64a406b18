package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ShardShuffle

/** q81 deterministic training shuffle: reproducible permutation, dense
  * per-shard ranks, real scatter, and a write path that replays the same
  * order without any window.
  */
class ShardShuffleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("permutation is deterministic and per-shard ranks are dense 1..count") {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val a = ShardShuffle.shardShuffleOf(docs, 16).as[(Long, Long, Long)].collect()
    val b = ShardShuffle.shardShuffleOf(docs, 16).as[(Long, Long, Long)].collect()
    assert(a.sameElements(b), "re-run must be bit-identical")
    assert(a.length == docs.count())
    a.groupBy(_._2).foreach { case (shard, rows) =>
      val ranks = rows.map(_._3).sorted
      assert(ranks.sameElements(1L to rows.length.toLong),
        s"shard $shard ranks not dense: ${ranks.take(5).mkString(",")}…")
    }
  }

  test("consecutive doc_ids scatter across shards (it is a shuffle, not a split)") {
    import spark.implicits._
    val byId = ShardShuffle.shardShuffleOf(Tables.documents(spark, TestSpark.Sf0001), 16)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val samePairs = byId.sliding(2).count { case Array(x, y) => x._2 == y._2 }
    val frac = samePairs.toDouble / (byId.length - 1)
    assert(frac < 0.3, f"adjacent ids co-sharded at $frac%.2f — not shuffled (expect ≈ 1/16)")
  }

  test("writeShards replays the declared permutation with no window in its plan") {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    ShardShuffle.writeShards(docs, dir, 16)
    val back = spark.read.parquet(dir)
    // reading one shard in file order must yield exactly the declared
    // per-shard order (parquet preserves within-file row order; each
    // shard is one file because we repartitioned by shard before writing)
    val declared = ShardShuffle.shardShuffleOf(docs, 16)
      .filter(col("shard") === 3).orderBy(col("pos"))
      .select(col("doc_id")).as[Long].collect().toList
    val filed = back.filter(col("shard") === 3)
      .select(col("doc_id")).as[Long].collect().toList
    assert(filed == declared, s"shard-3 file order diverges from declared permutation")
    assert(back.count() == docs.count())
  }

  test("epochs reshuffle: epoch 1 is a different deterministic permutation; epoch 0 is the declared one") {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val e0 = ShardShuffle.shardShuffleOf(docs, 16).as[(Long, Long, Long)].collect()
    val e0again = ShardShuffle.shardShuffleOf(docs, 16, epoch = 0L).as[(Long, Long, Long)].collect()
    assert(e0.sameElements(e0again), "epoch 0 must be the declared layout")
    val e1 = ShardShuffle.shardShuffleOf(docs, 16, epoch = 1L).as[(Long, Long, Long)].collect()
    assert(!e0.sameElements(e1), "epoch 1 must be a different permutation")
    assert(e1.length == e0.length)
    e1.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.sameElements(1L to rows.length.toLong),
        s"epoch-1 shard $shard ranks not dense")
    }
  }

  test("the rank window partitions by shard — never a single global ordering") {
    val p = ShardShuffle.shardShuffleOf(Tables.documents(spark, TestSpark.Sf0001), 16)
      .queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(shard"),
      s"window exchange must hash by shard;\n$p")
    assert(!p.contains("SinglePartition") || p.indexOf("Window") < 0 ||
      !p.substring(0, p.indexOf("Window")).contains("SinglePartition"),
      s"no single-partition exchange may feed the window;\n$p")
  }
}
