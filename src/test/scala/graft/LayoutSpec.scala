package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

/** q156 z-order layout + q157 compaction plan: the skipping bound the
  * interleave exists for, a brute-force Morton mirror, the execution
  * path's partition disjointness, and the packing invariants.
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q156: every file spans <= 16 of 256 buckets on BOTH dims, and covers all rows") {
    val ev = Tables.events(spark, TestSpark.Sf0001)
    val out = Layout.zorderLayoutOf(ev).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (fid, zMin, zMax) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(zMin >= fid * Layout.ZCellsPerFile && zMax < (fid + 1) * Layout.ZCellsPerFile,
        s"file $fid: z range [$zMin,$zMax] escapes its cell block")
      // fixing the file fixes the top 4 bits of both dims -> span <= 15
      assert(r.getLong(5) - r.getLong(4) <= 15, s"file $fid: ux span exceeds the skipping bound")
      assert(r.getLong(7) - r.getLong(6) <= 15, s"file $fid: tx span exceeds the skipping bound")
    }
    assert(out.map(_.getLong(1)).sum == ev.count(), "plan must cover every event row")
  }

  test("zInterleave equals the brute-force Morton code over the full 8-bit grid corners") {
    import spark.implicits._
    val pts = for (x <- Seq(0L, 1L, 5L, 127L, 128L, 255L); y <- Seq(0L, 2L, 85L, 170L, 255L))
      yield (x, y)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zInterleave(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def morton(x: Long, y: Long): Long =
      (0 until Layout.ZBits).map(b => (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))).sum
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == morton(x, y), s"z($x,$y)")
    }
  }

  test("writeZOrdered: partition z intervals are sorted within and disjoint across files") {
    val ev = Tables.events(spark, TestSpark.Sf0001)
    val coords = ev.select((col("user_id") % 256).as("ux"),
      (expr("unix_micros(ts) div 3600000000") % 256).as("tx"))
    val ranges = Layout.writeZOrdered(coords, Layout.zInterleave(col("ux"), col("tx")), 8)
      .select(col("_z"))
      .rdd.mapPartitions { it =>
        val zs = it.map(_.getLong(0)).toSeq
        if (zs.isEmpty) Iterator.empty
        else {
          assert(zs.zip(zs.tail).forall { case (a, b) => a <= b }, "file not sorted by z")
          Iterator.single((zs.head, zs.last))
        }
      }.collect().sortBy(_._1)
    assert(ranges.nonEmpty)
    ranges.zip(ranges.tail).foreach { case ((_, hi), (lo, _)) =>
      assert(hi <= lo, "file z intervals must not overlap")
    }
  }

  test("q157: packing covers the corpus, shards are id-ordered, boundaries honor the target") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val out = Layout.compactionPlanOf(docs, Layout.CompactTarget)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.map(_._3).sum == docs.count(), "every doc lands in exactly one shard")
    out.groupBy(_._1).foreach { case (src, shards) =>
      val s = shards.sortBy(_._2)
      // id ranges ordered and disjoint across consecutive shards
      s.zip(s.tail).foreach { case (a, b) =>
        assert(a._6 < b._5, s"$src: shard ${a._2} id range overlaps shard ${b._2}")
        assert(a._2 < b._2, s"$src: shard_seq must increase")
      }
      // prefix-sum packing: when shard k+1 exists, the cumulative payload
      // through shard k has crossed shard k+1's starting boundary
      s.zip(s.tail).foreach { case (a, b) =>
        val through = s.takeWhile(_._2 <= a._2).map(_._4).sum
        assert(through >= b._2 * Layout.CompactTarget,
          s"$src: cumulative ${through} through shard ${a._2} below shard ${b._2}'s boundary")
      }
    }
  }
}
