package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.HashRing

/** q166 consistent hashing: the only-steals elasticity property and a
  * brute-force successor mirror.
  */
class HashRingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q166: adding a node only STEALS keys — no old node gains, loads conserve") {
    val out = HashRing.consistentHashRing(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSeq == (0L until HashRing.NodesAfter.toLong))
    val total = Tables.documents(spark, TestSpark.Sf0001).count()
    assert(out.map(_._2).sum == total && out.map(_._3).sum == total,
      "both rings must place every key exactly once")
    out.filter(_._1 < HashRing.NodesBefore).foreach { case (n, n4, n5, gained) =>
      assert(gained == 0L, s"old node $n must not gain keys on expansion")
      assert(n5 <= n4, s"old node $n can only lose keys")
    }
    val newNode = out.find(_._1 == HashRing.NodesBefore.toLong).get
    assert(newNode._2 == 0L && newNode._4 == newNode._3,
      "the new node's entire load is gained keys")
    assert(newNode._3 > 0L, "the new node must take a nonzero share")
  }

  test("q166: assignment matches a brute-force successor scan over the ring") {
    import spark.implicits._
    val md = java.security.MessageDigest.getInstance("MD5")
    def kp(id: Long): Long = java.lang.Long.parseLong(
      md.digest(s"key:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 8), 16)
    val r5 = HashRing.ring(HashRing.NodesAfter)
    def succ(k: Long): Long =
      r5.find(_._1 >= k).getOrElse(r5.head)._2.toLong
    val ids = (0L until 200L)
    val got = ids.toDF("doc_id")
      .select(col("doc_id"),
        HashRing.assignCol(HashRing.NodesAfter,
          conv(substring(md5(concat(lit("key:"), col("doc_id"))), 1, 8), 16, 10)
            .cast("long")).as("node"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.foreach { id =>
      assert(got(id) == succ(kp(id)), s"key $id: successor mismatch")
    }
  }
}
