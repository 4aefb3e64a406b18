package graft

import scala.util.Random

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TopK

class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bounded-heap aggregator equals the window row_number formulation, ties included") {
    val rnd = new Random(13)
    // Duplicate scores on purpose so tie-breaking (ascending id) is exercised.
    val rows = for {
      qid <- 0 until 8
      id  <- 0 until 200
    } yield (qid.toLong, id.toLong, math.floor(rnd.nextDouble() * 20) / 20.0)
    val df = rows.toDF("qid", "id", "score").repartition(7)

    val k  = 5
    val tk = TopK.topKUdaf(k)
    val viaAgg = df
      .groupBy($"qid")
      .agg(tk($"id", $"score").as("top"))
      .select($"qid", posexplode($"top"))
      .toDF("qid", "pos", "s")
      .select($"qid", $"s.id".as("id"), $"s.score".as("score"), ($"pos" + 1).cast("long").as("rank"))

    val w = Window.partitionBy($"qid").orderBy($"score".desc, $"id".asc)
    val viaWindow = df
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k)
      .select($"qid", $"id", $"score", $"rank")

    val a = viaAgg.orderBy("qid", "rank").collect().toSeq
    val b = viaWindow.orderBy("qid", "rank").collect().toSeq
    assert(a == b)
  }

  test("groups smaller than k yield all their rows, ranked") {
    val df = Seq((1L, 10L, 0.5), (1L, 11L, 0.7), (2L, 20L, 0.1)).toDF("qid", "id", "score")
    val tk = TopK.topKUdaf(5)
    val got = df.groupBy($"qid").agg(tk($"id", $"score").as("top"))
      .select($"qid", posexplode($"top")).toDF("qid", "pos", "s")
      .select($"qid", $"s.id", ($"pos" + 1).as("rank"))
      .orderBy("qid", "rank").as[(Long, Long, Int)].collect().toSeq
    assert(got == Seq((1L, 11L, 1), (1L, 10L, 2), (2L, 20L, 1)))
  }
}
