package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Quantize

class QuantizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("quantization error is bounded by half a step; constant vectors quantize losslessly") {
    import spark.implicits._
    val r = Quantize.quantizeInt8(spark, TestSpark.Sf0001)
      .select($"vec_id", $"lo", $"hi", $"max_err").as[(Long, Double, Double, Double)].collect()
    assert(r.nonEmpty)
    r.foreach { case (id, lo, hi, maxErr) =>
      // linear int8 quantization error bound: half a quantization step
      // (+ rounding slack from the 6-dp emitted values)
      val step = (hi - lo) / 255.0
      assert(maxErr <= step / 2 + 1e-6, s"vec $id max_err $maxErr exceeds step/2 $step")
    }
    // the degenerate codebook (hi == lo): every code 0, reconstruction
    // exactly lo — zero error, no division by the zero scale
    val const = Seq((1L, Seq(0.25f, 0.25f, 0.25f)), (2L, Seq(0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val cr = Quantize.quantizeStats(const)
      .select($"vec_id", $"code_sum", $"mae", $"max_err")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(cr == Seq((1L, 0L, 0.0, 0.0), (2L, 0L, 0.0, 0.0)))
  }

  test("reconstructed vectors preserve cosine top-k: recall vs exact search") {
    import spark.implicits._
    import graft.functions.GraftFunctions
    import graft.functions.VectorFunctions._
    GraftFunctions.ensureRegistered(spark)

    val e = Tables.embeddings(spark, TestSpark.Sf0001)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    // quantize + reconstruct inline (each bound in its own projection)
    val recon = e
      .select(col("vec_id"), col("v"), array_min(col("v")).as("lo"), array_max(col("v")).as("hi"))
      .withColumn("scale", (col("hi") - col("lo")) / lit(255.0))
      .select(col("vec_id"), col("v"), col("lo"), col("scale"),
        when(col("scale") === lit(0.0), col("v"))
          .otherwise(transform(col("v"),
            x => col("lo") + round((x - col("lo")) / col("scale"), 0) * col("scale"))).as("rv"))

    val queries = recon.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("v").as("qv"))
    def topk(vecCol: String): Map[Long, Set[Long]] =
      queries.crossJoin(recon.select(col("vec_id"), col(vecCol).as("cv")))
        .select(col("qid"), col("vec_id"), GraftFunctions.cosine(col("qv"), col("cv")).as("s"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
            .orderBy(col("s").desc, col("vec_id").asc)))
        .filter(col("rn") <= 5).select($"qid", $"vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    val exact = topk("v")
    val viaQuantized = topk("rv")
    val recall = exact.map { case (q, ids) => (ids & viaQuantized(q)).size.toDouble / ids.size }
      .sum / exact.size
    assert(recall >= 0.9, s"int8 reconstruction should barely perturb top-5 (recall $recall)")
  }
}
