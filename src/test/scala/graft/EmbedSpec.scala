package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Embed
import graft.functions.VectorFunctions

/** The embedding-UDF operator shape (SURVEY.md §2A P7–P9): one encoder init
  * per partition, deterministic output, and composability with the vector
  * operators downstream.
  */
class EmbedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("embedColumn appends a unit-norm embedding and is deterministic") {
    val docs = Tables.documents(spark, TestSpark.Sf0001).select("doc_id", "text")
    val out  = Embed.embedColumn[String](docs, "text", "embedding", Embed.hashingTextEncoder(32))
    assert(out.schema.fieldNames.toSeq == Seq("doc_id", "text", "embedding"))

    val norms = out
      .select(round(VectorFunctions.l2Norm(VectorFunctions.toDouble(col("embedding"))), 4).as("n"))
      .distinct().collect().map(_.getDouble(0))
    assert(norms.forall(n => n == 1.0 || n == 0.0))

    val a = out.select("doc_id", "embedding").collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = Embed.embedColumn[String](docs, "text", "embedding", Embed.hashingTextEncoder(32))
      .select("doc_id", "embedding").collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a == b && a.nonEmpty)
  }

  test("encoder factory runs once per partition, not per row") {
    val inits = spark.sparkContext.longAccumulator("encoder_inits")
    val docs  = Tables.documents(spark, TestSpark.Sf0001)
      .select("doc_id", "text").repartition(4)
    val factory: () => String => Array[Float] = () => {
      inits.add(1) // the "model load"
      Embed.hashingTextEncoder(8)()
    }
    val n = Embed.embedColumn[String](docs, "text", "embedding", factory).count()
    assert(n > 4, "fixture must have more rows than partitions for this test to bite")
    assert(inits.value <= 4, s"encoder initialized ${inits.value} times for 4 partitions")
    assert(inits.value >= 1)
  }

  test("cross-modal shape: text queries retrieve from the vector corpus via shared dim") {
    // the reference's headline semantic (text_img.py): text and image
    // embeddings share one space, so ONE k-NN operator serves both
    // modalities — purely a data convention (matching dim), no operator
    // changes. Toy encoder stands in for CLIP's text tower.
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val corpus = Tables.embeddings(spark, TestSpark.Sf0001)
      .select(col("vec_id"), VectorFunctions.toDouble(col("embedding")).as("vec"))
    val queries = Seq((100L, "fast key merge"), (101L, "stream spark window")).toDF("qid", "text")
    val qEmb = Embed.embedColumn[String](queries, "text", "qvec", Embed.hashingTextEncoder(64))
    val scored = qEmb.crossJoin(corpus)
      .select(col("qid"), col("vec_id"),
        VectorFunctions.cosineSimilarity(col("qvec"), col("vec")).as("s"))
    val w = Window.partitionBy(col("qid")).orderBy(col("s").desc, col("vec_id"))
    val top = scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3).collect()
    assert(top.length == 6, "3 hits per text query")
    assert(top.forall(r => math.abs(r.getAs[Double]("s")) <= 1.0 + 1e-9))
  }

  test("embeddings compose with cosine scoring: identical text => score 1") {
    import spark.implicits._
    val pair = Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"), (3L, "completely different payload"))
      .toDF("id", "text")
    val emb = Embed.embedColumn[String](pair, "text", "embedding", Embed.hashingTextEncoder(64))
    val a   = emb.select(col("id").as("a_id"), col("embedding").as("va"))
    val b   = emb.select(col("id").as("b_id"), col("embedding").as("vb"))
    val scores = a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(VectorFunctions.cosineSimilarity(col("va"), col("vb")), 4).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(scores((1L, 2L)) == 1.0)
    assert(scores((1L, 3L)) < 1.0)
  }

  test("declared cross-modal query (q59): 5 text queries x ranked top-5 from the vector corpus") {
    val out = Embed.crossModalSearch(spark, TestSpark.Sf0001)
    assert(out.columns.toSeq == Seq("qid", "vec_id", "score", "rank"))
    val rows = out.collect()
    assert(rows.length == 25, "5 text-derived queries x top-5 hits")
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 5L).toSet)
    byQ.values.foreach { hits =>
      assert(hits.map(_.getLong(3)).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      assert(hits.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
    }
    // deterministic: the toy text tower and the search are both pure
    assert(out.collect().map(_.toSeq).toSeq == rows.map(_.toSeq).toSeq)
  }
}
