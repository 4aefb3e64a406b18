package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** The SQL-only user path: fixture tables as temp views + graft functions
  * callable from spark.sql.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("graft_cosine is callable from SQL and k-NN is expressible as pure SQL") {
    GraftFunctions.ensureRegistered(spark)
    val v = spark.sql("SELECT graft_cosine(array(1.0D, 0.0D), array(0.0D, 1.0D))").head().getDouble(0)
    assert(v == 0.0)

    Tables.embeddings(spark, TestSpark.Sf0001).createOrReplaceTempView("embeddings")
    val knn = spark.sql(
      """SELECT qid, vec_id, score FROM (
        |  SELECT q.vec_id AS qid, c.vec_id,
        |         round(graft_cosine(cast(q.embedding AS array<double>), cast(c.embedding AS array<double>)), 6) AS score,
        |         row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |           round(graft_cosine(cast(q.embedding AS array<double>), cast(c.embedding AS array<double>)), 6) DESC,
        |           c.vec_id) AS rank
        |  FROM (SELECT * FROM embeddings WHERE vec_id < 3) q CROSS JOIN embeddings c
        |) WHERE rank <= 5 ORDER BY qid, rank""".stripMargin)
      .collect()
    assert(knn.length == 15)
    // top hit for each query is the query itself at similarity 1.0
    val self = knn.filter(r => r.getLong(0) == r.getLong(1))
    assert(self.length == 3 && self.forall(_.getDouble(2) == 1.0))
  }

  test("q01's declared implementation routes through spark.sql and matches the DataFrame core") {
    import org.apache.spark.sql.functions.col
    val sqlOut = graft.operators.Knn.knnTopkCosine(spark, TestSpark.Sf0001).collect()
    val emb = Tables.embeddings(spark, TestSpark.Sf0001)
    val dfOut = graft.operators.Knn.topK(
      emb.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("embedding").as("qvec")),
      emb.select(col("vec_id"), col("embedding")), 5).collect()
    assert(sqlOut.length == 50 && sqlOut.toSeq == dfOut.toSeq,
      "the SQL route must be row-identical to the bounded-heap DataFrame core")
  }

  test("graft_l2_normalize is callable from SQL and emits unit vectors") {
    GraftFunctions.ensureRegistered(spark)
    val row = spark.sql(
      "SELECT graft_l2_normalize(array(3.0D, 4.0D)) AS u, graft_l2_normalize(array(0.0D, 0.0D)) AS z")
      .head()
    assert(row.getSeq[Double](0) == Seq(0.6, 0.8))
    assert(row.getSeq[Double](1) == Seq(0.0, 0.0))
  }

  test("bloom filter functions are callable from SQL: build on one set, probe another") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    (0 until 100).map(i => s"member$i").toDF("w").createOrReplaceTempView("members")
    // members must all hit; the disjoint probe set should ~all miss
    // (fpp bounded well below 1 at 10 bits/element)
    // the bloom side must be a constant or scalar subquery (the
    // BloomFilterMightContain contract) — hence (SELECT ... ) inline
    val r = spark.sql(
      """WITH bf AS (
        |  SELECT graft_bloom_agg(xxhash64(w), 100L, 1000L) AS b FROM members
        |)
        |SELECT
        |  (SELECT COUNT(*) FROM members m
        |   WHERE graft_bloom_might_contain((SELECT b FROM bf), xxhash64(m.w))) AS hits,
        |  (SELECT COUNT(*) FROM (SELECT concat('other', w) AS w FROM members) o
        |   WHERE graft_bloom_might_contain((SELECT b FROM bf), xxhash64(o.w))) AS false_hits""".stripMargin)
      .head()
    assert(r.getLong(0) == 100, "every member must hit its own bloom filter")
    assert(r.getLong(1) < 50, s"a disjoint set must mostly miss; got ${r.getLong(1)}/100 false positives")
  }
}
