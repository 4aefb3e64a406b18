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

  // COMPILE-TIME physical plan (the AdaptiveSparkPlan's Initial Plan
  // section) with expression/plan/codegen-span/query-stage ids scrubbed —
  // two routes that compile to the same operators over the same
  // expressions normalize to one string; a real divergence (extra
  // shuffle, different join strategy, different aggregate placement)
  // still differs. The initial plan, DELIBERATELY: AQE's runtime
  // re-planning picks join build sides from measured stage sizes, and on
  // near-equal tiny sides that choice can differ between two executions
  // of the SAME compiled plan (q182's pair/order join flipped
  // BuildLeft/BuildRight between a standalone and a full-suite run) —
  // runtime adaptivity is orthogonal to the route-identity claim this
  // pin makes. Callers must have EXECUTED the frame already (reading the
  // plan here instead of re-collecting keeps the suite at one execution
  // per frame).
  private def normPlan(df: org.apache.spark.sql.DataFrame): String = {
    val full = df.queryExecution.executedPlan.toString
    val marker = "== Initial Plan =="
    val at = full.indexOf(marker)
    (if (at >= 0) full.substring(at + marker.length) else full)
      .replaceAll("#\\d+L?", "#x")
      .replaceAll("plan_id=\\d+", "plan_id=x")
      .replaceAll("\\[id=#x\\]", "")
      .replaceAll("\\*\\(\\d+\\)", "*(n)")
      .replaceAll("QueryStage \\d+", "QueryStage n")
      // _wN: the analyzer's extracted-window-argument alias counter — its
      // start index differs between the SQL and DataFrame front-ends for
      // the same expressions; the alias is internal and meaningless
      .replaceAll("_w\\d+", "_wx")
      .replaceAll("(?m)\\s+$", "")
  }

  test("relational rows q26/q146/q162/q173/q174/q175/q182: the SQL text and the DataFrame core compile to one plan") {
    import graft.operators.{Relational, RelationalSql}
    val pairs: Seq[(String, org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)] = Seq(
      ("q26", RelationalSql.pricingSummary(spark, TestSpark.Sf0001),
        Relational.pricingSummary(spark, TestSpark.Sf0001)),
      ("q146", RelationalSql.shippingPriority(spark, TestSpark.Sf0001),
        Relational.shippingPriority(spark, TestSpark.Sf0001)),
      ("q162", RelationalSql.customerDistribution(spark, TestSpark.Sf0001),
        Relational.customerDistribution(spark, TestSpark.Sf0001)),
      ("q173", RelationalSql.smallQtyRevenue(spark, TestSpark.Sf0001),
        Relational.smallQtyRevenue(spark, TestSpark.Sf0001)),
      ("q174", RelationalSql.bigOrderCustomers(spark, TestSpark.Sf0001),
        Relational.bigOrderCustomers(spark, TestSpark.Sf0001)),
      ("q175", RelationalSql.idleRichCustomers(spark, TestSpark.Sf0001),
        Relational.idleRichCustomers(spark, TestSpark.Sf0001)),
      ("q182", RelationalSql.waitingSuppliers(spark, TestSpark.Sf0001),
        Relational.waitingSuppliers(spark, TestSpark.Sf0001)))
    pairs.foreach { case (name, sqlDf, coreDf) =>
      assert(sqlDf.columns.toSeq == coreDf.columns.toSeq, s"$name: column names must match")
      assert(sqlDf.collect().toSeq == coreDf.collect().toSeq,
        s"$name: the SQL route must be row-identical to the DataFrame core")
      val (sp, cp) = (normPlan(sqlDf), normPlan(coreDf))
      assert(sp == cp, s"$name: SQL and DataFrame forms must compile to IDENTICAL physical plans;\nSQL:\n$sp\nCORE:\n$cp")
    }
  }

  test("a pre-existing user temp view on a reserved graft_ name fails fast and is preserved") {
    // ADVICE r16: createOrReplaceTempView + finally-drop would silently
    // CLOBBER a user's same-named view and then destroy it — the surface
    // must fail fast instead, leaving the user's view untouched.
    spark.range(3).toDF("x").createOrReplaceTempView("graft_lineitem")
    try {
      val e = intercept[IllegalArgumentException] {
        graft.operators.RelationalSql.pricingSummary(spark, TestSpark.Sf0001)
      }
      assert(e.getMessage.contains("graft_lineitem"))
      assert(spark.table("graft_lineitem").count() == 3,
        "the user's colliding view must survive the failed call unchanged")
    } finally spark.catalog.dropTempView("graft_lineitem")
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
