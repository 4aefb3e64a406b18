package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextPipeline

/** Source/sink surface beyond parquet (SURVEY.md §2A S7/S8): the JSON vocab
  * artifact round-trip (reference: transformer_sample.py:395-411 tokenizer
  * JSON save/load), binary-file ingestion (reference: text_img.py:32 local
  * image load), and CSV interchange.
  */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("vocab JSON artifact round-trips losslessly (tokenizer save/load)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vocab_json").toString
    val vocab = TextPipeline.vocabBuild(spark, TestSpark.Sf0001)
    TextPipeline.saveVocab(vocab, dir)
    val back = TextPipeline.loadVocab(spark, dir)
    // JSON carries no nullability metadata, so compare names + types only
    assert(back.schema.map(f => (f.name, f.dataType)) == vocab.schema.map(f => (f.name, f.dataType)))
    val a = vocab.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val b = back.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("binaryFile source reads raw files with metadata") {
    val df = spark.read.format("binaryFile")
      .load(s"${TestSpark.Sf0001}/documents.parquet")
    val row = df.select("path", "length", "content").head()
    assert(row.getAs[Long]("length") > 0)
    assert(row.getAs[Array[Byte]]("content").length == row.getAs[Long]("length"))
  }

  test("fixture tables load with the expected logical schemas (drift guard)") {
    // The fixtures are regenerated between rounds and the physical parquet
    // types can drift (round 9: events.ts silently moved from
    // TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and killed 10 queries with an
    // opaque DATATYPE_MISMATCH five frames deep). This pins the LOGICAL
    // schema each Tables.* loader must present to the operators, so a
    // future drift fails here with a named one-line diagnosis.
    import org.apache.spark.sql.types._
    val sf = TestSpark.Sf0001
    val expected: Map[String, Seq[(String, DataType)]] = Map(
      "region"   -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
      "nation"   -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
        "n_regionkey" -> IntegerType),
      "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
        "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType),
      "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
        "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
      "part"     -> Seq("p_partkey" -> LongType, "p_name" -> StringType, "p_brand" -> StringType,
        "p_type" -> StringType, "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
      "orders"   -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
        "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
        "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
      "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
        "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
        "l_discount" -> DoubleType, "l_tax" -> DoubleType, "l_returnflag" -> StringType,
        "l_linestatus" -> StringType, "l_shipdate" -> TimestampNTZType),
      // events.ts is the one loader-NORMALIZED column: whatever the
      // physical fixture type (long nanos, TIMESTAMP_NTZ, timestamp),
      // operators must see a session-zone TimestampType.
      "events"   -> Seq("event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
        "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType),
      "documents" -> Seq("doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
        "source" -> StringType, "n_chars" -> LongType),
      "embeddings" -> Seq("vec_id" -> LongType,
        "embedding" -> ArrayType(FloatType, containsNull = true), "label" -> IntegerType)
    )
    val loaders: Map[String, org.apache.spark.sql.DataFrame] = Map(
      "region" -> Tables.region(spark, sf), "nation" -> Tables.nation(spark, sf),
      "customer" -> Tables.customer(spark, sf), "supplier" -> Tables.supplier(spark, sf),
      "part" -> Tables.part(spark, sf), "orders" -> Tables.orders(spark, sf),
      "lineitem" -> Tables.lineitem(spark, sf), "events" -> Tables.events(spark, sf),
      "documents" -> Tables.documents(spark, sf), "embeddings" -> Tables.embeddings(spark, sf))
    expected.foreach { case (table, cols) =>
      val actual = loaders(table).schema.map(f => f.name -> f.dataType)
      assert(actual == cols, s"fixture table '$table' drifted: loader presents $actual")
    }
  }

  test("Tables.events normalizes a long-nanos fixture (the legacy physical type)") {
    // The current fixtures ship TIMESTAMP(MICROS); earlier generations were
    // TIMESTAMP(NANOS), which the nanosAsLong flag surfaces as LongType.
    // Keep that branch live: an events layout whose ts column is raw nanos
    // longs must come out as the same session-zone TimestampType schema.
    import org.apache.spark.sql.functions.{col, expr}
    val sess = spark
    import sess.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_events_nanos").toString
    val micros = 1704067200000000L // 2024-01-01T00:00:00 UTC
    Seq((1L, micros * 1000L, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    val got = df.select(expr("unix_micros(ts)")).head().getLong(0)
    assert(got == micros, s"nanos->micros conversion drifted: $got != $micros")
    assert(df.select(col("event_id")).head().getLong(0) == 1L)
  }

  test("Tables.events refuses an NTZ fixture under a non-UTC session zone") {
    // ADVICE r10: the NTZ->TZ cast reinterprets naive micros in the
    // SESSION zone, so it is value-preserving only under UTC. An entry
    // point that forgets the UTC pin must get a named failure, not
    // silently shifted timestamps.
    import org.apache.spark.sql.functions.{col, expr}
    val dir = java.nio.file.Files.createTempDirectory("graft_events_ntz").toString
    val micros = 1704067200000000L // 2024-01-01T00:00:00 UTC
    spark.range(1).select(
      expr("1L").as("event_id"),
      expr(s"timestamp_micros(${micros}L)").cast("timestamp_ntz").as("ts"),
      expr("7L").as("user_id"),
      expr("'click'").as("event_type"),
      expr("1.5d").as("value"),
      expr("'{}'").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // sanity: the fixture really surfaces as NTZ
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val pinned = spark.conf.get("spark.sql.session.timeZone")
    assert(pinned == "UTC")
    // under the pin the load works and preserves the instant
    assert(Tables.events(spark, dir).select(expr("unix_micros(ts)")).head().getLong(0) == micros)
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val e = intercept[IllegalArgumentException] { Tables.events(spark, dir).collect() }
      assert(e.getMessage.contains("session.timeZone=UTC"),
        s"expected the named UTC guard, got: ${e.getMessage}")
    } finally spark.conf.set("spark.sql.session.timeZone", pinned)
  }

  test("csv sink/source round-trips the text-stats table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val stats = TextPipeline.textStats(spark, TestSpark.Sf0001)
    stats.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(dir)
    assert(back.count() == stats.count())
    assert(back.columns.sorted.toSeq == stats.columns.sorted.toSeq)
    val origSum = stats.agg(sum("n_tokens")).head().getLong(0)
    val backSum = back.agg(sum("n_tokens")).head().getLong(0)
    assert(origSum == backSum)
  }
}
