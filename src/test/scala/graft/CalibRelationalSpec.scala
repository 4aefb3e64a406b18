package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Quantize, Relational, TextAnalysis}

/** q144–q147 — quantization calibration, lang-ID confusion, the TPC-H
  * Q3 shape, and token-weighted dedup inflation.
  */
class CalibRelationalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ------------------------------------------------------------------ q144

  test("q144: per-dim moments match the closed form and a 3-sigma outlier clips") {
    // dim 1: 99 zeros + one 1000 -> mu 10, sigma sqrt(9900) ~ 99.5, the
    // 1000 sits at z ~ 9.95 and must clip; dim 2: constant -> sigma 0
    val emb = ((1 to 99).map(_ => Array(0f, 5f)) :+ Array(1000f, 5f))
      .map(Tuple1(_)).toDF("embedding")
    val out = Quantize.quantCalibrateOf(emb).collect()
      .map(r => r.getLong(0) -> r).toMap
    val mu = 10.0
    val sg = math.sqrt(1000.0 * 1000 / 100 - mu * mu)
    val d1 = out(1L)
    assert(d1.getDouble(1) == mu && d1.getDouble(2) == r6(sg))
    assert(d1.getDouble(3) == r6(mu - 3 * r6(sg)) && d1.getDouble(4) == r6(mu + 3 * r6(sg)))
    assert(d1.getLong(5) == 1L && d1.getDouble(6) == 0.01)
    val d2 = out(2L)
    assert(d2.getDouble(1) == 5.0 && d2.getDouble(2) == 0.0 && d2.getLong(5) == 0L,
      "a constant dimension has sigma 0 and clips nothing")
  }

  // ------------------------------------------------------------------ q145

  test("q145: the matrix attributes every truth row and exposes the blind language") {
    val docs = Seq(
      (1L, "the cat and the dog of it", "en"),
      (2L, "the end of the story and more", "en"),
      (3L, "der hund und die katze ist da", "zh")) // no zh profile exists
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.langidConfusionOf(docs).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(("en", "en")) == ((2L, 1.0)))
    assert(out(("zh", "de")) == ((1L, 1.0)),
      "the profile-less language must land on SOME profile — the matrix shows where")
  }

  // ------------------------------------------------------------------ q146

  test("q146: fixed-point revenue equals the float sum and the cut is top-10 ordered") {
    val out = Relational.shippingPriority(spark, TestSpark.Sf0001).collect()
    assert(out.nonEmpty && out.length <= 10)
    val revs = out.map(_.getDouble(1))
    assert(revs.sameElements(revs.sortBy(-_)), "revenue descending")
    // the fixed-point aggregate must agree with a plain double sum to
    // float tolerance for every returned order
    val cutoff = java.sql.Timestamp.valueOf(s"${Relational.ShipCutoff} 00:00:00")
    val expect = Tables.lineitem(spark, TestSpark.Sf0001)
      .filter($"l_shipdate" > cutoff)
      .groupBy($"l_orderkey")
      .agg(org.apache.spark.sql.functions.sum(
        $"l_extendedprice" * (org.apache.spark.sql.functions.lit(1.0) - $"l_discount")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out.foreach { r =>
      assert(math.abs(r.getDouble(1) - expect(r.getLong(0))) < 1e-6,
        s"order ${r.getLong(0)}: ${r.getDouble(1)} vs ${expect(r.getLong(0))}")
    }
  }

  // ------------------------------------------------------------------ q149

  test("q149: local-supplier revenue matches a brute-force recompute and stays in-region") {
    val out = Relational.localSupplierVolume(spark, TestSpark.Sf0001).collect()
    assert(out.nonEmpty)
    val revs = out.map(_.getDouble(1))
    assert(revs.sameElements(revs.sortBy(-_)), "revenue descending")
    // brute-force float recompute of the same join graph
    import org.apache.spark.sql.functions.{sum => fsum, lit => flit}
    val start = java.sql.Timestamp.valueOf(s"${Relational.Q5Start} 00:00:00")
    val end   = java.sql.Timestamp.valueOf(s"${Relational.Q5End} 00:00:00")
    val sf = TestSpark.Sf0001
    val asiaNations = Tables.nation(spark, sf)
      .join(Tables.region(spark, sf).filter($"r_name" === Relational.Q5Region),
        $"n_regionkey" === $"r_regionkey")
      .collect().map(r => r.getAs[Number](0).longValue -> r.getString(1)).toMap
    val expect = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf)
        .filter($"o_orderdate" >= start && $"o_orderdate" < end),
        $"l_orderkey" === $"o_orderkey")
      .join(Tables.supplier(spark, sf), $"l_suppkey" === $"s_suppkey")
      .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
      .filter($"c_nationkey" === $"s_nationkey")
      .filter($"s_nationkey".isin(asiaNations.keys.toSeq: _*))
      .groupBy($"s_nationkey")
      .agg(fsum($"l_extendedprice" * (flit(1.0) - $"l_discount")).as("r"))
      .collect().map(r => asiaNations(r.getAs[Number](0).longValue) -> r.getDouble(1)).toMap
    assert(out.length == expect.size, "one row per revenue-bearing in-region nation")
    out.foreach { r =>
      assert(asiaNations.values.toSet.contains(r.getString(0)), "nation must be in-region")
      assert(math.abs(r.getDouble(1) - expect(r.getString(0))) < 1e-6,
        s"nation ${r.getString(0)}: ${r.getDouble(1)} vs ${expect(r.getString(0))}")
    }
  }

  // ------------------------------------------------------------------ q147

  test("q147: duplicated tokens inflate the factor; a clean source reads 1.0") {
    val docs = Seq(
      (1L, "one two three four five", "A"),
      (2L, "one two three four five", "A"), // exact dup of doc 1
      (3L, "six seven eight", "A"),
      (4L, "alone here", "B"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.tokenDedupInflationOf(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    assert(out("A") == ((3L, 13L, 2L, 8L, 1.625)))
    assert(out("B") == ((1L, 2L, 1L, 2L, 1.0)))
  }

  test("q162: zero-order customers survive the outer join into the k=0 bucket") {
    import spark.implicits._
    val cust = Seq(1L, 2L, 3L).toDF("c_custkey")
    val ord = Seq((2L, 10L), (2L, 11L), (3L, 12L)).toDF("o_custkey", "o_orderkey")
    val out = Relational.customerDistributionOf(cust, ord).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 1L, 1L -> 1L, 2L -> 1L),
      "customer 1 (no orders) must appear in the k=0 bucket")
  }

  test("q163: collision-free buckets estimate exactly; the stratum audit scales by its modulus") {
    import spark.implicits._
    // keys 1..4 distinct mod 1024: est = true total (3); none of 1..4
    // falls in the md5 stratum → audit NULL, never a division blow-up
    val a = Seq(1L, 2L, 3L, 4L).toDF("k")
    val b = Seq(1L, 1L, 2L).toDF("k")
    val r1 = Relational.joinCardinalityOf(a, b).collect().head
    assert(r1.getLong(2) == 3L && r1.getLong(3) == 64L && r1.getLong(4) == 0L)
    assert(r1.isNullAt(6), "an empty stratum must yield NULL inflation")
    // key 84 IS in the md5 stratum (1-in-64 of distinct keys): its two
    // join pairs count exactly and extrapolate ×64
    val a2 = Seq(84L, 5L).toDF("k")
    val b2 = Seq(84L, 84L, 5L).toDF("k")
    val r2 = Relational.joinCardinalityOf(a2, b2).collect().head
    assert(r2.getLong(2) == 3L && r2.getLong(4) == 2L && r2.getLong(5) == 128L)
    assert(math.abs(r2.getDouble(6) - 3.0 / 128) < 1e-5)
    // keys 5 and 5+1024 collide mod 1024: the bucket product counts the
    // phantom pair — the overshoot the inflation column exists to expose
    val r3 = Relational.joinCardinalityOf(
      Seq(5L, 5L + 1024L).toDF("k"), Seq(5L).toDF("k")).collect().head
    assert(r3.getLong(2) == 2L, "bucket collisions must overshoot the estimate")
  }

  test("q169: cumulative boundaries are inclusive — 80/15/5 splits into one A, one B, one C") {
    val sf = TestSpark.Sf0001
    val out = Relational.nationAbc(spark, sf).collect()
    // fixture-level invariants: shares sum to 100 per nation, classes ordered
    out.groupBy(_.getString(0)).foreach { case (nation, rows) =>
      val share = rows.map(_.getDouble(4)).sum
      assert(math.abs(share - 100.0) < 1e-4, s"$nation: shares must sum to 100 (got $share)")
      val classes = rows.map(_.getString(1)).toSeq
      assert(classes == classes.sorted && classes.distinct == classes, s"$nation: $classes")
    }
    // and the A class must be a strict minority of customers with a
    // majority of revenue in at least one nation (the Pareto point)
    assert(out.exists(r => r.getString(1) == "A" && r.getDouble(4) >= 50.0))
  }

  test("q171: the sweep keeps exactly the non-dominated rows, ties on both dims together") {
    import spark.implicits._
    val rows = Seq(
      (1L, 10.0, 5L), (2L, 10.0, 5L), // tie on both dims: both survive
      (3L, 9.0, 3L),                  // cheapest: survives
      (4L, 11.0, 9L),                 // larger than every cheaper row
      (5L, 12.0, 1L),                 // dominated by 4
      (6L, 10.0, 4L)                  // same price as 1/2, smaller: dominated
    ).toDF("id", "price", "size")
    val got = graft.operators.Skyline.skylineOf(rows).collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L, 4L))
  }

  test("q171: the two-level sweep carries the prefix across bucket boundaries") {
    import spark.implicits._
    // width 16 → prices 10 / 20 / 40,41 land in buckets 0 / 1 / 2: the
    // verdicts at 40+ depend ONLY on the cross-bucket carry-in (40 is the
    // first price of its bucket, so its within-bucket prefix is null)
    val rows = Seq(
      (1L, 10.0, 5L),  // cheapest: survives
      (2L, 20.0, 7L),  // beats bucket-0 carry 5: survives
      (3L, 40.0, 6L),  // ≤ carry-in 7 from bucket 1: dominated
      (4L, 40.0, 9L),  // its price's max, beats carry 7: survives
      (5L, 41.0, 8L)   // within-bucket prefix 9 dominates
    ).toDF("id", "price", "size")
    val got = graft.operators.Skyline.skylineOf(rows).collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 4L))
  }

  test("q171 extension: d=3 blocked dominance skyline matches brute force on the sf0.001 catalog") {
    import spark.implicits._
    // hand frame: all-dim ties (1,2) survive together; 4 loses on strict
    // x; 5 loses to 7 within its bucket (same x,y — strict z); 6 loses
    // to 7 across x; 8 loses CROSS-bucket to the bucket-0 front
    val hand = Seq(
      (1L, 10.0, 5L, 5L), (2L, 10.0, 5L, 5L), (3L, 10.0, 6L, 4L),
      (4L, 11.0, 5L, 5L), (5L, 40.0, 9L, 9L), (6L, 41.0, 9L, 9L),
      (7L, 40.0, 9L, 10L), (8L, 40.0, 5L, 5L)
    ).toDF("id", "x", "y", "z")
    val got = graft.operators.Skyline.skyline3Of(hand).collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L, 7L))

    // q55's brute-force-pin discipline: the blocked join must equal the
    // all-pairs dominance verdict on a real catalog-scale frame
    val parts = spark.read.parquet(s"${TestSpark.Sf0001}/part.parquet")
      .selectExpr("p_partkey AS id", "p_retailprice AS x",
        "CAST(p_size AS BIGINT) AS y", "CAST(p_partkey % 7 AS BIGINT) AS z")
    val fast = graft.operators.Skyline.skyline3Of(parts).collect().map(_.getLong(0)).toSet
    val rows = parts.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    val brute = rows.filter { case (_, x, y, z) =>
      !rows.exists { case (_, qx, qy, qz) =>
        qx <= x && qy >= y && qz >= z && (qx < x || qy > y || qz > z) }
    }.map(_._1).toSet
    assert(fast == brute, s"blocked join diverged from brute force: " +
      s"extra=${(fast -- brute).take(5)} missing=${(brute -- fast).take(5)}")
  }

  test("skyline3Of edge contract: empty input, integer x, null coordinates excluded") {
    import spark.implicits._
    // empty: the adaptive width probe must not throw on null bounds
    val empty = Seq.empty[(Long, Double, Long, Long)].toDF("id", "x", "y", "z")
    assert(graft.operators.Skyline.skyline3Of(empty).collect().isEmpty)
    // integer-typed x: "any ordered numeric" per the contract
    val intX = Seq((1L, 5L, 2L, 2L), (2L, 4L, 1L, 1L), (3L, 6L, 9L, 9L)).toDF("id", "x", "y", "z")
    assert(graft.operators.Skyline.skyline3Of(intX).collect().map(_.getLong(0)).toSet
      == Set(1L, 2L, 3L))
    // null coordinate rows are excluded, not silently dropped-or-kept by
    // join null semantics
    val withNull = Seq((1L, Option(1.0), 5L, 5L), (2L, Option.empty[Double], 9L, 9L))
      .toDF("id", "x", "y", "z")
    assert(graft.operators.Skyline.skyline3Of(withNull).collect().map(_.getLong(0)).toSeq
      == Seq(1L))
  }

  test("q173: strict 20%-of-average cut on a hand corpus, boundary row excluded") {
    import spark.implicits._
    // part 1: quantities 1/2/27 → sum 30, cnt 3, 0.2·avg = 2: ql=1 passes
    // (5·1·3 = 15 < 30), ql=2 sits EXACTLY on the boundary (30 < 30 fails
    // — the integer form can't float apart), 27 fails. part 2: 4/16 →
    // 0.2·avg = 2: nothing passes.
    val li = Seq(
      (1L, 1.0, 7.0), (1L, 2.0, 3.0), (1L, 27.0, 5.0),
      (2L, 4.0, 9.0), (2L, 16.0, 2.0)
    ).toDF("l_partkey", "l_quantity", "l_extendedprice")
    val parts = Seq((1L, "B1"), (2L, "B1")).toDF("p_partkey", "p_brand")
    val out = graft.operators.Relational.smallQtyRevenueOf(parts, li).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "B1" && r.getLong(1) == 1L && r.getLong(2) == 700L)
    assert(r.getDouble(3) == 1.0, "avg_yearly = 700 cents / 700.0")
  }

  test("q175: integer cross-multiplied threshold — boundary excluded, negatives outside the average, anti-join applied") {
    import spark.implicits._
    // positive balances {90, 60, 30} → sum 18000¢, n 3, avg exactly
    // 6000¢: the 60.00 customer sits EXACTLY on the average (strict >
    // excludes them — 6000·3 = 18000); the −10.00 balance must not
    // drag the average; the 90.00 customer with orders is anti-joined out
    val cust2 = Seq(
      (1L, 0, 90.0), (2L, 0, 60.0), (3L, 1, 30.0), (4L, 1, -10.0)
    ).toDF("c_custkey", "c_nationkey", "c_acctbal")
    val ord = Seq(Tuple1(3L)).toDF("o_custkey")
    val out = Relational.idleRichCustomersOf(cust2, ord).collect()
    assert(out.length == 1, s"only the 90.00 no-order customer survives; got ${out.toSeq}")
    assert(out.head.getInt(0) == 0 && out.head.getLong(1) == 1L && out.head.getLong(2) == 9000L)
    // and when the above-average customer HAS orders, the result is empty
    val out2 = Relational.idleRichCustomersOf(cust2, Seq(Tuple1(1L)).toDF("o_custkey")).collect()
    assert(out2.isEmpty, "the anti-join must remove the only above-average customer")
  }

  test("q174: the having cut is strict and the subquery's sum rides out on the row") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("1996-03-01 00:00:00")
    val li = Seq((10L, 200.0), (10L, 60.0), (11L, 250.0), (12L, 100.0))
      .toDF("l_orderkey", "l_quantity")
    val ord = Seq((10L, 1L, ts, 123.45), (11L, 1L, ts, 99.99), (12L, 2L, ts, 11.11))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val cust = Seq((1L, "Alice"), (2L, "Bob")).toDF("c_custkey", "c_name")
    val out = graft.operators.Relational.bigOrderCustomersOf(li, ord, cust, 250L).collect()
    assert(out.length == 1, "order 11 sums to exactly 250 — strict > excludes it")
    val r = out.head
    assert(r.getString(0) == "Alice" && r.getLong(1) == 1L && r.getLong(2) == 10L)
    assert(r.getLong(4) == 12345L && r.getLong(5) == 260L)
  }

  test("q172: a hand basket set yields the exact association numbers") {
    import spark.implicits._
    val rows = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L),
      (4L, 3L)).toDF("basket", "item")
    val out = graft.operators.Basket.marketBasketOf(rows).collect()
    assert(out.length == 1, "only pair (1,2) reaches the min co-count")
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((1L, 2L, 3L, 3L, 3L)))
    assert(r.getDouble(5) == 0.75 && r.getDouble(6) == 1.0)
    assert(math.abs(r.getDouble(7) - 1.333333) < 1e-9, "lift = 3*4/(3*3) at 6 dp")
  }

  test("q159: fixture revenue matches a collected brute-force of the 8-table join") {
    val sf = TestSpark.Sf0001
    def m(name: String, k: String, v: String) = spark.read.parquet(s"$sf/$name.parquet")
      .collect().map(r => r.getAs[Any](k).toString.toLong -> r.getAs[Any](v)).toMap
    val natName  = m("nation", "n_nationkey", "n_name").map { case (k, v) => k -> v.toString }
    val natReg   = m("nation", "n_nationkey", "n_regionkey").map { case (k, v) => k -> v.toString.toLong }
    val regName  = m("region", "r_regionkey", "r_name").map { case (k, v) => k -> v.toString }
    val suppNat  = m("supplier", "s_suppkey", "s_nationkey").map { case (k, v) => k -> v.toString.toLong }
    val custNat  = m("customer", "c_custkey", "c_nationkey").map { case (k, v) => k -> v.toString.toLong }
    val ordCust  = m("orders", "o_orderkey", "o_custkey").map { case (k, v) => k -> v.toString.toLong }
    val start = java.time.LocalDateTime.parse(s"${Relational.Q5Start}T00:00:00")
    val end   = java.time.LocalDateTime.parse(s"${Relational.Q5End}T00:00:00")
    val acc = scala.collection.mutable.Map.empty[(String, String, Long), Long]
    spark.read.parquet(s"$sf/lineitem.parquet").collect().foreach { r =>
      // the fixture's physical type has shipped as both NTZ and TZ (see
      // Tables.events) — normalize whatever surfaces to a LocalDateTime
      val ship = r.getAs[Any]("l_shipdate") match {
        case t: java.sql.Timestamp    => t.toLocalDateTime
        case d: java.time.LocalDateTime => d
      }
      if (!ship.isBefore(start) && ship.isBefore(end)) {
        val sn = suppNat(r.getAs[Long]("l_suppkey"))
        val cn = custNat(ordCust(r.getAs[Long]("l_orderkey")))
        if (regName(natReg(sn)) == Relational.Q7SuppRegion
          && regName(natReg(cn)) == Relational.Q7CustRegion) {
          val cents = math.round(r.getAs[Double]("l_extendedprice") * 100)
          val disc  = math.round(r.getAs[Double]("l_discount") * 100)
          val year  = ship.getYear.toLong
          val k = (natName(sn), natName(cn), year)
          acc(k) = acc.getOrElse(k, 0L) + cents * (100 - disc)
        }
      }
    }
    val got = Relational.volumeShipping(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(got.keySet == acc.keySet)
    acc.foreach { case (k, e4) =>
      assert(got(k) == e4.toDouble / 10000.0, s"revenue mismatch at $k")
    }
  }
}
