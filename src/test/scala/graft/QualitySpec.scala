package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Quality

/** q126 — constraint-suite semantics on dirty constructed frames and the
  * declared warehouse report's shape.
  */
class QualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("q126 core: a dirty frame's violations count exactly, one aggregate pass") {
    val df = Seq((1, 10.0), (2, -3.0), (3, 200.0), (4, 10.0)).toDF("id", "v")
    val out = Quality.ruleRowsOf(df,
      "v_nonneg" -> (col("v") < 0),
      "v_le_100" -> (col("v") > 100.0),
      "id_positive" -> (col("id") <= 0))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(
      "v_nonneg" -> ((1L, 4L)), "v_le_100" -> ((1L, 4L)), "id_positive" -> ((0L, 4L))))
    val p = Quality.ruleRowsOf(df, "a" -> (col("v") < 0), "b" -> (col("v") > 1))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join") && !p.contains("Union"),
      s"all of one table's rules must fold into ONE aggregate;\n$p")
  }

  test("q126: the declared report mixes passing constraints and failing audits") {
    val rows = Quality.dataQuality(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.length == 10)
    assert(rows.map(_._1).sameElements(rows.map(_._1).sorted))
    rows.foreach { case (rule, v, total, pass) =>
      assert(total > 0, s"$rule total")
      assert(v >= 0 && v <= total, s"$rule bounds")
      assert(pass == (v == 0), s"$rule pass flag")
    }
    // the integrity constraints hold on the clean fixture; the two tight
    // business audits flag real rows — the mix is the point
    val byRule = rows.map(r => r._1 -> r._4).toMap
    assert(byRule("li_orderkey_fk") && byRule("orders_orderkey_unique") &&
      byRule("docs_nchars_consistent"))
    assert(!byRule("li_discount_le_5pct") && !byRule("li_tax_le_6pct"))
  }
}
