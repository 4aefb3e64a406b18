package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-quality validation — the Deequ/Great-Expectations axis: a
  * declarative constraint suite over the warehouse evaluated in bulk,
  * emitting one (rule, violations, total, pass) row per rule. A 100 TB
  * ingest runs exactly this before anything downstream trusts the
  * batch; it is the operational complement to the statistical audits
  * (q109/q117/q119/q120).
  */
object Quality {

  /** q126_data_quality — the constraint report over the fixture
    * warehouse: range rules, uniqueness, referential integrity (both
    * fact→dim edges), representation consistency (documents.n_chars
    * must equal length(text)), and two deliberately TIGHT business
    * rules (discount ≤ 5 %, tax ≤ 6 %) that flag real rows — a
    * non-degenerate mix of passing constraints and failing audits, the
    * shape a production run actually produces.
    *
    * 100 TB: every range/consistency rule for a table folds into ONE
    * scan's aggregate (a sum of CASE predicates, map-side combined —
    * adding a rule adds a column, not a pass); uniqueness is the
    * two-level distinct count on the key; each FK rule is one
    * anti-join whose dimension side broadcasts (or shuffles on the key
    * at dim scale — the q45 keeper-set discipline). The report is
    * rule-scale. Nothing recomputes per rule.
    */
  def dataQuality(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val orders = Tables.orders(spark, sfDir)
    val customer = Tables.customer(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
    val events = Tables.events(spark, sfDir)

    val scans = ruleRowsOf(li,
      "li_discount_le_5pct" -> (col("l_discount") > 0.05),
      "li_quantity_in_1_50" -> !col("l_quantity").between(1.0, 50.0),
      "li_tax_le_6pct" -> (col("l_tax") > 0.06))
      .unionByName(ruleRowsOf(docs,
        "docs_nchars_consistent" -> (col("n_chars") =!= length(col("text"))),
        "docs_text_nonempty" -> (col("text").isNull || length(col("text")) === 0)))
      .unionByName(ruleRowsOf(events,
        "events_ts_in_2024" -> !col("ts").between(
          lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
          lit(java.sql.Timestamp.valueOf("2024-12-31 23:59:59.999999")) ),
        "events_value_nonneg" -> (col("value") < 0)))

    val unique = orders.agg(count(lit(1)).as("total"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("violations"))
      .select(lit("orders_orderkey_unique").as("rule"), col("violations"), col("total"))

    def fk(name: String, fact: DataFrame, factKey: String,
           dim: DataFrame, dimKey: String): DataFrame = {
      val orphans = fact.select(col(factKey))
        .join(broadcast(dim.select(col(dimKey))), col(factKey) === col(dimKey), "left_anti")
        .agg(count(lit(1)).as("violations"))
      fact.agg(count(lit(1)).as("total")).crossJoin(orphans)
        .select(lit(name).as("rule"), col("violations"), col("total"))
    }

    scans
      .unionByName(unique)
      .unionByName(fk("li_orderkey_fk", li, "l_orderkey", orders, "o_orderkey"))
      .unionByName(fk("orders_custkey_fk", orders, "o_custkey", customer, "c_custkey"))
      .select(col("rule"), col("violations"), col("total"),
        (col("violations") === 0).as("pass"))
      .orderBy(col("rule"))
  }

  /** One table's predicate rules folded into ONE aggregate pass, then
    * exploded to (rule, violations, total) rows — adding a rule adds a
    * CASE-sum column, never another scan.
    */
  private[graft] def ruleRowsOf(df: DataFrame, checks: (String, Column)*): DataFrame = {
    def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    val agg = df.agg(count(lit(1)).as("total"),
      checks.zipWithIndex.map { case ((_, c), i) => cnt(c).as(s"v$i") }: _*)
    agg.select(explode(array(checks.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("rule"), col(s"v$i").as("violations"), col("total"))
    }: _*)).as("r")).select(col("r.rule"), col("r.violations"), col("r.total"))
  }

  val q126OracleSql: String =
    """SELECT rule, violations, total, violations = 0 AS pass FROM (
      |  SELECT 'li_discount_le_5pct' AS rule,
      |         CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS violations,
      |         COUNT(*) AS total FROM lineitem
      |  UNION ALL
      |  SELECT 'li_quantity_in_1_50',
      |         CAST(SUM(CASE WHEN NOT (l_quantity BETWEEN 1.0 AND 50.0) THEN 1 ELSE 0 END) AS BIGINT),
      |         COUNT(*) FROM lineitem
      |  UNION ALL
      |  SELECT 'li_tax_le_6pct',
      |         CAST(SUM(CASE WHEN l_tax > 0.06 THEN 1 ELSE 0 END) AS BIGINT),
      |         COUNT(*) FROM lineitem
      |  UNION ALL
      |  SELECT 'docs_nchars_consistent',
      |         CAST(SUM(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT),
      |         COUNT(*) FROM documents
      |  UNION ALL
      |  SELECT 'docs_text_nonempty',
      |         CAST(SUM(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END) AS BIGINT),
      |         COUNT(*) FROM documents
      |  UNION ALL
      |  SELECT 'events_ts_in_2024',
      |         CAST(SUM(CASE WHEN NOT (ts BETWEEN TIMESTAMP '2024-01-01 00:00:00'
      |                                        AND TIMESTAMP '2024-12-31 23:59:59.999999') THEN 1 ELSE 0 END) AS BIGINT),
      |         COUNT(*) FROM events
      |  UNION ALL
      |  SELECT 'events_value_nonneg',
      |         CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT),
      |         COUNT(*) FROM events
      |  UNION ALL
      |  SELECT 'orders_orderkey_unique',
      |         COUNT(*) - COUNT(DISTINCT o_orderkey),
      |         COUNT(*) FROM orders
      |  UNION ALL
      |  SELECT 'li_orderkey_fk',
      |         (SELECT COUNT(*) FROM lineitem l
      |          WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
      |         COUNT(*) FROM lineitem
      |  UNION ALL
      |  SELECT 'orders_custkey_fk',
      |         (SELECT COUNT(*) FROM orders o
      |          WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
      |         COUNT(*) FROM orders
      |) ORDER BY rule""".stripMargin
}
