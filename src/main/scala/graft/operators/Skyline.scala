package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** q171_skyline — the PARETO FRONT (skyline) operator: parts not
  * dominated on (price ↓, size ↑) — every row for which no other part is
  * both at-most-as-expensive and at-least-as-large with one strict — the
  * multi-objective shortlist query (cheapest-largest trade curve) that no
  * single ORDER BY expresses.
  *
  * Algorithm: the sort-based sweep, not the O(n²) pair join — collapse to
  * per-distinct-price max size, prefix-max over the price order, and a
  * row survives iff it is its price's max AND strictly beats every
  * smaller price's best (ties on both dims survive together: domination
  * requires one strict inequality). The sweep window runs over the
  * DISTINCT-PRICE table.
  *
  * 100 TB: parts are catalog-scale, and the distinct-price table smaller
  * still — the global prefix window is bounded by price cardinality, not
  * rows, and broadcasts back onto the scan. For a fact-scale skyline the
  * same sweep range-partitions by price with per-partition prefixes and
  * one boundary-max broadcast (the q157 prefix-sum argument); the
  * declared shape keeps the catalog-scale form honest.
  */
object Skyline {

  def skylineParts(spark: SparkSession, sfDir: String): DataFrame =
    skylineOf(Tables.part(spark, sfDir)
      .select(col("p_partkey").as("id"), col("p_retailprice").as("price"),
        col("p_size").cast("long").as("size")))

  /** Composable core for ANY (id, price, size) frame: minimize price,
    * maximize size.
    */
  def skylineOf(rows: DataFrame): DataFrame = {
    val pm = rows.groupBy(col("price")).agg(max(col("size")).as("pmax"))
    val w = Window.orderBy(col("price")).rowsBetween(Window.unboundedPreceding, -1)
    val pref = pm.withColumn("prefix", max(col("pmax")).over(w))
    rows.join(broadcast(pref), Seq("price"))
      .filter(col("size") === col("pmax") &&
        (col("prefix").isNull || col("size") > col("prefix")))
      .select(col("id"), col("price"), col("size"))
      .orderBy(col("price"), col("id"))
  }

  val q171OracleSql: String =
    """WITH rows_ AS (
      |  SELECT p_partkey AS id, p_retailprice AS price, CAST(p_size AS BIGINT) AS size FROM part
      |), pm AS (
      |  SELECT price, MAX(size) AS pmax FROM rows_ GROUP BY price
      |), pref AS (
      |  SELECT price, pmax,
      |         MAX(pmax) OVER (ORDER BY price ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prefix
      |  FROM pm
      |)
      |SELECT r.id, r.price, r.size
      |FROM rows_ r JOIN pref p USING (price)
      |WHERE r.size = p.pmax AND (p.prefix IS NULL OR r.size > p.prefix)
      |ORDER BY r.price, r.id""".stripMargin
}
