package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** q172_market_basket — ASSOCIATION RULES over order baskets: for every
  * part pair bought together in at least [[MinPairCount]] orders, the
  * support / confidence / lift triple, top-[[TopPairs]] by
  * (co-count, lift, pair) — the retail co-occurrence classic (the
  * "customers who bought X also bought Y" shortlist), and the q115 PMI
  * shape moved from text windows to transactional baskets.
  *
  * 100 TB: the pair generation is the BLOCKED self-join done right —
  * baskets bound the block (≤ max items per order, fixture max 13), so
  * the per-order pair fan-out is basket²-bounded the way q10's label
  * blocks are NOT; the join key is the order id (co-partitioned
  * distinct-item projections), pair counts map-side combine, the item
  * counts broadcast back onto the pair table, and the shortlist is
  * TakeOrdered. Everything is integer counts until the three final
  * 6-dp ratios.
  */
object Basket {

  val MinPairCount = 2L
  val TopPairs = 50

  def marketBasket(spark: SparkSession, sfDir: String): DataFrame =
    marketBasketOf(Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("basket"), col("l_partkey").as("item")))

  /** Composable core for ANY (basket, item) frame. The basket total rides
    * the plan as a broadcast 1-row aggregate (no eager driver action —
    * one job, auditable lineage).
    */
  def marketBasketOf(rows: DataFrame): DataFrame = {
    val items = rows.distinct()
    val nb = items.select(col("basket")).distinct().agg(count(lit(1)).as("n_baskets"))
    val itemCnt = items.groupBy(col("item")).agg(count(lit(1)).as("cnt"))
    val pairs = items.as("a")
      .join(items.as("b"), col("a.basket") === col("b.basket") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
      .agg(count(lit(1)).as("pair_count"))
      .filter(col("pair_count") >= MinPairCount)
    pairs
      .join(broadcast(itemCnt.withColumnRenamed("item", "item_a").withColumnRenamed("cnt", "cnt_a")), Seq("item_a"))
      .join(broadcast(itemCnt.withColumnRenamed("item", "item_b").withColumnRenamed("cnt", "cnt_b")), Seq("item_b"))
      .crossJoin(broadcast(nb))
      .select(col("item_a"), col("item_b"), col("pair_count"), col("cnt_a"), col("cnt_b"),
        round(col("pair_count") / col("n_baskets").cast("double"), 6).as("support"),
        round(col("pair_count") / col("cnt_a").cast("double"), 6).as("confidence"),
        round(col("pair_count") * col("n_baskets").cast("double") / (col("cnt_a") * col("cnt_b")), 6).as("lift"))
      .orderBy(col("pair_count").desc, col("lift").desc, col("item_a"), col("item_b"))
      .limit(TopPairs)
  }

  val q172OracleSql: String =
    s"""WITH items AS (
       |  SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
       |), nb AS (
       |  SELECT COUNT(DISTINCT basket) AS n FROM items
       |), ic AS (
       |  SELECT item, COUNT(*) AS cnt FROM items GROUP BY item
       |), pairs AS (
       |  SELECT a.item AS item_a, b.item AS item_b, CAST(COUNT(*) AS BIGINT) AS pair_count
       |  FROM items a JOIN items b ON a.basket = b.basket AND a.item < b.item
       |  GROUP BY a.item, b.item
       |  HAVING COUNT(*) >= $MinPairCount
       |)
       |SELECT p.item_a, p.item_b, p.pair_count,
       |       ca.cnt AS cnt_a, cb.cnt AS cnt_b,
       |       round(p.pair_count / CAST(nb.n AS DOUBLE), 6) AS support,
       |       round(p.pair_count / CAST(ca.cnt AS DOUBLE), 6) AS confidence,
       |       round(p.pair_count * CAST(nb.n AS DOUBLE) / (ca.cnt * cb.cnt), 6) AS lift
       |FROM pairs p
       |JOIN ic ca ON ca.item = p.item_a
       |JOIN ic cb ON cb.item = p.item_b
       |CROSS JOIN nb
       |ORDER BY p.pair_count DESC, lift DESC, p.item_a, p.item_b
       |LIMIT $TopPairs""".stripMargin
}
