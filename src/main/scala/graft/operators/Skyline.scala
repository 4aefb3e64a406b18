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
  * requires one strict inequality).
  *
  * The prefix-max is a DISTRIBUTED TWO-LEVEL sweep (VERDICT r14 item 1 —
  * the earlier `Window.orderBy(price)` was the repo's only unpartitioned
  * global window, one task holding every distinct price): prices bucket
  * into [[SkyBucketWidth]]-wide ranges, the strict prefix WITHIN a bucket
  * is a bucket-partitioned window, and the cross-bucket carry-in is a
  * bucket-scale running-max fold (the q134/q109 sort_array + lambda
  * idiom) broadcast back. prefix(p) = max(carry-in of p's bucket, strict
  * within-bucket prefix) — exact integer maxima, so the decomposition is
  * bit-identical to the oracle's single plain window.
  *
  * 100 TB: parts are catalog-scale, and the distinct-price table smaller
  * still — but distinct prices GROW with catalog size (TPC-H's price
  * formula yields ~120k distinct cent values at sf10 and keeps growing),
  * so the sweep must never serialize on one task: per-bucket windows
  * split the order across tasks, the fold runs over bucket-count rows
  * (domain/width — fixed), and the price→verdict table broadcasts back
  * onto the scan. The width is domain-pinned like Sketch.QsWidth (part
  * prices live in [900, 2101] → ~76 buckets); other domains pass their
  * own.
  */
object Skyline {

  /** Price-range width of one sweep bucket (domain-pinned: ~76 buckets
    * over the part price domain; each bucket's window sees only its own
    * distinct prices).
    */
  val SkyBucketWidth = 16.0

  def skylineParts(spark: SparkSession, sfDir: String): DataFrame =
    skylineOf(Tables.part(spark, sfDir)
      .select(col("p_partkey").as("id"), col("p_retailprice").as("price"),
        col("p_size").cast("long").as("size")))

  /** Composable core for ANY (id, price, size) frame: minimize price,
    * maximize size.
    */
  def skylineOf(rows: DataFrame, bucketWidth: Double = SkyBucketWidth): DataFrame = {
    val pm = rows.groupBy(col("price")).agg(max(col("size")).as("pmax"))
      .withColumn("bk", floor(col("price") / bucketWidth).cast("long"))
    // level 1: strict prefix-max WITHIN a price bucket — partitioned
    // window, tasks proportional to buckets, never a global order
    val wb = Window.partitionBy(col("bk")).orderBy(col("price"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val within = pm.withColumn("wpref", max(col("pmax")).over(wb))
    // level 2: carry-in per bucket = running max of EARLIER buckets'
    // maxima — one bucket-scale aggregate folded with a lambda (greatest
    // skips nulls, so the first bucket's carry-in stays null)
    val offsets = pm.groupBy(col("bk")).agg(max(col("pmax")).as("bmax"))
      .agg(sort_array(collect_list(struct(col("bk"), col("bmax")))).as("rows"))
      .select(explode(expr(
        """aggregate(
          |  rows,
          |  named_struct('run', cast(null as bigint),
          |               'out', cast(array() as array<struct<bk:bigint,off:bigint>>)),
          |  (acc, x) -> named_struct(
          |    'run', greatest(acc.run, x.bmax),
          |    'out', concat(acc.out, array(named_struct('bk', x.bk, 'off', acc.run))))
          |).out""".stripMargin)).as("r"))
      .select(col("r.bk").as("bk"), col("r.off").as("boff"))
    val pref = within.join(broadcast(offsets), Seq("bk"))
      .select(col("price"), col("pmax"),
        greatest(col("boff"), col("wpref")).as("prefix"))
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
