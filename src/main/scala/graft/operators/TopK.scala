package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Distributed exact top-k by (score desc, id asc).
  *
  * The window-function formulation (`row_number over (partition by qid order
  * by score desc)`) shuffles EVERY scored row into one partition per query —
  * at a 100 TB corpus with q queries that is q reducers each receiving N
  * rows. This Aggregator instead keeps a bounded k-element heap per
  * (partition, query) and merges heaps: the shuffle carries at most
  * q × partitions × k rows, independent of corpus size — the same
  * partial/final split Spark's TakeOrderedAndProject uses for global top-k,
  * generalized to per-group.
  */
object TopK {

  case class Scored(id: Long, score: Double)

  /** compare(a, b) < 0 means a is the BETTER result (higher score, then
    * smaller id).
    */
  private val bestFirst: Ordering[Scored] =
    Ordering.by[Scored, (Double, Long)](s => (-s.score, s.id))

  /** Buffer = a flat Seq kept ≤ 2k via amortized sort-and-trim: appends are
    * O(1), a trim runs every k overflows, so the amortized cost stays
    * O(log k)-ish per row while the buffer stays expression-encodable —
    * partials serialize as ordinary Spark rows (no Kryo, no closure
    * serialization), which keeps the shuffle payload a plain
    * array<struct<id,score>>.
    */
  class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    private def trim(b: Seq[Scored]): Seq[Scored] =
      if (b.length <= 2 * k) b else b.sorted(bestFirst).take(k)

    override def zero: Seq[Scored] = Vector.empty

    override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] = trim(b :+ a)

    override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] = trim(b1 ++ b2)

    /** Best-first (score desc, id asc) — rank = position + 1. */
    override def finish(b: Seq[Scored]): Seq[Scored] = b.sorted(bestFirst).take(k)

    override def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** DataFrame-friendly UDAF: `top_k(struct(id, score))` → array<struct<id,score>>. */
  def topKUdaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopKAggregator(k), org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Scored]())
}
