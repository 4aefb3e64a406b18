package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
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

  /** Max-heap ordering where "greatest" = worst (lowest score, then largest
    * id), so the heap head is the eviction candidate in O(log k).
    * compare(a, b) < 0 means a is the BETTER result.
    */
  private val worstFirst: Ordering[Scored] =
    Ordering.by[Scored, (Double, Long)](s => (-s.score, s.id))

  class TopKAggregator(k: Int) extends Aggregator[Scored, mutable.PriorityQueue[Scored], Seq[Scored]] {
    override def zero: mutable.PriorityQueue[Scored] = mutable.PriorityQueue.empty(worstFirst)

    private def add(b: mutable.PriorityQueue[Scored], s: Scored): mutable.PriorityQueue[Scored] = {
      if (b.size < k) b.enqueue(s)
      else if (worstFirst.compare(s, b.head) < 0) { b.dequeue(); b.enqueue(s) }
      b
    }

    override def reduce(b: mutable.PriorityQueue[Scored], a: Scored): mutable.PriorityQueue[Scored] = add(b, a)

    override def merge(b1: mutable.PriorityQueue[Scored], b2: mutable.PriorityQueue[Scored]): mutable.PriorityQueue[Scored] = {
      b2.foreach(add(b1, _)); b1
    }

    /** Best-first (score desc, id asc) — rank = position + 1. */
    override def finish(b: mutable.PriorityQueue[Scored]): Seq[Scored] =
      b.toSeq.sortBy(s => (-s.score, s.id))

    override def bufferEncoder: Encoder[mutable.PriorityQueue[Scored]] =
      Encoders.kryo[mutable.PriorityQueue[Scored]]
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** DataFrame-friendly UDAF: `top_k(struct(id, score))` → array<struct<id,score>>. */
  def topKUdaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopKAggregator(k), org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Scored]())
}
