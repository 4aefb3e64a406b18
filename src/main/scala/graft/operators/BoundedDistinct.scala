package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact bounded distinct-set aggregation: per group, the sorted distinct
  * values — IF there are at most `cap` of them; an empty result otherwise.
  *
  * This is the scale shape for "group, but only small groups matter"
  * (q91's fingerprint df cull): `collect_set` keeps UNBOUNDED state on hot
  * keys — the exact boilerplate fingerprints the cull exists to drop would
  * be the ones accumulating million-element sets — while this buffer never
  * holds more than cap+1 values, because keeping the cap+1 SMALLEST
  * distinct values is lossless for the question "are there more than cap?":
  * a value in the global smallest cap+1 survives every partial truncation
  * (anything dropped is larger than cap+1 kept values), so the final
  * buffer length equals min(df, cap+1) exactly and overflow detection is
  * exact, with partial aggregation (map-side combine) intact.
  */
object BoundedDistinct {

  class BoundedDistinctAggregator(cap: Int)
      extends Aggregator[Long, Seq[Long], Seq[Long]] {

    override def zero: Seq[Long] = Vector.empty

    override def reduce(b: Seq[Long], x: Long): Seq[Long] =
      if (b.contains(x)) b else ((b :+ x).sorted).take(cap + 1)

    override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
      (b1 ++ b2).distinct.sorted.take(cap + 1)

    /** Sorted distinct values, or empty when the group exceeds cap. */
    override def finish(b: Seq[Long]): Seq[Long] =
      if (b.length > cap) Vector.empty else b

    override def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** `bounded_distinct(col)` → array<long> (sorted; empty = over cap). */
  def udafOf(cap: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new BoundedDistinctAggregator(cap),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Long]())
}
