package graft.plans

import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.{CosineSimilarity, L2Normalize}

/** Optimizer rule: strip redundant `array<float> → array<double>` casts
  * under [[CosineSimilarity]]. The native expression widens float elements
  * exactly during its fused loop, so a Cast there only materializes a
  * doubled copy of every vector (64 extra bytes × dim × row at scan time)
  * without changing a single output bit — the equality of the cast and
  * raw paths is unit-tested in CosineSimilaritySpec.
  *
  * Registered by [[graft.functions.GraftExtensions]]; callers who write
  * `cosine(toDouble(embedding), q)` out of habit get the efficient plan
  * anyway.
  */
object StripCosineCasts extends Rule[LogicalPlan] {

  private def isFloatArray(t: org.apache.spark.sql.types.DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def strip(e: org.apache.spark.sql.catalyst.expressions.Expression) = e match {
    case Cast(child, ArrayType(DoubleType, _), _, _) if isFloatArray(child.dataType) => child
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case cos: CosineSimilarity =>
        val l = strip(cos.left); val r = strip(cos.right)
        if ((l eq cos.left) && (r eq cos.right)) cos else CosineSimilarity(l, r)
    }
}

/** Optimizer rule: cosine similarity is scale-invariant, so normalizing an
  * input first (`graft_cosine(graft_l2_normalize(a), b)`) buys nothing and
  * costs two extra passes plus a materialized unit-vector copy of every
  * row. Strip the [[L2Normalize]] wrapper under [[CosineSimilarity]].
  *
  * Algebraic, not bitwise: the stripped form associates the divisions
  * differently in the last ulp. Every declared score is emitted
  * `round(_, 6)`, which absorbs that (property-tested at 1e-9 in
  * RulesSpec); no declared query composes the two functions anyway — the
  * rule exists for user-written queries.
  */
object StripRedundantNormalize extends Rule[LogicalPlan] {

  private def strip(e: org.apache.spark.sql.catalyst.expressions.Expression) = e match {
    case L2Normalize(child) => child
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case cos: CosineSimilarity =>
        val l = strip(cos.left); val r = strip(cos.right)
        if ((l eq cos.left) && (r eq cos.right)) cos else CosineSimilarity(l, r)
    }
}
