package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native pinned-plane SimHash block code — q148's blocking key
  * (`Cluster.simhashCode`) as ONE compiled loop: bit `i` of the output is
  * set iff `Σ_j plane_i[j] · round(v[j]·10⁶) > 0` over the first
  * min(len(v), planeWidth) components, with seeded Rademacher (±1) planes.
  *
  * Why native (round 14): the column-expression form — b nested
  * `aggregate(zip_with(...))` integer dots — evaluates through interpreted
  * higher-order lambdas with per-element boxing, and its cost grows with
  * n·b where b itself grows with log n: the sf10 fork ladder read the HOF
  * form at ~2× the raw-axis code it replaced. This kernel quantizes once
  * into a stack `long[]` and runs b multiply-accumulate rows over it —
  * the SignBitsPack/RotateHd house pattern (codegen calls the same static
  * kernel as eval, so whole-stage codegen keeps its span and janino
  * compiles one call).
  *
  * Quantization is round-half-away-from-zero on the EXACT double product
  * `v[j]·10⁶` — for float inputs the product carries ≤ 44 mantissa bits,
  * so it is exact and its fractional part is a dyadic rational with ≤ 12
  * fractional bits: the only near-tie is an exact .5, which
  * half-away-from-zero, Spark's `round(…, 0)` (BigDecimal HALF_UP), and
  * DuckDB's `round` all resolve identically — the engine/oracle agreement
  * the q148 hash gate rests on. NULL components quantize to 0 (the
  * SignBitsPack totality rule).
  *
  * The plane matrix is a plan-time constant derived from (seed, width)
  * via java.util.Random's specified LCG — [[SimhashCode.planes]] is the
  * ONE generator shared with the oracle-SQL literal
  * (`Cluster.SimhashPlanes`), so the two engines cannot disagree on a
  * coefficient.
  */
case class SimhashCode(child: Expression, width: Int, seed: Long, bits: Int)
    extends UnaryExpression {

  require(width >= 1, s"graft_simhash_code needs width >= 1, got $width")
  require(bits >= 1 && bits <= 64,
    s"graft_simhash_code needs 1 <= bits <= 64, got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> or array<float> argument, got ${other.catalogString}")
  }

  override def dataType: DataType = LongType

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def prettyName: String = "graft_simhash_code"

  /** bits × width seeded ±1 rows — a plan-time constant. */
  @transient private lazy val ps: Array[Array[Long]] =
    SimhashCode.planes(bits, width, seed)

  override def nullSafeEval(input: Any): Any =
    SimhashCode.code(input.asInstanceOf[ArrayData], isFloat, ps)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", ps, "long[][]")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.SimhashCode.code($a, $isFloat, $planesRef);
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashCode {

  /** Seeded Rademacher rows, one per plane, over the full `width`.
    * java.util.Random's LCG is part of its spec — identical everywhere.
    * Generation order is row-major over a (maxPlanes × width) draw, so
    * requesting fewer planes yields a PREFIX of the same matrix.
    */
  def planes(nPlanes: Int, width: Int, seed: Long): Array[Array[Long]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(width)(if (rnd.nextBoolean()) 1L else -1L))
  }

  /** The kernel shared by eval and codegen: quantize once (6-dp
    * fixed-point, half away from zero, null → 0), then one
    * multiply-accumulate row per plane; bit i ⇔ dot_i > 0.
    */
  def code(a: ArrayData, isFloat: Boolean, planes: Array[Array[Long]]): Long = {
    val width = if (planes.length > 0) planes(0).length else 0
    val n = math.min(a.numElements(), width)
    val qv = new Array[Long](n)
    var j = 0
    while (j < n) {
      if (!a.isNullAt(j)) {
        val s = (if (isFloat) a.getFloat(j).toDouble else a.getDouble(j)) * 1e6
        qv(j) = (if (s >= 0) math.floor(s + 0.5) else -math.floor(-s + 0.5)).toLong
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < planes.length) {
      val p = planes(i)
      var acc = 0L
      var k = 0
      while (k < n) { acc += p(k) * qv(k); k += 1 }
      if (acc > 0) out |= 1L << i
      i += 1
    }
    out
  }
}
