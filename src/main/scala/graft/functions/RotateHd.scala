package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Pinned pseudo-orthogonal rotation for binary quantization: `rounds`
  * blocks of (seeded ±1 sign diagonal → fast Walsh–Hadamard transform →
  * 1/√n rescale) over the first `dim` components, zero-padded to the next
  * power of two. This is the standard "structured spinner" HD rotation
  * (Ailon–Chazelle fast JL; the cheap stand-in for a trained ITQ rotation,
  * Gong et al.): axis-aligned sign quantization loses exactly when
  * variance concentrates along a few non-axis directions, and a fixed
  * rotation that spreads every input direction across all output
  * coordinates recovers most of that loss — with NO training pass, so the
  * rotation is a plan-time constant (VERDICT r11 item 4's q88 closed-form
  * discipline: literal constants, not fitted artifacts).
  *
  * Orthogonal exactly (a signed permutation-free composition of
  * orthogonal factors): norms are preserved to fp rounding, so the
  * rotated space ranks the SAME cosine order for the exact rerank stage.
  * Deterministic: the diagonals derive from `seed` via java.util.Random's
  * specified LCG — identical on every JVM.
  *
  * O(rounds · n·log n) per row, compiled (the codegen path calls the same
  * static kernel as eval — whole-stage codegen keeps its span, janino
  * compiles one call, and the butterfly runs as JIT'd bytecode).
  */
case class RotateHd(child: Expression, dim: Int, seed: Long, rounds: Int)
    extends UnaryExpression {

  require(dim >= 1, s"graft_rotate_hd needs dim >= 1, got $dim")
  require(rounds >= 1, s"graft_rotate_hd needs rounds >= 1, got $rounds")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> or array<float> argument, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def prettyName: String = "graft_rotate_hd"

  /** rounds × paddedDim seeded ±1 diagonals — a plan-time constant. */
  @transient private lazy val diags: Array[Array[Byte]] =
    RotateHd.diagonals(dim, seed, rounds)

  override def nullSafeEval(input: Any): Any =
    RotateHd.rotate(input.asInstanceOf[ArrayData], isFloat, dim, diags)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val diagsRef = ctx.addReferenceObj("diags", diags, "byte[][]")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.RotateHd.rotate(
         |  $a, $isFloat, $dim, $diagsRef);
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RotateHd {

  /** Default round count: 3 HD blocks is the standard spinner depth
    * (1 leaves sparse inputs structured; 3 is where the JL literature
    * stops seeing gains).
    */
  val DefaultRounds = 3

  private[graft] def paddedDim(dim: Int): Int = {
    var n = 1
    while (n < dim) n <<= 1
    n
  }

  /** Seeded ±1 diagonals, one per round, over the padded width.
    * java.util.Random's LCG is part of its spec — identical everywhere.
    */
  private[graft] def diagonals(dim: Int, seed: Long, rounds: Int): Array[Array[Byte]] = {
    val n2 = paddedDim(dim)
    val rnd = new java.util.Random(seed)
    Array.fill(rounds)(Array.fill(n2)(if (rnd.nextBoolean()) 1.toByte else -1.toByte))
  }

  /** The kernel shared by eval and codegen: copy the first `dim`
    * components (zero-padded to the power-of-two width), then per round
    * apply the sign diagonal, the in-place FWHT butterfly, and the 1/√n
    * orthonormal rescale. Null components read as 0 (the sign-pack's
    * totality rule).
    */
  def rotate(a: ArrayData, isFloat: Boolean, dim: Int, diags: Array[Array[Byte]]): ArrayData = {
    val n2 = diags(0).length
    val v = new Array[Double](n2)
    val n = math.min(a.numElements(), dim)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) v(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    val scale = 1.0 / math.sqrt(n2.toDouble)
    var r = 0
    while (r < diags.length) {
      val d = diags(r)
      var j = 0
      while (j < n2) { v(j) = v(j) * d(j); j += 1 }
      // in-place fast Walsh–Hadamard butterfly
      var h = 1
      while (h < n2) {
        var base = 0
        while (base < n2) {
          var k = base
          val end = base + h
          while (k < end) {
            val x = v(k); val y = v(k + h)
            v(k) = x + y
            v(k + h) = x - y
            k += 1
          }
          base += h << 1
        }
        h <<= 1
      }
      var m = 0
      while (m < n2) { v(m) = v(m) * scale; m += 1 }
      r += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(v)
  }
}
