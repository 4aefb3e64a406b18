package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native multi-word sign-bit pack: bit `i` of word `w` is set iff
  * component `w*64 + i` of the embedding is strictly positive; output is
  * `array<long>` of ceil(dim/64) words. This is q99/q100's quantizer
  * (reference contract: binary-code search over the float vectors the
  * reference stores raw, vector_db.py:20-24) as ONE compiled loop: the
  * column-expression form (a 64-term when-chain per word) exceeded
  * janino's method limit at 512 dims — the reference's own CLIP width
  * (text_img.py:15) — and fell out of whole-stage codegen exactly where
  * the pack matters most. dim is a plan-time constant, so the word count
  * is a compiled literal, not data.
  *
  * Components past the vector's end and NULL components pack as 0 — the
  * same totality rule as the old `try_element_at` form, so a short or
  * ragged vector never differs from itself and the 64-d fixture packs
  * bit-identically to the round-11 single-long form (PropertySpec).
  */
case class SignBitsPack(child: Expression, dim: Int) extends UnaryExpression {

  require(dim >= 1, s"graft_sign_bits_pack needs dim >= 1, got $dim")

  private val words: Int = (dim + 63) / 64

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> or array<float> argument, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def prettyName: String = "graft_sign_bits_pack"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), dim)
    val out = new Array[Long](words)
    var idx = 0
    while (idx < n) {
      val pos = if (a.isNullAt(idx)) false
        else if (isFloat) a.getFloat(idx) > 0f else a.getDouble(idx) > 0d
      if (pos) out(idx >> 6) |= 1L << (idx & 63)
      idx += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val idx = ctx.freshName("idx")
      val out = ctx.freshName("out")
      val cmp = if (isFloat) s"$a.getFloat($idx) > 0f" else s"$a.getDouble($idx) > 0d"
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $dim);
         |final long[] $out = new long[$words];
         |for (int $idx = 0; $idx < $n; $idx++) {
         |  if (!$a.isNullAt($idx) && $cmp) {
         |    $out[$idx >> 6] |= 1L << ($idx & 63);
         |  }
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Summed per-word popcount-of-xor between two sign-bit packs — the
  * multi-word Hamming distance, one compiled loop of `Long.bitCount`, no
  * float math. Unequal word counts FAIL LOUD (an IllegalArgumentException,
  * not a truncated distance): both sides of a q99/q100 search pack at the
  * same plan-time dim, so a mismatch means the caller compared codes from
  * two different quantizers — exactly the silent-truncation footgun the
  * round-11 64-dim cap was (ADVICE r11 medium).
  */
case class HammingDistPacked(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> packs, got ${l.catalogString} and ${r.catalogString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_hamming_dist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"$prettyName: pack word counts differ ($n vs ${y.numElements()}) — " +
          "codes were built at different dims")
    var d = 0L
    var i = 0
    while (i < n) {
      d += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val d = ctx.freshName("d")
      s"""
         |final int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "graft_hamming_dist: pack word counts differ (" + $n + " vs " +
         |    $y.numElements() + ") - codes were built at different dims");
         |}
         |long $d = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $d += java.lang.Long.bitCount($x.getLong($i) ^ $y.getLong($i));
         |}
         |${ev.value} = $d;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
