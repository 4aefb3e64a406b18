package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for L2 normalization of an embedding array,
  * with whole-stage codegen: one fused pass for the squared norm, one for
  * the division, no lambda interpretation (the higher-order-function form
  * in VectorFunctions.normalize evaluates `transform`/`zip_with` lambdas
  * per element through the interpreter). Accumulation is left-to-right in
  * double — bit-identical to the expression form (property-tested).
  *
  * Zero vectors pass through unchanged (the project's documented
  * zero-vector policy); float input widens exactly, element-wise, with no
  * upfront Cast materializing a doubled corpus copy.
  */
case class L2Normalize(child: Expression) extends UnaryExpression {

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

  /** A null ELEMENT nulls the whole result: a vector with an undefined
    * component has no norm. Declared explicitly so `containsNull=true`
    * inputs (the parquet default) neither read garbage through
    * getDouble nor silently treat null as 0.0 (ADVICE r2).
    */
  private def elemNullable: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  }

  override def nullable: Boolean = child.nullable || elemNullable

  override def prettyName: String = "graft_l2_normalize"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (elemNullable) {
      var i = 0
      while (i < n) { if (a.isNullAt(i)) return null; i += 1 }
    }
    val out = new Array[Double](n)
    var norm = 0.0
    var i = 0
    while (i < n) {
      val xi = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      out(i) = xi
      norm += xi * xi
      i += 1
    }
    val d = math.sqrt(norm)
    if (d != 0.0) {
      var j = 0
      while (j < n) { out(j) = out(j) / d; j += 1 }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val out = ctx.freshName("out"); val norm = ctx.freshName("norm"); val xi = ctx.freshName("xi")
      val d = ctx.freshName("d"); val k = ctx.freshName("k")
      val get = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      // element-null scan first (only compiled in for containsNull inputs);
      // ev.isNull is a mutable local here because nullable is true whenever
      // elemNullable is
      val nullScan =
        if (elemNullable)
          s"""for (int $k = 0; $k < $n && !${ev.isNull}; $k++) {
             |  if ($a.isNullAt($k)) { ${ev.isNull} = true; }
             |}
             |if (!${ev.isNull}) {""".stripMargin
        else "{"
      s"""
         |final int $n = $a.numElements();
         |$nullScan
         |final double[] $out = new double[$n];
         |double $norm = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xi = $get;
         |  $out[$i] = $xi;
         |  $norm += $xi * $xi;
         |}
         |final double $d = Math.sqrt($norm);
         |if ($d != 0.0) {
         |  for (int $j = 0; $j < $n; $j++) { $out[$j] = $out[$j] / $d; }
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
