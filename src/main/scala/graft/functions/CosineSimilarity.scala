package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over two
  * `array<double>` columns, with whole-stage codegen.
  *
  * Replaces the three-pass `zip_with` + `aggregate` expression form
  * (VectorFunctions.cosineSimilarity) with a single fused loop over the two
  * arrays — one pass, no intermediate array allocation, branch-free inner
  * loop. Both forms accumulate dot/norms left-to-right in double, so they
  * are bit-identical (property-tested in CosineSimilaritySpec).
  *
  * Semantics: score 0.0 when either vector has zero norm (the project's
  * documented zero-vector policy, SURVEY.md §5); arrays of unequal length
  * are scored over the common prefix (fixtures are fixed-dim so this never
  * triggers; it avoids a runtime throw inside codegen).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> or array<float> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  /** Float arrays are read element-wise and widened (exactly) to double —
    * no upfront Cast materializing a doubled copy of every corpus vector.
    */
  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** A null ELEMENT in either array nulls the score (a vector with an
    * undefined component has no similarity) — same policy as
    * [[L2Normalize]], so `containsNull=true` inputs never read garbage.
    */
  private def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, n) => n
    case _ => false
  }

  override def nullable: Boolean =
    left.nullable || right.nullable || elemNullable(left) || elemNullable(right)

  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = isFloat(left); val rf = isFloat(right)
    val n = math.min(x.numElements(), y.numElements())
    // null scans run over EACH array's full length, not the common prefix —
    // a null beyond the shorter array still makes the vector undefined
    if (elemNullable(left)) {
      var i = 0
      while (i < x.numElements()) { if (x.isNullAt(i)) return null; i += 1 }
    }
    if (elemNullable(right)) {
      var i = 0
      while (i < y.numElements()) { if (y.isNullAt(i)) return null; i += 1 }
    }
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      val getX = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      val k = ctx.freshName("k")
      // element-null scans, compiled in only for containsNull inputs;
      // ev.isNull is a mutable local because nullable is true whenever
      // either side's elements are nullable
      // scans run over each array's own numElements (not the common prefix)
      val scans = Seq(
        if (elemNullable(left))
          s"""for (int $k = 0; $k < $a.numElements() && !${ev.isNull}; $k++) {
             |  if ($a.isNullAt($k)) { ${ev.isNull} = true; }
             |}""".stripMargin
        else "",
        if (elemNullable(right))
          s"""for (int $k = 0; $k < $b.numElements() && !${ev.isNull}; $k++) {
             |  if ($b.isNullAt($k)) { ${ev.isNull} = true; }
             |}""".stripMargin
        else "").mkString("\n")
      val guardOpen  = if (elemNullable(left) || elemNullable(right)) s"if (!${ev.isNull}) {" else "{"
      s"""
         |final int $n = Math.min($a.numElements(), $b.numElements());
         |$scans
         |$guardOpen
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xi = $getX;
         |  final double $yi = $getY;
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |final double $denom = Math.sqrt($nx) * Math.sqrt($ny);
         |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
         |}
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session-side registration + Column-API access for graft's native
  * expressions. Spark 4 removed the public `new Column(Expression)`
  * constructor, so the expression is exposed through the function registry
  * and `call_function`.
  */
object GraftFunctions {
  val CosineName    = "graft_cosine"
  val NormalizeName = "graft_l2_normalize"
  val BloomAggName          = "graft_bloom_agg"
  val BloomMightContainName = "graft_bloom_might_contain"
  val SignBitsName  = "graft_sign_bits_pack"
  val HammingName   = "graft_hamming_dist"
  val RotateHdName  = "graft_rotate_hd"
  val SimhashName   = "graft_simhash_code"

  /** Builder shared by the registry and the session extension: the pack
    * width must arrive as an integer literal (it is a plan-time constant —
    * the compiled word count — not data).
    */
  private[functions] def signBitsBuilder(exprs: Seq[Expression]): Expression = {
    val dim = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$SignBitsName: dim must be an integer literal, got $other")
    }
    SignBitsPack(exprs(0), dim)
  }

  /** Builder for the pinned HD rotation: (vector, dim, seed, rounds) with
    * the last three as literals — the rotation is a plan-time constant.
    */
  private[functions] def rotateHdBuilder(exprs: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{IntegerType, LongType}
    (exprs(1), exprs(2), exprs(3)) match {
      case (Literal(d: Int, IntegerType), Literal(s: Long, LongType), Literal(r: Int, IntegerType)) =>
        RotateHd(exprs(0), d, s, r)
      case other => throw new IllegalArgumentException(
        s"$RotateHdName: (dim, seed, rounds) must be (int, long, int) literals, got $other")
    }
  }

  /** Idempotently register graft expressions on a session. Checks the
    * registry first: re-registering on every operator call logs a
    * `SimpleFunctionRegistry ... replaced` warning per query, burying real
    * warnings in the bench/verify tails.
    *
    * The two bloom entries expose Spark's OWN codegen'd runtime-filter
    * expressions (`BloomFilterAggregate` / `BloomFilterMightContain` —
    * public Catalyst classes that Spark injects for join runtime filters
    * but does not put in the session registry) so
    * [[graft.operators.TextAnalysis.decontaminateBloom]] gets a scan-side
    * bloom membership test without a Scala UDF.
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    registerIfAbsent(spark, CosineName, exprs => CosineSimilarity(exprs(0), exprs(1)))
    registerIfAbsent(spark, NormalizeName, exprs => L2Normalize(exprs.head))
    registerIfAbsent(spark, BloomAggName, exprs =>
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        exprs(0), exprs(1), exprs(2)))
    registerIfAbsent(spark, BloomMightContainName, exprs =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(exprs(0), exprs(1)))
    registerIfAbsent(spark, SignBitsName, signBitsBuilder)
    registerIfAbsent(spark, HammingName, exprs => HammingDistPacked(exprs(0), exprs(1)))
    registerIfAbsent(spark, RotateHdName, rotateHdBuilder)
    registerIfAbsent(spark, SimhashName, simhashBuilder)
  }

  /** Builder for the pinned-plane SimHash block code: (vector, width,
    * seed, bits) with the last three as literals — the plane matrix is a
    * plan-time constant.
    */
  private[functions] def simhashBuilder(exprs: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{IntegerType, LongType}
    (exprs(1), exprs(2), exprs(3)) match {
      case (Literal(w: Int, IntegerType), Literal(s: Long, LongType), Literal(b: Int, IntegerType)) =>
        SimhashCode(exprs(0), w, s, b)
      case other => throw new IllegalArgumentException(
        s"$SimhashName: (width, seed, bits) must be (int, long, int) literals, got $other")
    }
  }

  private[functions] def registerIfAbsent(
      spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "built-in")
  }

  /** Cosine similarity via the native expression; inputs must already be
    * `array<double>` (use VectorFunctions.toDouble).
    */
  def cosine(a: Column, b: Column): Column = call_function(CosineName, a, b)

  /** L2 normalization via the native expression (accepts float or double
    * arrays; emits array<double>).
    */
  def normalize(a: Column): Column = call_function(NormalizeName, a)

  /** Multi-word sign-bit pack via the native expression: `array<long>` of
    * ceil(dim/64) words over a float/double embedding.
    */
  def signBitsPack(a: Column, dim: Int): Column =
    call_function(SignBitsName, a, org.apache.spark.sql.functions.lit(dim))

  /** Summed per-word popcount-xor Hamming distance between two packs. */
  def hammingDist(a: Column, b: Column): Column = call_function(HammingName, a, b)

  /** Pinned seeded HD rotation (±1 diagonal × Walsh–Hadamard, `rounds`
    * blocks) over the first `dim` components, zero-padded to the next
    * power of two; emits `array<double>` of that padded width.
    */
  def rotateHd(a: Column, dim: Int, seed: Long,
               rounds: Int = RotateHd.DefaultRounds): Column = {
    import org.apache.spark.sql.functions.lit
    call_function(RotateHdName, a, lit(dim), lit(seed), lit(rounds))
  }

  /** Pinned-plane SimHash block code over the 6-dp-quantized vector
    * ([[SimhashCode]]): `bits` seeded ±1 planes of `width`, emits the
    * 64-bit block key.
    */
  def simhashCode(a: Column, width: Int, seed: Long, bits: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function(SimhashName, a, lit(width), lit(seed), lit(bits))
  }
}

/** Session-extension entry point for cluster deployments: registers graft's
  * native functions at session build time, so SQL-only users get them
  * without any Scala call:
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  *   // or: --conf spark.sql.extensions=graft.functions.GraftExtensions
  * }}}
  *
  * Operator methods call `GraftFunctions.ensureRegistered` themselves, so
  * the extension is optional for the Scala API.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier(GraftFunctions.CosineName),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CosineSimilarity].getCanonicalName, GraftFunctions.CosineName),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier(GraftFunctions.NormalizeName),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[L2Normalize].getCanonicalName, GraftFunctions.NormalizeName),
      (exprs: Seq[Expression]) => L2Normalize(exprs.head)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier(RollingHash.Name),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[RollingHash].getCanonicalName, RollingHash.Name),
      (exprs: Seq[Expression]) =>
        RollingHash(exprs.head, RollingHash.DefaultBase, RollingHash.DefaultModulus)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier(GraftFunctions.BloomAggName),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getCanonicalName,
        GraftFunctions.BloomAggName),
      (exprs: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          exprs(0), exprs(1), exprs(2))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier(GraftFunctions.BloomMightContainName),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getCanonicalName,
        GraftFunctions.BloomMightContainName),
      (exprs: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(exprs(0), exprs(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier(GraftFunctions.SignBitsName),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SignBitsPack].getCanonicalName, GraftFunctions.SignBitsName),
      (exprs: Seq[Expression]) => GraftFunctions.signBitsBuilder(exprs)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier(GraftFunctions.HammingName),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[HammingDistPacked].getCanonicalName, GraftFunctions.HammingName),
      (exprs: Seq[Expression]) => HammingDistPacked(exprs(0), exprs(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier(GraftFunctions.RotateHdName),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[RotateHd].getCanonicalName, GraftFunctions.RotateHdName),
      (exprs: Seq[Expression]) => GraftFunctions.rotateHdBuilder(exprs)))
    e.injectOptimizerRule(_ => graft.plans.StripCosineCasts)
    e.injectOptimizerRule(_ => graft.plans.StripRedundantNormalize)
  }
}
