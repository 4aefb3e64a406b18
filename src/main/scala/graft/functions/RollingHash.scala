package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Karp-Rabin polynomial rolling hash of a string's bytes:
  * `h = (h * base + byte) mod modulus`, folded left-to-right.
  *
  * The expression-form equivalent (`aggregate(transform(split(text,''),
  * ascii), ...)`) allocates a per-char array and evaluates the lambda chain
  * interpreted (Spark's higher-order functions are CodegenFallback); this
  * native expression folds over the UTF8String bytes in one codegen'd loop.
  * For ASCII input the byte fold equals the per-char ascii() fold, which is
  * what the DuckDB oracle computes (fixture corpus verified ASCII-only,
  * FIXTURES.md).
  */
case class RollingHash(child: Expression, base: Long, modulus: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = (h * base + (bytes(i) & 0xff)) % modulus; i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes"); val h = ctx.freshName("h"); val i = ctx.freshName("i")
      s"""
         |final byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * ${base}L + ($bytes[$i] & 0xff)) % ${modulus}L;
         |}
         |${ev.value} = $h;
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  val Name = "graft_rolling_hash"
  val DefaultBase = 31L
  val DefaultModulus = 1000003L

  def ensureRegistered(spark: SparkSession): Unit =
    GraftFunctions.registerIfAbsent(
      spark, Name, exprs => RollingHash(exprs.head, DefaultBase, DefaultModulus))

  def rollingHash(c: Column): Column = call_function(Name, c)
}
