package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken, SIGMOD
  * 2003) as ONE pass per document: k-gram Karp-Rabin hashes ([[RollingHash]]
  * semantics — byte fold, equal to the char fold on the ASCII-verified
  * fixture), sliding-window minima via a monotone deque (O(n) total — the
  * deque keeps candidate minima strictly increasing; a new hash pops every
  * back element ≥ it, which is also exactly the rightmost-on-ties rule),
  * and inline dedup of repeated picks.
  *
  * The expression-form equivalent (transform over gram starts with a
  * nested aggregate fold per window) evaluates interpreted — measured
  * 5.0 s at sf0.1 — and needs a `distinct` shuffle afterwards; this native
  * expression is a codegen-reachable JVM loop with the dedup inside, so
  * the whole selection stays scan-local with NO exchange at all.
  *
  * Returns an array of [fp, pos] pairs (pos = 1-based gram start),
  * first-pick order; empty array for docs shorter than k chars.
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int, base: Long, modulus: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def prettyName: String = "graft_winnow_fingerprint"

  @transient private lazy val winnower = new Winnower(k, w, base, modulus)

  override def nullSafeEval(v: Any): Any =
    winnower.winnow(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnower", winnower, classOf[Winnower].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.winnow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The per-document selection loop, shared by eval and codegen. */
class Winnower(k: Int, w: Int, base: Long, modulus: Long) extends Serializable {
  // the dedup set packs (fp << 44) | pos into one long — sound only while
  // fp < 2^20; a larger modulus would silently alias picks, so refuse it
  require(modulus > 0 && modulus < (1L << 20),
    s"winnow modulus must be in (0, 2^20) for the packed dedup key, got $modulus")

  def winnow(text: UTF8String): GenericArrayData = {
    val bytes = text.getBytes
    val ng = bytes.length - k + 1
    if (ng <= 0) return new GenericArrayData(Array.empty[Any])
    // gram hashes (k is small; the plain refold is one multiply-add per
    // byte and avoids the negative-modulo care a rolling update needs)
    val hs = new Array[Long](ng)
    var i = 0
    while (i < ng) {
      var h = 0L; var j = 0
      while (j < k) { h = (h * base + (bytes(i + j) & 0xff)) % modulus; j += 1 }
      hs(i) = h
      i += 1
    }
    // monotone deque of gram indices, hashes strictly increasing
    // front→back; popping the back while back ≥ new is exactly the
    // rightmost-on-ties rule (an equal earlier gram can never win again)
    val effW = math.min(w, ng) // docs with < w grams winnow one truncated window
    val deque = new Array[Int](ng)
    var head = 0; var tail = 0 // live slice is [head, tail)
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    // dedup of repeated picks: fp < modulus < 2^20 and pos ≤ ng, so
    // (fp << 44) | pos is collision-free for any text below 16 TiB
    val seen = new java.util.HashSet[Long]()
    var e = 0 // window END gram index
    while (e < ng) {
      while (tail > head && hs(deque(tail - 1)) >= hs(e)) tail -= 1
      deque(tail) = e; tail += 1
      if (e >= effW - 1) {
        val s0 = e - effW + 1
        while (deque(head) < s0) head += 1
        val m = deque(head)
        val fp = hs(m); val pos = (m + 1).toLong
        if (seen.add((fp << 44) | pos)) out += new GenericArrayData(Array[Any](fp, pos))
      }
      e += 1
    }
    new GenericArrayData(out.toArray)
  }
}

object WinnowFingerprint {
  /** Register (idempotently) a winnow function for (k, w); name keyed on
    * the parameters so distinct configurations coexist in one session.
    */
  def ensureRegistered(spark: SparkSession, k: Int, w: Int): String = {
    val name = s"graft_winnow_fingerprint_${k}_$w"
    GraftFunctions.registerIfAbsent(spark, name,
      exprs => WinnowFingerprint(exprs.head, k, w,
        RollingHash.DefaultBase, RollingHash.DefaultModulus))
    name
  }

  def winnowCol(spark: SparkSession, k: Int, w: Int)(c: Column): Column =
    call_function(ensureRegistered(spark, k, w), c)
}
