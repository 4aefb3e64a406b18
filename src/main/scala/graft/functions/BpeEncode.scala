package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Applies a fixed BPE merge table to one token: split to characters,
  * then one greedy-left single-pair merge pass per table row, in rank
  * order — the segmentation the training loop itself produces
  * ([[graft.operators.Bpe.bpeTrainOf]] semantics, spec-pinned against
  * the same imperative reference).
  *
  * The expression-form equivalent (a merge-table-deep chain of
  * `aggregate` HOFs inside `transform`) evaluates interpreted with a
  * struct allocation per symbol per level — measured 23.5 s for a
  * 12-merge table over the sf0.1 corpus. This native expression runs
  * the whole chain as one JVM loop per token inside whole-stage
  * codegen (~0.4 s same corpus) and has no depth limit, which is what
  * makes production-size merge tables usable at all.
  *
  * Per-token cost is O(|merges| × len): every rank makes one pass.
  * That is the honest price of rank-order semantics; for deep tables
  * amortize it over distinct tokens via
  * [[graft.operators.Bpe.bpeEncodeViaTypes]] (the type table is
  * Heaps-bounded, so per-corpus cost is |types| × depth, not
  * |instances| × depth).
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  @transient private lazy val encoder = new BpeMergeEncoder(merges.toArray)

  override def nullSafeEval(v: Any): Any =
    encoder.encode(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncoder", encoder, classOf[BpeMergeEncoder].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The per-token merge loop, shared by eval and codegen (the generated
  * code calls [[encode]] through a broadcast-safe reference object; the
  * loop itself is plain JVM arrays, no Catalyst values).
  */
class BpeMergeEncoder(merges: Array[(String, String)]) extends Serializable {
  // precomputed (a, b, ab) to avoid per-row concatenation
  private val as  = merges.map(_._1)
  private val bs  = merges.map(_._2)
  private val abs = merges.map(m => m._1 + m._2)

  def encode(tok: UTF8String): ArrayData = {
    val s = tok.toString
    // initial symbols: one per code point (mirrors regex `(.)` on both
    // engines; fixture corpus is ASCII where all tokenizers agree)
    var n = 0
    val syms = new Array[String](s.length)
    var ci = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      syms(n) = new String(Character.toChars(cp))
      n += 1
      ci += Character.charCount(cp)
    }
    // one greedy-left pass per merge rank, compacting in place (the
    // write cursor never passes the read cursor)
    var m = 0
    while (m < merges.length && n >= 2) {
      val a = as(m); val b = bs(m); val ab = abs(m)
      var i = 0; var w = 0
      while (i < n) {
        if (i + 1 < n && syms(i) == a && syms(i + 1) == b) {
          syms(w) = ab; i += 2
        } else {
          syms(w) = syms(i); i += 1
        }
        w += 1
      }
      n = w
      m += 1
    }
    val out = new Array[Any](n)
    var k = 0
    while (k < n) { out(k) = UTF8String.fromString(syms(k)); k += 1 }
    new GenericArrayData(out)
  }
}

object BpeEncode {
  /** Register (idempotently) an encode function bound to `merges`;
    * returns the registry name. The name keys on a 128-bit MD5 content
    * digest of the table (length-prefixed pair encoding, so no two
    * distinct tables share a serialization) — distinct tables coexist in
    * one session, repeated calls with the same table reuse the entry, and
    * unlike a 32-bit `hashCode` a collision silently reusing the WRONG
    * table is out of practical reach.
    */
  def ensureRegistered(spark: SparkSession, merges: Seq[(String, String)]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    merges.foreach { case (a, b) =>
      val ab = a.getBytes("UTF-8"); val bb = b.getBytes("UTF-8")
      md.update(java.nio.ByteBuffer.allocate(8).putInt(ab.length).putInt(bb.length).array())
      md.update(ab); md.update(bb)
    }
    val name = s"graft_bpe_encode_${md.digest().map("%02x".format(_)).mkString}"
    GraftFunctions.registerIfAbsent(spark, name, exprs => BpeEncode(exprs.head, merges))
    name
  }

  def encodeCol(spark: SparkSession, merges: Seq[(String, String)])(c: Column): Column =
    call_function(ensureRegistered(spark, merges), c)
}
