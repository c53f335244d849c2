package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_md5i(str, nibbles)`: the first `nibbles` hex digits of
  * md5(str) as a non-negative long — BIT-IDENTICAL to the SQL idiom
  * `cast(conv(substr(md5(str), 1, nibbles), 16, 10) as bigint)` that
  * the engine's hash-derived features are specified in (classifier
  * buckets/weights, simhash bit hashes, fingerprints, winnowing,
  * md5-uniform split/sample ranks), and that external oracles replay.
  *
  * Why a native expression: the SQL idiom materializes a 32-char hex
  * STRING per call (md5 → hex encode), substrings it, then PARSES it
  * back to an integer (`conv` walks digits) — three allocations and
  * two format conversions to move 8 bytes. This expression reads the
  * digest bytes directly (nibble arithmetic, zero intermediate
  * allocations beyond the digest array) and keeps a thread-local
  * MessageDigest so no per-row `getInstance` lookup. Same value, one
  * conversion fewer in every hash-derived hot path — including
  * inside `aggregate`/`transform` lambdas, which execute interpreted
  * and pay the string round-trip at full price.
  *
  * `nibbles` must be 1..15 (≤ 60 bits — stays positive in a long).
  */
object Md5Prefix {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def eval(s: UTF8String, nibbles: Int): Long = eval(s, nibbles, 0)

  /** Hex digits [offset, offset+nibbles) of md5(str) as a long — the
    * general form backing `conv(substr(md5(x), offset+1, nibbles),
    * 16, 10)` (e.g. simhash's 64-bit hash = eval(t,8,0)·2³² +
    * eval(t,8,8)).
    */
  def eval(s: UTF8String, nibbles: Int, offset: Int): Long = {
    val d = md.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var v = 0L
    var i = offset
    val end = offset + nibbles
    while (i < end) {
      val b = digest(i >> 1) & 0xff
      val nib = if ((i & 1) == 0) b >>> 4 else b & 0xf
      v = (v << 4) | nib
      i += 1
    }
    v
  }
}

/** Catalyst expression for [[Md5Prefix.eval]]; `nibbles` and `offset`
  * are bound at construction (literals in SQL; arity-2 form means
  * offset 0).
  */
case class Md5PrefixLong(child: Expression, nibbles: Int, offset: Int = 0)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_md5i expects a STRING input, got ${child.dataType.simpleString}")
    else if (nibbles < 1 || nibbles > 15)
      TypeCheckResult.TypeCheckFailure(
        s"graft_md5i nibbles must be in [1, 15], got $nibbles")
    else if (offset < 0 || offset + nibbles > 32)
      TypeCheckResult.TypeCheckFailure(
        s"graft_md5i offset+nibbles must fit the 32-digit md5, " +
          s"got offset=$offset nibbles=$nibbles")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(s: Any): Any =
    Md5Prefix.eval(s.asInstanceOf[UTF8String], nibbles, offset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5Prefix.eval($c, $nibbles, $offset)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
