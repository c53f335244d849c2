package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Immutable merge-rank table shipped to executors once per task via
  * the codegen reference array (not per row): key = left + NUL + right,
  * value = rank (lower merges first).
  */
final class BpeMergeTable(merges: Seq[(String, String)]) extends Serializable {
  // boxed Integer, NOT Int: a primitive-valued map unboxes the
  // absent-key null to 0 (the TOP rank) and would merge every pair
  val ranks = new java.util.HashMap[String, java.lang.Integer](
    merges.size * 2)
  merges.zipWithIndex.foreach { case ((l, r), i) =>
    ranks.putIfAbsent(l + "\u0000" + r, i)
  }
  def rankOf(l: String, r: String): Int = {
    val v = ranks.get(l + "\u0000" + r)
    if (v == null) Int.MaxValue else v.intValue()
  }
}

/** BPE ENCODING with reference-tokenizer semantics: per whitespace
  * word, start from character symbols and repeatedly merge the
  * LOWEST-RANK adjacent pair present (greedy left-to-right within a
  * pair), until no known pair remains — the loop GPT-2/Sennrich
  * encoders use. This is NOT the same as sweeping the merge list once
  * in rank order: a late merge can create an earlier-rank pair, which
  * the sweep misses ([[graft.operators.BpeVocab.applyMerges]] is the
  * sweep form; BpeEncodeSpec pins a fixture where the two diverge).
  * The iterative min-rank loop is also why this is a rows-only query:
  * it is not replayable as SQL.
  *
  * Cost: O(symbols × merges-applied) per word, all inside whole-stage
  * codegen — the generated code is one static call and the merge
  * table rides the codegen references array, so a 100k-entry
  * vocabulary is resolved via one HashMap probe per adjacent pair.
  */
object BpeEncode {

  /** Static entry point called from generated code. */
  def encode(text: UTF8String, table: BpeMergeTable): ArrayData = {
    if (text == null) return null
    val words = text.toString.toLowerCase.split("\\s+")
    val out = new java.util.ArrayList[UTF8String]()
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) encodeWord(w, table, out)
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }

  private def encodeWord(w: String, table: BpeMergeTable,
                         out: java.util.ArrayList[UTF8String]): Unit = {
    // symbol list starts as code points
    var syms = new java.util.ArrayList[String](w.length)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      syms.add(new String(Character.toChars(cp)))
      i += Character.charCount(cp)
    }
    var done = false
    while (!done && syms.size > 1) {
      // lowest-rank adjacent pair present
      var best = Int.MaxValue
      var j = 0
      while (j < syms.size - 1) {
        val r = table.rankOf(syms.get(j), syms.get(j + 1))
        if (r < best) best = r
        j += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        // merge ALL disjoint occurrences of the best pair, left to
        // right (one pass is a fixpoint for a single pair: merging
        // consumes both symbols and the merged symbol is longer than
        // either, so no new occurrence of the same pair can appear)
        val next = new java.util.ArrayList[String](syms.size)
        var k = 0
        while (k < syms.size) {
          if (k < syms.size - 1 &&
              table.rankOf(syms.get(k), syms.get(k + 1)) == best) {
            next.add(syms.get(k) + syms.get(k + 1))
            k += 2
          } else {
            next.add(syms.get(k))
            k += 1
          }
        }
        syms = next
      }
    }
    var m = 0
    while (m < syms.size) {
      out.add(UTF8String.fromString(syms.get(m)))
      m += 1
    }
  }
}

/** `graft_bpe_encode(str, array('l r', ...))`: subword tokens of the
  * whitespace-lowercased text under the given merge list (rank =
  * array position). The merge array must be a literal — it is the
  * model, not data.
  */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_encode expects a STRING input, got " +
        child.dataType.simpleString)

  @transient private lazy val table = new BpeMergeTable(merges)

  override def nullSafeEval(s: Any): Any =
    BpeEncode.encode(s.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", table,
      classOf[BpeMergeTable].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeEncode.encode($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
