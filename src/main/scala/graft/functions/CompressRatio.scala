package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal: deflate(text).length / text.length.
  *
  * A document's compressibility is a cheap model-free proxy for
  * repetitiveness — boilerplate, keyword-stuffed spam, and templated
  * pages compress far below natural prose (used as a curation signal
  * in web-corpus pipelines; cf. the repetition rules in Gopher /
  * RefinedWeb, which this complements by catching long-range
  * repetition that n-gram ratios miss). Low ratio ⇒ highly
  * repetitive; ratios near (or slightly above) 1.0 ⇒ incompressible,
  * i.e. random-like or already-compressed content — both tails are
  * suspect for training data.
  *
  * Native Catalyst expression: the generated code is one static call,
  * so it stays inside whole-stage codegen; cost is O(bytes) per row
  * with zero shuffle — it pipelines on top of the scan at corpus
  * scale. Raw DEFLATE (no zlib/gzip header) at the default level, so
  * the score reflects content, not framing overhead.
  */
object CompressStats {

  /** Deflate-compressed size over raw UTF-8 size; empty string → 1.0.
    * Deterministic for a given input (fixed level, fixed strategy).
    */
  def deflateRatio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 1.0
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    try {
      d.setInput(bytes)
      d.finish()
      // Incompressible input can exceed the input length slightly;
      // loop-accumulate rather than assuming one buffer fits.
      val buf = new Array[Byte](math.max(1024, bytes.length / 2))
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / bytes.length
    } finally d.end()
  }
}

/** `graft_deflate_ratio(str)`: DEFLATE compression ratio in (0, ~1.1]. */
case class DeflateRatio(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_deflate_ratio expects a STRING input, got " +
        child.dataType.simpleString)
  override def nullSafeEval(s: Any): Any =
    CompressStats.deflateRatio(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CompressStats.deflateRatio($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
