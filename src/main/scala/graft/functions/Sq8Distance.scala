package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native ADC (asymmetric distance computation) scoring for the
  * IVF-SQ8 search path: the squared L2 distance between a query's
  * pre-folded residual and a corpus vector's 1-byte quantized residual,
  *
  *   d² = Σ_p (a_p − code_p · scale_p)²
  *
  * where the caller pre-computes `a_p = qr_p − lo_p − 128·scale_p` once
  * per (query, probed list) — folding the dequantization affine
  * (`deq_p = lo_p + (code_p + 128)·scale_p`) into the tiny query side so
  * the per-candidate loop is one multiply-subtract-square per dimension.
  *
  * This replaces a posexplode→broadcast-join→hash-aggregate formulation
  * of the same sum (one row per (query, candidate, dimension) through an
  * exchange) with a single whole-stage-codegen pass over the candidate
  * rows: the corpus-sized side is scanned once and never widened by the
  * dimension count. Same design rationale as [[CosineSimilarity]] — the
  * `aggregate`/`zip_with` higher-order form runs interpreted.
  *
  * Semantics: null if any input array is null; dimensions beyond the
  * shortest array are ignored; null elements count as 0.
  */
case class Sq8Distance(first: Expression, second: Expression,
                       third: Expression) extends TernaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def dbl(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val codesOk = third.dataType match {
      case ArrayType(ByteType, _) => true
      case _ => false
    }
    if (dbl(first.dataType) && dbl(second.dataType) && codesOk)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sq8_d2 expects (array<float|double> a, array<float|double> " +
        s"scale, array<tinyint> codes), got ${first.dataType.simpleString}, " +
        s"${second.dataType.simpleString}, ${third.dataType.simpleString}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, s: Any, c: Any): Any = {
    val (aa, ss, cc) = (a.asInstanceOf[ArrayData], s.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData])
    val (ta, ts) = (elemType(first), elemType(second))
    val n = math.min(math.min(aa.numElements(), ss.numElements()),
      cc.numElements())
    var d2 = 0.0
    var i = 0
    while (i < n) {
      val av = if (aa.isNullAt(i)) 0.0 else ta match {
        case FloatType => aa.getFloat(i).toDouble
        case _ => aa.getDouble(i)
      }
      val sv = if (ss.isNullAt(i)) 0.0 else ts match {
        case FloatType => ss.getFloat(i).toDouble
        case _ => ss.getDouble(i)
      }
      val cv = if (cc.isNullAt(i)) 0.0 else cc.getByte(i).toDouble
      val d = av - cv * sv
      d2 += d * d
      i += 1
    }
    d2
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getA = if (elemType(first) == FloatType) "getFloat" else "getDouble"
    val getS = if (elemType(second) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, s, c) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d2 = ctx.freshName("d2")
      val av = ctx.freshName("av")
      val sv = ctx.freshName("sv")
      val cv = ctx.freshName("cv")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min(
         |  java.lang.Math.min($a.numElements(), $s.numElements()),
         |  $c.numElements());
         |double $d2 = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $av = $a.isNullAt($i) ? 0.0 : (double) $a.$getA($i);
         |  double $sv = $s.isNullAt($i) ? 0.0 : (double) $s.$getS($i);
         |  double $cv = $c.isNullAt($i) ? 0.0 : (double) $c.getByte($i);
         |  double $d = $av - $cv * $sv;
         |  $d2 += $d * $d;
         |}
         |${ev.value} = $d2;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
