package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity of two float/double
  * array columns, with full `doGenCode` — the generated Java is a tight
  * primitive loop INSIDE whole-stage codegen, unlike the
  * `aggregate`/`zip_with` higher-order formulation which executes each
  * lambda interpreted (measured 3-4× slower on the ANN paths).
  *
  * Semantics: null if either array is null or either norm is 0; null
  * ELEMENTS count as 0; dimensions beyond the shorter array ignored.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine expects array<float|double> inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(aa.numElements(), bb.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aa.isNullAt(i)) 0.0 else ta match {
        case FloatType => aa.getFloat(i).toDouble
        case _ => aa.getDouble(i)
      }
      val y = if (bb.isNullAt(i)) 0.0 else tb match {
        case FloatType => bb.getFloat(i).toDouble
        case _ => bb.getDouble(i)
      }
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getA = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val getB = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.isNullAt($i) ? 0.0 : (double) $a.$getA($i);
         |  double $y = $b.isNullAt($i) ? 0.0 : (double) $b.$getB($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |if ($denom == 0.0) { ${ev.isNull} = true; }
         |else { ${ev.value} = $dot / $denom; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration plumbing: `graft_cosine` is available (a) through the
  * proper `spark.sql.extensions=graft.GraftExtensions` wiring, and
  * (b) via `GraftFunctions.ensureRegistered(spark)` for sessions built
  * without the conf (tests, driver-owned sessions). Both register the
  * same builder; repeat registration is a no-op overwrite.
  */
object GraftFunctions {
  import org.apache.spark.sql.catalyst.expressions.Literal

  val cosineInfo = new ExpressionInfo(
    classOf[CosineSimilarity].getName, "graft_cosine")

  /** Single shared builder — both registration paths must behave
    * identically (incl. the arity error).
    */
  val cosineBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "graft_cosine takes 2 arguments")
    CosineSimilarity(children.head, children(1))
  }

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val countMinInfo = new ExpressionInfo(
    classOf[CountMinAgg].getName, "graft_count_min")
  val countMinBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 3,
      "graft_count_min takes (hash, depth, width)")
    CountMinAgg(children.head,
      litInt(children(1), "depth"), litInt(children(2), "width"))
      .toAggregateExpression()
  }

  val cmEstimateInfo = new ExpressionInfo(
    classOf[CmEstimate].getName, "graft_cm_estimate")
  val cmEstimateBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 4,
      "graft_cm_estimate takes (sketch, hash, depth, width)")
    CmEstimate(children.head, children(1),
      litInt(children(2), "depth"), litInt(children(3), "width"))
  }

  val tdigestInfo = new ExpressionInfo(
    classOf[TDigestAgg].getName, "graft_tdigest")
  val tdigestBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2,
      "graft_tdigest takes (value, compression)")
    TDigestAgg(children.head, litInt(children(1), "compression"))
      .toAggregateExpression()
  }

  val tdQuantileInfo = new ExpressionInfo(
    classOf[TdQuantile].getName, "graft_td_quantile")
  val tdQuantileBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2,
      "graft_td_quantile takes (digest, q)")
    TdQuantile(children.head, children(1))
  }

  val topKInfo = new ExpressionInfo(
    classOf[TopKAgg].getName, "graft_topk")
  val topKBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 3,
      "graft_topk takes (score, id, k)")
    TopKAgg(children.head, children(1), litInt(children(2), "k"))
      .toAggregateExpression()
  }

  val kmvSetOpsInfo = new ExpressionInfo(
    classOf[KmvSetOps].getName, "graft_kmv_setops")
  val kmvSetOpsBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 3,
      "graft_kmv_setops takes (sketch_a, sketch_b, k)")
    KmvSetOps(children.head, children(1), litInt(children(2), "k"))
  }

  val editWithinInfo = new ExpressionInfo(
    classOf[EditWithin].getName, "graft_edit_within")
  val editWithinBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 3,
      "graft_edit_within takes (a, b, k)")
    EditWithin(children.head, children(1), litInt(children(2), "k"))
  }

  val sq8Info = new ExpressionInfo(
    classOf[Sq8Distance].getName, "graft_sq8_d2")
  val sq8Builder: Seq[Expression] => Expression = { children =>
    require(children.length == 3,
      "graft_sq8_d2 takes (a, scale, codes)")
    Sq8Distance(children.head, children(1), children(2))
  }

  val deflateRatioInfo = new ExpressionInfo(
    classOf[DeflateRatio].getName, "graft_deflate_ratio")
  val deflateRatioBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, "graft_deflate_ratio takes 1 argument")
    DeflateRatio(children.head)
  }

  val nfcInfo = new ExpressionInfo(
    classOf[NfcNormalize].getName, "graft_nfc")
  val nfcBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, "graft_nfc takes 1 argument")
    NfcNormalize(children.head)
  }

  val stripAccentsInfo = new ExpressionInfo(
    classOf[StripAccents].getName, "graft_strip_accents")
  val stripAccentsBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, "graft_strip_accents takes 1 argument")
    StripAccents(children.head)
  }

  val bpeEncodeInfo = new ExpressionInfo(
    classOf[BpeEncodeExpr].getName, "graft_bpe_encode")
  val bpeEncodeBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2,
      "graft_bpe_encode takes (text, merges array of 'left right')")
    val merges = children(1) match {
      case e if e.foldable && e.dataType.isInstanceOf[ArrayType] =>
        val arr = e.eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        (0 until arr.numElements()).map { i =>
          val s = arr.getUTF8String(i).toString
          val sp = s.indexOf(' ')
          require(sp > 0 && sp < s.length - 1,
            s"merge '$s' must be 'left right'")
          (s.substring(0, sp), s.substring(sp + 1))
        }
      case _ => throw new IllegalArgumentException(
        "graft_bpe_encode merges must be a literal array — the merge " +
          "list is the model, not per-row data")
    }
    BpeEncodeExpr(children.head, merges)
  }

  val randomProjectInfo = new ExpressionInfo(
    classOf[RandomProjectExpr].getName, "graft_random_project")
  val randomProjectBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 3,
      "graft_random_project takes (embedding, inDims, outDims)")
    RandomProjectExpr(children.head,
      litInt(children(1), "inDims"), litInt(children(2), "outDims"))
  }

  val md5iInfo = new ExpressionInfo(
    classOf[Md5PrefixLong].getName, "graft_md5i")
  val md5iBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2 || children.length == 3,
      "graft_md5i takes (str, nibbles[, offset])")
    Md5PrefixLong(children.head, litInt(children(1), "nibbles"),
      if (children.length == 3) litInt(children(2), "offset") else 0)
  }

  val bloomInfo = new ExpressionInfo(
    classOf[BloomAgg].getName, "graft_bloom")
  val bloomBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "graft_bloom takes (hash, bits)")
    BloomAgg(children.head, litInt(children(1), "bits"))
      .toAggregateExpression()
  }

  val bloomContainsInfo = new ExpressionInfo(
    classOf[BloomMightContain].getName, "graft_bloom_contains")
  val bloomContainsBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2,
      "graft_bloom_contains takes (sketch, hash)")
    BloomMightContain(children.head, children(1))
  }

  private val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(("graft_cosine", cosineInfo, cosineBuilder),
      ("graft_bloom", bloomInfo, bloomBuilder),
      ("graft_bloom_contains", bloomContainsInfo, bloomContainsBuilder),
      ("graft_md5i", md5iInfo, md5iBuilder),
      ("graft_random_project", randomProjectInfo, randomProjectBuilder),
      ("graft_deflate_ratio", deflateRatioInfo, deflateRatioBuilder),
      ("graft_nfc", nfcInfo, nfcBuilder),
      ("graft_strip_accents", stripAccentsInfo, stripAccentsBuilder),
      ("graft_bpe_encode", bpeEncodeInfo, bpeEncodeBuilder),
      ("graft_count_min", countMinInfo, countMinBuilder),
      ("graft_cm_estimate", cmEstimateInfo, cmEstimateBuilder),
      ("graft_tdigest", tdigestInfo, tdigestBuilder),
      ("graft_td_quantile", tdQuantileInfo, tdQuantileBuilder),
      ("graft_topk", topKInfo, topKBuilder),
      ("graft_kmv_setops", kmvSetOpsInfo, kmvSetOpsBuilder),
      ("graft_edit_within", editWithinInfo, editWithinBuilder),
      ("graft_sq8_d2", sq8Info, sq8Builder))

  def ensureRegistered(spark: SparkSession): Unit =
    all.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info, builder)
    }

  private[functions] def injections = all
}

/** `SparkSessionExtensions` entry point:
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.injections.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // stats-driven auto-broadcast for graft-table joins (pre-CBO:
    // after scan pushdown, before join planning); running sessions
    // use GraftBroadcastStats.install instead
    ext.injectPreCBORule(graft.plans.GraftBroadcastStats(_))
    // real SupportsReportStatistics through the V1 fallback wrapper —
    // every stats consumer (JoinSelection/CBO/AQE) sees manifest
    // bytes + sidecar row counts, not the default infinite size
    ext.injectPreCBORule(graft.plans.GraftScanStats(_))
    // SQL UPDATE / MERGE INTO / DELETE-with-subquery on graft tables
    // (post-hoc: the stock analyzer resolves the command first)
    ext.injectPostHocResolutionRule(graft.plans.GraftSqlRules(_))
    // persisted views (CREATE/DROP/SHOW VIEW + SELECT substitution)
    ext.injectHintResolutionRule(graft.plans.GraftViewSubstitution(_))
    ext.injectHintResolutionRule(graft.plans.GraftViewDdl(_))
  }
}
