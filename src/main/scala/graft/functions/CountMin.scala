package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Count-Min sketch for heavy-hitter estimation, as a genuine Catalyst
  * `TypedImperativeAggregate` (the internal aggregate surface beneath
  * `Aggregator`/udaf — the buffer is an opaque JVM object serialized
  * only when a partial crosses the shuffle).
  *
  * Shape: `depth` rows × `width` counters; update adds 1 to one
  * counter per row (hash_d(x) = mix of the input hash with the row
  * seed); point estimate = min over rows. Standard guarantees for
  * depth d, width w over N increments: estimate ≥ true count always
  * (one-sided error), and ≤ true + ε·N with probability 1−(1/2)^d for
  * ε ≈ 2/w (Cormode & Muthukrishnan 2005).
  *
  * Scale design: the sketch is a FIXED d·w·8-byte buffer regardless of
  * key cardinality — partial aggregation means each executor ships one
  * buffer per group, not per key; merge is element-wise add, so the
  * result is identical under any partitioning (spec-asserted).
  *
  * Input is the PRE-HASHED value, as with KmvSketch: apply as
  * `graft_count_min(xxhash64(col), depth, width)`.
  */
object CountMin {

  /** Row-seeded avalanche mix → bucket index in [0, width). Murmur3
    * finalizer over (hash ⊕ row-seed): called from BOTH interpreted
    * eval and generated code (via the object's static forwarder).
    */
  def bucket(hash: Long, row: Int, width: Int): Int = {
    var h = hash ^ (row.toLong * 0x9e3779b97f4a7c15L)
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    (((h % width) + width) % width).toInt
  }

  /** Leading elements of the emitted sketch array: `[depth, width]`.
    * The header makes the sketch self-describing so a probe with ANY
    * mismatched dimension — including same-product shapes like (8,32)
    * vs (4,64), which a length check alone cannot distinguish — fails
    * loudly instead of reading silently-garbage bucket positions.
    */
  val HeaderLen = 2

  /** Guard shared by interpreted and generated probe code: a sketch
    * built with different (depth, width) literals than the probe's
    * would otherwise be read out of bounds (UnsafeArrayData.getLong
    * does NOT bounds-check) or with wrong bucket math, returning
    * silent garbage. Validates BOTH header dimensions and the length.
    */
  def checkShape(arr: ArrayData, depth: Int, width: Int): Unit = {
    val n = arr.numElements()
    if (n < HeaderLen || arr.getLong(0) != depth || arr.getLong(1) != width ||
        n != HeaderLen + depth * width)
      throw new IllegalArgumentException(
        s"graft_cm_estimate: sketch header says depth x width = " +
          (if (n >= HeaderLen) s"${arr.getLong(0)} x ${arr.getLong(1)}"
           else s"<missing: $n elements>") +
          s" but the probe expects depth*width = $depth x $width " +
          "- build and probe must use identical (depth, width)")
  }
}

case class CountMinAgg(child: Expression, depth: Int, width: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16, s"depth $depth out of [1,16]")
  require(width >= 2, s"width $width must be >= 2")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var d = 0
      while (d < depth) {
        buf(d * width + CountMin.bucket(h, d, width)) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  // Emit with a [depth, width] self-describing header (internal
  // update/merge buffers stay header-free).
  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Long](CountMin.HeaderLen + buf.length)
    out(0) = depth.toLong; out(1) = width.toLong
    System.arraycopy(buf, 0, out, CountMin.HeaderLen, buf.length)
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_count_min expects a BIGINT (pre-hashed) input, got " +
        child.dataType.simpleString)

  override def withNewMutableAggBufferOffset(off: Int): CountMinAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): CountMinAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(c: Expression): CountMinAgg =
    copy(child = c)
  override def prettyName: String = "graft_count_min"
}

/** Point estimate against a materialized sketch array: min over the
  * depth counters the key hashes into. Codegen'd — the probe loop
  * stays inside whole-stage codegen on the (typically broadcast)
  * candidate⋈sketch stage.
  */
case class CmEstimate(left: Expression, right: Expression,
                      depth: Int, width: Int)
  extends Expression with BinaryLike[Expression] {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_cm_estimate expects (array<bigint> sketch, bigint hash), " +
          s"got ${l.simpleString}, ${r.simpleString}")
    }

  override def eval(input: InternalRow): Any = {
    val sk = left.eval(input)
    val h = right.eval(input)
    if (sk == null || h == null) null
    else {
      val arr = sk.asInstanceOf[ArrayData]
      CountMin.checkShape(arr, depth, width)
      val hash = h.asInstanceOf[Long]
      var min = Long.MaxValue
      var d = 0
      while (d < depth) {
        val c = arr.getLong(
          CountMin.HeaderLen + d * width + CountMin.bucket(hash, d, width))
        if (c < min) min = c
        d += 1
      }
      min
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val d = ctx.freshName("d")
    val min = ctx.freshName("min")
    val c = ctx.freshName("c")
    val cm = classOf[CountMin.type].getName.stripSuffix("$")
    ev.copy(code =
      code"""
            |${leftGen.code}
            |${rightGen.code}
            |boolean ${ev.isNull} = ${leftGen.isNull} || ${rightGen.isNull};
            |long ${ev.value} = 0L;
            |if (!${ev.isNull}) {
            |  $cm.checkShape(${leftGen.value}, $depth, $width);
            |  long $min = Long.MAX_VALUE;
            |  for (int $d = 0; $d < $depth; $d++) {
            |    long $c = ${leftGen.value}.getLong($cm.HeaderLen() +
            |      $d * $width + $cm.bucket(${rightGen.value}, $d, $width));
            |    if ($c < $min) $min = $c;
            |  }
            |  ${ev.value} = $min;
            |}
          """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_cm_estimate"
}
