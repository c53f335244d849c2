package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Blocked-free classic Bloom filter over PRE-HASHED values, as a
  * mergeable Catalyst `TypedImperativeAggregate` — the file-skipping
  * sketch real table formats persist per data file (Parquet's own
  * bloom_filter pages, Iceberg Puffin blobs) for equality predicates
  * on high-cardinality columns where min/max zone maps prune nothing.
  *
  * Apply as `graft_bloom(xxhash64(col), bits)`; k probe positions are
  * derived Kirsch–Mitzenmacher style from the one 64-bit input hash
  * (h1 = hash, h2 = odd avalanche mix of hash; pos_i = h1 + i·h2
  * masked to the power-of-two width), so build and probe agree from a
  * single shared hash — including a DRIVER-side probe against a
  * persisted sketch ([[Bloom.mightContain]]), which is how the
  * VersionedTable `_bloom.json` sidecar plans file skips without
  * running a job.
  *
  * Scale design: the buffer is a fixed bits/64-long array per group
  * regardless of row count; partial aggregation ships one buffer per
  * (executor, group) and merge is word-wise OR, so the result is
  * identical under any partitioning. False positives only (a set bit
  * never unsets): a probe miss is PROOF of absence — the sound
  * direction for file skipping.
  */
object Bloom {

  /** Probes per value. With m/n ≈ 10 bits/value this sits near the
    * optimal k = m/n·ln2 ≈ 7 and keeps fpp ≈ 1 %.
    */
  val K = 6

  /** Emitted array header: `[bits, k]` — self-describing so a probe
    * against a sketch built with a different geometry fails loudly
    * (same contract as CountMin's header).
    */
  val HeaderLen = 2

  /** Murmur3 finalizer; forced odd so the Kirsch–Mitzenmacher stride
    * is coprime with the power-of-two width (a zero/even stride would
    * collapse all k probes onto one or two bits).
    */
  def stride(hash: Long): Long = {
    var h = hash
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h | 1L
  }

  /** Set this value's K bits in `words` (bits = words.length·64,
    * power of two).
    */
  def set(words: Array[Long], hash: Long): Unit = {
    val mask = words.length * 64 - 1
    val h2 = stride(hash)
    var i = 0
    var pos = hash
    while (i < K) {
      val b = (pos & mask).toInt
      words(b >>> 6) |= (1L << (b & 63))
      i += 1
      pos += h2
    }
  }

  /** Probe a HEADERED sketch (as emitted by the aggregate) for the
    * hash — false ⇒ definitely absent.
    */
  def mightContain(sketch: Array[Long], hash: Long): Boolean = {
    require(sketch.length > HeaderLen &&
      sketch(0) == (sketch.length - HeaderLen) * 64L,
      s"malformed bloom sketch: header ${sketch.headOption} vs " +
        s"${sketch.length} words")
    val mask = sketch(0) - 1
    val h2 = stride(hash)
    var i = 0
    var pos = hash
    while (i < K) {
      val b = (pos & mask).toInt
      if ((sketch(HeaderLen + (b >>> 6)) & (1L << (b & 63))) == 0L)
        return false
      i += 1
      pos += h2
    }
    true
  }

  /** ArrayData flavor for the codegen'd probe expression. */
  def mightContainArr(arr: ArrayData, hash: Long): Boolean = {
    val bits = arr.getLong(0)
    if (bits <= 0 || (arr.numElements() - HeaderLen) * 64L != bits)
      throw new IllegalArgumentException(
        s"graft_bloom_contains: sketch header $bits inconsistent with " +
          s"${arr.numElements()} elements")
    val mask = bits - 1
    val h2 = stride(hash)
    var i = 0
    var pos = hash
    while (i < K) {
      val b = (pos & mask).toInt
      if ((arr.getLong(HeaderLen + (b >>> 6)) & (1L << (b & 63))) == 0L)
        return false
      i += 1
      pos += h2
    }
    true
  }

  /** The driver-side twin of SQL `xxhash64(BIGINT col)` — probing a
    * sidecar sketch for a literal must reproduce the builder's hash
    * exactly.
    */
  def hashLong(v: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function
      .hash(v, LongType, 42L)

  /** Driver-side twin of SQL `xxhash64(STRING col)`. */
  def hashString(v: String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function
      .hash(org.apache.spark.unsafe.types.UTF8String.fromString(v),
        StringType, 42L)
}

/** `graft_bloom(hash, bits)` — bits must be a power of two ≥ 64. */
case class BloomAgg(child: Expression, bits: Int,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(bits >= 64 && (bits & (bits - 1)) == 0,
    s"bits $bits must be a power of two >= 64")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](bits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Bloom.set(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Long](Bloom.HeaderLen + buf.length)
    out(0) = bits.toLong; out(1) = Bloom.K.toLong
    System.arraycopy(buf, 0, out, Bloom.HeaderLen, buf.length)
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
      s"graft_bloom expects a BIGINT (pre-hashed) input, got " +
        child.dataType.simpleString)

  override def withNewMutableAggBufferOffset(off: Int): BloomAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): BloomAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildInternal(c: Expression): BloomAgg =
    copy(child = c)
  override def prettyName: String = "graft_bloom"
}

/** `graft_bloom_contains(sketch, hash)` — codegen'd membership probe
  * against a materialized sketch (typically broadcast), for semi-join
  * pre-filters: probe the small side's bloom before paying the shuffle
  * for the real join.
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends Expression with BinaryLike[Expression] {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains expects (array<bigint> sketch, bigint " +
          s"hash), got ${l.simpleString}, ${r.simpleString}")
    }

  override def eval(input: InternalRow): Any = {
    val sk = left.eval(input)
    val h = right.eval(input)
    if (sk == null || h == null) null
    else Bloom.mightContainArr(sk.asInstanceOf[ArrayData],
      h.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val bl = classOf[Bloom.type].getName.stripSuffix("$")
    ev.copy(code =
      code"""
            |${leftGen.code}
            |${rightGen.code}
            |boolean ${ev.isNull} = ${leftGen.isNull} || ${rightGen.isNull};
            |boolean ${ev.value} = false;
            |if (!${ev.isNull}) {
            |  ${ev.value} = $bl.mightContainArr(${leftGen.value},
            |    ${rightGen.value});
            |}
          """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_bloom_contains"
}
