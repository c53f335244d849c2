package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k per group as a mergeable `TypedImperativeAggregate`:
  * `graft_topk(score, id, k)` → `array<struct<score:bigint,id:bigint>>`
  * ordered (score DESC, id ASC), length ≤ k.
  *
  * This is THE scale replacement for the `row_number() OVER (PARTITION
  * BY g ORDER BY s DESC) <= k` window idiom: the window form shuffles
  * and SORTS every input row per group before discarding all but k,
  * while this aggregate keeps O(k) state per group, combines map-side
  * (each executor ships at most k pairs per group across the
  * shuffle), and never materializes a per-group sort of the full
  * input. At 100 TB with millions of groups the window sort is a
  * top-line cost; the bounded heap is a hash-aggregate pass.
  *
  * Determinism: total order (score DESC, id ASC) with exact integer
  * keys — ties cut by id, so the result set is unique regardless of
  * partitioning (spec-asserted under repartition). Identical
  * (score, id) pairs collapse (the state is a set); callers pass a
  * unique id, which any row-identity column provides.
  */
object TopK {

  /** Composite ordering: score DESC, then id ASC. */
  val pairOrdering: java.util.Comparator[(Long, Long)] =
    new java.util.Comparator[(Long, Long)] {
      override def compare(a: (Long, Long), b: (Long, Long)): Int = {
        val c = java.lang.Long.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

  val resultType: ArrayType = ArrayType(
    StructType(Seq(
      StructField("score", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
}

case class TopKAgg(left: Expression, right: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long)]]
  with BinaryLike[Expression] {

  require(k >= 1 && k <= 1024, s"k=$k out of [1,1024]: the buffer is " +
    "O(k) per group ON EVERY EXECUTOR — a large k belongs in a window")

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Long)] =
    new java.util.TreeSet[(Long, Long)](TopK.pairOrdering)

  override def update(buf: java.util.TreeSet[(Long, Long)],
                      input: InternalRow): java.util.TreeSet[(Long, Long)] = {
    val s = left.eval(input)
    val i = right.eval(input)
    if (s != null && i != null) {
      val pair = (s.asInstanceOf[Long], i.asInstanceOf[Long])
      // saturated fast path: reject anything not beating the current
      // k-th best without mutating the tree
      if (buf.size() < k || TopK.pairOrdering.compare(pair, buf.last()) < 0) {
        buf.add(pair)
        if (buf.size() > k) buf.pollLast()
      }
    }
    buf
  }

  override def merge(a: java.util.TreeSet[(Long, Long)],
                     b: java.util.TreeSet[(Long, Long)])
  : java.util.TreeSet[(Long, Long)] = {
    val it = b.iterator()
    while (it.hasNext) {
      val pair = it.next()
      if (a.size() < k || TopK.pairOrdering.compare(pair, a.last()) < 0) {
        a.add(pair)
        if (a.size() > k) a.pollLast()
      }
    }
    a
  }

  override def eval(buf: java.util.TreeSet[(Long, Long)]): Any = {
    val out = new Array[Any](buf.size())
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val (s, id) = it.next()
      out(i) = InternalRow(s, id)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Long, Long)])
  : Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size() * 16)
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) {
      val (s, id) = it.next()
      bb.putLong(s); bb.putLong(id)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
  : java.util.TreeSet[(Long, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def dataType: DataType = TopK.resultType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_topk expects (BIGINT score, BIGINT id), got " +
          s"${l.simpleString}, ${r.simpleString}")
    }

  override def withNewMutableAggBufferOffset(off: Int): TopKAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): TopKAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): TopKAgg = copy(left = l, right = r)
  override def prettyName: String = "graft_topk"
}
