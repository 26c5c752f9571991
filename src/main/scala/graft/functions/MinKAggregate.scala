package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded "k smallest longs" aggregate (`graft_min_k(col, k)` →
  * `array<bigint>` sorted ascending).
  *
  * The scale property is the BUFFER BOUND: state is a max-heap of at most
  * k elements, so the aggregate participates in map-side partial
  * aggregation with O(k) memory per group — every map task collapses its
  * rows for a group to ≤ k values BEFORE the shuffle. That is what a
  * `row_number().over(Window.partitionBy(g).orderBy(v))`-then-`<= k`
  * rep-selection cannot do: a window moves EVERY row of a hot group to
  * one task (window partitions are AQE-unsplittable) and sorts them,
  * where this aggregate ships ≤ k·numMapTasks rows per group total.
  * Used by [[graft.operators.Similarity.dd10SemanticDedup]] to pick
  * per-cell representatives.
  *
  * Duplicates are kept with multiplicity (the k smallest VALUES, not
  * distinct values); nulls are skipped like every SQL aggregate.
  */
case class BoundedMinK(child: Expression, kExpr: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[java.lang.Long]] {

  // k is a query-shape constant: demand foldability at type-check time so
  // a non-literal k fails analysis by name instead of NPE-ing at eval
  private lazy val k: Int = kExpr.eval() match {
    case i: java.lang.Integer => i.intValue()
    case l: java.lang.Long    => l.intValue()
    case other => throw new IllegalStateException(
      s"graft_min_k: k must be an integer literal, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType && child.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_min_k expects a bigint/int value column, got ${child.dataType}")
    else if (!kExpr.foldable || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("graft_min_k: k must be an int literal")
    else if (kExpr.eval() == null || k <= 0)
      TypeCheckResult.TypeCheckFailure("graft_min_k: k must be a positive literal")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_min_k"

  override def createAggregationBuffer(): java.util.PriorityQueue[java.lang.Long] =
    new java.util.PriorityQueue[java.lang.Long](
      math.max(k, 1) + 1, java.util.Collections.reverseOrder[java.lang.Long]())

  private def insert(buf: java.util.PriorityQueue[java.lang.Long], v: Long): Unit =
    if (buf.size < k) buf.add(v)
    else if (v < buf.peek()) { buf.poll(); buf.add(v) }

  override def update(buf: java.util.PriorityQueue[java.lang.Long],
                      input: InternalRow): java.util.PriorityQueue[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v match {
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long    => l.longValue()
    })
    buf
  }

  override def merge(buf: java.util.PriorityQueue[java.lang.Long],
                     other: java.util.PriorityQueue[java.lang.Long]): java.util.PriorityQueue[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next().longValue())
    buf
  }

  override def eval(buf: java.util.PriorityQueue[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.PriorityQueue[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    // serialized buffers are already ≤ k elements — add directly
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedMinK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedMinK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))
}
