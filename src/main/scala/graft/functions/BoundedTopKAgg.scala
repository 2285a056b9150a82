package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Mutable bounded top-k buffer: a k-slot array kept sorted best→worst.
  * `size` ≤ k always; `arr(size-1)` is the current worst survivor. */
final class TopKBuffer(val k: Int) {
  val arr: Array[Any] = new Array[Any](k)
  var size: Int = 0
}

/**
 * Bounded top-k-per-group aggregate on a k-slot insertion-sorted ARRAY —
 * the round-12 replacement for Catalyst's `CollectTopK` on the graft
 * top-k paths (guide §4 per-task work / §5 memory). Same contract, two
 * structural wins over the BoundedPriorityQueue form:
 *
 *  - **Losers are never copied.** CollectTopK's `update` copies every
 *    input value (`convertToBufferElement` = `InternalRow.copyValue`)
 *    BEFORE the bounded queue decides whether to keep it, so a
 *    600k-row/150k-group pass allocates 600k sort-key struct copies to
 *    keep 300k. Here the incoming (ephemeral) value is compared against
 *    the current worst survivor first; a losing row costs one interpreted
 *    comparison and zero allocation. Rows-per-key ≫ k is exactly the
 *    regime this operator exists for, so almost every row is a loser.
 *  - **A k-slot array, not a heap.** Per-group state is one flat
 *    Array[Any] (k is 2-25 at every call site) — no PriorityQueue node
 *    boxes, no siftup, and `eval` emits the already-sorted slots instead
 *    of heap-draining + re-sorting. With 150k live groups per partition
 *    the buffer population is the ObjectHashAggregate working set, so
 *    slimming it also moves the hash-vs-sort-fallback balance
 *    (`GraftSession` notes).
 *
 * Semantics are EXACTLY CollectTopK(child, k, reverse): nulls skipped;
 * `reverse=true` keeps the k SMALLEST by the type's interpreted ordering
 * and emits them ascending, `reverse=false` the k largest, descending.
 * Ties beyond slot k resolve identically because every call site's sort
 * key embeds a unique tiebreak (the TopKAgg contract).
 */
case class BoundedTopKAgg(
    child: Expression,
    k: Int,
    reverse: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (k <= 0) TypeCheckResult.TypeCheckFailure(
      s"bounded_top_k requires k > 0, got $k")
    else if (!org.apache.spark.sql.catalyst.expressions.RowOrdering
      .isOrderable(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"bounded_top_k input must be orderable, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(child.dataType, false)
  override def nullable: Boolean = false

  // best→worst order: ascending for k-smallest, descending for k-largest
  @transient private lazy val ord: Ordering[Any] = {
    val natural = TypeUtils.getInterpretedOrdering(child.dataType)
    if (reverse) natural else natural.reverse
  }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  /** Insert an already-copied value into its sorted slot (linear from the
    * worst end — k is single-digit at the hot call sites). */
  private def insertCopied(buf: TopKBuffer, v: Any): Unit = {
    var i = buf.size
    while (i > 0 && ord.compare(buf.arr(i - 1), v) > 0) {
      buf.arr(i) = buf.arr(i - 1)
      i -= 1
    }
    buf.arr(i) = v
    if (buf.size < k) buf.size += 1
  }

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null &&
        (buf.size < k || ord.compare(v, buf.arr(buf.size - 1)) < 0)) {
      if (buf.size == k) buf.size -= 1 // evict the worst; slot reused below
      insertCopied(buf, InternalRow.copyValue(v))
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) {
      val v = other.arr(i) // already a defensive copy on the other side
      if (buf.size < k) insertCopied(buf, v)
      else if (ord.compare(v, buf.arr(buf.size - 1)) < 0) {
        buf.size -= 1
        insertCopied(buf, v)
      } else i = other.size // other is sorted: first loser ends the merge
      i += 1
    }
    buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(java.util.Arrays.copyOfRange(
      buf.arr.asInstanceOf[Array[AnyRef]], 0, buf.size))

  // spill/shuffle codec: one UnsafeRow holding ARRAY(child.dataType) —
  // the Collect serializer shape, minus its intermediate growable buffer
  @transient private lazy val proj =
    UnsafeProjection.create(Array[DataType](dataType))
  @transient private lazy val row = new org.apache.spark.sql.catalyst
    .expressions.GenericInternalRow(1)

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    row.update(0, eval(buf))
    proj.apply(row).getBytes
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val buf = createAggregationBuffer()
    val r = new UnsafeRow(1)
    r.pointTo(bytes, bytes.length)
    val arr = r.getArray(0)
    val et = child.dataType
    var i = 0
    val n = arr.numElements()
    while (i < n) { // serialized ascending-by-ord, so appends stay sorted
      buf.arr(i) = InternalRow.copyValue(arr.get(i, et))
      i += 1
    }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedTopKAgg =
    copy(child = newChild)
  override def prettyName: String = "bounded_top_k"
}
