package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream,
  DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/**
 * Value-ordered double summation as one native aggregate — the
 * deterministic-sum primitive the iterative graph passes (PageRank / PPR
 * / weighted PageRank / HITS) fold their per-node contributions with.
 *
 * Semantics are EXACTLY the composed form
 * `aggregate(array_sort(collect_list(x)), 0.0D, (acc, v) -> acc + v)`:
 * nulls skipped, values sorted ascending by `java.lang.Double.compare`
 * order (what Spark's array_sort uses for DOUBLE), then left-folded from
 * +0.0 — so the IEEE result is independent of row arrival order (equal
 * doubles commute), bit-for-bit the value the SQL replay computes with
 * `list_reduce(list_prepend(0.0, list(x ORDER BY x)), ...)`.
 *
 * Why native instead of the composed Columns: collect_list materializes
 * a GenericArrayData per group, array_sort copies it, and the fold runs
 * as an INTERPRETED lambda per element — on an |E|-row contribution
 * frame per iteration that is allocation + megamorphic-dispatch churn in
 * the hottest loop the engine has. This buffer is one growable
 * primitive double array per group: update appends, merge concatenates,
 * eval does one `Arrays.sort` + one tight fold. Same shuffle width as
 * collect_list (all values travel — an order-dependent fold cannot
 * pre-combine), strictly less per-row overhead.
 */
case class SortedSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Double]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"sorted_sum requires DOUBLE input, got ${dt.sql}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): ArrayBuffer[Double] =
    ArrayBuffer.empty[Double]

  override def update(buf: ArrayBuffer[Double],
                      input: InternalRow): ArrayBuffer[Double] = {
    val v = child.eval(input)
    if (v != null) buf += v.asInstanceOf[Double] // null-skip = collect_list
    buf
  }

  override def merge(buf: ArrayBuffer[Double],
                     other: ArrayBuffer[Double]): ArrayBuffer[Double] = {
    buf ++= other
    buf
  }

  override def eval(buf: ArrayBuffer[Double]): Any = {
    val arr = buf.toArray
    java.util.Arrays.sort(arr) // Double.compare order, like array_sort
    var acc = 0.0
    var i = 0
    while (i < arr.length) { acc += arr(i); i += 1 }
    acc
  }

  override def serialize(buf: ArrayBuffer[Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + 8 * buf.length)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach(out.writeDouble)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[Double](n)
    var i = 0
    while (i < n) { buf += in.readDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SortedSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SortedSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SortedSumAgg =
    copy(child = newChild)
  override def prettyName: String = "sorted_sum"
}
