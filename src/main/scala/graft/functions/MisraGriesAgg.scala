package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream,
  DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Misra-Gries frequent-items sketch as a Catalyst
 * [[TypedImperativeAggregate]] — the 100 TB heavy-hitter pattern: ONE
 * scalar aggregate with O(capacity) state per partition finds every
 * candidate token whose true frequency exceeds n/(capacity+1); a cheap
 * second pass recounts only the candidates exactly (see
 * [[graft.ops.TextAnalysis.heavyHitters]]). No groupBy over the full
 * token space, no shuffle wider than `capacity` entries per map task.
 *
 * Update rule (Misra & Gries 1982): increment a tracked token; insert an
 * untracked token while there is room; otherwise decrement EVERY counter
 * (dropping zeros) — each full decrement retires `capacity` prior
 * increments, so updates stay amortized O(1) per token.
 *
 * Merge rule (Agarwal et al., "Mergeable Summaries", PODS 2012): add the
 * two count maps, then if more than `capacity` tokens remain subtract the
 * (capacity+1)-th largest count from all and drop the non-positive — the
 * merged sketch keeps the one-pass guarantee: every token with true count
 * > n/(capacity+1) survives with a positive counter REGARDLESS of how
 * Spark splits and merges partial buffers. Counts are lower bounds
 * (undercount ≤ n/(capacity+1)); the candidate SET, not the counts, is
 * the contract — callers must recount exactly (the sketch output order —
 * count desc, token asc — is deterministic only given the buffer, so the
 * raw sketch is not itself oracle-gateable; the recount pass is).
 *
 * Input: a per-row ARRAY of tokens (the `WordGrams` shape), so the
 * aggregate consumes token arrays without a pre-explode.
 */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(capacity > 0, "capacity must be positive")

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val arr = child.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[ArrayData]
      var i = 0
      val n = a.numElements()
      while (i < n) {
        if (!a.isNullAt(i)) {
          val t = a.getUTF8String(i)
          buf.get(t) match {
            case Some(c) => buf.update(t, c + 1L)
            case None =>
              if (buf.size < capacity) {
                // clone: the UTF8String may point into a reused scan buffer
                buf.update(t.clone(), 1L)
              } else {
                // decrement-all; each sweep retires `capacity` increments
                buf.filterInPlace((_, c) => c > 1L)
                  .mapValuesInPlace((_, c) => c - 1L)
              }
          }
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
                     other: mutable.HashMap[UTF8String, Long])
      : mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (t, c) =>
      buf.updateWith(t) {
        case Some(c0) => Some(c0 + c)
        case None     => Some(c)
      }
    }
    if (buf.size > capacity) {
      // subtract the (capacity+1)-th largest count, drop non-positive
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val m = counts(counts.length - capacity - 1)
      buf.filterInPlace((_, c) => c > m).mapValuesInPlace((_, c) => c - m)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val entries = buf.toArray
    // deterministic given the buffer: count desc, token asc
    java.util.Arrays.sort(entries,
      (x: (UTF8String, Long), y: (UTF8String, Long)) => {
        val byCount = java.lang.Long.compare(y._2, x._2)
        if (byCount != 0) byCount else x._1.compareTo(y._1)
      })
    new GenericArrayData(entries.map { case (t, c) =>
      InternalRow(t, c)
    }.toIndexedSeq)
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val b = t.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "misra_gries"

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}
