package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/**
 * All L-token window identities of a token array in ONE O(n) pass —
 * the bucket keys of the span/suffix dedup exchanges
 * ([[graft.ops.Dedup.suffixSpanDedup]] / `duplicateSpanRemoval`).
 *
 * The composed-Column form those operators started with —
 * `transform(positions, i => md5(concat_ws(" ", slice(toks, i+1, L))))` —
 * re-concatenates and re-hashes the full L-token window at EVERY
 * position: O(n·L) bytes hashed per document (L defaults to 50), and the
 * md5 HEX STRING it emits shuffles 32 chars where 16 bytes carry the
 * same 128 bits. At 100 TB both constants are real money on the
 * operator's one corpus-wide exchange (round-9 verdict). This expression
 * replaces both:
 *
 *  - O(n) compute: each token hashes once (FNV-1a 64 over its UTF-8
 *    bytes + murmur fmix64 finalizer, two independent seeds); window
 *    identities are TWO polynomial rolling hashes over the per-token
 *    hashes (bases B1/B2, natural mod-2^64 arithmetic) updated in O(1)
 *    per slide — Rabin-Karp, the same reduction Lee et al. 2022's
 *    suffix-array pipeline avoids re-reading suffixes with.
 *  - 16-byte BINARY output: the two 64-bit lanes packed big-endian —
 *    half the hex-string payload, and binary groups/shuffles without
 *    string comparison cost.
 *
 * Identity discipline: 128 independent-ish bits treated as exact, the
 * same convention as the md5 form it replaces (md5 is
 * collision-resistant adversarially; a double polynomial hash is not,
 * but dedup inputs are not adversarial and the oracle gates compare
 * OUTPUT spans computed from raw grams, so a collision would surface as
 * a hash mismatch in CI, not silence). Windows are order-sensitive and
 * boundary-sensitive (position-weighted token hashes), like the
 * space-joined md5 gram.
 *
 * CodegenFallback like [[MinhashSignature]]: the per-row work IS the
 * hash loop; losing whole-stage codegen on the projection costs nothing
 * measurable next to the eliminated O(n·L) re-hash.
 *
 * Returns array<binary>: element j = identity of the window starting at
 * token j (size n-L+1; empty when n < L — the caller's "docs shorter
 * than the span emit none" guard collapses into the expression).
 */
case class WindowRollingHashes(child: Expression, span: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"window_hashes requires ARRAY<STRING> input, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    WindowRollingHashes.compute(input.asInstanceOf[ArrayData], span)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WindowRollingHashes {

  val FnName = "window_hashes"

  // odd bases (full period mod 2^64) and distinct seeds for the two lanes
  private val B1 = 0x9E3779B97F4A7C15L
  private val B2 = 0xC2B2AE3D27D4EB4FL
  private val S1 = 0x8BADF00D5EEDFACEL
  private val S2 = 0x1CEB00DA0DDBA11L

  /** murmur3 64-bit finalizer — full avalanche over the FNV lane. */
  private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL
    x ^= x >>> 33; x *= 0xC4CEB9FE1A85EC53L
    x ^= x >>> 33; x
  }

  /** FNV-1a 64 over the token's UTF-8 bytes (no allocation). */
  private def fnv(t: org.apache.spark.unsafe.types.UTF8String): Long = {
    var h = 0xCBF29CE484222325L
    val n = t.numBytes()
    var i = 0
    while (i < n) { h ^= (t.getByte(i) & 0xFFL); h *= 0x100000001B3L; i += 1 }
    h
  }

  def compute(arr: ArrayData, span: Int): GenericArrayData = {
    val n = arr.numElements()
    if (n < span) return new GenericArrayData(Array.empty[Any])
    val h1 = new Array[Long](n)
    val h2 = new Array[Long](n)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      val base = if (t == null) 0L else fnv(t)
      h1(i) = fmix64(base ^ S1)
      h2(i) = fmix64(base ^ S2)
      i += 1
    }
    // B^(L-1) for the O(1) slide
    var p1 = 1L; var p2 = 1L
    var k = 0
    while (k < span - 1) { p1 *= B1; p2 *= B2; k += 1 }
    var acc1 = 0L; var acc2 = 0L
    k = 0
    while (k < span) { acc1 = acc1 * B1 + h1(k); acc2 = acc2 * B2 + h2(k); k += 1 }
    val out = new Array[Any](n - span + 1)
    out(0) = pack(acc1, acc2)
    var j = 1
    while (j <= n - span) {
      acc1 = (acc1 - h1(j - 1) * p1) * B1 + h1(j + span - 1)
      acc2 = (acc2 - h2(j - 1) * p2) * B2 + h2(j + span - 1)
      out(j) = pack(acc1, acc2)
      j += 1
    }
    new GenericArrayData(out)
  }

  private def pack(a: Long, b: Long): Array[Byte] = {
    val out = new Array[Byte](16)
    var i = 0
    while (i < 8) {
      out(i) = (a >>> (56 - 8 * i)).toByte
      out(8 + i) = (b >>> (56 - 8 * i)).toByte
      i += 1
    }
    out
  }

  def register(spark: SparkSession): Unit =
    Registry.registerOnce(spark, FnName, classOf[WindowRollingHashes],
      exprs => WindowRollingHashes(
        exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()))

  /** Column API ([[register]] first): all L-token window identities of a
    * token-array column, 16-byte binary each. */
  def windowHashes(toks: Column, span: Int): Column =
    call_function(FnName, toks, lit(span))
}
