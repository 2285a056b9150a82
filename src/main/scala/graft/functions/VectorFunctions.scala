package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Vector math as pure Catalyst expressions (no UDFs — everything stays in
 * whole-stage codegen). The hot path of every retrieval is a cosine similarity
 * scan (reference: retrieval/utils/statement_utils.py:15-95 does the same with
 * NumPy batch cosine); here it compiles to a codegen'd fold over the arrays.
 *
 * All math is done in Double regardless of the input element type so results
 * are deterministic and independent of the storage dtype (parquet float32).
 * `aggregate` folds left-to-right in array order — deterministic summation.
 */
object VectorFunctions {

  /** Elementwise cast to double (parquet embeddings are float32). */
  def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Dot product of two equal-length numeric arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0),
      (acc, v) => acc + v)

  /** Euclidean norm. */
  def norm(a: Column): Column =
    sqrt(aggregate(toDouble(a), lit(0.0), (acc, v) => acc + v * v))

  /** Cosine similarity; 0.0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n === 0.0, 0.0).otherwise(d / n)
  }

  /** Squared L2 distance. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(toDouble(a), toDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, v) => acc + v)

  /**
   * Symmetric per-vector int8 quantization: `struct(scale, q)` with
   * `scale = 127 / max|v|` (1.0 for the zero vector) and
   * `q_i = floor(v_i * scale + 0.5)` — always in [-127, 127], so the
   * quantized store holds ONE BYTE per dimension. At 100 TB the embedding
   * columns dominate storage and scan bandwidth; int8 cuts both 4× vs
   * float32, and cosine needs no dequantization at all (the per-vector
   * scales cancel in the ratio), so the scan stays exact integer math
   * until the final division. `floor(x + 0.5)` rather than `round` because
   * its IEEE-double semantics replay bit-identically in any engine
   * (round() half-even vs half-away varies). */
  def quantizeInt8(v: Column): Column = {
    val d = toDouble(v)
    val mx = array_max(transform(d, x => abs(x)))
    val scale = when(mx === 0.0, lit(1.0)).otherwise(lit(127.0) / mx)
    struct(scale.as("scale"),
      transform(d, x => floor(x * scale + lit(0.5)).cast("tinyint")).as("q"))
  }

  /** Inverse of [[quantizeInt8]] (lossy): q / scale, as doubles. */
  def dequantizeInt8(qv: Column): Column =
    transform(qv.getField("q"), x => x.cast("double") / qv.getField("scale"))

  /**
   * Deterministic hash-projection embedding of a text column: dim doubles in
   * [-1, 1], seeded per dimension from md5. Stand-in for a real embedding
   * model in tests (the reference's embedder is a pluggable Bedrock call —
   * config.py:37-40); the geometry is arbitrary but stable.
   */
  def hashEmbedding(text: Column, dim: Int): Column = {
    val comps = (0 until dim).map { i =>
      (conv(substring(md5(concat_ws("#", lit(i), text)), 1, 15), 16, 10)
        .cast("double") / lit(1.152921504606847e18) * 2.0 - 1.0)
    }
    array(comps: _*)
  }
}
