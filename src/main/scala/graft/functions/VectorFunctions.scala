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
