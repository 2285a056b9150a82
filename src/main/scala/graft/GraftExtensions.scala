package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/**
 * SparkSessionExtensions entry point: makes the engine's custom Catalyst
 * expressions available in any session via
 * `spark.sql.extensions=graft.GraftExtensions` — the standard way to ship
 * native functions with a library (no per-session registration calls).
 *
 * Injected functions:
 *  - `cosine_sim(a, b)`   — codegen'd cosine over ARRAY<FLOAT|DOUBLE>
 *  - `minhash_sig(s, n, k)` — compiled minhash signature
 *  - `unicode_normalize(s, form)` — codegen'd UAX #15 normalization
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // tenant isolation as a plan rewrite (active only when the session sets
    // graft.tenant) — see graft.plans.TenantScopingRule
    ext.injectOptimizerRule(plans.TenantScopingRule(_))
    ext.injectFunction((
      FunctionIdentifier(functions.CosineSimilarity.FnName),
      new ExpressionInfo(classOf[functions.CosineSimilarity].getName,
        functions.CosineSimilarity.FnName),
      exprs => functions.CosineSimilarity(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier(functions.MinhashSignature.FnName),
      new ExpressionInfo(classOf[functions.MinhashSignature].getName,
        functions.MinhashSignature.FnName),
      exprs => functions.MinhashSignature(
        exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier(functions.UnicodeNormalize.FnName),
      new ExpressionInfo(classOf[functions.UnicodeNormalize].getName,
        functions.UnicodeNormalize.FnName),
      exprs => functions.UnicodeNormalize(exprs.head,
        exprs(1).eval()
          .asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)))
  }
}

object GraftExtensions {
  /** Imperative twin of the extensions class for already-running sessions
    * (tests, notebooks): registers the same functions on the session's
    * registry. */
  def registerAll(spark: SparkSession): Unit = {
    functions.CosineSimilarity.register(spark)
    functions.MinhashSignature.register(spark)
    functions.WordShingles.register(spark)
    functions.WordGrams.register(spark)
    functions.TextStats.register(spark)
    functions.FingerprintHash.register(spark)
    functions.UnicodeNormalize.register(spark)
  }
}
