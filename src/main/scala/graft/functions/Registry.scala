package graft.functions

import org.apache.spark.internal.Logging
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Idempotent temp-function registration: operators call `register`
  * defensively on their hot path (a caller's session may lack
  * GraftExtensions), but re-binding an already-registered name makes Spark
  * log "replaced a previously registered function" on every query.
  *
  * Ownership is decided by the registered ExpressionInfo's class name:
  * graft bindings (from GraftExtensions injection or from here) carry a
  * `graft.*` expression class and are left untouched; a FOREIGN binding of
  * the same name (a user temp function named `cosine_sim`, say) is replaced
  * — graft operators depend on their exact semantics — with one warning, so
  * the takeover is visible instead of silent either way. */
private[graft] object Registry extends Logging {
  def registerOnce(spark: SparkSession, name: String, owner: Class[_],
                   builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = FunctionIdentifier(name)
    val existing = reg.lookupFunction(id)
    val graftOwned = existing.exists(info =>
      Option(info.getClassName).exists(_.startsWith("graft.")))
    if (!graftOwned) {
      existing.foreach { info =>
        logWarning(s"replacing non-graft binding for function '$name' " +
          s"(was ${info.getClassName}); graft operators require graft's " +
          "implementation")
      }
      reg.registerFunction(id, new ExpressionInfo(owner.getName, name), builder)
    }
  }
}
