package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Idempotent temp-function registration: operators call `register`
  * defensively on their hot path (a caller's session may lack
  * GraftExtensions), but re-binding an already-registered name makes Spark
  * log "replaced a previously registered function" on every query — so
  * skip when the name is bound. GraftExtensions-injected sessions never
  * re-bind at all. */
private[graft] object Registry {
  def registerOnce(spark: SparkSession, name: String,
                   builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "built-in")
  }
}
