package org.apache.spark

/**
 * Bridge into `private[spark]` scheduler internals, same discipline as
 * [[org.apache.spark.sql.GraftSqlBridge]]: one thin accessor per member,
 * each used by exactly one graft consumer.
 */
object GraftSparkBridge {

  /** Block until the async listener bus has delivered every queued event —
    * graft.tools.PlanCensus must read its counters only after the drain
    * (the alternative is a sleep, which is both slow and racy). */
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()

  /** Whether a completed stage was a shuffle-map stage (its
    * `private[spark]` shuffleDepId is defined) — the census' runtime
    * twin of "exchange in the plan". */
  def isShuffleMapStage(si: scheduler.StageInfo): Boolean =
    si.shuffleDepId.isDefined
}
