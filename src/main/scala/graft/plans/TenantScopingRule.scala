package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag

/**
 * Tenant isolation as a Catalyst rule: when `graft.tenant` is set on the
 * session, every leaf relation exposing a `tenant_id` column gets
 * `tenant_id = <tenant>` injected directly above the scan.
 *
 * The reference enforces tenancy by rewriting every generated query's labels
 * and index names through MultiTenantGraphStore
 * (reference: lexical-graph/src/graphrag_toolkit/lexical_graph/storage/graph/
 * multi_tenant_graph_store.py:145-160, tenant_id.py:74-151). Here the same
 * guarantee is a plan rewrite: user code cannot forget the tenant filter,
 * and because the predicate lands on the scan it pushes into parquet
 * row-group pruning (partition pruning when tables are partitioned by
 * tenant) — the SURVEY §4 "TenantScoping rule" candidate made real.
 *
 * The TreeNodeTag guard makes the rule a no-op on replay, so it is safe
 * under fixed-point rule execution.
 */
case class TenantScopingRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private val scoped = TreeNodeTag[Boolean]("graft.tenantScoped")

  override def apply(plan: LogicalPlan): LogicalPlan =
    spark.conf.getOption(TenantScopingRule.ConfKey) match {
      case None => plan
      case Some(tenant) =>
        plan.transformUp {
          case r: LeafNode if r.getTagValue(scoped).isEmpty &&
              r.output.exists(_.name == TenantScopingRule.TenantColumn) =>
            r.setTagValue(scoped, true)
            val attr = r.output.find(_.name == TenantScopingRule.TenantColumn).get
            Filter(EqualTo(attr, Literal(tenant)), r)
        }
    }
}

object TenantScopingRule {
  val ConfKey = "graft.tenant"
  val TenantColumn = "tenant_id"

  /** Attach to a live session (tests, notebooks); sessions built with
    * `spark.sql.extensions=graft.GraftExtensions` get it automatically. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(
        _.isInstanceOf[TenantScopingRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TenantScopingRule(spark)
}
