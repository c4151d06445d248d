package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.expr

import graft.sources.GraftSqlTable

/** ROW ACCESS POLICIES — the Snowflake row-access-policy surface at the
  * catalog (governance) layer: a table declaring
  * `TBLPROPERTIES ('rowPolicy' = '<boolean sql>')` serves, through any
  * CATALOG read (`SELECT … FROM cat.ns.t`, `spark.table`, time travel),
  * only the rows where the policy holds. The policy expression sees the
  * row's columns plus session context functions (`current_user()`,
  * `current_date()` …), and lands as an ordinary Catalyst `Filter`
  * directly above the relation — injected before pushdown planning, so
  * a sargable policy prunes generations/row groups like any user
  * predicate (governance costs the same as a WHERE clause, not a
  * post-scan pass).
  *
  * Boundaries, chosen to keep the engine's own state transitions exact:
  *  - WRITE TARGETS are exempt (the relation in a write command's
  *    table position is a sink, not a scan) — INSERT lands full rows.
  *  - Engine-internal reads (the provider path `format("graft")`, mart
  *    folds, extremum recomputes, CoW rewrites) are the OWNER path and
  *    bypass policies, exactly like Snowflake's policy-owner reads —
  *    otherwise an incremental maintainer would fold a filtered world
  *    into an unfiltered table and corrupt it.
  *  - SQL row-level DML (MERGE/UPDATE/DELETE) on a policy-bearing table
  *    REFUSES loudly: a copy-on-write rewrite under a filtered read
  *    would silently DROP the invisible rows. Use the engine verbs
  *    (`CALL …update_where/delete_where`) — the owner path — or drop
  *    the policy.
  *  - merge-on-read tables refuse the policy at declaration time (their
  *    reads re-plan into multi-leg reconciliation unions this filter
  *    placement does not govern).
  */
object RowPolicyRule {

  /** Table property holding the policy predicate. */
  val PolicyKey = "rowPolicy"

  /** Set on a relation once its policy filter is planted — the
    * fixpoint-idempotency marker (tags survive plan copies).
    */
  private[plans] val Applied = TreeNodeTag[Boolean]("graft.rowPolicyApplied")

  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[RowPolicyRule]))
      // PREPEND: the policy filter must plant before the metadata-count
      // rewrite could answer an aggregate from manifest row counts, and
      // before the reconciliation/mart rules restructure the plan
      spark.experimental.extraOptimizations =
        RowPolicyRule(fallback = true) +: spark.experimental.extraOptimizations
}

/** Two registration shapes of one rule. The EXTENSIONS instance
  * (`fallback = false`, injected by [[graft.GraftExtensions]]) runs in
  * the operator-optimization batch BEFORE pushdown, sees pre-pushdown
  * `DataSourceV2Relation` nodes, and plants a filter pushdown then
  * prunes with. The FALLBACK instance (`fallback = true`, registered
  * through `experimental.extraOptimizations` by the catalog for
  * sessions wired without extensions) runs AFTER pushdown, where only
  * `DataSourceV2ScanRelation` remains — it plants the same filter
  * above the scan (correct, unpruned), and stands down entirely when
  * the extensions instance is present so the policy never applies
  * twice.
  */
case class RowPolicyRule(fallback: Boolean = false)
    extends Rule[LogicalPlan] {

  import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

  private def spark: SparkSession = SparkSession.active

  private def policyOf(t: org.apache.spark.sql.connector.catalog.Table)
      : Option[String] = t match {
    case g: GraftSqlTable => g.index.state.props.get(RowPolicyRule.PolicyKey)
    case _ => None
  }

  /** Is the pre-pushdown (extensions) instance active in this session? */
  private def extensionsActive: Boolean =
    spark.sessionState.optimizer.batches.exists(_.rules.exists {
      case r: RowPolicyRule => !r.fallback
      case _ => false
    })

  private def planted(node: LogicalPlan, table: String, sql: String)
      : LogicalPlan = {
    val df = org.apache.spark.sql.graftbridge.Bridge.ofRows(spark, node)
      .filter(
        try expr(sql) catch {
          case e: Exception => throw new IllegalArgumentException(
            s"row policy on '$table' does not parse: $sql", e)
        })
    // analyzed against the node itself, so the result is fully resolved
    // (this is an optimizer-time rule)
    df.queryExecution.analyzed
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // relations in WRITE-TARGET position are sinks, never scans
    val targets: Set[LogicalPlan] = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.V2WriteCommand =>
        w.table: LogicalPlan
    }.toSet
    plan.transformUp {
      case r: DataSourceV2Relation
          if !targets.contains(r) &&
            r.getTagValue(RowPolicyRule.Applied).isEmpty &&
            policyOf(r.table).nonEmpty =>
        r.setTagValue(RowPolicyRule.Applied, true)
        planted(r, r.table.name(), policyOf(r.table).get)
      case s: DataSourceV2ScanRelation
          if fallback && !extensionsActive &&
            s.getTagValue(RowPolicyRule.Applied).isEmpty &&
            policyOf(s.relation.table).nonEmpty =>
        // post-pushdown the scan is already column-pruned, possibly past
        // the policy's columns: rebuild an UNPRUNED scan over the same
        // relation (same attribute ids), filter, and project back to the
        // pruned shape — correct, unpruned; the extensions instance is
        // the pruning path
        val fresh = DataSourceV2ScanRelation(s.relation,
          s.relation.table
            .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
            .newScanBuilder(s.relation.options).build(),
          s.relation.output)
        fresh.setTagValue(RowPolicyRule.Applied, true)
        val filtered = planted(fresh, s.relation.table.name(),
          policyOf(s.relation.table).get)
        org.apache.spark.sql.catalyst.plans.logical.Project(
          s.output, filtered)
    }
  }
}
