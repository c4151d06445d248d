package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.expr

import graft.sources.GraftSqlTable

/** ROW ACCESS POLICIES + COLUMN MASKING — the Snowflake governance
  * surface at the catalog layer:
  *
  *  - `TBLPROPERTIES ('rowPolicy' = '<boolean sql>')`: every CATALOG
  *    read (`SELECT … FROM cat.ns.t`, `spark.table`, time travel)
  *    serves only the rows where the policy holds. Lands as an ordinary
  *    Catalyst `Filter` directly above the relation — injected before
  *    pushdown planning, so a sargable policy prunes generations/row
  *    groups like any user predicate (governance costs the same as a
  *    WHERE clause, not a post-scan pass).
  *  - `TBLPROPERTIES ('mask.<col>' = '<sql expr>')` (dynamic data
  *    masking): catalog reads serve the column REWRITTEN through the
  *    masking expression (which sees the row's columns — partial
  *    masking like `concat('***', substring(email, position('@' in
  *    email), 99))` works), planted as a `Project` whose output keeps
  *    the ORIGINAL attribute ids, so parent operators stay resolved and
  *    every downstream predicate/aggregate computes over MASKED values
  *    (a filter can never probe the hidden cleartext). The expression
  *    must cast to the column's type, and may not be nullable over a
  *    non-nullable column (the optimizer believes declared
  *    nullability).
  *  - `TBLPROPERTIES ('mask.<col>.<field>' = '<sql expr>')` — NESTED-
  *    FIELD masking for semi-structured columns (the reference's
  *    payloads are JSON/structs, sql/03): ONE struct field rewrites
  *    through `withField`, sibling fields flow cleartext, dotted paths
  *    reach deeper levels, and several field masks on one column
  *    compose. A whole-column mask on the same column wins outright.
  *
  * Boundaries, chosen to keep the engine's own state transitions exact:
  *  - WRITE TARGETS are exempt (the relation in a write command's
  *    table position is a sink, not a scan) — INSERT lands full rows.
  *  - Engine-internal reads (the provider path `format("graft")`, mart
  *    folds, extremum recomputes, CoW rewrites) are the OWNER path and
  *    bypass policies, exactly like Snowflake's policy-owner reads —
  *    otherwise an incremental maintainer would fold a filtered/masked
  *    world into an unfiltered table and corrupt it.
  *  - SQL row-level DML (MERGE/UPDATE/DELETE) on a ROW-POLICY table is
  *    POLICY-AWARE (the Snowflake contract): the statement's scan serves
  *    only policy-visible rows and the commit carries the hidden slice
  *    of the rewritten groups through unmodified — see
  *    [[graft.sources.GovernedRows]] / [[graft.sources.GraftRowLevelOperation]].
  *    Masked tables allow DML with cleartext semantics — the row-level
  *    read leg resolves through the operation wrapper (owner view), so
  *    rewrites persist TRUE values, never masked ones.
  *  - merge-on-read tables refuse the rowPolicy at declaration time
  *    (their reads re-plan into multi-leg reconciliation unions this
  *    filter placement does not govern); masks compose fine (the
  *    reconciled union's top relation is still the catalog relation).
  */
object RowPolicyRule {

  /** Table property holding the policy predicate. */
  val PolicyKey = "rowPolicy"

  /** Table-property prefix for column masking expressions. */
  val MaskPrefix = "mask."

  /** Set on a relation once its governance plan is planted — the
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
  * `DataSourceV2ScanRelation` remains — it plants the same governance
  * plan above the scan (correct, unpruned), and stands down entirely
  * when the extensions instance is present so nothing applies twice.
  */
case class RowPolicyRule(fallback: Boolean = false)
    extends Rule[LogicalPlan] {

  import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

  private def spark: SparkSession = SparkSession.active

  /** Is `k` a read-governance property (the row policy or a mask)? */
  private def isGovKey(k: String): Boolean =
    k == RowPolicyRule.PolicyKey || k.startsWith(RowPolicyRule.MaskPrefix)

  /** Table properties with GOVERNANCE keys resolved from the manifest
    * HEAD rather than the relation's pinned snapshot: the CURRENT policy
    * governs time-travel reads too (the Snowflake contract) — a policy
    * or mask added after version v still filters `VERSION AS OF v`, and
    * a dropped one stops filtering it. Non-governance props keep the
    * snapshot's values; raw (owner-leg) tables never reach governance
    * (their relations carry the Applied tag through plan copies).
    */
  private def propsOf(t: org.apache.spark.sql.connector.catalog.Table)
      : Map[String, String] = t match {
    case g: GraftSqlTable =>
      val snap = g.index.state.props
      if (g.pinnedVersion.isEmpty || g.raw) snap
      else {
        val head = graft.sources.ManifestTable.read(g.rootDir)
          .map(_.table(g.tableName).props).getOrElse(snap)
        snap.filterNot { case (k, _) => isGovKey(k) } ++
          head.filter { case (k, _) => isGovKey(k) }
      }
    case _ => Map.empty
  }

  private def policyOf(props: Map[String, String]): Option[String] =
    props.get(RowPolicyRule.PolicyKey)

  private def masksOf(props: Map[String, String]): Seq[(String, String)] =
    props.toSeq.collect {
      case (k, v) if k.startsWith(RowPolicyRule.MaskPrefix) =>
        k.stripPrefix(RowPolicyRule.MaskPrefix) -> v
    }.sortBy(_._1)

  /** Is the pre-pushdown (extensions) instance active in this session? */
  private def extensionsActive: Boolean =
    spark.sessionState.optimizer.batches.exists(_.rules.exists {
      case r: RowPolicyRule => !r.fallback
      case _ => false
    })

  /** The governance plan over `node`: the policy filter (when declared),
    * then the masking projection (when declared) with output attribute
    * IDS PINNED to `node`'s — parents stay resolved, and downstream
    * operators compute over masked values only.
    */
  private def planted(node: LogicalPlan, table: String,
      policy: Option[String], masks: Seq[(String, String)]): LogicalPlan = {
    // policies/masks may call graft_session_attr — make sure the parse
    // below resolves it even in sessions wired without extensions
    graft.functions.SessionAttr.register(spark)
    def parse(what: String, sql: String) =
      try expr(sql) catch {
        case e: Exception => throw new IllegalArgumentException(
          s"$what on '$table' does not parse: $sql", e)
      }
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    val filtered = policy.fold(node) { sql =>
      bridge.ofRows(spark, node).filter(parse("row policy", sql))
        .queryExecution.analyzed
    }
    if (masks.isEmpty) filtered
    else {
      val out = node.output
      // whole-column masks rewrite the column; NESTED keys
      // (`mask.<col>.<path.to.field>`) rewrite one struct field — the
      // column split/withField composition is shared with the compiled
      // (streaming/row-level) path so the two can never diverge
      val cols: Seq[org.apache.spark.sql.Column] =
        graft.sources.GovernedRows.maskColumns(out, masks, table, parse)
      val analyzed = bridge.ofRows(spark, filtered).select(cols: _*)
        .queryExecution.analyzed
      analyzed match {
        case p: Project =>
          p.projectList.zip(out).foreach {
            case (al: Alias, orig) =>
              require(!al.child.nullable || orig.nullable,
                s"mask for column '${orig.name}' on '$table' may " +
                  "return NULL but the column is non-nullable — wrap " +
                  "the expression in coalesce()")
            case _ => ()
          }
          p
        case other => other // select of pure attributes collapsed: no-op
      }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // relations in WRITE-TARGET position are sinks, never scans
    val targets: Set[LogicalPlan] = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.V2WriteCommand =>
        w.table: LogicalPlan
    }.toSet
    // per-invocation props memo: a pinned relation's governance keys
    // resolve from the manifest HEAD ([[propsOf]]), and the guard plus
    // the match body would otherwise re-read the manifest several times
    // per relation per optimizer pass
    val memo = scala.collection.mutable.HashMap
      .empty[org.apache.spark.sql.connector.catalog.Table,
        Map[String, String]]
    def props(t: org.apache.spark.sql.connector.catalog.Table)
        : Map[String, String] = memo.getOrElseUpdate(t, propsOf(t))
    def governed(t: org.apache.spark.sql.connector.catalog.Table): Boolean =
      policyOf(props(t)).nonEmpty || masksOf(props(t)).nonEmpty
    // transformUpWithNewOutput: masked columns get FRESH attribute ids
    // (a Project whose output id shadowed its own input id would read as
    // redundant and optimize away), and every parent reference rewrites
    // to the masked output automatically
    plan.transformUpWithNewOutput {
      case r: DataSourceV2Relation
          if !targets.contains(r) &&
            r.getTagValue(RowPolicyRule.Applied).isEmpty &&
            governed(r.table) =>
        r.setTagValue(RowPolicyRule.Applied, true)
        val g = planted(r, r.table.name(), policyOf(props(r.table)),
          masksOf(props(r.table)))
        g -> r.output.zip(g.output).filter {
          case (o, n) => o.exprId != n.exprId }
      case s: DataSourceV2ScanRelation
          if fallback && !extensionsActive &&
            s.getTagValue(RowPolicyRule.Applied).isEmpty &&
            governed(s.relation.table) =>
        // post-pushdown the scan is already column-pruned, possibly past
        // the governance expressions' columns: rebuild an UNPRUNED scan
        // over the same relation (same attribute ids), govern — correct,
        // unpruned; the extensions instance is the pruning path
        val fresh = DataSourceV2ScanRelation(s.relation,
          s.relation.table
            .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
            .newScanBuilder(s.relation.options).build(),
          s.relation.output)
        fresh.setTagValue(RowPolicyRule.Applied, true)
        val g = planted(fresh, s.relation.table.name(),
          policyOf(props(s.relation.table)),
          masksOf(props(s.relation.table)))
        val mapping = s.relation.output.zip(g.output).filter {
          case (o, n) => o.exprId != n.exprId }
        g -> mapping
    }
  }
}
