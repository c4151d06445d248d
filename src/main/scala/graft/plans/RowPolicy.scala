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

  /** Is `k` a read-governance property (the row policy, a mask, or the
    * object-tagging surface — a tag assignment or a tag-attached
    * masking policy)?
    */
  private def isGovKey(k: String): Boolean =
    k == RowPolicyRule.PolicyKey || k.startsWith(RowPolicyRule.MaskPrefix) ||
      k.startsWith(graft.sources.GovernedRows.TagPrefix) ||
      k.startsWith(graft.sources.GovernedRows.TagMaskPrefix)

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

  private def masksOf(props: Map[String, String], table: String)
      : Seq[graft.sources.MaskSpec] =
    graft.sources.GovernedRows.effectiveMasks(props, table)

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
      policy: Option[String], masks: Seq[graft.sources.MaskSpec])
      : LogicalPlan = {
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

  /** The graft file index inside a Dataset-cache entry's materialized
    * plan (descending through the AQE wrapper), when the cached data is
    * a graft table read whose table is GOVERNED at the manifest HEAD.
    *
    * Why this exists: Spark's analyzer resolves a table name straight
    * to the cache manager's stored relation plan when an entry for that
    * name is live (`CacheManager.lookupCachedTable`), and
    * `withCachedData` then swaps in the `InMemoryRelation` — all BEFORE
    * the optimizer runs, so no Table-equality key can gate it, and the
    * materialized rows were governed under the CACHING session's
    * context (or none, for a pre-ALTER entry). Serving them to another
    * context is the one true cache leak; the rule answers it by
    * BYPASSING the cache for governed tables — rebuild a live scan,
    * govern it, and let the entry idle.
    */
  private def governedCache(
      imr: org.apache.spark.sql.execution.columnar.InMemoryRelation)
      : Option[graft.sources.ManifestFileIndex] = {
    def leaves(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val own = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          leaves(a.inputPlan)
        case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          leaves(m.relation.cachedPlan)
        case other => other.collectLeaves().flatMap {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            leaves(a.inputPlan)
          case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
            leaves(m.relation.cachedPlan)
          case l => Seq(l)
        }
      }
      // subquery plans (SubqueryExec / InSubqueryExec live in EXPRESSIONS
      // of interior nodes, not the main tree) are part of the
      // materialized result too — a governed scan feeding a cached
      // filter's scalar subquery leaked through the old main-tree-only
      // walk; every node's expressions are swept, recursively
      val subs = p match {
        case _: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec |
             _: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          p.subqueries // nested plans were walked above; root exprs here
        case other => other.flatMap(_.subqueries) // every node's exprs
      }
      own ++ subs.flatMap(leaves)
    }
    // EVERY graft scan leaf is checked — a cached join/union of an
    // ungoverned table with a governed one must still bypass, or the
    // first (ungoverned) leaf would mask the leak; the walk descends
    // nested cache entries (an inner cache ALTERed governed after the
    // outer materialized) and subquery plans recursively
    leaves(imr.cachedPlan).collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan
    }.collect {
      case g: graft.sources.GraftBatchScan => g.index
    }.find { idx =>
      val head = graft.sources.ManifestTable
        .read(new java.io.File(idx.rootPath))
        .map(_.table(idx.tableName).props).getOrElse(Map.empty)
      graft.sources.GovernedRows.governs(head, idx.tableName)
    }
  }

  /** The Dataset-cache entry this `InMemoryRelation` materializes,
    * matched by its shared `CachedRDDBuilder` (`withCachedData`
    * substitutes copies, so instance identity of the relation itself is
    * not stable) — the entry's stored logical plan is what a governed
    * bypass must recompute. Reaches the cache manager's private entry
    * list reflectively; a miss returns None and the caller refuses
    * loudly rather than serving or guessing.
    */
  private def storedPlanOf(
      imr: org.apache.spark.sql.execution.columnar.InMemoryRelation)
      : Option[LogicalPlan] = {
    val cm = spark.sharedState.cacheManager
    val fld = cm.getClass.getDeclaredFields
      .find(_.getName.endsWith("cachedData"))
    fld.flatMap { f =>
      f.setAccessible(true)
      val entries: Seq[Any] = f.get(cm) match {
        case l: java.util.List[_] =>
          scala.jdk.CollectionConverters.ListHasAsScala(l).asScala.toSeq
        case s: scala.collection.Seq[_] => s.toSeq
        case _ => Nil
      }
      entries.collectFirst {
        case cd: org.apache.spark.sql.execution.CachedData
            if cd.cachedRepresentation.cacheBuilder eq imr.cacheBuilder =>
          cd.plan
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
      policyOf(props(t)).nonEmpty || masksOf(props(t), t.name()).nonEmpty
    // per-invocation memo for the governed-cache probe: the guard, the
    // body, and every fixpoint iteration would otherwise re-read and
    // re-parse the manifest per cached-plan encounter
    val cacheMemo = scala.collection.mutable.HashMap
      .empty[AnyRef, Option[graft.sources.ManifestFileIndex]]
    def govCache(
        imr: org.apache.spark.sql.execution.columnar.InMemoryRelation)
        : Option[graft.sources.ManifestFileIndex] =
      cacheMemo.getOrElseUpdate(imr.cacheBuilder, governedCache(imr))
    // BRANCH-context staleness: the analyzer's NAME-keyed cache lookup
    // is lineage-blind — an entry whose graft relations were loaded
    // under a different `graft.session.branch` context than the current
    // session's resolves the WRONG lineage (a branch write's refresh
    // re-registers the table's entry with branch state; a later main
    // read would serve it, and vice versa). Same remedy as governed
    // tables: bypass and recompute live — the cleanse's fresh table
    // instances capture the CURRENT branch.
    val branchMemo = scala.collection.mutable.HashMap.empty[AnyRef, Boolean]
    def branchStale(
        imr: org.apache.spark.sql.execution.columnar.InMemoryRelation)
        : Boolean =
      branchMemo.getOrElseUpdate(imr.cacheBuilder,
        storedPlanOf(imr).exists { p =>
          (p +: p.subqueriesAll).exists(_.collect {
            case r: DataSourceV2Relation => r.table
          }.exists {
            case g: GraftSqlTable =>
              g.branchAtLoad !=
                graft.sources.ManifestTable.sessionBranch(g.rootDir)
            case _ => false
          })
        })
    // transformUpWithNewOutput: masked columns get FRESH attribute ids
    // (a Project whose output id shadowed its own input id would read as
    // redundant and optimize away), and every parent reference rewrites
    // to the masked output automatically
    plan.transformUpWithNewOutput {
      case r: DataSourceV2Relation
          if !targets.contains(r) &&
            r.getTagValue(RowPolicyRule.Applied).isEmpty &&
            governed(r.table) =>
        // tag a COPY, never the matched instance: when this rule runs
        // inside the optimizer's first (subquery) batch, `r` IS the
        // analyzed plan's node, shared with the Dataset handle that
        // spawned this QueryExecution and with any cache entry storing
        // the same plan — mutating it marks those OTHER pipelines
        // "already governed" and their later optimization then skips
        // planting entirely (a same-handle show-then-collect served the
        // second execution UNGOVERNED before this copy)
        val nr = r.copy()
        nr.setTagValue(RowPolicyRule.Applied, true)
        val g = planted(nr, r.table.name(), policyOf(props(r.table)),
          masksOf(props(r.table), r.table.name()))
        g -> r.output.zip(g.output).filter {
          case (o, n) => o.exprId != n.exprId }
      case imr: org.apache.spark.sql.execution.columnar.InMemoryRelation
          if (!fallback || !extensionsActive) &&
            (govCache(imr).isDefined || branchStale(imr)) =>
        // Dataset-cache BYPASS for governed tables and cross-BRANCH
        // entries: the entry's rows materialized under one governance/
        // lineage context — recompute the entry's own STORED logical
        // plan (user operators preserved) over fresh, un-tagged
        // relations, governed inline under THIS query's context; the
        // entry idles (see [[governedCache]] / branchStale above)
        val stored = storedPlanOf(imr).getOrElse(
          throw new IllegalStateException(
            "a Dataset cache entry over " +
              govCache(imr).map(i => s"governed table '${i.tableName}'")
                .getOrElse("a branch-context graft table") +
              " cannot be matched back to its stored plan — unpersist " +
              "it (reads never serve from a cross-context cache)"))
        // fresh relation instances: the stored plan's relations are
        // SHARED across queries (the analyzer resolves a cached name to
        // the stored plan) and carry the Applied tag from the caching
        // query's own optimization — planting must not race on them.
        // The cleanse DESCENDS INTO SUBQUERY EXPRESSION PLANS: a stored
        // filter over a scalar subquery of a governed table carries the
        // same shared, tagged relations one level down, and the main
        // optimizer's subquery batch already ran, so nothing else would
        // refresh them (subquery plans re-optimize at physical planning,
        // but only FRESH untagged relations get planted there)
        def cleanse(p0: LogicalPlan): LogicalPlan = {
          val withSubs = p0.transformAllExpressions {
            case se: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
              se.withNewPlan(cleanse(se.plan))
          }
          val fresh = withSubs.transformUpWithNewOutput {
            case r: DataSourceV2Relation =>
              // a FRESH table instance, not the stored one: the shared
              // instance's lazily-pinned index froze the snapshot (and
              // its governance props) at CACHING time — the bypass must
              // resolve the CURRENT state, or a policy ALTERed in after
              // caching would never plant
              val tbl = r.table match {
                case g: GraftSqlTable => new GraftSqlTable(
                  g.rootDir, g.tableName, g.pinnedVersion, g.raw)
                case other => other
              }
              val nr = DataSourceV2Relation.create(
                tbl, r.catalog, r.identifier, r.options)
              nr -> r.output.zip(nr.output).filter {
                case (o, n) => o.exprId != n.exprId }
          }
          org.apache.spark.sql.catalyst.analysis
            .EliminateSubqueryAliases(fresh)
        }
        val cleansed = cleanse(stored)
        // govern inline — the SAME pass; deferring to the next fixpoint
        // iteration would let a later rule (the metadata-count rewrite)
        // see the relation ungoverned. Subquery plans are governed here
        // too (idempotent with the physical-planning re-optimization:
        // the Applied tag set on the fresh instances survives copies)
        // subquery plans get NO further optimizer batches (the subquery
        // batch ran first, pushdown only revisits the main tree), so a
        // fresh logical relation inside one would reach physical planning
        // unconverted ("No plan for RelationV2") — pre-plan it as a scan
        // relation, the same shape the fallback's ordinary case builds.
        // Unpruned by construction; correctness over pruning for the
        // bypass's subquery edge.
        def planScans(p0: LogicalPlan): LogicalPlan = p0.transformUp {
          case r: DataSourceV2Relation =>
            val fresh = DataSourceV2ScanRelation(r,
              r.table.asInstanceOf[
                org.apache.spark.sql.connector.catalog.SupportsRead]
                .newScanBuilder(r.options).build(), r.output)
            fresh.setTagValue(RowPolicyRule.Applied, true)
            fresh
        }
        def govern(p0: LogicalPlan): LogicalPlan = {
          val withSubs = p0.transformAllExpressions {
            case se: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
              se.withNewPlan(planScans(govern(se.plan)))
          }
          // NO Applied-tag guard here: the cleanse's fresh relations can
          // still CARRY a stale tag (transformUpWithNewOutput copies tags
          // from the node it replaces, and the stored plan's relations
          // were tag-mutated by the caching query's own subquery
          // planning) — every cleansed relation is fresh by construction,
          // so planting unconditionally is what makes the bypass correct
          withSubs.transformUpWithNewOutput {
            case r: DataSourceV2Relation if governed(r.table) =>
              r.setTagValue(RowPolicyRule.Applied, true)
              val head = props(r.table)
              val gr = planted(r, r.table.name(), policyOf(head),
                masksOf(head, r.table.name()))
              gr -> r.output.zip(gr.output).filter {
                case (o, n) => o.exprId != n.exprId }
          }
        }
        val g = govern(cleansed)
        // fallback instance: post-pushdown a bare logical relation has
        // no physical strategy — rebuild every remaining one (governed
        // plants sit ABOVE their relation, so this covers both) as a
        // scan relation, the same shape the fallback's ordinary case
        // builds
        val planned =
          if (!fallback) g
          else g.transformUp {
            case r: DataSourceV2Relation =>
              val fresh = DataSourceV2ScanRelation(r,
                r.table.asInstanceOf[
                  org.apache.spark.sql.connector.catalog.SupportsRead]
                  .newScanBuilder(r.options).build(), r.output)
              fresh.setTagValue(RowPolicyRule.Applied, true)
              fresh
          }
        planned -> imr.output.zip(planned.output).filter {
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
          masksOf(props(s.relation.table), s.relation.table.name()))
        val mapping = s.relation.output.zip(g.output).filter {
          case (o, n) => o.exprId != n.exprId }
        // the governed plant is UNPRUNED while `s` may be column-pruned:
        // project back to exactly s.output (masked ids substituted), or
        // a scan sitting at the PLAN ROOT (a bare `SELECT ssn FROM t`)
        // would widen the query's output and misalign row decoding —
        // the masked value silently read as the wrong column
        val remap = mapping.map { case (o, n) => o.exprId -> n }.toMap
        val repruned = org.apache.spark.sql.catalyst.plans.logical.Project(
          s.output.map(o => remap.getOrElse(o.exprId,
            g.output.find(_.exprId == o.exprId).getOrElse(o))), g)
        repruned -> mapping
    }
  }
}
