package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}

import graft.sources.{GraftBatchScan, GraftSqlTable, ManifestFileIndex, ManifestTable}

/** MERGE-ON-READ read-side planning: any relation over a graft table
  * with outstanding row deltas rewrites into the reconciliation plan —
  *
  * {{{
  *   base-scan ──left-anti (broadcast keys)──┐
  *                                           ├─ union ─ project(orig ids)
  *   delta-scan ─ latest-per-key ─ upserts ──┘
  * }}}
  *
  * declared entirely with the DataFrame API so Catalyst owns the
  * physical strategy: predicate pushdown reaches BOTH scans through the
  * union/join, the delta side stays broadcast-small by the compaction
  * contract, and the base scan never shuffles. The base leg is the
  * ORIGINAL relation re-pinned with a `raw` marker, so generation
  * pruning is preserved and the rule is idempotent (the marker stops
  * re-wrapping across fixpoint passes).
  *
  * Covered relations:
  *  - [[DataSourceV2Relation]] over a catalog [[GraftSqlTable]] — both
  *    plain SELECTs and the read side of row-level WriteDelta plans
  *    (their [[RowLevelOperationTable]] wrapper re-wraps around the raw
  *    clone, keeping the operation's own scan builder). The commit-side
  *    `table` slot of a V2 write command is NOT a plan child, so it is
  *    never rewritten.
  *  - [[LogicalRelation]] over a `format("graft")`
  *    [[ManifestFileIndex]].
  *  - [[DataSourceV2ScanRelation]] fallback (a session without
  *    [[graft.GraftExtensions]] only reaches the post-pushdown batch):
  *    the scan's pruned output may lack merge keys, so this leg
  *    rebuilds from a fresh reconciled read at the scan's pinned
  *    version — correct, at the cost of the pushed-filter pruning the
  *    extensions path keeps.
  *
  * Injected by [[graft.GraftExtensions]] into the operator-optimization
  * batch (pre-pushdown, relations intact) and self-registered into
  * `experimental.extraOptimizations` for ad-hoc sessions — the same
  * dual path as [[MetadataAggRule]].
  */
object MergeOnReadRule {
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[MergeOnReadRule]))
      spark.experimental.extraOptimizations ++= Seq(MergeOnReadRule())
}

case class MergeOnReadRule() extends Rule[LogicalPlan] {

  private def spark: SparkSession = SparkSession.active

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case r: DataSourceV2Relation =>
      rewriteV2(r).getOrElse(r)
    case s: DataSourceV2ScanRelation =>
      rewriteScan(s).getOrElse(s)
    case lr: LogicalRelation =>
      rewriteV1(lr).getOrElse(lr)
  }

  private def underlying(t: Table): Option[GraftSqlTable] = t match {
    case g: GraftSqlTable => Some(g)
    case other =>
      org.apache.spark.sql.graftbridge.Bridge.unwrapRowLevel(other) match {
        case Some(g: GraftSqlTable) => Some(g)
        case _ => None
      }
  }

  private def rewriteV2(r: DataSourceV2Relation): Option[LogicalPlan] =
    underlying(r.table)
      .filter(g => !g.raw && g.index.state.deltas.nonEmpty)
      .map { g =>
        val rawTable: Table = r.table match {
          case g2: GraftSqlTable => g2.rawClone
          case wrapper => org.apache.spark.sql.graftbridge.Bridge
            .rewrapRowLevel(wrapper, g.rawClone)
        }
        wrap(r.output, r.copy(table = rawTable),
          g.rootDir.toString, g.index.state)
      }

  private def rewriteV1(lr: LogicalRelation): Option[LogicalPlan] =
    lr.relation match {
      case fs: HadoopFsRelation => fs.location match {
        case idx: ManifestFileIndex
            if !idx.raw && idx.state.deltas.nonEmpty =>
          val newFs = fs.copy(location = idx.rawCopy)(fs.sparkSession)
          Some(wrap(lr.output, lr.copy(relation = newFs),
            idx.rootPath, idx.state))
        case _ => None
      }
      case _ => None
    }

  /** Post-pushdown fallback: the scan's column pruning may have dropped
    * the merge keys, so reconcile a FRESH read at the scan's pinned
    * snapshot and re-prune to the scan's output.
    */
  private def rewriteScan(s: DataSourceV2ScanRelation): Option[LogicalPlan] =
    s.scan match {
      case b: GraftBatchScan
          if !b.index.raw && b.index.state.deltas.nonEmpty =>
        val full = ManifestTable.readTable(spark, b.index.rootPath,
          Some(b.index.snapshotVersion), b.index.tableName)
        val pruned = full.select(
          s.output.map(a => org.apache.spark.sql.functions.col(a.name))
            .toIndexedSeq: _*)
        Some(aliasTo(s.output, pruned.queryExecution.analyzed))
      case _ => None
    }

  private def wrap(output: Seq[Attribute], basePlan: LogicalPlan,
      root: String, st: ManifestTable.TableState): LogicalPlan = {
    val base = org.apache.spark.sql.graftbridge.Bridge.ofRows(spark, basePlan)
    val reconciled = ManifestTable.reconcileDeltas(spark, root, st, base)
    aliasTo(output, reconciled.queryExecution.analyzed)
  }

  /** Bind the rewritten plan's output back to the original relation's
    * attribute ids, so every parent reference stays resolved. When the
    * plan already carries the original ids (the base leg keeps them
    * through join/union), no projection is needed.
    *
    * The spliced subplan skipped the optimizer's hint-resolution batch
    * (it runs before this rule's), so the reconciliation's broadcast
    * hint is folded into its Join node here — leaving a ResolvedHint
    * in the final plan is an internal error at physical planning.
    */
  private def aliasTo(output: Seq[Attribute], plan0: LogicalPlan): LogicalPlan = {
    val plan =
      org.apache.spark.sql.catalyst.optimizer.EliminateResolvedHint(plan0)
    require(plan.output.length == output.length,
      s"merge-on-read rewrite arity mismatch: ${plan.output.length} vs " +
        s"${output.length}")
    if (plan.output.map(_.exprId) == output.map(_.exprId)) plan
    else Project(output.zip(plan.output).map { case (o, n) =>
      Alias(n, o.name)(exprId = o.exprId,
        qualifier = o.qualifier): NamedExpression
    }, plan)
  }
}
