package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.ResolvedIdentifier
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, ExprId}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, CreateTableAsSelect, LogicalPlan, Project, ReplaceTableAsSelect, TableSpec}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}

import graft.sources.{GraftCatalog, GraftSqlTable}

object CtasTagLineage {
  /** Fallback registration for sessions wired WITHOUT GraftExtensions
    * — the reference propagates tags regardless of client, so the carry
    * must not depend on the extensions conf. Same dual shape as
    * [[RowPolicyRule]]: the catalog registers this optimizer instance;
    * it stands down when the extensions' resolution instance is present.
    */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[CtasTagLineage]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ CtasTagLineage(
          fallback = true)
}

/** Tag propagation through CTAS column LINEAGE (the Snowflake rule the
  * catalog alone cannot implement: Spark hands `createTable` the result
  * schema, never the query plan — reference sql/02_canonical_ddl.sql's
  * CREATE OR REPLACE shape, with Snowflake's tag-lineage semantics).
  *
  * For `CREATE [OR REPLACE] TABLE graft.ns.t AS SELECT …`, every output
  * column with DIRECT lineage to a tagged source column — a bare
  * reference or a rename (`AS`), traced through Project/Aggregate alias
  * chains — carries the source's `tag.<col>` onto the new table, and
  * the carried tags' `maskForTag.<tag>` policies ride along so the tag
  * keeps masking at the target. A COMPUTED column (any expression
  * beyond a bare reference) breaks lineage, Snowflake's rule — deriving
  * `substr(ssn, -4)` is a declaration decision, not an automatic carry.
  * An explicitly declared key always wins over the carried value.
  *
  * Same-table REPLACE carry (tags of surviving columns when the CTAS
  * reads other sources or none) stays in [[graft.sources.GraftCatalog]]
  * `staged()`; this rule adds the CROSS-TABLE half.
  *
  * Two registration shapes of the one rule, mirroring [[RowPolicyRule]]:
  * the EXTENSIONS instance (`fallback = false`) is a resolution rule —
  * it enriches the node once the query subtree and target identifier
  * resolve, seeing pre-pushdown `DataSourceV2Relation` sources. The
  * FALLBACK instance (`fallback = true`, registered through
  * `experimental.extraOptimizations` by the catalog) runs post-pushdown
  * where only `DataSourceV2ScanRelation` remains — lineage still traces
  * because the governance projections pin output attribute ids to the
  * scan's — and stands down when the extensions instance is wired so
  * nothing applies twice. Both reach a fixpoint because they only ADD
  * keys that are absent.
  */
case class CtasTagLineage(fallback: Boolean = false)
    extends Rule[LogicalPlan] {

  private def extensionsActive: Boolean =
    SparkSession.active.sessionState.optimizer.batches
      .exists(_.rules.exists {
        case r: RowPolicyRule => !r.fallback
        case _ => false
      })

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (fallback && extensionsActive) plan
    else if (fallback) plan.transformUp(rewrite)
    else plan.resolveOperatorsUp(rewrite)

  private val rewrite: PartialFunction[LogicalPlan, LogicalPlan] = {
    case c: CreateTableAsSelect if eligible(c.name, c.query, c.tableSpec) =>
      val ts = c.tableSpec.asInstanceOf[TableSpec]
      val add = carried(c.query, ts.properties)
      if (add.isEmpty) c
      else c.copy(tableSpec = ts.copy(properties = ts.properties ++ add))
    case r: ReplaceTableAsSelect if eligible(r.name, r.query, r.tableSpec) =>
      val ts = r.tableSpec.asInstanceOf[TableSpec]
      val add = carried(r.query, ts.properties)
      if (add.isEmpty) r
      else r.copy(tableSpec = ts.copy(properties = ts.properties ++ add))
  }

  private def eligible(name: LogicalPlan, query: LogicalPlan,
      spec: org.apache.spark.sql.catalyst.plans.logical.TableSpecBase)
      : Boolean = name match {
    case ResolvedIdentifier(c: GraftCatalog, _) =>
      query.resolved && spec.isInstanceOf[TableSpec]
    case _ => false
  }

  /** Each graft source relation in `query` as (table, the output
    * attributes its columns are exposed under) — both the pre-pushdown
    * relation (resolution time) and the post-pushdown scan relation
    * (fallback optimizer time; its nested relation's output carries the
    * unpruned attribute ids the scan's pruned output is a subset of).
    */
  private def graftSources(query: LogicalPlan)
      : Seq[(GraftSqlTable, Seq[AttributeReference])] =
    query.collect {
      case r: DataSourceV2Relation => (r.table, r.output)
      case s: DataSourceV2ScanRelation => (s.relation.table,
        s.relation.output)
    }.collect { case (g: GraftSqlTable, out: Seq[_]) =>
      (g, out.asInstanceOf[Seq[AttributeReference]])
    }

  /** The `tag.*` / `maskForTag.*` properties the query's lineage
    * carries, minus anything `declared` already sets.
    */
  private def carried(query: LogicalPlan,
      declared: Map[String, String]): Map[String, String] = {
    val sources = graftSources(query)
    // source tags by the exprId each graft relation exposes them under
    val srcTags: Map[ExprId, String] = sources.flatMap { case (g, out) =>
      val props = g.properties().asScala
      out.flatMap(a => props.get(s"tag.${a.name}").map(t => a.exprId -> t))
    }.toMap
    if (srcTags.isEmpty) return Map.empty
    // direct-rename chains: Alias over a bare AttributeReference keeps
    // lineage; any other expression breaks it (Snowflake's rule)
    val aliasTo: Map[ExprId, ExprId] = query.collect {
      case p: Project => p.projectList.collect {
        case a: Alias => a.child match {
          case ar: AttributeReference => Some(a.exprId -> ar.exprId)
          case _ => None
        }
      }.flatten
      case ag: Aggregate => ag.aggregateExpressions.collect {
        case a: Alias => a.child match {
          case ar: AttributeReference => Some(a.exprId -> ar.exprId)
          case _ => None
        }
      }.flatten
    }.flatten.toMap
    @annotation.tailrec
    def source(id: ExprId, hops: Int = 0): ExprId =
      aliasTo.get(id) match {
        case Some(next) if hops < 64 => source(next, hops + 1)
        case _ => id
      }
    val tagProps = query.output.flatMap { a =>
      srcTags.get(source(a.exprId)).map(t => s"tag.${a.name}" -> t)
    }.toMap
    if (tagProps.isEmpty) return Map.empty
    // the tags are inert without their policies — but ONLY the policies
    // of tags that actually carried may ride along: copying every
    // source's maskForTag.* would arm masks for tags the target never
    // received, silently activating them if the user later declares
    // that tag themselves (on duplicate keys across sources, toMap
    // keeps the last relation's policy; conflicting declarations on one
    // table already refuse at read)
    val carriedTags = tagProps.values.toSet
    val maskProps: Map[String, String] = sources.flatMap { case (g, _) =>
      g.properties().asScala.toSeq.filter { case (k, _) =>
        k.startsWith("maskForTag.") &&
          carriedTags.contains(k.stripPrefix("maskForTag.")) }
    }.toMap
    (tagProps ++ maskProps).filter { case (k, _) => !declared.contains(k) }
  }
}
