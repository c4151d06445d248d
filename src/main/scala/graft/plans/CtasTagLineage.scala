package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.ResolvedIdentifier
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, ExprId}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, CreateTableAsSelect, LogicalPlan, Project, ReplaceTableAsSelect, TableSpec}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sources.{GraftCatalog, GraftSqlTable}

/** Tag propagation through CTAS column LINEAGE (the Snowflake rule the
  * catalog alone cannot implement: Spark hands `createTable` the result
  * schema, never the query plan — reference sql/02_canonical_ddl.sql's
  * CREATE OR REPLACE shape, with Snowflake's tag-lineage semantics).
  *
  * For `CREATE [OR REPLACE] TABLE graft.ns.t AS SELECT …`, every output
  * column with DIRECT lineage to a tagged source column — a bare
  * reference or a rename (`AS`), traced through Project/Aggregate alias
  * chains — carries the source's `tag.<col>` onto the new table, and
  * the source tables' `maskForTag.*` policies ride along so the tag
  * keeps masking at the target. A COMPUTED column (any expression
  * beyond a bare reference) breaks lineage, Snowflake's rule — deriving
  * `substr(ssn, -4)` is a declaration decision, not an automatic carry.
  * An explicitly declared key always wins over the carried value.
  *
  * Same-table REPLACE carry (tags of surviving columns when the CTAS
  * reads other sources or none) stays in [[graft.sources.GraftCatalog]]
  * `staged()`; this rule adds the CROSS-TABLE half. Injected as a
  * resolution rule: it enriches the node only once the query subtree
  * and the target identifier are resolved, and reaches a fixpoint
  * because it only ADDS keys that are absent.
  */
case class CtasTagLineage() extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
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

  /** The `tag.*` / `maskForTag.*` properties the query's lineage
    * carries, minus anything `declared` already sets.
    */
  private def carried(query: LogicalPlan,
      declared: Map[String, String]): Map[String, String] = {
    // source tags by the exprId each graft relation exposes them under
    val srcTags: Map[ExprId, String] = query.collect {
      case r: DataSourceV2Relation => r.table match {
        case g: GraftSqlTable =>
          val props = g.properties().asScala
          r.output.flatMap(a => props.get(s"tag.${a.name}")
            .map(t => a.exprId -> t))
        case _ => Nil
      }
    }.flatten.toMap
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
    // the tags are inert without their policies: carry the sources'
    // maskForTag.* wholesale (first writer wins on a duplicate key —
    // conflicting multi-policy declarations already refuse at read)
    val maskProps: Map[String, String] = query.collect {
      case r: DataSourceV2Relation => r.table match {
        case g: GraftSqlTable => g.properties().asScala.toSeq
          .filter(_._1.startsWith("maskForTag."))
        case _ => Nil
      }
    }.flatten.toMap
    (tagProps ++ maskProps).filter { case (k, _) => !declared.contains(k) }
  }
}
