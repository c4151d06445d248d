package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation,
  LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.sources.ManifestFileIndex

/** Metadata-only `COUNT(*)`: a bare count over an UNFILTERED
  * `format("graft")` relation is answered from the manifest's recorded
  * per-generation row counts — zero jobs, zero files opened. The
  * reference's warehouse serves exactly this from micro-partition
  * metadata (a bare `SELECT COUNT(*)` never scans), and Delta ships the
  * same rewrite (OptimizeMetadataOnlyDeltaQuery); stock Spark instead
  * plans a zero-column scan of every file, which at 100 TB is still a
  * full listing + footer pass over the table.
  *
  * Safety gates, each of which falls back to the scan (the rewrite must
  * never be a guess):
  *  - every aggregate expression is a plain `COUNT(1)`/`COUNT(*)` —
  *    no DISTINCT, no FILTER clause, no other aggregates in the list;
  *  - no grouping, and the child is the relation itself (optionally
  *    through an attribute-only Project) — a Filter in between keeps the
  *    plan untouched;
  *  - the snapshot's every generation carries a recorded count
  *    ([[graft.sources.ManifestTable.TableState.rowCount]] is None
  *    otherwise — e.g. a table with pre-count legacy commits).
  *
  * Registered by [[graft.GraftExtensions]] (the deployment path) and
  * self-registered into `experimental.extraOptimizations` by
  * [[graft.sources.GraftDataSource]] for ad-hoc sessions — same dual
  * path as the as-of join strategy.
  */
case class MetadataCountRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def isCountStar(ne: NamedExpression): Boolean = ne match {
    case Alias(ae: AggregateExpression, _) =>
      ae.mode == Complete && !ae.isDistinct && ae.filter.isEmpty &&
        (ae.aggregateFunction match {
          case Count(Seq(Literal(_, _))) => true
          case _ => false
        })
    case _ => false
  }

  /** The manifest row count when `plan` IS the graft relation (modulo an
    * attribute-only projection) — anything else, including any Filter,
    * returns None.
    */
  private def metadataCount(plan: LogicalPlan): Option[Long] = plan match {
    case lr: LogicalRelation => lr.relation match {
      case fsr: HadoopFsRelation => fsr.location match {
        case idx: ManifestFileIndex => idx.metadataRowCount
        case _ => None
      }
      case _ => None
    }
    case Project(projectList, child) if projectList.forall(_.isInstanceOf[Attribute]) =>
      metadataCount(child)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    // matched by type, not constructor shape (Aggregate's arity differs
    // across Spark minors)
    case agg: Aggregate
        if agg.groupingExpressions.isEmpty &&
          agg.aggregateExpressions.nonEmpty &&
          agg.aggregateExpressions.forall(isCountStar) =>
      metadataCount(agg.child) match {
        case Some(n) =>
          LocalRelation(agg.aggregateExpressions.map(_.toAttribute),
            Seq(InternalRow.fromSeq(agg.aggregateExpressions.map(_ => n))))
        case None => agg
      }
  }
}
