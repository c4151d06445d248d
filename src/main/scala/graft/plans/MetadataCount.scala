package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, ApproximatePercentile, Complete, Count, HyperLogLogPlusPlus, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation,
  LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.sources.ManifestFileIndex

/** Metadata-only aggregates: `COUNT(*)`, `MIN(col)` and `MAX(col)` over
  * an UNFILTERED `format("graft")` relation are answered from the
  * manifest's recorded per-generation row counts and column bounds —
  * zero jobs, zero files opened. The reference's warehouse serves
  * exactly these from micro-partition metadata (a bare
  * `SELECT COUNT(*), MAX(load_ts)` never scans), and Delta ships the
  * same rewrite (OptimizeMetadataOnlyDeltaQuery); stock Spark instead
  * plans a scan of every file, which at 100 TB is still a full listing +
  * footer pass over the table.
  *
  * Safety gates, each of which falls back to the scan (the rewrite must
  * never be a guess):
  *  - every aggregate expression is a plain `COUNT(1)`/`COUNT(*)`,
  *    `MIN(col)` or `MAX(col)` — no DISTINCT, no FILTER clause, no other
  *    aggregates in the list (`COUNT(col)` is null-sensitive and stats
  *    don't record null counts, so it scans);
  *  - no grouping, and the child is the relation itself (optionally
  *    through an attribute-only Project) — a Filter in between keeps the
  *    plan untouched;
  *  - the snapshot's metadata actually covers the question: every
  *    generation carries a row count for COUNT, and every non-empty
  *    generation carries a current-domain stat for the MIN/MAX column
  *    ([[ManifestFileIndex.metadataBound]]'s contract — legacy commits,
  *    dropped over-length string bounds, or an evolved comparison domain
  *    all disqualify).
  *
  * Registered by [[graft.GraftExtensions]] (the deployment path) and
  * self-registered into `experimental.extraOptimizations` by
  * [[graft.sources.GraftDataSource]] for ad-hoc sessions — same dual
  * path as the as-of join strategy.
  */
object MetadataAggRule {
  /** The manifest NDV sketches' relative standard deviation — HLL at
    * lgK = [[graft.sources.ManifestTable.NdvLgK]]: rsd ≈ 1.04/√(2^lgK).
    * The metadata substitution may only serve queries whose requested
    * rsd is AT LEAST this loose.
    */
  val SketchNdvRsd: Double =
    1.04 / math.sqrt((1L << graft.sources.ManifestTable.NdvLgK).toDouble)

  /** Idempotent per-session registration. The rule itself is stateless
    * (it captures NO session — multi-session applications each register
    * into their own `experimental.extraOptimizations`), so callers on
    * the ad-hoc paths (provider reads, catalog scans) register into
    * whatever session is actually planning the query.
    */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[MetadataAggRule]))
      spark.experimental.extraOptimizations ++= Seq(MetadataAggRule())
}

case class MetadataAggRule() extends Rule[LogicalPlan] {

  /** The metadata answer for one aggregate output (as a Catalyst-internal
    * value, possibly null), or None when this aggregate can't be answered
    * without a scan.
    */
  private def answer(ne: NamedExpression, idx: ManifestFileIndex): Option[Any] =
    ne match {
      case Alias(ae: AggregateExpression, _)
          if ae.mode == Complete && !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(Seq(Literal(_, _))) => idx.metadataRowCount
          case Min(a: Attribute) =>
            idx.metadataBound(a.name, lower = true).map(_.orNull)
          case Max(a: Attribute) =>
            idx.metadataBound(a.name, lower = false).map(_.orNull)
          // approx_count_distinct is an ESTIMATE by contract, so the
          // manifest's merged HLL sketches (±3.25% at lgK=10, vs HLL++'s
          // default 5% rsd) may answer it metadata-only — the
          // warehouse's metadata approx shape — but ONLY when the
          // sketch's error bound covers what the query asked for: an
          // explicit relativeSD tighter than the sketch re-plans the
          // scan rather than silently serving looser numbers. Kill
          // switch: spark.graft.metadataApproxNdv=false.
          case hll: HyperLogLogPlusPlus if conf.getConfString(
              "spark.graft.metadataApproxNdv", "true").toBoolean &&
              hll.relativeSD >= MetadataAggRule.SketchNdvRsd =>
            hll.child match {
              case a: Attribute => idx.metadataNdv(a.name)
              case _ => None
            }
          // approx_percentile / percentile_approx: same estimate-by-
          // contract reasoning, answered from the manifest's merged KLL
          // sketches (k=200 ⇒ ~1.65% rank error). Integral columns get
          // the retained value rounded back to the column's type — KLL
          // retains actual stream values, so the round is exact. Its own
          // kill switch (spark.graft.metadataApproxPercentile), and an
          // accuracy argument ABOVE the function's default — the only
          // way a user expresses "tighter than the estimate contract" —
          // re-plans the scan.
          case ap: ApproximatePercentile if conf.getConfString(
              "spark.graft.metadataApproxPercentile", "true").toBoolean &&
              ap.accuracyExpression.foldable &&
              (ap.accuracyExpression.eval() match {
                case n: Number => n.longValue <= ApproximatePercentile
                  .DEFAULT_PERCENTILE_ACCURACY
                case _ => false
              }) =>
            ap.child match {
              case a: Attribute
                  if a.dataType.isInstanceOf[
                    org.apache.spark.sql.types.NumericType] &&
                    ap.percentageExpression.foldable =>
                def toChild(v: Double): Any = a.dataType match {
                  case org.apache.spark.sql.types.DoubleType => v
                  case org.apache.spark.sql.types.FloatType => v.toFloat
                  case org.apache.spark.sql.types.LongType => math.round(v)
                  case org.apache.spark.sql.types.IntegerType =>
                    math.round(v).toInt
                  case org.apache.spark.sql.types.ShortType =>
                    math.round(v).toShort
                  case org.apache.spark.sql.types.ByteType =>
                    math.round(v).toByte
                  case _ => return None
                }
                ap.percentageExpression.eval() match {
                  case d: java.lang.Double =>
                    idx.metadataQuantiles(a.name, Seq(d)).map(q =>
                      toChild(q.head))
                  case arr: org.apache.spark.sql.catalyst.util.ArrayData =>
                    val ps = arr.toDoubleArray().toSeq
                    idx.metadataQuantiles(a.name, ps).map(qs =>
                      new org.apache.spark.sql.catalyst.util.GenericArrayData(
                        qs.map(toChild)))
                  case _ => None
                }
              case _ => None
            }
          case _ => None
        }
      case _ => None
    }

  /** The graft file index when `plan` IS the relation (modulo an
    * attribute-only projection) — anything else, including any Filter,
    * returns None. Matches BOTH read surfaces: the `format("graft")`
    * HadoopFsRelation and the catalog's DSv2 scan relation (where a
    * pushed filter — even though graft keeps all filters residual —
    * disqualifies for safety).
    */
  private def graftIndex(plan: LogicalPlan): Option[ManifestFileIndex] =
    plan match {
      case lr: LogicalRelation => lr.relation match {
        case fsr: HadoopFsRelation => fsr.location match {
          case idx: ManifestFileIndex => Some(idx)
          case _ => None
        }
        case _ => None
      }
      case sr: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        sr.scan match {
          case s: graft.sources.GraftBatchScan if s.pushed.isEmpty =>
            Some(s.index)
          case _ => None
        }
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        r.table match {
          case t: graft.sources.GraftSqlTable => Some(t.index)
          case _ => None
        }
      case Project(projectList, child)
          if projectList.forall(_.isInstanceOf[Attribute]) =>
        graftIndex(child)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    // matched by type, not constructor shape (Aggregate's arity differs
    // across Spark minors)
    case agg: Aggregate
        if agg.groupingExpressions.isEmpty &&
          agg.aggregateExpressions.nonEmpty =>
      graftIndex(agg.child) match {
        case Some(idx) =>
          val answers = agg.aggregateExpressions.map(answer(_, idx))
          if (answers.forall(_.isDefined))
            LocalRelation(agg.aggregateExpressions.map(_.toAttribute),
              Seq(InternalRow.fromSeq(answers.map(_.get))))
          else agg
        case None => agg
      }
  }
}
