package graft.plans

import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
import org.apache.spark.sql.types.{LongType, StringType}

import graft.sources.{GraftSqlTable, ManifestTable}

/** Resolution for `spark.readStream.option("readChangeFeed", "true")
  * .table("graft.ns.t")` — subscribing to a table's change data feed by
  * its CATALOG NAME, the same name a SQL user SELECTs from, instead of
  * by path options on `format("graft-cdf")`.
  *
  * The wrinkle this rule exists for: a streaming relation's output
  * attributes are fixed at resolution from `Table.schema()`, but a feed
  * read produces the TABLE's columns PLUS the two CDF metadata columns
  * (`_change_type`, `_commit_version`) — and `loadTable` never sees the
  * read options, so the table object cannot report the feed shape
  * itself. The rule closes the gap where the options ARE visible: on
  * the resolved [[StreamingRelationV2]], appending the CDF columns to
  * the output exactly once (idempotent across analyzer passes). The
  * scan side ([[GraftSqlTable.newScanBuilder]]) sees the same option
  * and plans the [[graft.sources.CdfMicroBatchStream]] — the identical
  * stream `format("graft-cdf")` plans, checkpoint-compatible offsets
  * included. (Delta resolves its `readChangeFeed` option through the
  * same analysis-time rewrite.)
  *
  * Injected by [[graft.GraftExtensions]] — name-based feed subscription
  * therefore needs the extensions configured, which is the documented
  * deployment path for the catalog anyway; the path-based
  * `format("graft-cdf")` source keeps working without them.
  */
case class ResolveChangeFeedRead() extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case r @ StreamingRelationV2(_, _, _: GraftSqlTable, opts, output,
          _, _, _)
          if opts.getBoolean(GraftSqlTable.ReadChangeFeedOption, false) &&
            !output.exists(_.name == ManifestTable.ChangeTypeCol) =>
        r.copy(output = output ++ Seq(
          AttributeReference(ManifestTable.ChangeTypeCol, StringType)(),
          AttributeReference(ManifestTable.CommitVersionCol, LongType)()))
    }
}
