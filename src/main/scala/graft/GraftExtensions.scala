package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Spark extensions entry point — the production registration path for the
  * engine's custom planner pieces (today: the sort-merge as-of join
  * strategy, plans/AsOfJoinPlan.scala).
  *
  * Wire it either way:
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions)   // in-code
  *   --conf spark.sql.extensions=graft.GraftExtensions            // cluster
  * }}}
  * `AsOfJoin.apply` also self-registers through
  * `experimental.extraStrategies` for ad-hoc sessions, so both paths stay
  * equivalent; the extensions route is the one a deployment should use
  * (applies to every session built from the config, survives
  * `newSession()`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => plans.AsOfJoinStrategy)
    // session-context governance: graft_session_attr('k') folds the
    // session conf graft.session.k to a literal at analysis time
    ext.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier(
        functions.SessionAttr.Name),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft.functions", functions.SessionAttr.Name),
      functions.SessionAttr.builder))
    // row access policies FIRST: the policy filter must plant before the
    // metadata-count rewrite could answer an aggregate from manifest row
    // counts (which would leak hidden rows), and before pushdown so a
    // sargable policy prunes like any user predicate
    ext.injectOptimizerRule(_ => plans.RowPolicyRule())
    // metadata-only COUNT(*) over format("graft") relations — answered
    // from the manifest's recorded row counts, zero scan jobs
    ext.injectOptimizerRule(_ => plans.MetadataAggRule())
    // readStream.option("readChangeFeed", true).table("graft.ns.t") —
    // feed subscription by catalog name (the output-schema rewrite the
    // table object can't do itself because loadTable never sees options)
    ext.injectResolutionRule(_ => plans.ResolveChangeFeedRead())
    // merge-on-read reconciliation: relations over tables with
    // outstanding row deltas rewrite into base ∪ latest-delta plans —
    // injected pre-pushdown so the base leg keeps pruning/pushdown
    ext.injectOptimizerRule(_ => plans.MergeOnReadRule())
    // materialized-view substitution: subsumed aggregates over a table
    // with a FRESH self-maintaining mart rewrite onto the mart
    ext.injectOptimizerRule(_ => plans.MartRewriteRule())
    // named views against graft catalogs: the CREATE/DROP VIEW verbs
    // reroute at PARSE time (Spark 4.1.2 has no v2 view exec wiring and
    // ResolveSessionCatalog refuses them before a resolution rule could
    // run), and reads expand the stored SQL at resolution
    ext.injectParser((_, delegate) => new plans.GraftSqlParser(delegate))
    ext.injectResolutionRule(_ => plans.ResolveGraftViews())
    // CTAS tag lineage: CREATE [OR REPLACE] TABLE … AS SELECT carries
    // tag.<col>/maskForTag.* from DIRECTLY-referenced tagged source
    // columns — the cross-table half the catalog can't see (it gets the
    // result schema, never the query plan)
    ext.injectResolutionRule(_ => plans.CtasTagLineage())
  }
}
