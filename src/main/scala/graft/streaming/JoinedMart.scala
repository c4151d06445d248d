package graft.streaming

import java.io.File

import graft.sources.ManifestTable
import graft.sources.ManifestTable.TableBatch
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JOIN-AWARE self-maintaining mart — a rollup of `source ⋈ dim`
  * materialized at (source groups × dim attributes) grain and kept
  * current INCREMENTALLY from both tables' change feeds, so a
  * dim-attribute dashboard rollup (the reference's ops views join
  * canonical facts to reference data before aggregating,
  * sql/07_operational_views.sql) answers from a churn-maintained table
  * with NO join at query time at all.
  *
  * Architecture — the cascade, extended through a join. The joined
  * mart J sits on top of an ordinary [[IncrementalMart]] partial P:
  *
  * {{{
  *   P = source.groupBy(joinKeys ++ srcGroupCols)
  *             .agg(count(*) as n_rows, sum(v) as sum_v)   // feed-active
  *   J = (P ⋈ dim on keys).groupBy(srcGroupCols ++ dimGroupCols)
  *             .agg(sum(n_rows) as n_rows, sum(sum_v) as sum_v)
  * }}}
  *
  * and each refresh folds the classic join-IVM identity
  *
  * {{{   ΔJ = ΔP ⋈ D_old  +  P_new ⋈ ΔD   }}}
  *
  * (exact for additive aggregates because join multiplicity distributes
  * over the partial sums; both terms are change-feed reads, never a
  * source scan). Sequencing makes the identity hold verbatim: the ΔP
  * term joins against the dim pinned at the PREVIOUS fold watermark,
  * the ΔD term against the partial at the NEW one, so a key whose fact
  * rows and dim row both changed in the range contributes exactly once
  * from each side.
  *
  * Cost at scale: a refresh pays churn(source) to maintain P (the
  * standard mart fold), churn(P) × dim-match + churn(dim) × partial
  * rows on changed keys to maintain J — the 100 TB fact table is never
  * rescanned, and a dim attribute update (the classic "region renamed"
  * migration that invalidates every naive rollup) costs one bounded
  * re-join of the affected keys' PARTIALS, not their facts.
  *
  * Aggregates are the additive set (count(*), sum) only: extrema are
  * not invertible through a dim retraction without refetching fact
  * rows, which would break the never-rescan contract — a query needing
  * joined min/max still rewrites onto (P ⋈ dim) via
  * [[graft.plans.MartRewriteRule]]'s join shape.
  *
  * Freshness is two-stamped: `jmartSourceVersion` is the SOURCE commit
  * version folded through P into J, `jmartFoldVersion` the manifest
  * version through which BOTH P's and the dim's feeds are folded —
  * the query rewrite substitutes J only when no source change is newer
  * than the former and no dim change newer than the latter.
  */
object JoinedMart {

  /** Property keys the joined mart stamps on itself. */
  val Source = "jmartSource"
  val Dim = "jmartDim"
  val SrcKeys = "jmartSrcKeys"
  val DimKeys = "jmartDimKeys"
  val SrcGroupCols = "jmartSrcGroupCols"
  val DimGroupCols = "jmartDimGroupCols"
  val ValueCols = "jmartValueCols"
  val Partial = "jmartPartial"
  val SourceVersion = "jmartSourceVersion"
  val FoldVersion = "jmartFoldVersion"

  /** `CREATE/REFRESH` verb (`CALL graft.system.refresh_joined_mart`):
    * bring the joined mart current through the manifest head — first
    * call records the declaration and builds base state (one P ⋈ dim
    * join at partial grain), later calls may omit the column lists and
    * fold only the unseen feed ranges. Returns the manifest version the
    * mart is now current through. Idempotent: a repeated call folds an
    * empty range and commits nothing.
    */
  def refresh(spark: SparkSession, root: File, source: String, dim: String,
      mart: String, srcKeys: Seq[String] = Nil, dimKeys: Seq[String] = Nil,
      srcGroupCols: Seq[String] = Nil, dimGroupCols: Seq[String] = Nil,
      valueCols: Seq[String] = Nil, numBuckets: Int = 8,
      /** Publish the joined mart's OWN change feed, so even coarser
        * rollups cascade ABOVE the join (daily joined rollup → monthly)
        * with per-level cost tracking that level's churn — and the
        * rewrite rule chains onto the coarser mart the usual way. Like
        * [[IncrementalMart]], a mart already feed-active stays so.
        */
      changeFeed: Boolean = false): Long = {
    val m0 = ManifestTable.read(root).getOrElse(
      throw new IllegalArgumentException(s"no manifest under $root"))
    require(m0.table(source).schemaJson.nonEmpty,
      s"table '$source' does not exist")
    val dimTs0 = m0.table(dim)
    require(dimTs0.schemaJson.nonEmpty, s"table '$dim' does not exist")
    require(dimTs0.feedFrom >= 0,
      s"dim table '$dim' has no active change feed — joined-mart " +
        "maintenance folds it; write the dim with changeFeed=true")
    val martTs = m0.table(mart)
    def recorded(key: String): Seq[String] = martTs.props.get(key)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    def pick(passed: Seq[String], key: String): Seq[String] =
      if (passed.nonEmpty) passed else recorded(key)
    val sk = pick(srcKeys, SrcKeys)
    val dk = pick(dimKeys, DimKeys)
    val sg = pick(srcGroupCols, SrcGroupCols)
    val dg = pick(dimGroupCols, DimGroupCols)
    val vc = pick(valueCols, ValueCols)
    require(sk.nonEmpty && sk.length == dk.length,
      s"join keys required (src=$sk, dim=$dk): mart '$mart' has no " +
        "recorded declaration yet")
    val groupCols = sg ++ dg
    require(groupCols.nonEmpty, "at least one group column required")
    require(groupCols.distinct.length == groupCols.length,
      s"source and dim group column names must be disjoint: $groupCols")
    val partial = martTs.props.getOrElse(Partial, s"${mart}_partial")
    // an existing mart's physical layout wins over the argument — a
    // refresh must hash into the bucket space the table was built with
    val buckets = if (martTs.numBuckets > 0) martTs.numBuckets else numBuckets
    // keep an already-feed-active joined mart cascading
    val feed = changeFeed || martTs.feedFrom >= 0

    // 1. the partial mart: source rolled up to (join keys × src groups),
    //    feed-active so its diffs cascade into J. refreshMart stamps the
    //    SOURCE version P (and therefore J) is current through.
    val srcV = IncrementalMart.refreshMart(spark, root, source, partial,
      groupCols = (sk ++ sg).distinct, valueCols = vc,
      numBuckets = buckets, changeFeed = true)

    val m1 = ManifestTable.read(root).get
    val v1 = m1.version
    val qid = EventPipeline.currentQueryId(spark)
    val props = Map(
      Source -> source, Dim -> dim, Partial -> partial,
      SrcKeys -> sk.mkString(","), DimKeys -> dk.mkString(","),
      SrcGroupCols -> sg.mkString(","), DimGroupCols -> dg.mkString(","),
      ValueCols -> vc.mkString(","),
      SourceVersion -> srcV.toString, FoldVersion -> v1.toString)

    def keyCond(l: DataFrame, r: DataFrame): Column =
      sk.zip(dk).map { case (a, b) => l(a) === r(b) }.reduce(_ && _)
    // a partial/dim row's additive contribution to its joined group,
    // signed by the feed row's change type on the driving side
    def contrib(rows: DataFrame, part: DataFrame, d: DataFrame)
        : DataFrame = {
      val sign = when(col(ManifestTable.ChangeTypeCol)
        .isin("insert", "update_postimage"), lit(1L)).otherwise(lit(-1L))
      val sumType = (c: String) => part.schema(s"sum_$c").dataType
      rows.groupBy((sg.map(part(_)) ++ dg.map(d(_))): _*)
        .agg(
          sum(sign * part(IncrementalMart.RowsCol)).as("delta_rows"),
          (vc.map(c => sum(sign * part(s"sum_$c")).cast(sumType(c))
            .as(s"delta_$c"))
            // non-null counts ride the same signed fold: count(col)/avg
            // stay derivable from the JOINED mart too
            ++ vc.map(c => sum(sign * part(s"cnt_$c")).cast("long")
              .as(s"delta_cnt_$c"))): _*)
    }

    // base (re)build: one join at PARTIAL grain — P is group-sized, the
    // dim is a dim, never the fact table. Also the fallback when a feed
    // range this mart needs has aged past retention (a mart left
    // unrefreshed longer than the feed window): overwrite replaces the
    // stale state wholesale in one atomic commit.
    def rebuild(overwrite: Boolean): Unit = {
      // pin BOTH reads to the stamped watermark v1: a commit landing
      // between the manifest read and these table reads would otherwise
      // be included in the rebuild yet stamped unfolded — and the next
      // refresh would fold its feed range a second time
      val p = ManifestTable.readTable(spark, root.toString,
        version = Some(v1), table = partial)
      val d = ManifestTable.readTable(spark, root.toString,
        version = Some(v1), table = dim)
      val rows = p.join(d, keyCond(p, d))
        .groupBy((sg.map(p(_)) ++ dg.map(d(_))): _*)
        .agg(sum(p(IncrementalMart.RowsCol)).as(IncrementalMart.RowsCol),
          (vc.map(c => sum(p(s"sum_$c"))
            .cast(p.schema(s"sum_$c").dataType).as(s"sum_$c"))
            ++ vc.map(c =>
              sum(p(s"cnt_$c")).cast("long").as(s"cnt_$c"))): _*)
      ManifestTable.mergeBatch(root, qid, v1,
        Seq(TableBatch(mart, rows, groupCols, buckets,
          overwrite = overwrite, changeFeed = feed, props = props)))
    }

    val v0 = martTs.props.get(FoldVersion)
      .flatMap(s => scala.util.Try(s.trim.toLong).toOption)
    v0 match {
      case None => rebuild(overwrite = false)
      case Some(from) if from >= v1 => // nothing new anywhere
      case Some(from) =>
        // ΔP ⋈ D_old: the partial's feed changes against the dim AS OF
        // the previous watermark (time travel when retained, exact feed
        // inversion when aged — added rows subtracted back, removed
        // rows restored; multiset algebra, same contract as
        // IncrementalMart's retraction fallback)
        val (dP, dDRaw) =
          try (
            ManifestTable.readChangeFeed(spark, root.toString,
              from + 1, Some(v1), partial),
            ManifestTable.readChangeFeed(spark, root.toString,
              from + 1, Some(v1), dim))
          catch {
            case _: IllegalStateException => // feed range aged out
              rebuild(overwrite = true); return v1
          }
        val dD = dDRaw.persist()
        try {
          val dNow = ManifestTable.readTable(spark, root.toString,
            version = Some(v1), table = dim)
          val dCols = dNow.columns.toIndexedSeq
          val dOld =
            try ManifestTable.readTable(spark, root.toString,
              version = Some(from), table = dim)
            catch {
              case _: java.io.FileNotFoundException =>
                val added = dD.filter(col(ManifestTable.ChangeTypeCol)
                  .isin("insert", "update_postimage"))
                  .select(dCols.map(col): _*)
                val removed = dD.filter(col(ManifestTable.ChangeTypeCol)
                  .isin("delete", "update_preimage"))
                  .select(dCols.map(col): _*)
                // union BEFORE subtracting: a key inserted at v_i and
                // updated at v_j (both in the unfolded range) must
                // reconstruct to {} — subtract-first floors the multiset
                // at zero and resurrects the pre-update row
                dNow.unionAll(removed).exceptAll(added)
            }
          val pNow = ManifestTable.readTable(spark, root.toString,
            version = Some(v1), table = partial)
          val fromP = contrib(dP.join(dOld, keyCond(dP, dOld)), dP, dOld)
          // P_new ⋈ ΔD: dim feed changes against the just-refreshed
          // partial — the term that makes a dim-attribute update migrate
          // every affected key's rollup without touching the source
          val fromD = contrib(dD.join(pNow, keyCond(pNow, dD)), pNow, dD)
          // groups both terms touch must net BEFORE the fold (its
          // replace-by-key join expects one delta row per group)
          val deltas = fromP.unionByName(fromD)
            .groupBy(groupCols.map(col): _*)
            .agg(sum("delta_rows").as("delta_rows"),
              (vc.map(c => sum(s"delta_$c")
                .cast(fromP.schema(s"delta_$c").dataType)
                .as(s"delta_$c"))
                ++ vc.map(c => sum(s"delta_cnt_$c").cast("long")
                  .as(s"delta_cnt_$c"))): _*)
            .persist()
          try IncrementalMart.foldDeltas(spark, root.toString, mart,
            groupCols, vc, buckets, changeFeed = feed, deltas,
            qid, v1, props)
          finally { deltas.unpersist(); () }
        } finally { dD.unpersist(); () }
    }
    v1
  }
}
