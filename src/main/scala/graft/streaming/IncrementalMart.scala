package graft.streaming

import java.io.File

import graft.sources.ManifestTable
import graft.sources.ManifestTable.TableBatch
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Self-maintaining aggregate mart over a [[ManifestTable]] change data
  * feed — the downstream half of the CDF contract, and the Spark-native
  * analogue of the reference's stream-fed summary marts (a Snowflake task
  * consuming a STREAM to keep OPS_* rollups current;
  * sql/07_operational_views.sql derives them on demand, a warehouse
  * deployment materializes them exactly this way).
  *
  * The maintainer subscribes with `format("graft-cdf")` and, per
  * micro-batch, folds the commit deltas into a persisted mart table:
  *
  *   1. [[ManifestTable.deltaAggregate]] nets the batch's change rows into
  *      per-group deltas (inserts/postimages `+`, preimages/deletes `−`) —
  *      one row per TOUCHED group, never a table scan;
  *   2. the mart rows for exactly those groups are loaded via the mart's
  *      own hash-bucketing ([[ManifestTable.readTableBuckets]] — opens
  *      only covering buckets);
  *   3. old state ⊕ delta is merged back replace-by-key under the same
  *      (queryId, batchId) idempotence and atomic-manifest commit as every
  *      other sink — a group netted to zero rows is deleted, a group the
  *      update MIGRATED gets `−` in its old group and `+` in its new one
  *      by construction of the preimage rows.
  *
  * Per-trigger cost therefore scales with CHURN (changed groups × bucket
  * width), never with mart or source size: at 100 TB the mart never
  * rescans its source, and a restart resumes exactly-once from the
  * checkpointed feed version. Invariant (spec-locked):
  * `mart == source.groupBy(groupCols).agg(count(*), sum(valueCols))` after
  * every drained commit, from any retained starting point.
  *
  * Non-additive extrema (`maxCols`/`minCols` — the
  * VW_LOAD_AUDIT_SUMMARY `MAX(load_ts)` shape, sql/07_ops_views.sql:12)
  * ride the same fold with a two-regime rule:
  *  - insert-only batches merge the stored extremum with the batch's via
  *    greatest/least — monotone, feed-only, still source-scan-free (the
  *    overwhelmingly common regime: appends and late arrivals);
  *  - a batch whose group carries ANY preimage/delete may have retracted
  *    the reigning extremum, which no feed arithmetic can recover — those
  *    groups (and ONLY those) are recomputed from the source snapshot
  *    pinned at the batch's last commit version (time travel keeps the
  *    answer exact even when the live table has already moved on). The
  *    recompute is a column-pruned scan restricted by a semi join to the
  *    retracted groups; it cannot bucket-prune (the source is bucketed by
  *    its own merge keys, not the mart's group columns), so the honest
  *    cost model is: retraction batches pay one narrow source scan,
  *    insert batches pay nothing.
  */
object IncrementalMart {

  /** `count(*)` column name in the mart; value sums land as `sum_<col>`,
    * per-column non-null counts as `cnt_<col>` (what derives `count(col)`
    * and `avg` = sum/cnt at rewrite time), extrema as `max_<col>` /
    * `min_<col>`.
    */
  val RowsCol = "n_rows"

  final case class Config(
      sourceRoot: String,
      martRoot: String,
      groupCols: Seq[String],
      valueCols: Seq[String],
      sourceTable: String = ManifestTable.DefaultTable,
      martTable: String = ManifestTable.DefaultTable,
      numBuckets: Int = 8,
      maxCols: Seq[String] = Nil,
      minCols: Seq[String] = Nil,
      /** Row-level projection applied to the feed batch (and to the
        * recompute's source rows) before aggregation — where a view's
        * derived 0/1 columns live, e.g. VW_CANON_COUNTS'
        * `SUM(IFF(is_valid, 1, 0))` becomes a prepared `valid` column.
        * Must be a per-row projection (no aggregation, no reordering
        * semantics): it runs on change rows that still carry the
        * change-type column.
        */
      prepare: DataFrame => DataFrame = identity,
      /** Publish the mart's own change feed: each maintenance commit's
        * replace-by-key diff (postimages + touched-key deletes) becomes
        * a feed downstream consumers — including ANOTHER mart — fold,
        * so rollups CASCADE (source → daily mart → monthly mart) with
        * per-level cost tracking that level's churn. The rewrite rule
        * chains the same way: a query over a feed-active mart rewrites
        * onto ITS fresh mart.
        */
      changeFeed: Boolean = false)

  /** Subscribe and maintain continuously (caller owns the trigger). */
  def start(spark: SparkSession, cfg: Config, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream.format("graft-cdf")
      .option("path", cfg.sourceRoot).option("table", cfg.sourceTable)
      .load()
      .writeStream.option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        applyBatch(cfg, batch, batchId))
      .start()

  /** Drain the feed backlog into the mart and return (AvailableNow). */
  def sync(spark: SparkSession, cfg: Config, checkpoint: String): Unit = {
    val q = start(spark, cfg, checkpoint)
    q.awaitTermination()
  }

  /** One micro-batch of feed rows → one atomic mart commit. Also usable
    * directly over a batch [[ManifestTable.readChangeFeed]] range.
    */
  def applyBatch(cfg: Config, batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return // empty feed version: nothing to fold
    val spark = batch.sparkSession
    val prepared = cfg.prepare(batch)
    val deltas = ManifestTable
      .deltaAggregate(prepared, cfg.groupCols, cfg.valueCols,
        cfg.maxCols, cfg.minCols)
      .persist()
    try {
      val extremaCols =
        cfg.maxCols.map(c => s"max_$c") ++ cfg.minCols.map(c => s"min_$c")
      // extremum recompute fallback: only for groups a retraction touched,
      // only when the batch HAS retractions (the driver-side count keeps
      // the insert-only fast path from ever planning a source scan)
      def withExtrema(joined: DataFrame): (DataFrame, Seq[Column]) =
        if (extremaCols.isEmpty) (joined, Nil)
        else {
          val retracts = deltas
            .agg(sum("delta_retracts")).head.getLong(0)
          if (retracts == 0L)
            (joined,
              cfg.maxCols.map(c =>
                greatest(col(s"m.max_$c"), col(s"d.max_$c")).as(s"max_$c"))
                ++ cfg.minCols.map(c =>
                  least(col(s"m.min_$c"), col(s"d.min_$c")).as(s"min_$c")))
          else {
            // pin the source at the batch's last commit version: the live
            // table may already hold commits whose feed versions this
            // subscriber hasn't folded yet, and an unpinned read would
            // leak their rows into the extremum ahead of the counts
            val pinV = batch
              .agg(max(col(ManifestTable.CommitVersionCol))).head.getLong(0)
            val rGroups = deltas.filter(col("delta_retracts") > 0)
              .select(cfg.groupCols.map(col).toIndexedSeq: _*)
            // only the columns the recompute aggregates travel through the
            // scan (and the fallback's multiset algebra below)
            val projCols =
              (cfg.groupCols ++ (cfg.maxCols ++ cfg.minCols).distinct)
                .map(col).toIndexedSeq
            def groupRows(df: DataFrame): DataFrame = {
              val c = cfg.groupCols.map(k => df(k) <=> rGroups(k)).reduce(_ && _)
              df.join(rGroups, c, "left_semi").select(projCols: _*)
            }
            val pinned =
              try groupRows(cfg.prepare(ManifestTable.readTable(spark,
                cfg.sourceRoot, version = Some(pinV), table = cfg.sourceTable)))
              catch {
                case _: java.io.FileNotFoundException =>
                  // the batch's last commit version aged out of SNAPSHOT
                  // retention (a subscriber restarting several versions
                  // behind: RetainVersions < ChangeRetainVersions, and the
                  // feed contract serves starting points the snapshot
                  // window no longer does). Reconstruct the retracted
                  // groups' row-multiset AT pinV exactly: the oldest
                  // retained snapshot minus the feed changes in (pinV, r]
                  // this subscriber hasn't folded yet — a range the feed
                  // still retains precisely because its window is wider.
                  val live = ManifestTable.read(new File(cfg.sourceRoot))
                    .map(_.version).getOrElse(pinV)
                  val r = live - ManifestTable.RetainVersions + 1
                  val snapR = groupRows(cfg.prepare(ManifestTable.readTable(
                    spark, cfg.sourceRoot, version = Some(r),
                    table = cfg.sourceTable)))
                  val chg = cfg.prepare(ManifestTable.readChangeFeed(spark,
                    cfg.sourceRoot, pinV + 1, Some(r), cfg.sourceTable))
                  val added = groupRows(chg.filter(
                    col(ManifestTable.ChangeTypeCol)
                      .isin("insert", "update_postimage")))
                  val removed = groupRows(chg.filter(
                    col(ManifestTable.ChangeTypeCol)
                      .isin("delete", "update_preimage")))
                  // union BEFORE subtracting (and multiset unionAll):
                  // subtract-first floors at zero when a row was both
                  // inserted and re-updated inside (pinV, r], resurrecting
                  // its intermediate image
                  snapR.unionAll(removed).exceptAll(added)
              }
            val rcAggs = cfg.maxCols.map(c => max(col(c)).as(s"rc_max_$c")) ++
              cfg.minCols.map(c => min(col(c)).as(s"rc_min_$c"))
            val recomputed = pinned
              .groupBy(cfg.groupCols.map(col).toIndexedSeq: _*)
              .agg(rcAggs.head, rcAggs.tail.toIndexedSeq: _*)
            val rCond = cfg.groupCols
              .map(k => col(s"d.$k") <=> col(s"r.$k")).reduce(_ && _)
            val j2 = joined.join(recomputed.alias("r"), rCond, "left_outer")
            val sel = cfg.maxCols.map(c =>
              when(col("d.delta_retracts") > 0, col(s"r.rc_max_$c"))
                .otherwise(greatest(col(s"m.max_$c"), col(s"d.max_$c")))
                .as(s"max_$c")) ++
              cfg.minCols.map(c =>
                when(col("d.delta_retracts") > 0, col(s"r.rc_min_$c"))
                  .otherwise(least(col(s"m.min_$c"), col(s"d.min_$c")))
                  .as(s"min_$c"))
            (j2, sel)
          }
        }
      // self-declare as a materialized view and stamp the source commit
      // version this fold reaches — the freshness gate
      // graft.plans.MartRewriteRule substitutes aggregates on (stale
      // stamp = no rewrite, never a stale answer); idempotent re-stamps
      // of the declaration keys are free
      val srcV = batch
        .agg(max(col(ManifestTable.CommitVersionCol))).head.getLong(0)
      foldDeltas(spark, cfg.martRoot, cfg.martTable, cfg.groupCols,
        cfg.valueCols, cfg.numBuckets, cfg.changeFeed, deltas,
        EventPipeline.currentQueryId(spark), batchId,
        props = Map(
          graft.plans.MartRewriteRule.Of -> cfg.sourceTable,
          graft.plans.MartRewriteRule.SourceRoot ->
            new File(cfg.sourceRoot).getCanonicalPath,
          graft.plans.MartRewriteRule.GroupCols ->
            cfg.groupCols.mkString(","),
          graft.plans.MartRewriteRule.ValueCols ->
            cfg.valueCols.mkString(","),
          graft.plans.MartRewriteRule.MaxCols -> cfg.maxCols.mkString(","),
          graft.plans.MartRewriteRule.MinCols -> cfg.minCols.mkString(","),
          graft.plans.MartRewriteRule.SourceVersion -> srcV.toString),
        extraFields =
          extremaCols.map(c => StructField(c, deltas.schema(c).dataType)),
        extraSelect = withExtrema)
    } finally { deltas.unpersist(); () }
  }

  /** Fold a frame of per-group NET deltas (`groupCols ++ delta_rows ++
    * delta_<c>`) into the mart as ONE atomic replace-by-key commit — the
    * shared lower half of every mart maintainer ([[applyBatch]] computes
    * its deltas from raw feed rows; [[JoinedMart]] from the partial-mart
    * and dimension feeds). Only the touched groups' buckets are read
    * (the writer's own key hash over the churn-sized delta frame), a
    * group netted to zero rows is deleted, and `extraSelect` lets the
    * caller append non-additive columns (the extremum hook) computed
    * over the (mart ⟗ delta) join.
    */
  private[graft] def foldDeltas(spark: SparkSession, martRoot: String,
      martTable: String, groupCols: Seq[String], valueCols: Seq[String],
      numBuckets: Int, changeFeed: Boolean, deltas: DataFrame,
      qid: String, batchId: Long, props: Map[String, String],
      extraFields: Seq[StructField] = Nil,
      extraSelect: DataFrame => (DataFrame, Seq[Column]) = j => (j, Nil))
      : Unit = {
    // covering mart buckets of the touched groups — the writer's own
    // hash, evaluated over the already-aggregated (churn-sized) frame;
    // at most numBuckets distinct values come back
    val bucketExpr =
      pmod(xxhash64(groupCols.map(col).toIndexedSeq: _*), lit(numBuckets))
    val touched = deltas.select(bucketExpr.as("__b")).distinct()
      .collect().map(_.getLong(0)).toSet
    if (touched.isEmpty) return // no touched groups: nothing to commit
    val martSchema = StructType(
      groupCols.map(k => deltas.schema(k))
        ++ Seq(StructField(RowsCol, LongType))
        ++ valueCols.map(c =>
          StructField(s"sum_$c", deltas.schema(s"delta_$c").dataType))
        ++ valueCols.map(c => StructField(s"cnt_$c", LongType))
        ++ extraFields)
    val bucketRows = ManifestTable
      .readTableBuckets(spark, martRoot, touched, martTable)
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], martSchema))
    // only the touched groups participate; co-bucketed strangers stay
    // out of the rewrite (replace-by-key deletes just the touched keys)
    val keyCond = groupCols
      .map(k => col(s"m.$k") <=> col(s"d.$k")).reduce(_ && _)
    val joined = bucketRows.alias("m")
      .join(deltas.alias("d"), keyCond, "left_semi")
      .alias("m")
      .join(deltas.alias("d"), keyCond, "full_outer")
    val (withExtra, extraCols) = extraSelect(joined)
    val merged = withExtra
      .select(
        groupCols.map(k => coalesce(col(s"m.$k"), col(s"d.$k")).as(k))
          ++ Seq((coalesce(col(s"m.$RowsCol"), lit(0L))
            + col(s"d.delta_rows")).as(RowsCol))
          // the running sum stays pinned at the delta's type (for DECIMAL
          // that is Sum's Decimal(p+10, s) — Add would widen precision by
          // one per fold and drift the stored schema); decimal adds are
          // exact, so the cast only normalizes the declared width
          ++ valueCols.map(c =>
            (coalesce(col(s"m.sum_$c"), lit(0).cast(
              deltas.schema(s"delta_$c").dataType))
              + coalesce(col(s"d.delta_$c"), lit(0)))
              .cast(deltas.schema(s"delta_$c").dataType)
              .as(s"sum_$c"))
          // per-column non-null counts: `count(col)`/`avg` derivability
          ++ valueCols.map(c =>
            (coalesce(col(s"m.cnt_$c"), lit(0L))
              + coalesce(col(s"d.delta_cnt_$c"), lit(0L)))
              .as(s"cnt_$c"))
          ++ extraCols: _*)
      .filter(col(RowsCol) > 0)
    ManifestTable.mergeBatch(new File(martRoot), qid, batchId,
      Seq(TableBatch(martTable, merged, groupCols, numBuckets,
        deleteKeys =
          Some(deltas.select(groupCols.map(col).toIndexedSeq: _*)),
        changeFeed = changeFeed, props = props)))
  }

  /** One-shot batch refresh — the SQL surface's `CREATE/REFRESH
    * MATERIALIZED VIEW` verb (`CALL graft.system.refresh_mart`): fold
    * exactly the feed range the mart hasn't seen (its `martSourceVersion`
    * stamp + 1 up to the current manifest version; the whole feed on
    * first refresh) through the same [[applyBatch]] the streaming
    * maintainer runs. Idempotent with no external checkpoint: the stamp
    * rides the mart's own commit, so a repeated call folds an empty
    * range and commits nothing. Column lists may be omitted after the
    * first refresh — the mart's recorded declaration fills them in.
    * Returns the manifest version the mart is now current THROUGH (the
    * rewrite rule's freshness gate passes until the source commits
    * again).
    */
  def refreshMart(spark: SparkSession, root: File, source: String,
      mart: String, groupCols: Seq[String] = Nil,
      valueCols: Seq[String] = Nil, maxCols: Seq[String] = Nil,
      minCols: Seq[String] = Nil, numBuckets: Int = 8,
      changeFeed: Boolean = false): Long = {
    import graft.plans.MartRewriteRule
    val m = ManifestTable.read(root).getOrElse(
      throw new IllegalArgumentException(s"no manifest under $root"))
    val src = m.table(source)
    require(src.schemaJson.nonEmpty, s"table '$source' does not exist")
    require(src.feedFrom >= 0,
      s"table '$source' has no active change feed — mart maintenance " +
        "folds the feed; write the source with changeFeed=true")
    val martTs = m.table(mart)
    def recorded(key: String): Seq[String] = martTs.props.get(key)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    val g =
      if (groupCols.nonEmpty) groupCols
      else recorded(MartRewriteRule.GroupCols)
    require(g.nonEmpty,
      s"groupCols required: mart '$mart' has no recorded declaration yet")
    val cfg = Config(root.toString, root.toString,
      groupCols = g,
      valueCols =
        if (valueCols.nonEmpty) valueCols
        else recorded(MartRewriteRule.ValueCols),
      sourceTable = source, martTable = mart,
      numBuckets = if (martTs.numBuckets > 0) martTs.numBuckets
        else numBuckets,
      maxCols =
        if (maxCols.nonEmpty) maxCols else recorded(MartRewriteRule.MaxCols),
      minCols =
        if (minCols.nonEmpty) minCols else recorded(MartRewriteRule.MinCols),
      // keep an already-feed-active mart cascading: a maintenance commit
      // without the flag would RESET the mart's own change feed
      changeFeed = changeFeed || martTs.feedFrom >= 0)
    val from = martTs.props.get(MartRewriteRule.SourceVersion)
      .flatMap(s => scala.util.Try(s.trim.toLong).toOption)
      .map(_ + 1).getOrElse(src.feedFrom)
    val to = m.version
    if (from <= to)
      applyBatch(cfg,
        ManifestTable.readChangeFeed(spark, root.toString, from,
          Some(to), source),
        batchId = to)
    to
  }
}
