package graft

import java.io.File
import java.nio.file.Files

import graft.sources.ManifestTable
import graft.sources.ManifestTable.TableBatch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The physical-maintenance verbs added for long-lived tables: the
  * search/stats BACKFILL (`CALL graft.system.index` —
  * `ALTER TABLE … ADD SEARCH OPTIMIZATION`'s analogue: retrofit sidecars
  * and bounds onto existing generations without touching a row) and
  * TRUE Z-ORDER reclustering (bit-interleaved curve cells that adapt to
  * correlated clustering columns, vs the depth-1 quantile grid).
  */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def scanFiles(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan
      .collect { case f: FileSourceScanExec => f }
      .map(_.metrics("numFiles").value).sum
  }

  test("index backfill: existing generations gain sidecars + stats without row rewrites; lookups prune; feed untouched") {
    val target = tmp("graft_idxbf")
    val root = new File(target)
    val t = ManifestTable.DefaultTable
    // a table that grew WITHOUT indexing: 8 append commits, client ids
    // scattering across every generation (min/max spans never prune),
    // with an ACTIVE change feed
    (0 until 8).foreach { i =>
      ManifestTable.mergeBatch(root, "q", i.toLong, Seq(
        TableBatch(t,
          (0 until 50).map(j =>
            (i * 100L + j, s"c${(i * 50 + j) % 40}", (i * 50 + j).toLong))
            .toDF("event_id", "client", "seq"),
          Seq("event_id"), 2, append = true, changeFeed = true)))
    }
    val before = ManifestTable.read(root).get.table(t)
    assert(before.gens.size == 16) // 8 commits × 2 buckets
    assert(before.gens.forall(_.search.isEmpty))
    assert(before.gens.forall(!_.stats.contains("seq")))
    val genPaths = before.gens.map(_.path).toSet

    def lookup() = spark.read.format("graft").option("path", target).load()
      .filter(col("client") === "c7").select("event_id")
    def ranged() = spark.read.format("graft").option("path", target).load()
      .filter(col("seq").between(100L, 140L)).select("event_id")
    val fullFiles = scanFiles(
      spark.read.format("graft").option("path", target).load())
    val expectLookup = lookup().collect().map(_.getLong(0)).toSet
    val expectRanged = ranged().collect().map(_.getLong(0)).toSet
    assert(scanFiles(lookup()) == fullFiles, "nothing should prune yet")

    // the retrofit: one verb, zero row rewrites
    val indexed = ManifestTable.buildIndexes(spark, root, t,
      searchCols = Seq("client"), statsCols = Seq("seq"))
    assert(indexed == 16)

    val after = ManifestTable.read(root).get.table(t)
    // SAME generation dirs — no data moved, snapshots and feed intact
    assert(after.gens.map(_.path).toSet == genPaths)
    assert(after.feedFrom >= 0, "backfill reset the change feed")
    assert(after.gens.forall(_.search == Seq("client")))
    assert(after.gens.forall(_.stats.contains("seq")))
    // recorded layout adopted: FUTURE writers keep indexing
    assert(after.searchCols == Seq("client") &&
      after.statsCols.contains("seq"))

    // point lookup now prunes through the retrofitted sidecars (2% fpp:
    // expected ~all-but-matching skipped) and stays EXACT
    assert(lookup().collect().map(_.getLong(0)).toSet == expectLookup)
    val lookupFiles = scanFiles(lookup())
    assert(lookupFiles < fullFiles,
      s"sidecar backfill failed to prune: $lookupFiles/$fullFiles")
    // range read prunes through the retrofitted stats and stays exact
    assert(ranged().collect().map(_.getLong(0)).toSet == expectRanged)
    val rangedFiles = scanFiles(ranged())
    assert(rangedFiles < fullFiles,
      s"stats backfill failed to prune: $rangedFiles/$fullFiles")

    // idempotent: nothing left to do
    assert(ManifestTable.buildIndexes(spark, root, t,
      Seq("client"), Seq("seq")) == 0L)

    // a write AFTER the retrofit indexes itself from the recorded layout
    ManifestTable.mergeBatch(root, "q", 8L, Seq(
      TableBatch(t, Seq((9999L, "c7", 9999L)).toDF("event_id", "client", "seq"),
        Seq("event_id"), 2, append = true, changeFeed = true)))
    val last = ManifestTable.read(root).get.table(t)
    assert(last.gens.count(_.search == Seq("client")) == last.gens.size)
  }

  test("z-order recluster: bit-interleaved cells open strictly fewer generations than the depth-1 grid at equal slice count") {
    // CORRELATED clustering columns (y tracks x — ts vs monotonically
    // assigned ids, the classic warehouse pair): independent
    // per-dimension quantile strata concentrate the data in the grid's
    // DIAGONAL cells, so a small window straddling a stratum boundary
    // clips several dense diagonal cells plus their boundary slivers.
    // The interleaved curve follows the diagonal monotonically: its
    // equal-count cells are SEGMENTS of the diagonal with tight
    // rectangles, and the same window covers a couple of them.
    def data: DataFrame = {
      val rng = new scala.util.Random(7)
      (0 until 4000).map { i =>
        val x = rng.nextDouble() * 1000.0
        (i.toLong, x, x + rng.nextGaussian() * 20.0)
      }.toDF("event_id", "x", "y")
    }
    def build(): String = {
      val target = tmp("graft_zvsg")
      ManifestTable.mergeBatch(new File(target), "q", 0L, Seq(
        TableBatch(ManifestTable.DefaultTable, data, Seq("event_id"), 1)))
      target
    }
    val slices = 16
    val grid = build()
    val zord = build()
    ManifestTable.reclusterBy(spark, new File(grid), Seq("x", "y"),
      slices = slices)
    ManifestTable.reclusterBy(spark, new File(zord), Seq("x", "y"),
      slices = slices, zorder = true)
    val gridTs = ManifestTable.read(new File(grid)).get
      .table(ManifestTable.DefaultTable)
    val zordTs = ManifestTable.read(new File(zord)).get
      .table(ManifestTable.DefaultTable)
    // equal budgets (the grid's q² = 16 never exceeds it; empty
    // off-diagonal combinations just don't materialize)
    assert(zordTs.gens.size == slices)
    assert(gridTs.gens.size <= slices,
      s"grid produced ${gridTs.gens.size} cells for a $slices budget")

    // a small diagonal window straddling the MEDIAN boundary of both
    // dimensions (~10% of rows): the grid opens the four boundary cells
    // — two of them dense diagonal quarters
    def window(target: String) = spark.read.format("graft")
      .option("path", target).load()
      .filter(col("x").between(450.0, 550.0) &&
        col("y").between(450.0, 550.0))
    assert(window(grid).collect().map(_.getLong(0)).toSet ==
      window(zord).collect().map(_.getLong(0)).toSet)
    val gridFiles = scanFiles(window(grid))
    val zordFiles = scanFiles(window(zord))
    assert(zordFiles < gridFiles,
      s"z-order opened $zordFiles generations vs the grid's $gridFiles")
    // and the opened generations hold fewer ROWS — the byte cost that
    // actually matters
    def openedRows(ts: ManifestTable.TableState): Long = {
      def overlaps(g: ManifestTable.BucketGen, c: String): Boolean =
        g.stats.get(c).forall(s =>
          !(BigDecimal(s.lo) > 550.0 || BigDecimal(s.hi) < 450.0))
      ts.gens.filter(g => overlaps(g, "x") && overlaps(g, "y"))
        .map(_.rows).sum
    }
    assert(openedRows(zordTs) * 2 < openedRows(gridTs),
      s"z cells scan ${openedRows(zordTs)} rows vs grid ${openedRows(gridTs)}")
  }

  test("incremental recluster: only window-violating generations rewrite, disjoint ones keep their dirs, repeat run is a metadata-only no-op") {
    val target = tmp("graft_increcl")
    val root = new File(target)
    val t = ManifestTable.DefaultTable
    val base = spark.range(0, 400).select(col("id"), col("id").as("v"))
    ManifestTable.mergeBatch(root, "q", 0L,
      Seq(TableBatch(t, base, Seq("id"), 2, statsCols = Seq("v"))))
    // first-time clustering: FULL recluster into 4 v-disjoint slices
    ManifestTable.reclusterBy(spark, root, Seq("v"), t, slices = 4): Unit
    val sliced = ManifestTable.read(root).get.table(t)
    val slicePaths = sliced.gens.map(_.path).toSet

    // one append per bucket spanning the WHOLE v range — each overlaps
    // every slice of its bucket; slices still overlap only it
    val churn = spark.range(1000, 1040)
      .select(col("id"), ((col("id") - 1000) * 10).as("v"))
    ManifestTable.mergeBatch(root, "q", 1L,
      Seq(TableBatch(t, churn, Seq("id"), 2, statsCols = Seq("v"),
        append = true)))
    val before = ManifestTable.read(root).get.table(t)
    val appended = before.gens.map(_.path).toSet -- slicePaths
    assert(appended.nonEmpty)

    // budget 3: the wide appended generations (overlap 4 slices) rewrite;
    // the slices (overlap 1) keep their dirs — PATH IDENTITY
    val n = ManifestTable.reclusterBy(spark, root, Seq("v"), t, slices = 4,
      overlapBudget = 3)
    assert(n == appended.size.toLong,
      s"expected ${appended.size} rewritten generations, got $n")
    val after = ManifestTable.read(root).get.table(t)
    assert(slicePaths.subsetOf(after.gens.map(_.path).toSet),
      "disjoint slices must survive an incremental recluster untouched")
    assert((appended -- after.gens.map(_.path).toSet) == appended,
      "violating generations must have been replaced")

    // data intact
    def all: DataFrame = spark.read.format("graft")
      .option("path", target).option("table", t).load()
    assert(all.count() == 440L)
    assert(all.agg(sum("v")).head.getLong(0)
      == (0L until 400L).sum + (0L until 40L).map(_ * 10).sum)

    // everything now inside the window: repeat run rewrites nothing and
    // commits nothing
    val v = ManifestTable.read(root).get.version
    assert(ManifestTable.reclusterBy(spark, root, Seq("v"), t, slices = 4,
      overlapBudget = 3) == 0L)
    assert(ManifestTable.read(root).get.version == v,
      "a no-op incremental recluster must not commit")

    // the SQL verb: same semantics by name, reports the rewrite count
    val wh = new File(target).getParent
    spark.conf.set("spark.sql.catalog.ir", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ir.warehouse", wh)
    val ns = new File(target).getName
    assert(spark.sql(
      s"CALL ir.system.recluster('$ns', '$t', 'v', 4, 3)").head.getLong(0) == 0L)
  }

  test("minor compaction: only small generations fold, the large base keeps its dir, repeat run is a no-op") {
    val target = tmp("graft_minorc")
    val root = new File(target)
    val t = ManifestTable.DefaultTable
    // one big base write, then 5 small appends per bucket
    ManifestTable.mergeBatch(root, "q", 0L, Seq(TableBatch(t,
      spark.range(0, 2000).select(col("id"), col("id").as("v")),
      Seq("id"), 2, statsCols = Seq("v"))))
    (1 to 5).foreach { i =>
      ManifestTable.mergeBatch(root, "q", i.toLong, Seq(TableBatch(t,
        spark.range(10000L + i * 10, 10000L + i * 10 + 10)
          .select(col("id"), col("id").as("v")),
        Seq("id"), 2, statsCols = Seq("v"), append = true)))
    }
    val before = ManifestTable.read(root).get.table(t)
    val bigPaths = before.gens.filter(_.rows > 100L).map(_.path).toSet
    assert(bigPaths.size == 2 && before.gens.size == 12) // 2 big + 10 small

    ManifestTable.compact(spark, root, t, smallRows = 100L)
    val after = ManifestTable.read(root).get.table(t)
    // the big bases survive BY PATH; each bucket's smalls folded to one
    assert(bigPaths.subsetOf(after.gens.map(_.path).toSet),
      "minor compaction rewrote a large generation")
    assert(after.gens.size == 4, s"expected 2 big + 2 folded, got ${after.gens.map(_.path)}")
    assert(after.buckets.values.forall(_.count(_.rows <= 100L) == 1))
    def all = spark.read.format("graft").option("path", target)
      .option("table", t).load()
    assert(all.count() == 2050L)

    // idempotent: one small generation per bucket left → nothing to fold
    val v = ManifestTable.read(root).get.version
    ManifestTable.compact(spark, root, t, smallRows = 100L)
    assert(ManifestTable.read(root).get.version == v)

    // major compaction still collapses each bucket to ONE generation
    ManifestTable.compact(spark, root, t)
    assert(ManifestTable.read(root).get.table(t).buckets.values
      .forall(_.size == 1))
    assert(all.count() == 2050L)
  }

  test("CALL graft.system.maintain: declared per-table thresholds drive one policy sweep; quiet tables cost nothing") {
    val wh = tmp("graft_maint_pol")
    spark.conf.set("spark.sql.catalog.mp", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mp.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mp.ops")
    // a managed table with maintenance policy + an unmanaged bystander
    spark.sql("""CREATE TABLE mp.ops.t (id BIGINT, v BIGINT)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2',
        'statsCols'='v', 'maintCompactSmallRows'='100',
        'maintReclusterCols'='v', 'maintReclusterSlices'='4',
        'maintOverlapBudget'='3')""")
    spark.sql("""CREATE TABLE mp.ops.quiet (id BIGINT)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')""")
    spark.sql("INSERT INTO mp.ops.quiet SELECT id FROM range(10)")
    val root = new java.io.File(wh, "ops")

    // big base + small appends + recluster + one wide churn append:
    // the sweep should fold the smalls AND rewrite the violator
    spark.sql("INSERT INTO mp.ops.t SELECT id, id FROM range(400)")
    ManifestTable.reclusterBy(spark, root, Seq("v"), "t", slices = 4): Unit
    (1 to 3).foreach(i => spark.sql(
      s"INSERT INTO mp.ops.t SELECT id + ${10000 * i}, (id + ${10000 * i}) % 5 FROM range(10)"))
    val quietGens = ManifestTable.read(root).get.table("quiet")
      .gens.map(_.path).toSet

    val sweep = spark.sql("CALL mp.system.maintain('ops')").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(sweep.exists { case (t, v, n) => t == "t" && v == "compact" && n > 0 },
      s"sweep did not fold the small generations: ${sweep.toSeq}")
    assert(sweep.exists { case (t, v, _) => t == "t" && v == "recluster" },
      s"sweep skipped the declared recluster: ${sweep.toSeq}")
    // the bystander was untouched
    assert(ManifestTable.read(root).get.table("quiet")
      .gens.map(_.path).toSet == quietGens)
    assert(spark.sql("SELECT count(*) FROM mp.ops.t").head.getLong(0) == 430L)

    // a second sweep finds a settled table: zero folds, zero rewrites
    val again = spark.sql("CALL mp.system.maintain('ops')").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(again.filter(_._1 == "t").forall(_._3 == 0L),
      s"repeat sweep still rewrote: ${again.toSeq}")

    // adopting a search layout via ALTER makes the NEXT sweep backfill
    // the uncovered generations (the recorded layout IS the policy)
    spark.sql("ALTER TABLE mp.ops.t SET TBLPROPERTIES ('searchCols'='id')")
    val withIdx = spark.sql("CALL mp.system.maintain('ops')").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(withIdx.exists { case (t, v, n) => t == "t" && v == "index" && n > 0 },
      s"sweep did not backfill the adopted search layout: ${withIdx.toSeq}")
    assert(ManifestTable.read(root).get.table("t")
      .gens.forall(_.search.contains("id")))
    val settled = spark.sql("CALL mp.system.maintain('ops')").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(!settled.exists(_._2 == "index"),
      s"covered table still reported index work: ${settled.toSeq}")
  }

  test("data metric functions: declared metrics RECORD into the _metrics ops table on the maintain sweep (counts match direct queries), fresh feed-active tables skip, and a new commit re-measures") {
    val wh = tmp("graft_dmf")
    spark.conf.set("spark.sql.catalog.dmf", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.dmf.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dmf.ops")
    // the reference's anomaly shapes as declarative metrics: a boolean
    // row predicate (violation COUNT, the CHECK machinery recording
    // instead of refusing) and two aggregates (distinct count, max)
    spark.sql("""CREATE TABLE dmf.ops.txn
      (id BIGINT, email STRING, amt DOUBLE, load_ts TIMESTAMP)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2',
        'metric.null_email' = 'email IS NULL',
        'metric.negative_amt' = 'amt < 0',
        'metric.distinct_emails' = 'count(distinct email)',
        'metric.freshness' = 'max(unix_seconds(load_ts))')""")
    import spark.implicits._
    val root = new java.io.File(wh, "ops")
    def write(rows: Seq[(Long, String, Double, Long)]): Unit =
      graft.sources.ManifestTable.mergeBatch(root, "q", rows.head._1, Seq(
        graft.sources.ManifestTable.TableBatch("txn",
          rows.toDF("id", "email", "amt", "epoch")
            .select(col("id"), col("email"), col("amt"),
              col("epoch").cast("timestamp").as("load_ts")),
          Seq("id"), 2, changeFeed = true)))
    write(Seq((1L, "a@x.com", 5.0, 1000L), (2L, null, -3.0, 2000L),
      (3L, "b@x.com", 7.0, 3000L), (4L, null, 1.0, 1500L),
      (5L, "a@x.com", -0.5, 2500L)))

    val sweep = spark.sql("CALL dmf.system.maintain('ops')").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(sweep.exists(t => t._2 == "metrics" && t._3 == 4L),
      s"maintain did not record the 4 declared metrics: ${sweep.toSeq}")
    def latest: Map[String, Option[Double]] =
      spark.sql("""SELECT metric_name, value FROM dmf.ops._metrics m
        WHERE version = (SELECT max(version) FROM dmf.ops._metrics)""")
        .collect()
        .map(r => r.getString(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(latest == Map(
      "null_email" -> Some(2.0), "negative_amt" -> Some(2.0),
      "distinct_emails" -> Some(2.0), "freshness" -> Some(3000.0)),
      s"metric values diverged from the direct counts: $latest")

    // a second sweep on the UNCHANGED feed-active table skips: no new
    // _metrics rows (the metricSrcVersion stamp covers the feed head)
    val rowsBefore = spark.sql("SELECT count(*) FROM dmf.ops._metrics")
      .head.getLong(0)
    val sweep2 = spark.sql("CALL dmf.system.maintain('ops')").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(!sweep2.exists(_._2 == "metrics"),
      s"an unchanged table re-measured: ${sweep2.toSeq}")
    assert(spark.sql("SELECT count(*) FROM dmf.ops._metrics")
      .head.getLong(0) == rowsBefore)

    // new churn re-measures: the null email heals, freshness advances
    write(Seq((2L, "c@x.com", 3.0, 9000L)))
    spark.sql("CALL dmf.system.maintain('ops')").collect()
    assert(latest == Map(
      "null_email" -> Some(1.0), "negative_amt" -> Some(1.0),
      "distinct_emails" -> Some(3.0), "freshness" -> Some(9000.0)),
      s"re-measured values diverged: $latest")
    // the history KEEPS the earlier measurement — a time series, the
    // Snowflake DMF event-table shape
    assert(spark.sql(
      "SELECT count(DISTINCT version) FROM dmf.ops._metrics")
      .head.getLong(0) == 2L)

    // a NON-feed table has no change watermark — `metricIntervalMs`
    // caps its sweep cadence by wall clock instead: back-to-back sweeps
    // measure once
    spark.sql("""CREATE TABLE dmf.ops.nf (id BIGINT, v DOUBLE)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2',
        'metric.neg_v' = 'v < 0', 'metricIntervalMs' = '3600000')""")
    import spark.implicits._
    Seq((1L, -1.0), (2L, 2.0)).toDF("id", "v")
      .write.format("graft").option("path", root.toString)
      .option("table", "nf").option("mergeKeys", "id")
      .mode("append").save()
    spark.sql("CALL dmf.system.maintain('ops')").collect()
    val nfRows = spark.sql(
      "SELECT count(*) FROM dmf.ops._metrics WHERE table_name = 'nf'")
      .head.getLong(0)
    assert(nfRows == 1L, s"non-feed metric did not record once: $nfRows")
    val sweep3 = spark.sql("CALL dmf.system.maintain('ops')").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(!sweep3.exists(_._2 == "metrics"),
      s"interval-covered table re-measured: ${sweep3.toSeq}")
    assert(spark.sql(
      "SELECT count(*) FROM dmf.ops._metrics WHERE table_name = 'nf'")
      .head.getLong(0) == 1L)
  }

  test("governed metrics: metricGoverned.<name>=true scopes that metric's sweep to the session's policy-visible rows; siblings keep the owner view") {
    val wh = tmp("graft_gmf")
    spark.conf.set("spark.sql.catalog.gmf",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmf.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmf.ops")
    spark.sql("""CREATE TABLE gmf.ops.t (id BIGINT, client STRING, v DOUBLE)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2',
        'rowPolicy' = "client = graft_session_attr('client')",
        'metric.neg_all' = 'v < 0',
        'metric.neg_mine' = 'v < 0',
        'metricGoverned.neg_mine' = 'true')""")
    spark.sql("""INSERT INTO gmf.ops.t VALUES
      (1, 'ACME', -1.0), (2, 'ACME', 2.0),
      (3, 'BETA', -3.0), (4, 'BETA', -4.0)""")
    spark.conf.set("graft.session.client", "ACME")
    try {
      spark.sql("CALL gmf.system.maintain('ops')").collect()
      val vals = spark.sql(
        "SELECT metric_name, value FROM gmf.ops._metrics")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      // the owner-view metric counts every negative row; the governed
      // twin sees only the ACME subset
      assert(vals == Map("neg_all" -> 3.0, "neg_mine" -> 1.0),
        s"governed metric scope wrong: $vals")
    } finally spark.conf.unset("graft.session.client")
  }
}
