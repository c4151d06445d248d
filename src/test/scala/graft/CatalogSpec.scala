package graft

import java.io.File

import graft.sources.{GraftBatchScan, GraftCatalog, ManifestTable}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** The SQL catalog surface (SURVEY §2.E): named graft tables with the
  * reference's SQL verbs — CREATE/INSERT/SELECT/DELETE/TRUNCATE/
  * RENAME/DROP — all riding the manifest commit protocol, with pruned
  * columnar reads and SQL time travel.
  */
class CatalogSpec extends SparkSpec {

  private def scanOf(df: DataFrame): GraftBatchScan = {
    df.collect()
    df.queryExecution.executedPlan
      .collect { case b: BatchScanExec => b }
      .head.scan.asInstanceOf[GraftBatchScan]
  }

  test("SQL verbs against named tables: create, insert, pruned select, time travel, delete, truncate, rename, drop") {
    val wh = java.nio.file.Files.createTempDirectory("graft_cat").toString
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)

    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ops")
    spark.sql("""CREATE TABLE graft.ops.events
      (event_id BIGINT, ts TIMESTAMP, client STRING, v DOUBLE)
      USING graft TBLPROPERTIES ('mergeKeys'='event_id', 'buckets'='2',
        'statsCols'='ts,event_id', 'searchCols'='client')""")
    assert(spark.sql("SHOW TABLES IN graft.ops").collect()
      .map(_.getString(1)).contains("events"))

    // three INSERTs = three append commits, each a narrow day slice
    (1 to 3).foreach { d =>
      spark.sql(s"""INSERT INTO graft.ops.events
        SELECT id + ${d * 1000}, timestamp'2024-03-0$d 12:00:00',
          'c$d', cast(id as double) * 1.5 FROM range(50)""")
    }
    assert(spark.sql("SELECT count(*) FROM graft.ops.events")
      .head.getLong(0) == 150L)

    // the catalog read plans through the native v2 scan with generation
    // pruning from the pushed predicate AND column pruning
    val all = scanOf(spark.sql("SELECT event_id FROM graft.ops.events"))
    val day2 = spark.sql("""SELECT event_id FROM graft.ops.events
      WHERE ts BETWEEN timestamp'2024-03-02 00:00:00'
        AND timestamp'2024-03-02 23:59:59'""")
    assert(day2.collect().map(_.getLong(0)).toSet ==
      (2000L until 2050L).toSet)
    val pruned = scanOf(day2)
    assert(pruned.plannedFiles > 0 && pruned.plannedFiles < all.plannedFiles,
      s"predicate failed to prune: ${pruned.plannedFiles}/${all.plannedFiles}")
    assert(pruned.readSchema().fieldNames.toSet == Set("event_id", "ts"),
      "column pruning failed on the catalog scan")

    // a merge-key equality pins the covering hash bucket
    val keyed = scanOf(spark.sql(
      "SELECT v FROM graft.ops.events WHERE event_id = 2013"))
    assert(keyed.plannedFiles < all.plannedFiles)

    // the recorded searchCols give SQL inserts membership sidecars: an
    // equality on the unclustered client column prunes through them
    val side = spark.sql("SELECT event_id FROM graft.ops.events WHERE client = 'c3'")
    assert(side.collect().length == 50)
    assert(scanOf(side).plannedFiles < all.plannedFiles,
      "search sidecar failed to prune on the catalog path")

    // SQL time travel rides the retained snapshots: right after the
    // second insert the table held 100 rows
    val root = new File(wh, "ops")
    val vNow = ManifestTable.read(root).get.version
    assert(spark.sql(
      s"SELECT count(*) FROM graft.ops.events VERSION AS OF ${vNow - 1}")
      .head.getLong(0) == 100L)

    // DELETE FROM maps onto the predicate-delete verb (feed contract,
    // OCC, generation-level rewrite — ManifestTableSpec's coverage)
    spark.sql("DELETE FROM graft.ops.events WHERE client = 'c2'")
    assert(spark.sql("SELECT count(*) FROM graft.ops.events")
      .head.getLong(0) == 100L)
    assert(spark.sql(
      "SELECT count(*) FROM graft.ops.events WHERE client = 'c2'")
      .head.getLong(0) == 0L)

    // INSERT OVERWRITE replaces the table wholesale
    spark.sql("""INSERT OVERWRITE graft.ops.events
      SELECT id, timestamp'2024-04-01 00:00:00', 'ow',
        cast(id as double) FROM range(7)""")
    assert(spark.sql("SELECT count(*) FROM graft.ops.events")
      .head.getLong(0) == 7L)

    // every DDL/DML above is a recorded commit: history's newest entries
    val hist = ManifestTable.history(spark, root).collect()
    assert(hist.head.getString(1) == "OVERWRITE")
    assert(hist.map(_.getString(1)).contains("DELETE"))

    // TRUNCATE empties through the same delete verb
    spark.sql("TRUNCATE TABLE graft.ops.events")
    assert(spark.sql("SELECT count(*) FROM graft.ops.events")
      .head.getLong(0) == 0L)

    // RENAME is pure metadata (no data moves), DROP is a versioned commit
    spark.sql("ALTER TABLE graft.ops.events RENAME TO ops.events_v2")
    assert(spark.sql("SHOW TABLES IN graft.ops").collect()
      .map(_.getString(1)).toSet == Set("events_v2"))
    spark.sql("DROP TABLE graft.ops.events_v2")
    assert(spark.sql("SHOW TABLES IN graft.ops").collect().isEmpty)
  }

  test("multi-table namespaces share one manifest root: SQL inserts into two tables interleave with the bespoke API's atomic commits") {
    val wh = java.nio.file.Files.createTempDirectory("graft_cat2").toString
    spark.conf.set("spark.sql.catalog.graft2", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft2.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft2.mart")
    spark.sql("""CREATE TABLE graft2.mart.hdr (id BIGINT, k STRING)
      USING graft TBLPROPERTIES ('mergeKeys'='id')""")
    spark.sql("""CREATE TABLE graft2.mart.line (id BIGINT, qty BIGINT)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='4')""")
    spark.sql("INSERT INTO graft2.mart.hdr SELECT id, concat('k', id) FROM range(20)")
    spark.sql("INSERT INTO graft2.mart.line SELECT id, id * 2 FROM range(30)")

    // both tables live in ONE manifest: a bespoke multi-table commit lands
    // under the same root and SQL sees it
    val root = new File(wh, "mart")
    import spark.implicits._
    ManifestTable.mergeBatch(root, "api", 0L, Seq(
      ManifestTable.TableBatch("hdr",
        Seq((100L, "k100")).toDF("id", "k"), Seq("id"), 16),
      ManifestTable.TableBatch("line",
        Seq((100L, 200L)).toDF("id", "qty"), Seq("id"), 4)))
    assert(spark.sql("SELECT count(*) FROM graft2.mart.hdr")
      .head.getLong(0) == 21L)
    assert(spark.sql(
      "SELECT qty FROM graft2.mart.line WHERE id = 100")
      .head.getLong(0) == 200L)

    // the SQL-visible schema tracks the manifest's unified schema after a
    // sink-side evolution through the bespoke API
    ManifestTable.mergeBatch(root, "api", 1L, Seq(
      ManifestTable.TableBatch("hdr",
        Seq((101L, "k101", "extra")).toDF("id", "k", "note"), Seq("id"), 16)))
    assert(spark.sql("SELECT note FROM graft2.mart.hdr WHERE id = 101")
      .head.getString(0) == "extra")

    // bare COUNT(*)/MIN/MAX over a catalog table answer from manifest
    // metadata — zero scan (the same MetadataAggRule rewrite as the
    // format("graft") path, registered by the catalog itself)
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    val cnt = spark.sql("SELECT count(*) AS n FROM graft2.mart.line")
    assert(cnt.head.getLong(0) == 31L)
    assert(cnt.queryExecution.optimizedPlan
      .collect { case l: LocalRelation => l }.nonEmpty,
      "catalog COUNT(*) failed to answer from metadata")
    val mm = spark.sql(
      "SELECT min(id) AS lo, max(id) AS hi FROM graft2.mart.line")
    assert(mm.head.getLong(0) == 0L && mm.head.getLong(1) == 100L)
    assert(mm.queryExecution.optimizedPlan
      .collect { case l: LocalRelation => l }.nonEmpty,
      "catalog MIN/MAX failed to answer from metadata")
    // a filtered count must NOT rewrite (scans and stays correct)
    val fcnt = spark.sql(
      "SELECT count(*) FROM graft2.mart.line WHERE id < 10")
    assert(fcnt.head.getLong(0) == 10L)
    assert(fcnt.queryExecution.optimizedPlan
      .collect { case l: LocalRelation => l }.isEmpty)
  }

  test("CALL procedures: update_where/delete_where return counts, compact collapses generations, history reads back through SQL") {
    val wh = java.nio.file.Files.createTempDirectory("graft_cat3").toString
    spark.conf.set("spark.sql.catalog.graft3", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft3.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft3.ops")
    spark.sql("""CREATE TABLE graft3.ops.t (id BIGINT, grp STRING, v DOUBLE)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')""")
    (0 until 3).foreach { b =>
      spark.sql(s"""INSERT INTO graft3.ops.t
        SELECT id + ${b * 100}, 'g$b', cast(id as double) FROM range(40)""")
    }

    // UPDATE through CALL (SQL UPDATE needs row-level-operation plumbing;
    // the procedure IS the SQL-reachable update verb) — returns the count
    val updated = spark.sql(
      """CALL graft3.system.update_where('ops', 't', "grp = 'g1'", 'v', 'v + 1000')""")
    assert(updated.head.getLong(0) == 40L)
    assert(spark.sql(
      "SELECT count(*) FROM graft3.ops.t WHERE v >= 1000").head.getLong(0) == 40L)

    val deleted = spark.sql(
      """CALL graft3.system.delete_where('ops', 't', "grp = 'g2'")""")
    assert(deleted.head.getLong(0) == 40L)
    assert(spark.sql("SELECT count(*) FROM graft3.ops.t").head.getLong(0) == 80L)

    // compact collapses the append generations; table unchanged
    val root = new File(wh, "ops")
    val gensBefore = ManifestTable.read(root).get.table("t").gens.size
    spark.sql("CALL graft3.system.compact('ops', 't')")
    val gensAfter = ManifestTable.read(root).get.table("t").gens.size
    assert(gensAfter < gensBefore && gensAfter == 2)
    assert(spark.sql("SELECT count(*) FROM graft3.ops.t").head.getLong(0) == 80L)

    // TIMESTAMP AS OF resolves through the recorded commit timestamps:
    // "now" sees the current state, a far-future instant the same, and a
    // pre-creation instant errors instead of guessing
    assert(spark.sql(
      "SELECT count(*) FROM graft3.ops.t TIMESTAMP AS OF current_timestamp()")
      .head.getLong(0) == 80L)
    intercept[Exception] {
      spark.sql(
        "SELECT * FROM graft3.ops.t TIMESTAMP AS OF timestamp'2001-01-01'")
        .collect()
    }

    // history through SQL: newest-first, operations recorded
    val hist = spark.sql("CALL graft3.system.history('ops')").collect()
    assert(hist.head.getString(1) == "COMPACT")
    assert(hist.forall(r => !r.isNullAt(2)))
    val vs = hist.map(_.getLong(0)).toSeq
    assert(vs == vs.sortBy(-_))

    // recluster through SQL: range-disjoint slices on v
    spark.sql("CALL graft3.system.recluster('ops', 't', 'v', 4)")
    assert(spark.sql("SELECT count(*) FROM graft3.ops.t WHERE v < 10")
      .head.getLong(0) == 10L)
    assert(ManifestTable.read(root).get.table("t").gens.size > 2)

    // detail reports the recorded layout and exact metadata counts
    val det = spark.sql("CALL graft3.system.detail('ops', 't')").head
    assert(det.getString(0) == "t")
    assert(det.getAs[scala.collection.Seq[String]]("merge_keys").toSeq == Seq("id"))
    assert(det.getInt(3) == 2)
    assert(det.getLong(7) == 80L)
    assert(det.getLong(6) == ManifestTable.read(root).get.table("t").gens.size.toLong)

    // vacuum collects a crashed writer's orphan dir without a commit;
    // dry_run=true reports the same (files, bytes) without deleting
    val orphan = new File(root, "data/t/b0-v1-deadbeef")
    orphan.mkdirs()
    val junk = new File(orphan, "junk.parquet")
    java.nio.file.Files.write(junk.toPath, Array.fill[Byte](128)(1))
    val dry = spark.sql("CALL graft3.system.vacuum('ops', true)").head
    assert(dry.getBoolean(2) && dry.getLong(0) >= 1L && dry.getLong(1) >= 128L)
    assert(orphan.exists, "dry_run vacuum must not delete")
    val real = spark.sql("CALL graft3.system.vacuum('ops')").head
    assert(!real.getBoolean(2))
    assert(real.getLong(0) == dry.getLong(0) && real.getLong(1) == dry.getLong(1),
      "real sweep must collect exactly what dry_run reported")
    assert(!orphan.exists, "vacuum left the orphan generation dir")
  }

  test("readStream.table with readChangeFeed subscribes to the feed by catalog name — same stream, same checkpoints, SQL INSERT keeps feeding it") {
    import org.apache.spark.sql.streaming.Trigger
    val wh = java.nio.file.Files.createTempDirectory("graft_cat4").toString
    spark.conf.set("spark.sql.catalog.graft4", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft4.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft4.ops")
    spark.sql("""CREATE TABLE graft4.ops.t (id BIGINT, v DOUBLE)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')""")
    val root = new File(wh, "ops")
    // open the feed through the provider writer
    import spark.implicits._
    (0L until 20L).map(i => (i, i.toDouble)).toDF("id", "v")
      .write.format("graft").option("path", root.toString)
      .option("table", "t").option("mergeKeys", "id")
      .option("changeFeed", "true").mode("append").save()

    val ckpt = java.nio.file.Files.createTempDirectory("graft_cat4_ck").toString
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    def drain(): Unit = {
      val q = spark.readStream
        .option("readChangeFeed", "true").table("graft4.ops.t")
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, _: Long) =>
          val got = b.collect().map(_.toString)
          seen.synchronized { seen ++= got }: Unit
        }.start()
      q.awaitTermination()
    }

    // first drain: the feed's retained history, with the CDF columns the
    // named subscription resolved onto the relation
    drain()
    val feedFrom = ManifestTable.read(root).get.table("t").feedFrom
    val expect = ManifestTable
      .readChangeFeed(spark, root.toString, feedFrom, None, "t")
      .collect().map(_.toString)
    assert(seen.size == 20 && seen.toSet == expect.toSet)

    // restart: the checkpoint holds, zero replay
    drain()
    assert(seen.size == 20, "named feed subscription replayed deltas")

    // SQL INSERT into the feed-active table keeps the feed alive (a
    // non-feed commit would reset it and fail this drain loudly) and
    // its rows arrive as insert deltas
    spark.sql("INSERT INTO graft4.ops.t SELECT id + 100, -1.0 FROM range(5)")
    drain()
    assert(seen.size == 25, s"SQL INSERT deltas missing: ${seen.size}")
    assert(seen.count(_.contains("insert")) == 25)

    // a PLAIN streaming table read (no readChangeFeed) serves the
    // current snapshot as its first batch — TABLE rows, no CDF columns
    val ck2 = java.nio.file.Files.createTempDirectory("graft_cat4_ck2")
    val plain = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
    val q = spark.readStream.table("graft4.ops.t")
      .writeStream.option("checkpointLocation", ck2.toString)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        val got = b.collect()
        plain.synchronized { plain ++= got }: Unit
      }.start()
    q.awaitTermination()
    assert(plain.size == 25, s"plain table stream snapshot: ${plain.size}")
    assert(plain.headOption.forall(_.schema.fieldNames.toSeq
      == Seq("id", "v")), "plain table stream leaked CDF columns")
  }

  test("plain readStream.table: initial snapshot + appended generations only, restart no-replay, admission control, non-append churn fails loudly") {
    import org.apache.spark.sql.streaming.Trigger
    val wh = java.nio.file.Files.createTempDirectory("graft_catp").toString
    spark.conf.set("spark.sql.catalog.graftp", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftp.warehouse", wh)
    val root = new File(wh, "ops")
    root.mkdirs()
    import spark.implicits._
    def append(rows: Seq[(Long, Double)]): Unit =
      rows.toDF("id", "v")
        .write.format("graft").option("path", root.toString)
        .option("table", "t").option("mergeKeys", "id")
        .option("appendOnly", "true").mode("append").save()
    append((0L until 20L).map(i => (i, i.toDouble)))

    val ckpt = java.nio.file.Files.createTempDirectory("graft_catp_ck").toString
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    var batches = 0
    def drain(maxVersions: Option[Int] = None): Unit = {
      var rs = spark.readStream
      maxVersions.foreach(n =>
        rs = rs.option("maxVersionsPerTrigger", n.toString))
      val q = rs.table("graftp.ops.t")
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, _: Long) =>
          val got = b.collect().map(_.getLong(0))
          seen.synchronized { seen ++= got; if (got.nonEmpty) batches += 1 }: Unit
        }.start()
      q.awaitTermination()
    }

    // first drain: the full snapshot — NOT version-capped even under
    // admission control (a capped initial offset could target a version
    // before the table's first commit)
    drain(maxVersions = Some(1))
    assert(seen.sorted == (0L until 20L), s"snapshot wrong: ${seen.sorted}")
    // restart with nothing new: zero replay
    drain()
    assert(seen.size == 20, "plain table stream replayed the snapshot")

    // two append commits, drained with maxVersionsPerTrigger=1: each
    // batch carries exactly one commit's generations — admission control
    append(Seq((100L, 1.0), (101L, 1.0)))
    append(Seq((102L, 1.0)))
    batches = 0
    drain(maxVersions = Some(1))
    assert(seen.size == 23, s"appends missing: ${seen.size}")
    assert(batches == 2, s"maxVersionsPerTrigger ignored: $batches batches")
    assert(seen.count(_ >= 100L) == 3)

    // non-append churn (replace-by-key merge rewrites a generation):
    // the next drain fails LOUDLY with the actionable message instead of
    // silently re-serving or missing rows
    Seq((0L, -1.0)).toDF("id", "v")
      .write.format("graft").option("path", root.toString)
      .option("table", "t").option("mergeKeys", "id")
      .mode("append").save()
    val err = intercept[Exception] { drain() }
    val chain = Iterator.iterate(err: Throwable)(_.getCause)
      .takeWhile(_ != null).map(e => Option(e.getMessage).getOrElse(""))
      .mkString("\n")
    assert(chain.contains("append-only") && chain.contains("readChangeFeed"),
      s"non-append churn must fail actionably, got: $chain")

    // skipChangeCommits (the Delta knob): the churn commit SKIPS
    // WHOLESALE — its rewritten generations carry old rows merged in,
    // so serving them would re-deliver — and later appends keep flowing
    append(Seq((200L, 2.0)))
    def drainSkip(): Unit = {
      val q = spark.readStream.option("skipChangeCommits", "true")
        .table("graftp.ops.t")
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, _: Long) =>
          val got = b.collect().map(_.getLong(0))
          seen.synchronized { seen ++= got }: Unit
        }.start()
      q.awaitTermination()
    }
    drainSkip()
    assert(seen.size == 24, s"skipChangeCommits drain: ${seen.size}")
    assert(seen.count(_ == 200L) == 1, "post-churn append missing")
    assert(!seen.contains(0L) || seen.count(_ == 0L) == 1,
      "skipped churn commit re-delivered rows")
  }

  test("writeStream.toTable: micro-batches land as manifest commits — upsert semantics, restart no-replay, Complete overwrites") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val wh = java.nio.file.Files.createTempDirectory("graft_cat5").toString
    spark.conf.set("spark.sql.catalog.graft5", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft5.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft5.ops")
    spark.sql("""CREATE TABLE graft5.ops.t (id BIGINT, v DOUBLE)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')""")
    val root = new File(wh, "ops")

    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, Double)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cat5_ck").toString
    def drain(): Unit = {
      val q = in.toDF().toDF("id", "v").writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .toTable("graft5.ops.t")
      q.awaitTermination()
    }
    in.addData((0L until 10L).map(i => (i, i.toDouble)): _*)
    drain()
    assert(spark.sql("SELECT count(*) FROM graft5.ops.t").head.getLong(0) == 10L)

    // overlapping keys UPSERT (Append mode merges on the recorded keys)
    in.addData((5L until 15L).map(i => (i, -i.toDouble)): _*)
    drain()
    assert(spark.sql("SELECT count(*) FROM graft5.ops.t").head.getLong(0) == 15L)
    assert(spark.sql("SELECT v FROM graft5.ops.t WHERE id = 7")
      .head.getDouble(0) == -7.0, "streamed upsert did not replace")

    // restart with nothing new: the checkpointed query id + epoch replay
    // through the manifest's (queryId, batchId) contract — zero effect
    val vBefore = ManifestTable.read(root).get.version
    drain()
    assert(ManifestTable.read(root).get.version == vBefore,
      "an empty restart advanced the table version")

    // Complete mode: each epoch's full aggregate result OVERWRITES
    spark.sql("""CREATE TABLE graft5.ops.agg (id BIGINT, n BIGINT)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')""")
    val in2 = MemoryStream[Long]
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_cat5_ck2").toString
    def drainAgg(): Unit = {
      val q = in2.toDF().toDF("id").groupBy("id")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
        .writeStream.outputMode("complete")
        .option("checkpointLocation", ckpt2)
        .trigger(Trigger.AvailableNow())
        .toTable("graft5.ops.agg")
      q.awaitTermination()
    }
    in2.addData(1L, 1L, 2L)
    drainAgg()
    in2.addData(1L, 3L)
    drainAgg()
    val agg = spark.sql("SELECT id, n FROM graft5.ops.agg ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(agg == Seq((1L, 3L), (2L, 1L), (3L, 1L)), s"complete-mode: $agg")
  }

  test("RESTORE TABLE: pure-metadata rewind to a retained version; an active feed gets the exact keyed diff (a mart folds straight through); UNDROP restores a dropped table") {
    import graft.streaming.IncrementalMart
    val wh = java.nio.file.Files.createTempDirectory("graft_rst").toString
    spark.conf.set("spark.sql.catalog.rst", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rst.warehouse", wh)
    val root = new File(wh, "ops")
    root.mkdirs()
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    def feed(b: Long, rows: Seq[(Long, String, Double)],
        deletes: Option[Seq[Long]] = None): Unit =
      ManifestTable.mergeBatch(root, "q", b, Seq(
        ManifestTable.TableBatch("t", rows.toDF("id", "grp", "v"),
          Seq("id"), 2, deleteKeys = deletes.map(_.toDF("id")),
          changeFeed = true)))
    feed(0L, (0L until 20L).map(i => (i, s"g${i % 2}", i * 0.5)))
    val vKeep = ManifestTable.read(root).get.version
    val keepRows = ManifestTable.readTable(spark, root.toString, table = "t")
      .collect().map(_.toString).toSet
    // churn past the kept version in ONE commit (updates incl. a group
    // migration, an insert, deletes), so vKeep stays inside the
    // retention window once the mart's own commit lands too
    feed(1L, Seq((0L, "g1", 100.0), (50L, "g0", 7.5), (1L, "g0", -2.0)),
      deletes = Some(Seq(3L, 5L)))

    // a CDF-fed mart drains the churn BEFORE the restore…
    val cfg = IncrementalMart.Config(root.toString, root.toString,
      groupCols = Seq("grp"), valueCols = Seq("v"),
      sourceTable = "t", martTable = "m", numBuckets = 2)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rst_ck").toString
    IncrementalMart.sync(spark, cfg, ckpt)

    // RESTORE to the kept version: reads ≡ that snapshot, one new commit
    val restoredV = spark.sql(
      s"CALL rst.system.restore('ops', 't', $vKeep)").head.getLong(0)
    assert(restoredV == ManifestTable.read(root).get.version)
    assert(ManifestTable.readTable(spark, root.toString, table = "t")
      .collect().map(_.toString).toSet == keepRows,
      "restore must serve the target snapshot exactly")
    // pre-restore history stays readable through retention
    assert(ManifestTable.readTable(spark, root.toString,
      Some(restoredV - 1), "t").filter(col("id") === 50L).count() == 1L)

    // …and folds the restore's keyed diff AFTER it: the mart lands
    // exactly on the restored table's aggregate — proof the diff is
    // exact (a wrong pre/post pair would corrupt the netting)
    IncrementalMart.sync(spark, cfg, ckpt)
    val expected = ManifestTable.readTable(spark, root.toString, table = "t")
      .groupBy("grp").agg(count(lit(1)).as(IncrementalMart.RowsCol),
        sum("v").as("sum_v"), count(col("v")).as("cnt_v"))
      .collect().map(_.toString).toSet
    assert(ManifestTable.readTable(spark, root.toString, table = "m")
      .collect().map(_.toString).toSet == expected,
      "CDF subscriber diverged across the restore")

    // no-op restore: already that state → version unchanged
    val v2 = ManifestTable.read(root).get.version
    spark.sql(s"CALL rst.system.restore('ops', 't', $v2)").collect()
    assert(ManifestTable.read(root).get.version == v2)

    // UNDROP: drop, then restore from the pre-drop snapshot
    assert(ManifestTable.dropTable(root, "t"))
    val vDrop = ManifestTable.read(root).get.version
    spark.sql(s"CALL rst.system.restore('ops', 't', ${vDrop - 1})").collect()
    assert(ManifestTable.readTable(spark, root.toString, table = "t")
      .collect().map(_.toString).toSet == keepRows,
      "UNDROP must serve the pre-drop rows")
  }

  test("CHECK constraints: declared once, enforced on every write path (INSERT, MERGE, UPDATE, merge-on-read); ADD CONSTRAINT validates existing data; NULL passes") {
    val wh = java.nio.file.Files.createTempDirectory("graft_chk").toString
    spark.conf.set("spark.sql.catalog.chk", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.chk.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS chk.ops")
    spark.sql("""CREATE TABLE chk.ops.t (id BIGINT, amt DOUBLE, cur STRING)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2',
        'constraint.amt_nonneg' = 'amt >= 0')""")
    val root = new File(wh, "ops")

    // valid rows land; a NULL condition PASSES (standard CHECK)
    spark.sql("INSERT INTO chk.ops.t VALUES (1, 5.0, 'USD'), (2, NULL, 'EUR')")
    assert(spark.sql("SELECT count(*) FROM chk.ops.t").head.getLong(0) == 2L)

    // a violating INSERT fails loudly, names the constraint, commits
    // NOTHING
    val v1 = ManifestTable.read(root).get.version
    val e1 = intercept[Exception] {
      spark.sql("INSERT INTO chk.ops.t VALUES (3, -1.0, 'USD')")
    }
    def chain(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(e => Option(e.getMessage).getOrElse(""))
      .mkString("\n")
    assert(chain(e1).contains("amt_nonneg"), s"got: ${chain(e1)}")
    assert(ManifestTable.read(root).get.version == v1,
      "violating INSERT committed a version")
    assert(spark.sql("SELECT count(*) FROM chk.ops.t").head.getLong(0) == 2L)

    // native MERGE INTO (group CoW row-level path) enforces too
    val e2 = intercept[Exception] {
      spark.sql("""MERGE INTO chk.ops.t t
        USING (SELECT 1L AS id, -9.0 AS amt, 'USD' AS cur) s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET t.amt = s.amt""")
    }
    assert(chain(e2).contains("amt_nonneg"))
    assert(spark.sql("SELECT amt FROM chk.ops.t WHERE id = 1")
      .head.getDouble(0) == 5.0, "violating MERGE leaked")

    // update_where (the metadata verb) enforces the post-update image
    val e3 = intercept[Exception] {
      spark.sql("CALL chk.system.update_where('ops', 't', 'id = 1', " +
        "'amt', '-2.0')").collect()
    }
    assert(chain(e3).contains("amt_nonneg"))

    // ADD CONSTRAINT validates EXISTING data: one that current rows
    // violate refuses; a satisfiable one records and then gates writes
    val e4 = intercept[Exception] {
      spark.sql("ALTER TABLE chk.ops.t SET TBLPROPERTIES " +
        "('constraint.usd_only' = \"cur = 'USD'\")")
    }
    assert(chain(e4).contains("usd_only"),
      s"ADD CONSTRAINT over violating data must refuse: ${chain(e4)}")
    spark.sql("ALTER TABLE chk.ops.t SET TBLPROPERTIES " +
      "('constraint.cur_known' = \"cur IN ('USD', 'EUR')\")")
    val e5 = intercept[Exception] {
      spark.sql("INSERT INTO chk.ops.t VALUES (4, 1.0, 'XXX')")
    }
    assert(chain(e5).contains("cur_known"))
    spark.sql("INSERT INTO chk.ops.t VALUES (4, 1.0, 'EUR')")
    assert(spark.sql("SELECT count(*) FROM chk.ops.t").head.getLong(0) == 3L)

    // the merge-on-read delta path enforces as well
    spark.sql("""CREATE TABLE chk.ops.m (id BIGINT, amt DOUBLE)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2',
        'rowLevelMode'='merge-on-read', 'constraint.amt_nonneg' = 'amt >= 0')""")
    spark.sql("INSERT INTO chk.ops.m VALUES (1, 1.0)")
    val e6 = intercept[Exception] {
      spark.sql("""MERGE INTO chk.ops.m t
        USING (SELECT 1L AS id, -3.0 AS amt) s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET t.amt = s.amt""")
    }
    assert(chain(e6).contains("amt_nonneg"))
    assert(spark.sql("SELECT amt FROM chk.ops.m WHERE id = 1")
      .head.getDouble(0) == 1.0)
  }

  test("generated columns: always derived on every write path — provided values are overwritten, updates re-derive, constraints compose") {
    val wh = java.nio.file.Files.createTempDirectory("graft_gen").toString
    spark.conf.set("spark.sql.catalog.gen", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gen.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gen.ops")
    spark.sql("""CREATE TABLE gen.ops.t
      (id BIGINT, qty DOUBLE, price DOUBLE, total DOUBLE)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2',
        'generated.total' = 'qty * price',
        'constraint.total_nonneg' = 'total >= 0')""")

    // a writer-provided total is OVERWRITTEN by the derivation
    spark.sql("INSERT INTO gen.ops.t VALUES (1, 2.0, 3.0, 999.0)")
    assert(spark.sql("SELECT total FROM gen.ops.t WHERE id = 1")
      .head.getDouble(0) == 6.0, "generated column kept a provided value")

    // updating a REFERENCED column re-derives the generated one
    spark.sql("CALL gen.system.update_where('ops', 't', 'id = 1', " +
      "'qty', '5.0')").collect()
    assert(spark.sql("SELECT total FROM gen.ops.t WHERE id = 1")
      .head.getDouble(0) == 15.0, "update left the generated column stale")

    // the native MERGE (CoW row-level) path re-derives too
    spark.sql("""MERGE INTO gen.ops.t t
      USING (SELECT 1L AS id, 4.0 AS qty, 2.5 AS price, 0.0 AS total) s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET t.qty = s.qty, t.price = s.price
      WHEN NOT MATCHED THEN INSERT * """)
    assert(spark.sql("SELECT total FROM gen.ops.t WHERE id = 1")
      .head.getDouble(0) == 10.0, "MERGE left the generated column stale")

    // a CHECK constraint over the DERIVED value gates the write: the
    // violating derivation (negative qty) refuses even though the
    // provided total was innocent
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gen.ops.t VALUES (2, -1.0, 3.0, 0.0)")
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(x => Option(x.getMessage).getOrElse("")).mkString
      .contains("total_nonneg"))

    // the merge-on-read delta path derives as well
    spark.sql("""CREATE TABLE gen.ops.m
      (id BIGINT, qty DOUBLE, price DOUBLE, total DOUBLE)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2',
        'rowLevelMode'='merge-on-read', 'generated.total' = 'qty * price')""")
    spark.sql("INSERT INTO gen.ops.m VALUES (1, 1.0, 1.0, 0.0)")
    spark.sql("""MERGE INTO gen.ops.m t
      USING (SELECT 1L AS id, 7.0 AS qty, 2.0 AS price, 0.0 AS total) s
      ON t.id = s.id WHEN MATCHED THEN UPDATE SET t.qty = s.qty,
        t.price = s.price""")
    assert(spark.sql("SELECT total FROM gen.ops.m WHERE id = 1")
      .head.getDouble(0) == 14.0, "MoR delta left the generated column stale")
  }

  test("default columns: writer-omitted columns fill with their default expression; batches that carry the column keep values, explicit NULLs included") {
    val wh = java.nio.file.Files.createTempDirectory("graft_def").toString
    spark.conf.set("spark.sql.catalog.dfl", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.dfl.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dfl.ops")
    spark.sql("""CREATE TABLE dfl.ops.t
      (id BIGINT, amt DOUBLE, cur STRING, doubled DOUBLE)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2',
        'default.cur' = "'USD'", 'default.doubled' = 'amt * 2')""")
    val root = new File(wh, "ops")
    import spark.implicits._

    // a provider write OMITTING cur and doubled: defaults fill —
    // including the one referencing another batch column
    Seq((1L, 5.0), (2L, 7.0)).toDF("id", "amt")
      .write.format("graft").option("path", root.toString)
      .option("table", "t").option("mergeKeys", "id").mode("append").save()
    val got = spark.sql("SELECT id, cur, doubled FROM dfl.ops.t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, "USD", 10.0), (2L, "USD", 14.0)),
      s"defaults did not fill: ${got.toSeq}")

    // a batch that CARRIES the column keeps its values — explicit NULL
    // included (SQL DEFAULT applies to omission, not null values)
    Seq[(java.lang.Long, java.lang.Double, String)]((3L, 1.0, null))
      .toDF("id", "amt", "cur")
      .write.format("graft").option("path", root.toString)
      .option("table", "t").option("mergeKeys", "id").mode("append").save()
    assert(spark.sql("SELECT cur FROM dfl.ops.t WHERE id = 3").head.isNullAt(0),
      "an explicit NULL must stay NULL when the column is present")

    // ALTER adds a default for future writes
    spark.sql("ALTER TABLE dfl.ops.t SET TBLPROPERTIES " +
      "('default.amt' = '0.0')")
    Seq(Tuple1(9L)).toDF("id")
      .write.format("graft").option("path", root.toString)
      .option("table", "t").option("mergeKeys", "id").mode("append").save()
    val r9 = spark.sql("SELECT amt, cur, doubled FROM dfl.ops.t WHERE id = 9")
      .head
    assert(r9.getDouble(0) == 0.0 && r9.getString(1) == "USD"
      && r9.getDouble(2) == 0.0, s"ALTER-declared default missing: $r9")
  }

  test("engine-native DEFAULT + IDENTITY: SQL DDL defaults fill INSERT column lists, ALTER COLUMN SET DEFAULT applies forward, identity values generate from the committed high-water mark and never collide across concurrent writers") {
    val wh = java.nio.file.Files.createTempDirectory("graft_idn").toString
    spark.conf.set("spark.sql.catalog.idn", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.idn.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS idn.ops")
    // native DDL: DEFAULT and GENERATED ALWAYS AS IDENTITY both parse
    // because the catalog advertises the capabilities; the analyzer's
    // resolved metadata persists through the manifest schema
    spark.sql("""CREATE TABLE idn.ops.t
      (id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 100 INCREMENT BY 2),
       name STRING, cur STRING DEFAULT 'USD', qty INT DEFAULT 7)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')""")

    // INSERT with a COLUMN LIST: omitted defaults fill with their
    // declared expressions, the omitted identity column generates
    spark.sql("INSERT INTO idn.ops.t (name) VALUES ('a'), ('b')")
    val r1 = spark.sql("SELECT id, name, cur, qty FROM idn.ops.t ORDER BY id")
      .collect()
    assert(r1.map(_.getString(2)).toSeq == Seq("USD", "USD") &&
      r1.map(_.getInt(3)).toSeq == Seq(7, 7),
      s"declared defaults did not fill the INSERT column list: ${r1.toSeq}")
    assert(r1.map(_.getLong(0)).toSeq == Seq(100L, 102L),
      s"identity did not generate from START 100 STEP 2: ${r1.toSeq}")

    // the DEFAULT keyword works positionally too
    spark.sql("INSERT INTO idn.ops.t (name, cur) VALUES ('c', DEFAULT)")
    assert(spark.sql("SELECT cur, id FROM idn.ops.t WHERE name = 'c'")
      .head.getString(0) == "USD")
    // the hwm advanced with the prior commit: no reuse of 100/102
    val ids3 = spark.sql("SELECT id FROM idn.ops.t").collect()
      .map(_.getLong(0)).toSeq
    assert(ids3.distinct.length == 3 && ids3.forall(i => i >= 100 && i % 2 == 0),
      s"identity block reservation broke: $ids3")

    // GENERATED ALWAYS refuses an explicit value through SQL
    val ex = intercept[Exception] {
      spark.sql("INSERT INTO idn.ops.t (id, name) VALUES (1, 'x')")
    }
    assert(ex.getMessage.toLowerCase.contains("identity"),
      s"expected the ALWAYS identity refusal, got: ${ex.getMessage}")

    // ALTER COLUMN SET DEFAULT applies to future writes; DROP DEFAULT
    // returns the column to null-fill
    spark.sql("ALTER TABLE idn.ops.t ALTER COLUMN qty SET DEFAULT 42")
    spark.sql("INSERT INTO idn.ops.t (name) VALUES ('d')")
    assert(spark.sql("SELECT qty FROM idn.ops.t WHERE name = 'd'")
      .head.getInt(0) == 42, "SET DEFAULT did not apply forward")
    spark.sql("ALTER TABLE idn.ops.t ALTER COLUMN qty DROP DEFAULT")
    spark.sql("INSERT INTO idn.ops.t (name) VALUES ('e')")
    assert(spark.sql("SELECT qty FROM idn.ops.t WHERE name = 'e'")
      .head.isNullAt(0), "DROP DEFAULT did not apply forward")

    // CONCURRENT writers through the provider path (DataFrame writes
    // omitting the identity column): the loser's OCC rebase sees the
    // winner's moved hwm property, fails the staged-rebase props check,
    // and re-derives against the fresh block — ids never collide
    import spark.implicits._
    val root = new File(wh, "ops")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val writes = (0 until 4).map { w =>
      Future {
        (0L until 25L).map(i => s"w$w-$i").toDF("name")
          .write.format("graft").option("path", root.toString)
          .option("table", "t").option("mergeKeys", "id")
          .mode("append").save()
      }
    }
    Await.result(Future.sequence(writes), 120.seconds)
    val ids = spark.sql("SELECT id FROM idn.ops.t").collect()
      .map(_.getLong(0)).toSeq
    assert(ids.length == 105 && ids.distinct.length == 105,
      s"concurrent identity writers collided: ${ids.length} rows, " +
        s"${ids.distinct.length} distinct")
    assert(ids.forall(i => i >= 100L && (i - 100L) % 2 == 0),
      "generated ids left the START/STEP lattice")

    // ADD COLUMN … DEFAULT: committed rows null-backfill (history keeps
    // its meaning), FUTURE writes fill the declared default
    spark.sql("ALTER TABLE idn.ops.t ADD COLUMN tag STRING DEFAULT 'z'")
    assert(spark.sql("SELECT tag FROM idn.ops.t WHERE name = 'a'")
      .head.isNullAt(0), "existing rows must null-backfill")
    spark.sql("INSERT INTO idn.ops.t (name) VALUES ('f')")
    assert(spark.sql("SELECT tag FROM idn.ops.t WHERE name = 'f'")
      .head.getString(0) == "z", "added-column default did not apply")

    // identity reservations advance through a transaction ENVELOPE's
    // overlay: two statements in one envelope read each other's hwm
    // (read-your-own-writes covers table PROPS too), so blocks never
    // reuse — and the published single commit carries the final hwm
    spark.sql("CALL idn.system.begin('ops')")
    spark.sql("INSERT INTO idn.ops.t (name) VALUES ('tx1'), ('tx2')")
    spark.sql("INSERT INTO idn.ops.t (name) VALUES ('tx3')")
    spark.sql("CALL idn.system.commit('ops')")
    val idsTx = spark.sql("SELECT id FROM idn.ops.t").collect()
      .map(_.getLong(0)).toSeq
    assert(idsTx.distinct.length == idsTx.length,
      s"envelope statements reused an identity block: ${idsTx.sorted}")

    // rows born through native SQL MERGE's NOT MATCHED INSERT generate
    // ids too — the copy-on-write row-level path reserves from the same
    // committed hwm (identity columns can't key the merge, so key on a
    // natural column via a second table)
    spark.sql("""CREATE TABLE idn.ops.m
      (mid BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 1 INCREMENT BY 1),
       k BIGINT, v STRING)
      USING graft TBLPROPERTIES ('mergeKeys'='k', 'buckets'='2')""")
    spark.sql("INSERT INTO idn.ops.m (k, v) VALUES (1, 'a'), (2, 'b')")
    val midOf2 = spark.sql("SELECT mid FROM idn.ops.m WHERE k = 2")
      .head.getLong(0)
    spark.sql("""MERGE INTO idn.ops.m t
      USING (SELECT * FROM VALUES (2L, 'B'), (3L, 'c'), (4L, 'd')
             AS s(k, v)) s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    val m = spark.sql("SELECT mid, k, v FROM idn.ops.m ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(m.map(_._3).toSeq == Seq("a", "B", "c", "d"),
      s"merge semantics broke: ${m.toSeq}")
    val mids = m.map(_._1)
    assert(mids.distinct.length == 4 && mids.forall(_ >= 1L),
      s"MERGE-born rows did not get unique identity values: ${m.toSeq}")
    // the matched row KEPT its original id (updates re-carry identity)
    assert(m.find(_._2 == 2L).map(_._1).contains(midOf2),
      s"the updated row lost its identity value: ${m.toSeq}")

    // same through the MERGE-ON-READ delta path
    spark.sql("""CREATE TABLE idn.ops.mor
      (mid BIGINT GENERATED ALWAYS AS IDENTITY,
       k BIGINT, v STRING)
      USING graft TBLPROPERTIES ('mergeKeys'='k', 'buckets'='2',
        'rowLevelMode'='merge-on-read')""")
    spark.sql("INSERT INTO idn.ops.mor (k, v) VALUES (1, 'a')")
    spark.sql("""MERGE INTO idn.ops.mor t
      USING (SELECT * FROM VALUES (1L, 'A'), (2L, 'b') AS s(k, v)) s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    val mor = spark.sql("SELECT mid, k, v FROM idn.ops.mor ORDER BY k")
      .collect().map(r => (if (r.isNullAt(0)) null else r.getLong(0),
        r.getLong(1), r.getString(2)))
    assert(mor.map(_._3).toSeq == Seq("A", "b") &&
      mor.forall(_._1 != null) &&
      mor.map(_._1).distinct.length == 2,
      s"MoR MERGE-born rows did not get identity values: ${mor.toSeq}")
  }

  test("row access policies: a rowPolicy property filters every catalog read (incl. time travel), writes land full rows, row-level DML acts on visible rows only, the provider path stays the owner view") {
    val wh = java.nio.file.Files.createTempDirectory("graft_rap").toString
    spark.conf.set("spark.sql.catalog.rap", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rap.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rap.ops")
    spark.sql("""CREATE TABLE rap.ops.t
      (id BIGINT, region STRING, v BIGINT)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2',
        'rowPolicy' = "region <> 'SECRET'")""")
    spark.sql("""INSERT INTO rap.ops.t VALUES
      (1, 'EU', 10), (2, 'SECRET', 20), (3, 'US', 30), (4, 'SECRET', 40)""")

    // catalog reads see only policy-visible rows; the write landed ALL
    // rows (write targets are exempt — proven by the owner view below)
    assert(spark.sql("SELECT sum(v) FROM rap.ops.t").head.getLong(0) == 40L)
    assert(spark.sql("SELECT id FROM rap.ops.t ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 3L))
    // the provider path is the OWNER view — engine maintainers must see
    // the unfiltered table or incremental folds would corrupt it
    val root = new File(wh, "ops")
    assert(spark.read.format("graft").option("path", root.toString)
      .option("table", "t").load().count() == 4L)
    // time travel reads filter too (same relation shape)
    val v = graft.sources.ManifestTable.read(root).get.version
    assert(spark.sql(s"SELECT count(*) FROM rap.ops.t VERSION AS OF $v")
      .head.getLong(0) == 2L)

    // row-level DML is POLICY-AWARE: statements act on visible rows
    // only, and the CoW rewrite carries the hidden slice through
    // unmodified (the Snowflake contract)
    spark.sql("UPDATE rap.ops.t SET v = 0 WHERE id = 1")
    assert(spark.sql("SELECT v FROM rap.ops.t WHERE id = 1")
      .head.getLong(0) == 0L)
    // a predicate that would hit a HIDDEN row touches nothing
    spark.sql("UPDATE rap.ops.t SET v = -1 WHERE id = 2")
    spark.sql("DELETE FROM rap.ops.t WHERE id = 4")
    val owner = spark.read.format("graft").option("path", root.toString)
      .option("table", "t").load().collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("region"),
        r.getAs[Long]("v"))).sortBy(_._1)
    assert(owner.toSeq == Seq((1L, "EU", 0L), (2L, "SECRET", 20L),
      (3L, "US", 30L), (4L, "SECRET", 40L)),
      s"DML touched policy-hidden rows: ${owner.toSeq}")
    // a DELETE over visible rows removes them — and ONLY them
    spark.sql("DELETE FROM rap.ops.t WHERE id = 3")
    assert(spark.read.format("graft").option("path", root.toString)
      .option("table", "t").load().collect().map(_.getAs[Long]("id")).sorted
      .toSeq == Seq(1L, 2L, 4L),
      "policy-aware DELETE dropped a hidden row")
    // the owner verbs keep working (policies gate the SQL surface)
    spark.sql("CALL rap.system.update_where('ops', 't', 'id = 2', " +
      "'v', 'v + 1')").collect()
    assert(spark.read.format("graft").option("path", root.toString)
      .option("table", "t").load()
      .filter(org.apache.spark.sql.functions.col("id") === 2)
      .head.getAs[Long]("v") == 21L)

    // ALTER swaps the policy for future reads; aggregate rewrites and
    // metadata counts never leak hidden rows (count goes through the
    // filter, not the manifest row count)
    spark.sql("""ALTER TABLE rap.ops.t SET TBLPROPERTIES
      ('rowPolicy' = "region = 'EU'")""")
    assert(spark.sql("SELECT count(*) FROM rap.ops.t").head.getLong(0) == 1L)

    // declaring a policy on a merge-on-read table refuses
    val mor = intercept[Exception] {
      spark.sql("""CREATE TABLE rap.ops.m (id BIGINT, v BIGINT)
        USING graft TBLPROPERTIES ('mergeKeys'='id',
          'rowLevelMode'='merge-on-read', 'rowPolicy'='v > 0')""")
    }
    assert(mor.getMessage.contains("merge-on-read"))
  }

  test("column masking (dynamic data masking): catalog reads serve masked values with downstream predicates/aggregates computing over the MASK, writes and the owner path see cleartext, and masks compose with a row policy") {
    val wh = java.nio.file.Files.createTempDirectory("graft_msk").toString
    spark.conf.set("spark.sql.catalog.msk", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.msk.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS msk.ops")
    // partial masking: keep the domain, hide the local part — the mask
    // expression sees the row's own columns
    spark.sql("""CREATE TABLE msk.ops.t
      (id BIGINT, email STRING, region STRING, v BIGINT)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2',
        'mask.email' =
          "concat('***', substring(email, position('@' in email), 99))")""")
    spark.sql("""INSERT INTO msk.ops.t VALUES
      (1, 'alice@x.com', 'EU', 10), (2, 'bob@y.org', 'US', 20),
      (3, null, 'EU', 30)""")

    // reads serve the mask; NULL flows through (concat of null → null)
    val emails = spark.sql("SELECT email FROM msk.ops.t ORDER BY id")
      .collect().map(r => Option(r.getString(0)))
    assert(emails.toSeq == Seq(Some("***@x.com"), Some("***@y.org"), None),
      s"mask did not apply: ${emails.toSeq}")
    // downstream PREDICATES compute over masked values — cleartext is
    // not probeable through a filter
    assert(spark.sql(
      "SELECT count(*) FROM msk.ops.t WHERE email = 'alice@x.com'")
      .head.getLong(0) == 0L, "a filter probed the cleartext")
    assert(spark.sql(
      "SELECT count(*) FROM msk.ops.t WHERE email = '***@x.com'")
      .head.getLong(0) == 1L)
    // aggregates over the masked column see masked values; min/max must
    // NOT be answered from manifest column stats (cleartext bounds)
    assert(spark.sql("SELECT min(email) FROM msk.ops.t").head.getString(0)
      == "***@x.com", "min leaked a cleartext bound")
    // the owner path (provider read) sees cleartext — maintainers must
    val root = new File(wh, "ops")
    assert(spark.read.format("graft").option("path", root.toString)
      .option("table", "t").load()
      .filter(org.apache.spark.sql.functions.col("id") === 1)
      .head.getAs[String]("email") == "alice@x.com")

    // writes land cleartext (write targets exempt): proven above by the
    // owner read; and row-level DML is ALLOWED on masked tables — its
    // read leg is the owner view, so the rewrite persists TRUE values
    spark.sql("UPDATE msk.ops.t SET v = 99 WHERE id = 1")
    val r1 = spark.read.format("graft").option("path", root.toString)
      .option("table", "t").load()
      .filter(org.apache.spark.sql.functions.col("id") === 1).head
    assert(r1.getAs[Long]("v") == 99L &&
      r1.getAs[String]("email") == "alice@x.com",
      s"DML corrupted the masked column: $r1")

    // masks compose with a row policy (filter first, then mask)
    spark.sql("""ALTER TABLE msk.ops.t SET TBLPROPERTIES
      ('rowPolicy' = "region = 'EU'")""")
    val both = spark.sql("SELECT id, email FROM msk.ops.t ORDER BY id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1))))
    assert(both.toSeq == Seq((1L, Some("***@x.com")), (3L, None)),
      s"policy+mask composition broke: ${both.toSeq}")

    // a nullable mask over a NON-nullable column refuses at plan time
    spark.sql("""CREATE TABLE msk.ops.nn (id BIGINT, k BIGINT, v STRING)
      USING graft TBLPROPERTIES ('mergeKeys'='k', 'buckets'='2',
        'rowLevelMode'='merge-on-read',
        'mask.v' = "concat('*', v)")""")
    spark.sql("INSERT INTO msk.ops.nn (k, v) VALUES (1, 'x')")
    // (merge-on-read + mask composes: the reconciled read still masks)
    assert(spark.sql("SELECT v FROM msk.ops.nn").head.getString(0) == "*x")

    // a GOVERNED plain stream serves exactly the governed batch view:
    // the policy filter and mask apply per micro-batch at the reader
    val q = spark.readStream.table("msk.ops.t").writeStream
      .format("memory").queryName("msk_gov")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("msk_ck").toString)
      .start()
    q.processAllAvailable()
    val streamed = spark.sql("SELECT id, email, region FROM msk_gov")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getString(2))).sortBy(_._1)
    val batch = spark.sql("SELECT id, email, region FROM msk.ops.t")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getString(2))).sortBy(_._1)
    assert(streamed.toSeq == batch.toSeq && streamed.nonEmpty &&
      streamed.forall { case (_, e, rg) =>
        e.forall(_.startsWith("***")) && rg == "EU" },
      s"governed stream diverged: stream=${streamed.toSeq} " +
        s"batch=${batch.toSeq}")
    q.stop()

    // a PRUNED governed subscriber (selects neither the policy nor the
    // mask column) still gets policy-filtered rows: the reader widens
    // its read to the governance's columns and projects back down
    val qp = spark.readStream.table("msk.ops.t").select("id")
      .writeStream.format("memory").queryName("msk_gov_pruned")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("msk_ckp").toString)
      .start()
    qp.processAllAvailable()
    qp.stop()
    assert(spark.sql("SELECT id FROM msk_gov_pruned").collect()
      .map(_.getLong(0)).sorted.toSeq ==
      spark.sql("SELECT id FROM msk.ops.t").collect()
        .map(_.getLong(0)).sorted.toSeq,
      "pruned governed stream diverged from the governed batch read")

    // the CDF subscription stays refused on governed tables (preimages
    // of newly-hidden rows are ill-posed); the provider CDF path
    // remains the owner subscription
    val st = intercept[Exception] {
      spark.readStream.option("readChangeFeed", "true")
        .table("msk.ops.t").writeStream
        .format("memory").queryName("msk_leak")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("msk_ck2").toString)
        .start().processAllAvailable()
    }
    assert(st.getMessage.contains("row policy or column mask"),
      s"governed CDF subscription must refuse: ${st.getMessage}")
  }

  test("metadata tables: t$history / t$files / t$properties / t$snapshots / t$partitions answer from the manifest alone, and t$metrics serves the DMF time series by name") {
    val wh = java.nio.file.Files.createTempDirectory("graft_meta").toString
    spark.conf.set("spark.sql.catalog.mt", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mt.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mt.ops")
    spark.sql("""CREATE TABLE mt.ops.t (id BIGINT, v BIGINT)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2',
        'retainHours'='48')""")
    spark.sql("""CREATE TABLE mt.ops.u (id BIGINT, w BIGINT)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')""")
    spark.sql("INSERT INTO mt.ops.t VALUES (1, 10), (2, 20)")
    spark.sql("INSERT INTO mt.ops.u VALUES (1, 1)")
    spark.sql("INSERT INTO mt.ops.t VALUES (3, 30)")

    // $history: only the commits that touched THIS table
    val h = spark.sql("SELECT version, operation FROM mt.ops.`t$history`")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(h.length >= 3, s"history too short: ${h.toSeq}") // create + 2 inserts
    val hu = spark.sql("SELECT count(*) FROM mt.ops.`u$history`")
      .head.getLong(0)
    assert(hu < h.length, "per-table history cut did not filter")

    // $files: live generations with per-file row counts — sums to the
    // table count without opening a data file
    val files = spark.sql(
      "SELECT bucket, path, rows, file_kind FROM mt.ops.`t$files`")
      .collect()
    assert(files.forall(_.getString(3) == "base"))
    assert(files.map(_.getLong(2)).sum == 3L,
      s"file rows did not sum to the table count: ${files.toSeq}")
    assert(files.map(_.getString(1)).distinct.length == files.length)

    // $properties: declared properties read back
    val props = spark.sql(
      "SELECT key, value FROM mt.ops.`t$properties`").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("retainHours").contains("48"), s"props: $props")

    // a MoR delta generation shows with its kind
    spark.sql("ALTER TABLE mt.ops.t SET TBLPROPERTIES " +
      "('rowLevelMode'='merge-on-read')")
    spark.sql("UPDATE mt.ops.t SET v = 11 WHERE id = 1")
    val kinds = spark.sql("SELECT file_kind FROM mt.ops.`t$files`")
      .collect().map(_.getString(0)).toSet
    assert(kinds == Set("base", "delta"), s"kinds: $kinds")

    // $snapshots: one row per RETAINED version at which the table
    // existed — per-version state sizes from the manifest alone
    val snaps = spark.sql("""SELECT version, rows, files, delta_files,
        delta_rows FROM mt.ops.`t$snapshots` ORDER BY version""").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(snaps.nonEmpty)
    // row counts never shrink across this append-then-MoR history, and
    // the head of the series reflects the live state: 3 base rows plus
    // at least one delta generation from the UPDATE above
    assert(snaps.map(_._2).toSeq == snaps.map(_._2).sorted.toSeq,
      s"snapshot rows not monotone: ${snaps.toSeq}")
    val last = snaps.last
    assert(last._2 == 3L && last._4 >= 1L && last._5 >= 1L,
      s"live snapshot row wrong: $last")
    // $snapshots covers at least every commit $history names for t
    val histV = spark.sql("SELECT version FROM mt.ops.`t$history`")
      .collect().map(_.getLong(0)).toSet
    val snapV = snaps.map(_._1).toSet
    assert(histV.subsetOf(snapV),
      s"snapshots missing history versions: ${histV -- snapV}")

    // $partitions: per-bucket skew view — rows sum to the table, shares
    // sum to ~1, MoR delta generations counted per bucket
    val parts = spark.sql("""SELECT bucket, files, rows, delta_files,
        delta_rows, row_share FROM mt.ops.`t$partitions`""").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(parts.map(p => p._3 + p._5).sum == 4L, // 3 base + 1 delta row
      s"partition rows wrong: ${parts.toSeq}")
    assert(parts.map(_._4).sum >= 1L, "MoR delta not counted per bucket")
    assert(math.abs(parts.map(_._6).sum - 1.0) < 1e-9,
      s"row shares must sum to 1: ${parts.toSeq}")

    // SHOW TBLPROPERTIES / DESCRIBE EXTENDED render the declared props
    // (Table.properties() — without the override Spark shows nothing)
    val shown = spark.sql("SHOW TBLPROPERTIES mt.ops.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("retainHours").contains("48") &&
      shown.get("rowLevelMode").contains("merge-on-read"),
      s"SHOW TBLPROPERTIES incomplete: $shown")

    // $metrics: declare a DMF, sweep, read the time series by name
    spark.sql("""ALTER TABLE mt.ops.t SET TBLPROPERTIES
      ('metric.null_v' = "v is null", 'metric.n_rows' = "count(*)")""")
    spark.sql("CALL mt.system.maintain('ops')").collect()
    val mets = spark.sql("""SELECT metric_name, value
        FROM mt.ops.`t$metrics` ORDER BY metric_name""").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(mets.toSeq == Seq(("n_rows", 3.0), ("null_v", 0.0)),
      s"metric series wrong: ${mets.toSeq}")

    // unknown kinds and missing bases still error cleanly
    intercept[Exception] {
      spark.sql("SELECT * FROM mt.ops.`t$nope`").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT * FROM mt.ops.`ghost$files`").collect()
    }
  }

  test("ALTER TABLE: ADD COLUMNS null-backfills as a metadata commit; SET TBLPROPERTIES adopts the layout for future writers and index backfill") {
    val wh = java.nio.file.Files.createTempDirectory("graft_cat6").toString
    spark.conf.set("spark.sql.catalog.graft6", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft6.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft6.ops")
    spark.sql("""CREATE TABLE graft6.ops.t (id BIGINT, client STRING)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')""")
    spark.sql("""INSERT INTO graft6.ops.t
      SELECT id, concat('c', id % 10) FROM range(100)""")
    val root = new File(wh, "ops")
    val gensBefore = ManifestTable.read(root).get.table("t").gens
      .map(_.path).toSet

    // append-only schema evolution, zero data rewrites
    spark.sql("ALTER TABLE graft6.ops.t ADD COLUMNS (note STRING)")
    assert(ManifestTable.read(root).get.table("t").gens.map(_.path).toSet
      == gensBefore, "ADD COLUMNS rewrote data")
    assert(spark.sql(
      "SELECT count(*) FROM graft6.ops.t WHERE note IS NULL")
      .head.getLong(0) == 100L)
    spark.sql(
      "INSERT INTO graft6.ops.t SELECT 1000, 'cx', 'annotated'")
    assert(spark.sql(
      "SELECT note FROM graft6.ops.t WHERE id = 1000").head.getString(0)
      == "annotated")

    // recorded-layout adoption + backfill = pruning on an old table
    spark.sql(
      "ALTER TABLE graft6.ops.t SET TBLPROPERTIES ('searchCols'='client')")
    assert(ManifestTable.read(root).get.table("t").searchCols ==
      Seq("client"))
    val n = spark.sql(
      "CALL graft6.system.index('ops', 't', 'client', '')").head.getLong(0)
    assert(n > 0)
    assert(ManifestTable.read(root).get.table("t").gens
      .forall(_.search == Seq("client")))

    // the ALTERs are first-class history entries
    val ops = ManifestTable.history(spark, root).collect()
      .map(_.getString(1)).toSeq
    assert(ops.contains("ALTER") && ops.contains("INDEX"))

    // refused shapes fail loudly instead of lying about committed bytes
    intercept[Exception] {
      spark.sql("ALTER TABLE graft6.ops.t DROP COLUMN note")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE graft6.ops.t RENAME COLUMN note TO memo")
    }
  }

  test("governance hardening: the CURRENT policy governs time-travel reads, rowLevelMode cannot unset over live deltas, and a real table named like a meta view stays reachable") {
    val wh = java.nio.file.Files.createTempDirectory("graft_gvh").toString
    spark.conf.set("spark.sql.catalog.gvh", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gvh.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gvh.ops")

    // --- CURRENT governance applies to time travel (the Snowflake
    // contract): a policy added AFTER version v still filters
    // `VERSION AS OF v`, and dropping it stops filtering v too ---
    spark.sql("""CREATE TABLE gvh.ops.t (id BIGINT, region STRING)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')""")
    spark.sql("""INSERT INTO gvh.ops.t VALUES
      (1, 'EU'), (2, 'SECRET'), (3, 'US')""")
    val root = new File(wh, "ops")
    val vPrePolicy = ManifestTable.read(root).get.version
    assert(spark.sql(
      s"SELECT count(*) FROM gvh.ops.t VERSION AS OF $vPrePolicy")
      .head.getLong(0) == 3L)
    spark.sql("""ALTER TABLE gvh.ops.t SET TBLPROPERTIES
      ('rowPolicy' = "region <> 'SECRET'",
       'mask.region' = "substring(region, 1, 1)")""")
    // the pre-ALTER snapshot serves FILTERED + MASKED rows now
    val tt = spark.sql(s"SELECT id, region FROM gvh.ops.t " +
      s"VERSION AS OF $vPrePolicy ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(tt.toSeq == Seq((1L, "E"), (3L, "U")),
      s"time travel escaped the current policy/mask: ${tt.toSeq}")
    // dropping the policy un-governs the SAME old version
    spark.sql("ALTER TABLE gvh.ops.t UNSET TBLPROPERTIES " +
      "('rowPolicy', 'mask.region')")
    assert(spark.sql(
      s"SELECT count(*) FROM gvh.ops.t VERSION AS OF $vPrePolicy")
      .head.getLong(0) == 3L)

    // --- rowLevelMode is not removable while deltas shadow the base:
    // stale delta upserts would resurrect under a CoW rewrite ---
    spark.sql("""CREATE TABLE gvh.ops.m (id BIGINT, v BIGINT)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2',
        'rowLevelMode'='merge-on-read')""")
    spark.sql("INSERT INTO gvh.ops.m VALUES (1, 10), (2, 20)")
    spark.sql("UPDATE gvh.ops.m SET v = 11 WHERE id = 1")
    assert(ManifestTable.read(root).get.table("m").deltas.nonEmpty)
    val rm = intercept[Exception] {
      spark.sql("ALTER TABLE gvh.ops.m UNSET TBLPROPERTIES ('rowLevelMode')")
    }
    assert(rm.getMessage.contains("merge-on-read deltas"),
      s"unexpected refusal: ${rm.getMessage}")
    // after collapsing the deltas the unset goes through, and CoW DML
    // then sees the collapsed (correct) values
    spark.sql("CALL gvh.system.compact('ops', 'm')").collect()
    spark.sql("ALTER TABLE gvh.ops.m UNSET TBLPROPERTIES ('rowLevelMode')")
    spark.sql("UPDATE gvh.ops.m SET v = v + 1 WHERE id = 1")
    assert(spark.sql("SELECT v FROM gvh.ops.m WHERE id = 1")
      .head.getLong(0) == 12L)

    // --- a REAL table whose name carries '$' is never shadowed by the
    // meta view of its prefix ---
    spark.sql("""CREATE TABLE gvh.ops.`t$history` (k BIGINT, note STRING)
      USING graft TBLPROPERTIES ('mergeKeys'='k', 'buckets'='2')""")
    spark.sql("INSERT INTO gvh.ops.`t$history` VALUES (7, 'real')")
    val real = spark.sql("SELECT k, note FROM gvh.ops.`t$history`").collect()
    assert(real.length == 1 && real.head.getLong(0) == 7L &&
      real.head.getString(1) == "real",
      s"real '$$'-named table shadowed by the meta view: ${real.toSeq}")
    // the meta view of OTHER tables keeps answering
    assert(spark.sql("SELECT count(*) FROM gvh.ops.`m$history`")
      .head.getLong(0) >= 1L)
  }

  test("session-context governance: graft_session_attr reads session confs inside policies and masks — one table serves different rows/masks to sessions differing only in the attribute") {
    val wh = java.nio.file.Files.createTempDirectory("graft_sat").toString
    def wire(s: org.apache.spark.sql.SparkSession): Unit = {
      s.conf.set("spark.sql.catalog.sat", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.sat.warehouse", wh)
    }
    wire(spark)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS sat.ops")
    // the reference's ops views are per-client (sql/07): "an analyst
    // sees only their own client" is the canonical per-session policy
    spark.sql("""CREATE TABLE sat.ops.t (id BIGINT, client STRING, v BIGINT)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2',
        'rowPolicy' = "client = graft_session_attr('client')",
        'mask.v' = "CASE WHEN graft_session_attr('role') = 'admin'
                    THEN v ELSE -1 END")""")
    spark.sql("""INSERT INTO sat.ops.t VALUES
      (1, 'ACME', 10), (2, 'BETA', 20), (3, 'ACME', 30)""")

    // session 1: ACME analyst — own rows, masked values
    spark.conf.set("graft.session.client", "ACME")
    val s1 = spark.sql("SELECT id, v FROM sat.ops.t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(s1.toSeq == Seq((1L, -1L), (3L, -1L)),
      s"ACME analyst view wrong: ${s1.toSeq}")

    // same session promoted to admin: mask lifts, rows unchanged
    spark.conf.set("graft.session.role", "admin")
    val s1a = spark.sql("SELECT id, v FROM sat.ops.t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(s1a.toSeq == Seq((1L, 10L), (3L, 30L)),
      s"admin mask lift wrong: ${s1a.toSeq}")

    // a SECOND session over the same table, differing only in the attr,
    // gets different rows — session isolation of the attribute
    val spark2 = spark.newSession()
    wire(spark2)
    spark2.conf.set("graft.session.client", "BETA")
    val s2 = spark2.sql("SELECT id, v FROM sat.ops.t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(s2.toSeq == Seq((2L, -1L)), s"BETA analyst view wrong: ${s2.toSeq}")

    // unset attribute → NULL → the equality policy hides everything
    val spark3 = spark.newSession()
    wire(spark3)
    assert(spark3.sql("SELECT count(*) FROM sat.ops.t").head.getLong(0) == 0L,
      "an unset session attribute leaked rows")

    // the folded literal keeps the policy SARGABLE: the planted filter
    // prunes generations like a user predicate (merge-key equality not
    // required — just assert the plan carries a pushed filter)
    spark.conf.unset("graft.session.role")
    val plan = spark.sql("SELECT v FROM sat.ops.t")
      .queryExecution.executedPlan.toString
    assert(plan.contains("client"),
      s"policy filter missing from the plan:\n$plan")

    // and it really PRUNES: a searchCols-covered policy column drives
    // sidecar membership pruning exactly like a user predicate — fewer
    // files planned under the policy than the owner view reads
    spark.sql("""CREATE TABLE sat.ops.p (id BIGINT, client STRING, v BIGINT)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='1',
        'searchCols'='client')""")
    (0 until 4).foreach { i =>
      spark.sql(s"""INSERT INTO sat.ops.p
        SELECT id + ${i * 100}, 'c$i', id FROM range(50)""")
    }
    val allFiles = scanOf(spark.sql("SELECT v FROM sat.ops.p")).plannedFiles
    spark.sql("""ALTER TABLE sat.ops.p SET TBLPROPERTIES
      ('rowPolicy' = "client = graft_session_attr('client')")""")
    spark.conf.set("graft.session.client", "c2")
    val governedScan = scanOf(spark.sql("SELECT v FROM sat.ops.p"))
    assert(governedScan.plannedFiles > 0 &&
      governedScan.plannedFiles < allFiles,
      s"session-attr policy failed to prune: " +
        s"${governedScan.plannedFiles}/$allFiles")
    assert(spark.sql("SELECT count(*) FROM sat.ops.p").head.getLong(0)
      == 50L)
    spark.conf.unset("graft.session.client")
  }

  test("SQL surface: CTAS lands an atomic create+insert, DESCRIBE TABLE serves columns, SHOW CREATE TABLE round-trips the declaration") {
    val wh = java.nio.file.Files.createTempDirectory("graft_sqs").toString
    spark.conf.set("spark.sql.catalog.sqs", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.sqs.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS sqs.ops")

    // CTAS: schema from the query, data in the same statement
    spark.sql("""CREATE TABLE sqs.ops.t USING graft
      TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')
      AS SELECT id, concat('c', id % 3) AS client,
        cast(id as double) * 1.5 AS v FROM range(30)""")
    assert(spark.sql("SELECT count(*) FROM sqs.ops.t").head.getLong(0) == 30L)
    assert(spark.sql("SELECT v FROM sqs.ops.t WHERE id = 4")
      .head.getDouble(0) == 6.0)

    // DESCRIBE serves the committed schema
    val desc = spark.sql("DESCRIBE TABLE sqs.ops.t").collect()
      .map(_.getString(0))
    assert(Seq("id", "client", "v").forall(desc.contains),
      s"DESCRIBE incomplete: ${desc.toSeq}")

    // SHOW CREATE TABLE round-trips the provider and the declared props
    val ddl = spark.sql("SHOW CREATE TABLE sqs.ops.t").head.getString(0)
    assert(ddl.contains("graft") && ddl.contains("mergeKeys"),
      s"SHOW CREATE TABLE incomplete:\n$ddl")
  }

  test("governed postimage-only CDF: governedPostimages serves policy-visible inserts/update postimages masked; preimages, deletes, and hidden-row changes never flow; the raw subscription still refuses") {
    val wh = java.nio.file.Files.createTempDirectory("graft_gcf").toString
    spark.conf.set("spark.sql.catalog.gcf", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcf.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcf.ops")
    spark.sql("""CREATE TABLE gcf.ops.t (id BIGINT, region STRING, v BIGINT)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2',
        'rowPolicy' = "region = 'EU'", 'mask.v' = "v * -1")""")
    val root = new File(wh, "ops")
    import spark.implicits._
    // feed-on write: two inserts, one visible (EU) one hidden (XX)
    Seq((1L, "EU", 10L), (2L, "XX", 20L)).toDF("id", "region", "v")
      .write.format("graft").option("path", root.toString)
      .option("table", "t").option("mergeKeys", "id")
      .option("changeFeed", "true").mode("append").save()
    // owner-verb churn: update a visible row, update a hidden row,
    // insert a visible row, delete a visible row
    spark.sql("CALL gcf.system.update_where('ops','t','id = 1','v','v + 1')")
      .collect()
    spark.sql("CALL gcf.system.update_where('ops','t','id = 2','v','v + 9')")
      .collect()
    spark.sql("INSERT INTO gcf.ops.t VALUES (3, 'EU', 30)")
    spark.sql("CALL gcf.system.delete_where('ops','t','id = 3')").collect()

    val q = spark.readStream
      .option(graft.sources.GraftSqlTable.ReadChangeFeedOption, "true")
      .option(graft.sources.GraftSqlTable.GovernedPostimagesOption, "true")
      .table("gcf.ops.t")
      .writeStream.format("memory").queryName("gcf_gov")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("gcf_ck").toString)
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.sql(
      s"""SELECT id, v, ${ManifestTable.ChangeTypeCol} FROM gcf_gov""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(t => (t._1, t._3))
    // visible insert id1 (masked), its update postimage, insert id3
    // (masked; its later DELETE never flows); the hidden row id2's
    // insert/update never flow; zero preimages/deletes of any kind
    assert(got.toSeq == Seq(
      (1L, -10L, "insert"), (1L, -11L, "update_postimage"),
      (3L, -30L, "insert")),
      s"governed feed slice wrong: ${got.toSeq}")

    // without the opt-in the governed subscription still refuses
    val raw = intercept[Exception] {
      spark.readStream
        .option(graft.sources.GraftSqlTable.ReadChangeFeedOption, "true")
        .table("gcf.ops.t")
        .writeStream.format("memory").queryName("gcf_raw")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("gcf_ck2").toString)
        .start().processAllAvailable()
    }
    assert(raw.getMessage.contains(graft.sources.GraftSqlTable.GovernedPostimagesOption),
      s"refusal must name the opt-in: ${raw.getMessage}")
  }

  test("nested-field masks: mask.<col>.<field> rewrites ONE struct field, siblings flow cleartext, dotted paths reach deeper levels, filter probes see the mask, and top-level masks compose") {
    val wh = java.nio.file.Files.createTempDirectory("graft_nfm").toString
    spark.conf.set("spark.sql.catalog.nfm", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.nfm.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS nfm.ops")
    // the reference's payload columns are semi-structured (sql/03's JSON
    // paths): masking one PII field of the struct is the realistic ask
    spark.sql("""CREATE TABLE nfm.ops.t (
      id BIGINT, email STRING,
      payload STRUCT<ssn: STRING, country: STRING,
                     geo: STRUCT<lat: DOUBLE, lon: DOUBLE>>)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2',
        'mask.payload.ssn' = "concat('***-', substring(payload.ssn, 8, 4))",
        'mask.payload.geo.lat' = "cast(0.0 as double)",
        'mask.email' = "'hidden'")""")
    spark.sql("""INSERT INTO nfm.ops.t VALUES
      (1, 'a@x.com', named_struct('ssn', '123-45-6789', 'country', 'DE',
        'geo', named_struct('lat', 52.5, 'lon', 13.4))),
      (2, 'b@y.org', named_struct('ssn', '987-65-4321', 'country', 'FR',
        'geo', named_struct('lat', 48.8, 'lon', 2.3)))""")

    // one field masks, siblings flow cleartext — incl. a dotted path one
    // level deeper; the top-level mask on another column composes
    val rows = spark.sql("""SELECT email, payload.ssn, payload.country,
        payload.geo.lat, payload.geo.lon
      FROM nfm.ops.t ORDER BY id""").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.toSeq == Seq(
      ("hidden", "***-6789", "DE", 0.0, 13.4),
      ("hidden", "***-4321", "FR", 0.0, 2.3)),
      s"nested mask wrong: ${rows.toSeq}")

    // filter-probe resistance holds on the masked FIELD: the cleartext
    // never matches, the mask does
    assert(spark.sql(
      "SELECT count(*) FROM nfm.ops.t WHERE payload.ssn = '123-45-6789'")
      .head.getLong(0) == 0L, "a filter probed the cleartext field")
    assert(spark.sql(
      "SELECT count(*) FROM nfm.ops.t WHERE payload.ssn = '***-6789'")
      .head.getLong(0) == 1L)

    // the owner path sees cleartext, and writes landed full values
    val root = new File(wh, "ops")
    val ownerSsn = spark.read.format("graft").option("path", root.toString)
      .option("table", "t").load()
      .selectExpr("payload.ssn").collect().map(_.getString(0)).sorted
    assert(ownerSsn.toSeq == Seq("123-45-6789", "987-65-4321"))

    // a mask key that addresses a non-struct path refuses loudly at
    // read planning (id is BIGINT — 'id.x' cannot resolve)
    spark.sql("""ALTER TABLE nfm.ops.t SET TBLPROPERTIES
      ('mask.id.x' = "'0'")""")
    val bad = intercept[Exception] {
      spark.sql("SELECT * FROM nfm.ops.t").collect()
    }
    assert(bad.getMessage.contains("not a struct field"),
      s"unexpected error: ${bad.getMessage}")
    spark.sql("ALTER TABLE nfm.ops.t UNSET TBLPROPERTIES ('mask.id.x')")
    assert(spark.sql("SELECT count(*) FROM nfm.ops.t").head.getLong(0) == 2L)
    // a whole-column mask on the same column wins over its field masks
    spark.sql("""ALTER TABLE nfm.ops.t SET TBLPROPERTIES
      ('mask.payload' = "named_struct('ssn', 'GONE', 'country', 'XX',
        'geo', named_struct('lat', cast(0.0 as double),
                            'lon', cast(0.0 as double)))")""")
    assert(spark.sql("SELECT payload.ssn FROM nfm.ops.t").collect()
      .map(_.getString(0)).toSet == Set("GONE"))
  }

  test("session-enforced owner verbs: update_where/delete_where with session_enforced => true mutate only policy-visible rows, hidden rows are untouchable, default stays the owner view") {
    val wh = java.nio.file.Files.createTempDirectory("graft_sev").toString
    spark.conf.set("spark.sql.catalog.sev", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.sev.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS sev.ops")
    spark.sql("""CREATE TABLE sev.ops.t (id BIGINT, client STRING, v BIGINT)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2',
        'rowPolicy' = "client = graft_session_attr('client')")""")
    spark.sql("""INSERT INTO sev.ops.t VALUES
      (1, 'ACME', 10), (2, 'BETA', 20), (3, 'ACME', 30), (4, 'BETA', 40)""")
    val root = new File(wh, "ops")
    def owner() = spark.read.format("graft").option("path", root.toString)
      .option("table", "t").load().collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("v"))).sortBy(_._1).toSeq

    // enforced UPDATE under client=ACME: a condition spanning all rows
    // touches only the visible ones, and the count says so
    spark.conf.set("graft.session.client", "ACME")
    val updated = spark.sql(
      "CALL sev.system.update_where('ops', 't', 'v >= 10', 'v', 'v + 1', " +
        "session_enforced => true)").head.getLong(0)
    assert(updated == 2L, s"enforced update matched $updated rows")
    assert(owner() == Seq((1L, 11L), (2L, 20L), (3L, 31L), (4L, 40L)),
      s"enforced update touched hidden rows: ${owner()}")

    // enforced DELETE keyed at a HIDDEN row is a no-op (invisible = no
    // match — the caller cannot even probe its existence: count is 0)
    val delHidden = spark.sql(
      "CALL sev.system.delete_where('ops', 't', 'id = 2', " +
        "session_enforced => true)").head.getLong(0)
    assert(delHidden == 0L, "enforced delete reached a hidden row")
    assert(owner().map(_._1) == Seq(1L, 2L, 3L, 4L))

    // enforced DELETE of a visible row lands
    assert(spark.sql(
      "CALL sev.system.delete_where('ops', 't', 'id = 3', " +
        "session_enforced => true)").head.getLong(0) == 1L)
    assert(owner().map(_._1) == Seq(1L, 2L, 4L))

    // the attribute changes mid-session and the NEXT call re-folds it:
    // BETA's rows become the mutable set
    spark.conf.set("graft.session.client", "BETA")
    assert(spark.sql(
      "CALL sev.system.update_where('ops', 't', 'true', 'v', '0', " +
        "session_enforced => true)").head.getLong(0) == 2L)
    assert(owner() == Seq((1L, 11L), (2L, 0L), (4L, 0L)),
      s"re-folded attr wrong: ${owner()}")

    // DEFAULT (owner) call still reaches everything — policies gate the
    // SQL surface and the enforced variant, not the owner's own verbs
    assert(spark.sql(
      "CALL sev.system.delete_where('ops', 't', 'v = 11')")
      .head.getLong(0) == 1L)
    assert(owner().map(_._1) == Seq(2L, 4L))

    // enforced on a POLICY-FREE table = plain owner verb (nothing to
    // enforce)
    spark.sql("""CREATE TABLE sev.ops.free (id BIGINT, v BIGINT)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='1')""")
    spark.sql("INSERT INTO sev.ops.free VALUES (1, 1), (2, 2)")
    assert(spark.sql(
      "CALL sev.system.delete_where('ops', 'free', 'v = 2', " +
        "session_enforced => true)").head.getLong(0) == 1L)

    // a subquery policy refuses the enforced verb FAST with the remedy
    spark.sql("""ALTER TABLE sev.ops.t SET TBLPROPERTIES
      ('rowPolicy' = "id IN (SELECT 1)")""")
    val bad = intercept[Exception] {
      spark.sql("CALL sev.system.delete_where('ops', 't', 'true', " +
        "session_enforced => true)").collect()
    }
    assert(bad.getMessage.contains("subquery"),
      s"unexpected error: ${bad.getMessage}")
    spark.conf.unset("graft.session.client")
  }

  test("tag propagation: CREATE OR REPLACE [AS SELECT] carries the replaced table's tags/masks for surviving columns; CLONE carries them wholesale") {
    val wh = java.nio.file.Files.createTempDirectory("graft_tgp").toString
    spark.conf.set("spark.sql.catalog.tgp", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.tgp.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS tgp.ops")
    spark.sql("""CREATE TABLE tgp.ops.t (id BIGINT, ssn STRING, note STRING)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2',
        'tag.ssn' = 'pii', 'maskForTag.pii' = "concat('#', val)")""")
    spark.sql("INSERT INTO tgp.ops.t VALUES (1, '111', 'a')")
    // an untagged staging source: a CTAS reading the TAGGED table would
    // correctly write MASKED values (the Snowflake semantics) — the
    // propagation assert needs cleartext input
    spark.sql("""CREATE TABLE tgp.ops.raw (id BIGINT, ssn STRING)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')""")
    spark.sql("INSERT INTO tgp.ops.raw VALUES (1, '333')")

    // RTAS keeping the tagged column: the tag AND its policy carry —
    // the replacement masks identically
    spark.sql("""CREATE OR REPLACE TABLE tgp.ops.t
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')
      AS SELECT id, ssn FROM tgp.ops.raw""")
    assert(spark.sql("SELECT ssn FROM tgp.ops.t WHERE id = 1")
      .head.getString(0) == "#333",
      "CREATE OR REPLACE AS SELECT dropped the replaced table's tag mask")
    val props = spark.sql("SHOW TBLPROPERTIES tgp.ops.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("tag.ssn").contains("pii") &&
      props.contains("maskForTag.pii"), s"carried props wrong: $props")

    // a replace that DROPS the tagged column sheds the column tag but
    // keeps the tag policy (it may govern future tagged columns)
    spark.sql("""CREATE OR REPLACE TABLE tgp.ops.t
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')
      AS SELECT id FROM tgp.ops.raw""")
    val props2 = spark.sql("SHOW TBLPROPERTIES tgp.ops.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(!props2.contains("tag.ssn"),
      "a dropped column's tag survived the replace")

    // an explicit re-declaration wins over the carried value
    spark.sql("""CREATE TABLE tgp.ops.s (id BIGINT, ssn STRING)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2',
        'tag.ssn' = 'pii', 'maskForTag.pii' = "concat('#', val)")""")
    spark.sql("INSERT INTO tgp.ops.s VALUES (1, '222')")
    spark.sql("""CREATE OR REPLACE TABLE tgp.ops.s
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2',
        'maskForTag.pii' = "'X'")
      AS SELECT id, ssn FROM tgp.ops.s""")
    assert(spark.sql("SELECT ssn FROM tgp.ops.s WHERE id = 1")
      .head.getString(0) == "X",
      "a re-declared tag policy lost to the carried one")

    // CLONE carries tags wholesale (the manifest entry copies)
    spark.sql("CALL tgp.system.clone('ops', 's', 's2', -1)")
    assert(spark.sql("SELECT ssn FROM tgp.ops.s2 WHERE id = 1")
      .head.getString(0) == "X", "CLONE dropped the source's tag mask")
  }

  test("tag lineage through CTAS: direct column lineage from a DIFFERENT tagged source carries tags and their policies, renames follow, computed columns break lineage, declarations win") {
    val wh = java.nio.file.Files.createTempDirectory("graft_tgl").toString
    spark.conf.set("spark.sql.catalog.tgl", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.tgl.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS tgl.ops")
    spark.sql("""CREATE TABLE tgl.ops.src (id BIGINT, ssn STRING, note STRING)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2',
        'tag.ssn' = 'pii', 'maskForTag.pii' = "concat('#', val)")""")
    spark.sql("INSERT INTO tgl.ops.src VALUES (1, '111', 'a')")
    def propsOf(t: String): Map[String, String] =
      spark.sql(s"SHOW TBLPROPERTIES tgl.ops.$t").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap

    // CTAS into a NEW table: the directly-referenced tagged column
    // carries its tag AND the tag's policy — the copy keeps masking
    spark.sql("""CREATE TABLE tgl.ops.d
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')
      AS SELECT id, ssn FROM tgl.ops.src""")
    val dp = propsOf("d")
    assert(dp.get("tag.ssn").contains("pii") &&
      dp.get("maskForTag.pii").contains("concat('#', val)"),
      s"cross-table tag lineage lost: $dp")
    // the CTAS read was itself masked (stored '#111'); the carried tag
    // masks AGAIN at the target — proof the policy is LIVE there
    assert(spark.sql("SELECT ssn FROM tgl.ops.d").head.getString(0)
      == "##111")

    // a RENAME (alias over a bare reference) keeps lineage
    spark.sql("""CREATE TABLE tgl.ops.r
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')
      AS SELECT id, ssn AS social FROM tgl.ops.src""")
    assert(propsOf("r").get("tag.social").contains("pii"),
      s"renamed column lost its tag: ${propsOf("r")}")

    // a COMPUTED column breaks lineage (Snowflake's rule): deriving
    // from a tagged column is a declaration decision, not a carry
    spark.sql("""CREATE TABLE tgl.ops.c
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')
      AS SELECT id, substr(ssn, 1, 1) AS s1 FROM tgl.ops.src""")
    assert(!propsOf("c").contains("tag.s1"),
      s"computed column carried a tag: ${propsOf("c")}")

    // an explicit declaration on the CTAS wins over the carried value
    spark.sql("""CREATE TABLE tgl.ops.e
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2',
        'tag.ssn' = 'open')
      AS SELECT id, ssn FROM tgl.ops.src""")
    assert(propsOf("e").get("tag.ssn").contains("open"),
      s"carried tag beat the declared one: ${propsOf("e")}")

    // lineage traces through a JOIN: each side's tagged column carries
    spark.sql("""CREATE TABLE tgl.ops.src2 (id BIGINT, email STRING)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2',
        'tag.email' = 'contact',
        'maskForTag.contact' = "'hidden'")""")
    spark.sql("INSERT INTO tgl.ops.src2 VALUES (1, 'a@b.c')")
    spark.sql("""CREATE TABLE tgl.ops.j
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')
      AS SELECT s.id, s.ssn, s2.email
      FROM tgl.ops.src s JOIN tgl.ops.src2 s2 USING (id)""")
    val jp = propsOf("j")
    assert(jp.get("tag.ssn").contains("pii") &&
      jp.get("tag.email").contains("contact") &&
      jp.contains("maskForTag.pii") && jp.contains("maskForTag.contact"),
      s"join lineage incomplete: $jp")
  }

  test("session-enforced mergeBatch: a provider replace-by-key under the session's context leaves policy-hidden rows untouchable") {
    import graft.sources.ManifestTable
    import graft.sources.ManifestTable.TableBatch
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_mbe").toString
    spark.conf.set("spark.sql.catalog.mbe", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mbe.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mbe.ops")
    spark.sql("""CREATE TABLE mbe.ops.g (id BIGINT, client STRING, v BIGINT)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2',
        'rowPolicy' = "client = graft_session_attr('client')")""")
    spark.sql("""INSERT INTO mbe.ops.g VALUES
      (1, 'ACME', 10), (2, 'BETA', 20)""")
    val root = new File(wh, "ops")
    def owner(): Seq[(Long, String, Long)] =
      spark.read.format("graft").option("path", root.toString)
        .option("table", "g").load().orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

    // an ACME session upserts three keys: its own key updates, the new
    // key inserts, and the key belonging to a BETA (hidden) row is
    // UNTOUCHABLE — the hidden row survives byte-exactly
    spark.conf.set("graft.session.client", "ACME")
    try {
      val batch = Seq((1L, "ACME", 11L), (2L, "ACME", 99L),
        (3L, "ACME", 30L)).toDF("id", "client", "v")
      ManifestTable.mergeBatchEnforced(spark, root, "q-enf", 1L,
        Seq(TableBatch("g", batch, Seq("id"), 2)))
      assert(owner() == Seq((1L, "ACME", 11L), (2L, "BETA", 20L),
        (3L, "ACME", 30L)),
        s"enforced mergeBatch touched a hidden row: ${owner()}")

      // an enforced delete set drops hidden keys too: deleting 2 (BETA,
      // hidden) is a no-op, deleting 3 (visible) lands
      ManifestTable.mergeBatchEnforced(spark, root, "q-enf", 2L,
        Seq(TableBatch("g",
          Seq.empty[(Long, String, Long)].toDF("id", "client", "v"),
          Seq("id"), 2,
          deleteKeys = Some(Seq(2L, 3L).toDF("id")))))
      assert(owner() == Seq((1L, "ACME", 11L), (2L, "BETA", 20L)),
        s"enforced delete reached a hidden row: ${owner()}")
    } finally spark.conf.unset("graft.session.client")

    // the plain owner-path mergeBatch is unchanged: it reaches everything
    ManifestTable.mergeBatch(root, "q-own", 3L, Seq(TableBatch("g",
      Seq((2L, "BETA", 21L)).toDF("id", "client", "v"), Seq("id"), 2)))
    assert(owner() == Seq((1L, "ACME", 11L), (2L, "BETA", 21L)))

    // the enforced flavor covers the whole provider-write surface:
    spark.conf.set("graft.session.client", "ACME")
    try {
      // APPEND — a row keyed to the hidden BETA row drops (it would
      // shadow the hidden row on reconcile), the fresh key lands
      ManifestTable.mergeBatchEnforced(spark, root, "q-app", 1L,
        Seq(TableBatch("g",
          Seq((2L, "ACME", 55L), (4L, "ACME", 40L)).toDF("id", "client", "v"),
          Seq("id"), 2, append = true)))
      assert(owner() == Seq((1L, "ACME", 11L), (2L, "BETA", 21L),
        (4L, "ACME", 40L)),
        s"enforced append shadowed a hidden row: ${owner()}")

      // OVERWRITE — replaces only the VISIBLE rows: ACME's 1 and 4 go,
      // the incoming row keyed to hidden 2 drops, and the hidden BETA
      // row rides into the replacement byte-unchanged
      ManifestTable.mergeBatchEnforced(spark, root, "q-ovw", 1L,
        Seq(TableBatch("g",
          Seq((2L, "ACME", 66L), (7L, "ACME", 70L)).toDF("id", "client", "v"),
          Seq("id"), 2, overwrite = true)))
      assert(owner() == Seq((2L, "BETA", 21L), (7L, "ACME", 70L)),
        s"enforced overwrite broke the hidden complement: ${owner()}")
    } finally spark.conf.unset("graft.session.client")
  }

  test("dataset caching: snapshot-keyed reuse — fresh reads of the same snapshot hit the cache, a commit invalidates reuse instead of serving frozen bytes, governed tables never serve from a cross-query cache") {
    val wh = java.nio.file.Files.createTempDirectory("graft_cch").toString
    spark.conf.set("spark.sql.catalog.cch", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cch.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cch.ops")
    spark.sql("""CREATE TABLE cch.ops.t (id BIGINT, v BIGINT)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')""")
    spark.sql("INSERT INTO cch.ops.t VALUES (1, 10), (2, 20)")
    val root = new File(wh, "ops")
    def cached(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.toString.contains("InMemoryRelation")

    // cache through one DataFrame; a FRESH spark.table (new loadTable,
    // new Table instance) reuses it — the snapshot-keyed identity
    val df = spark.table("cch.ops.t")
    df.cache(); df.count()
    try {
      val fresh = spark.table("cch.ops.t")
      assert(cached(fresh), "fresh read of the cached snapshot missed " +
        s"the cache:\n${fresh.queryExecution.optimizedPlan}")
      assert(fresh.count() == 2L)

      // a CATALOG write refreshes the entry through Spark's recache
      // hook: the next read still hits the cache AND serves the new
      // snapshot's rows — never frozen bytes
      spark.sql("INSERT INTO cch.ops.t VALUES (3, 30)")
      val after = spark.table("cch.ops.t")
      assert(after.count() == 3L,
        "a cached entry served stale rows across a catalog commit")
      assert(cached(after),
        "a catalog write dropped the cache instead of refreshing it")

      // an OUT-OF-BAND write (the provider path bypasses Spark's
      // hook) is standard v2 semantics: REFRESH TABLE re-materializes
      import org.apache.spark.sql.functions.lit
      spark.range(1).select(lit(4L).as("id"), lit(40L).as("v"))
        .write.format("graft").option("path", root.toString)
        .option("table", "t").mode("append").save()
      spark.sql("REFRESH TABLE cch.ops.t")
      val refreshed = spark.table("cch.ops.t")
      assert(refreshed.count() == 4L,
        "REFRESH TABLE did not re-materialize the cache")
      assert(cached(refreshed),
        "REFRESH TABLE dropped the cache instead of recaching")
    } finally { df.unpersist(blocking = true) }

    // GOVERNED tables: policy context lives in the session, and
    // governance plants AFTER cache lookup — so a governed read must
    // never serve from a cross-query cache (an attr change between
    // cache and read would leak another context's rows)
    spark.sql("""CREATE TABLE cch.ops.g (id BIGINT, client STRING)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2',
        'rowPolicy' = "client = graft_session_attr('client')")""")
    spark.sql("INSERT INTO cch.ops.g VALUES (1, 'ACME'), (2, 'BETA')")
    spark.conf.set("graft.session.client", "ACME")
    val g = spark.table("cch.ops.g")
    g.cache(); g.count()
    try {
      spark.conf.set("graft.session.client", "BETA")
      val other = spark.table("cch.ops.g")
      assert(!cached(other),
        "a governed read served from another context's cache")
      assert(other.collect().map(_.getLong(0)).toSeq == Seq(2L),
        "governed read after an attr change leaked rows")
      // even the SAME context recomputes — governance is strict
      spark.conf.set("graft.session.client", "ACME")
      assert(!cached(spark.table("cch.ops.g")))
    } finally {
      g.unpersist(blocking = true)
      spark.conf.unset("graft.session.client")
    }

    // a governed leaf ANYWHERE in a cached plan (here: joined under an
    // ungoverned scan) still triggers the bypass — probing only the
    // first scan leaf was a cross-context leak
    spark.conf.set("graft.session.client", "ACME")
    val j = spark.table("cch.ops.t").join(spark.table("cch.ops.g"), "id")
    j.cache(); j.count()
    try {
      spark.conf.set("graft.session.client", "BETA")
      val ids = j.select("id").collect().map(_.getLong(0)).toSeq
      assert(ids == Seq(2L),
        s"a cached JOIN over a governed table leaked another " +
          s"context's rows: $ids")
    } finally {
      j.unpersist(blocking = true)
      spark.conf.unset("graft.session.client")
    }

    // ALTER adding a policy orphans pre-policy cache entries: new reads
    // are governed and equal nothing cached
    val u = spark.table("cch.ops.t")
    u.cache(); u.count()
    try {
      spark.sql("""ALTER TABLE cch.ops.t SET TBLPROPERTIES
        ('rowPolicy' = 'v > 15')""")
      val gated = spark.table("cch.ops.t")
      assert(!cached(gated),
        "a policy-gated read served from a pre-policy cache")
      assert(gated.count() == 3L) // rows 20, 30, 40
    } finally { u.unpersist(blocking = true) }
  }

  test("governed-cache bypass reaches subquery plans and nested cache entries — no cross-context serve through either indirection") {
    val wh = java.nio.file.Files.createTempDirectory("graft_csq").toString
    spark.conf.set("spark.sql.catalog.csq", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.csq.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS csq.ops")
    def cached(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.toString.contains("InMemoryRelation")

    // (1) SUBQUERY indirection: the cached plan's MAIN tree scans only
    // the ungoverned table — the governed scan hides inside a scalar
    // subquery's SubqueryExec expression, which collectLeaves never
    // visits. Serving the entry across an attr flip would leak the old
    // context's threshold into the new context's filter.
    spark.sql("""CREATE TABLE csq.ops.t3 (id BIGINT, v BIGINT)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')""")
    spark.sql("INSERT INTO csq.ops.t3 VALUES (1, 10), (2, 20), (3, 30)")
    spark.sql("""CREATE TABLE csq.ops.g3 (id BIGINT, client STRING, lim BIGINT)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2',
        'rowPolicy' = "client = graft_session_attr('client')")""")
    spark.sql("INSERT INTO csq.ops.g3 VALUES (1, 'ACME', 15), (2, 'BETA', 25)")
    val q = "SELECT id FROM csq.ops.t3 WHERE v > " +
      "(SELECT max(lim) FROM csq.ops.g3) ORDER BY id"

    // (0) same-handle, NO cache: head() compiles a derived COPY whose
    // subquery planting runs in the optimizer's FIRST batch, directly on
    // the shared analyzed nodes — tagging the matched instance (instead
    // of a copy) poisoned the handle's own later optimization into
    // skipping the plant, serving the handle's collect() UNGOVERNED
    spark.conf.set("graft.session.client", "ACME")
    val h = spark.sql(q)
    h.head() // derived copy executes (and governs) first
    assert(h.collect().map(_.getLong(0)).toSeq == Seq(2L, 3L),
      "a derived execution poisoned the handle's own subquery governance")

    val sq = spark.sql(q)
    sq.cache(); sq.count()
    try {
      assert(sq.collect().map(_.getLong(0)).toSeq == Seq(2L, 3L)) // lim 15
      spark.conf.set("graft.session.client", "BETA")
      val fresh = spark.sql(q)
      assert(!cached(fresh),
        "a cached plan with a governed scan in a SUBQUERY served " +
          "across a context flip")
      assert(fresh.collect().map(_.getLong(0)).toSeq == Seq(3L), // lim 25
        "subquery-carried governance leaked the caching context's rows")
    } finally {
      sq.unpersist(blocking = true)
      spark.conf.unset("graft.session.client")
    }

    // (2) NESTED-CACHE indirection: an inner cache over a then-
    // ungoverned table embeds as an InMemoryTableScanExec inside the
    // outer entry's materialized plan; ALTERing the inner table governed
    // afterwards must stop the OUTER entry from serving to the pinned
    // DataFrame handle (HEAD policies apply to old snapshots too).
    spark.sql("""CREATE TABLE csq.ops.t2 (id BIGINT, w BIGINT)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')""")
    spark.sql("INSERT INTO csq.ops.t2 VALUES (1, 100), (2, 200)")
    spark.sql("""CREATE TABLE csq.ops.g2 (id BIGINT, client STRING)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')""")
    spark.sql("INSERT INTO csq.ops.g2 VALUES (1, 'ACME'), (2, 'BETA')")
    val inner = spark.table("csq.ops.g2")
    inner.cache(); inner.count()
    val outer = spark.table("csq.ops.t2").join(spark.table("csq.ops.g2"), "id")
    outer.cache(); outer.count()
    try {
      assert(outer.count() == 2L)
      spark.sql("""ALTER TABLE csq.ops.g2 SET TBLPROPERTIES
        ('rowPolicy' = "client = graft_session_attr('client')")""")
      spark.conf.set("graft.session.client", "BETA")
      // the pinned handle still matches ITS OWN entry (snapshot keys
      // unchanged inside the plan) — the bypass must see the governed
      // scan through the embedded inner InMemoryTableScanExec
      val ids = outer.select("id").collect().map(_.getLong(0)).toSeq
      assert(ids == Seq(2L),
        s"a cached JOIN embedding an inner cache over a table ALTERed " +
          s"governed leaked rows: $ids")
    } finally {
      outer.unpersist(blocking = true)
      inner.unpersist(blocking = true)
      spark.conf.unset("graft.session.client")
    }
  }

  test("object tagging: maskForTag.<tag> masks every column tagged <tag> through one policy over `val`, column-attached masks win, multi-policy tags refuse, untagging restores cleartext") {
    val wh = java.nio.file.Files.createTempDirectory("graft_tgm").toString
    spark.conf.set("spark.sql.catalog.tgm", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.tgm.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS tgm.ops")
    // email and ssn carry 'pii'; phone carries only 'contact' (no
    // policy attached yet) — ONE pii policy governs both pii columns
    spark.sql("""CREATE TABLE tgm.ops.t
      (id BIGINT, email STRING, ssn STRING, phone STRING)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2',
        'tag.email' = 'pii,contact', 'tag.ssn' = 'pii',
        'tag.phone' = 'contact',
        'maskForTag.pii' = "concat('#', val)")""")
    spark.sql("""INSERT INTO tgm.ops.t VALUES
      (1, 'a@x.com', '111', '555'), (2, 'b@y.org', '222', '666')""")
    def row1() = spark.sql(
      "SELECT email, ssn, phone FROM tgm.ops.t WHERE id = 1").head

    // the one policy binds `val` per tagged column; untagged-policy
    // columns flow cleartext
    assert(row1().toSeq == Seq("#a@x.com", "#111", "555"),
      s"tag mask wrong: ${row1().toSeq}")
    // filter-probe resistance holds for tag masks too
    assert(spark.sql(
      "SELECT count(*) FROM tgm.ops.t WHERE ssn = '111'").head.getLong(0)
      == 0L, "cleartext probed through a tag mask")
    assert(spark.sql(
      "SELECT count(*) FROM tgm.ops.t WHERE ssn = '#111'").head.getLong(0)
      == 1L)
    // the owner path is cleartext, as for column-attached masks
    val root = new File(wh, "ops")
    assert(spark.read.format("graft").option("path", root.toString)
      .option("table", "t").load().filter("id = 1")
      .head.getAs[String]("ssn") == "111")

    // a COLUMN-ATTACHED mask on a tagged column wins over its tag
    spark.sql("""ALTER TABLE tgm.ops.t SET TBLPROPERTIES
      ('mask.email' = "'X'")""")
    assert(row1().toSeq == Seq("X", "#111", "555"))

    // attaching a policy to 'contact' masks phone; email (explicit
    // mask) is immune to the new tag policy
    spark.sql("""ALTER TABLE tgm.ops.t SET TBLPROPERTIES
      ('maskForTag.contact' = "'-'")""")
    assert(row1().toSeq == Seq("X", "#111", "-"))

    // dropping the explicit mask exposes the conflict: email's tags now
    // resolve to TWO policies — refuse loudly with the remedy
    spark.sql("ALTER TABLE tgm.ops.t UNSET TBLPROPERTIES ('mask.email')")
    val dup = intercept[Exception] { row1() }
    assert(dup.getMessage.contains("tag masks"),
      s"unexpected error: ${dup.getMessage}")
    // arbitrating via the column mask clears it
    spark.sql("""ALTER TABLE tgm.ops.t SET TBLPROPERTIES
      ('mask.email' = "concat('#', email)")""")
    assert(row1().toSeq == Seq("#a@x.com", "#111", "-"))

    // untagging a column (UNSET tag.<col>) restores cleartext
    spark.sql("ALTER TABLE tgm.ops.t UNSET TBLPROPERTIES ('tag.ssn')")
    assert(row1().toSeq == Seq("#a@x.com", "111", "-"))

    // the COMPILED projection (streaming/row-level path) shares the
    // same expansion and `val` binding — prove it resolves
    val props = graft.sources.ManifestTable.read(root).get.table("t").props
    val schema = graft.sources.ManifestTable.read(root).get.table("t").schema
    val proj = graft.sources.GovernedRows.compileProjection(spark, schema,
      graft.sources.GovernedRows.effectiveMasks(props, "t"), "t")
    assert(proj.length == schema.length)
    assert(proj.forall(_.resolved), "compiled tag masks left unresolved " +
      s"expressions: $proj")

    // a tag on a column that does not exist refuses at read planning —
    // a typo'd tag would otherwise silently skip the mask
    spark.sql("""ALTER TABLE tgm.ops.t SET TBLPROPERTIES
      ('tag.emial' = 'pii')""")
    val typo = intercept[Exception] { row1() }
    assert(typo.getMessage.contains("matches no column"),
      s"unexpected error: ${typo.getMessage}")
    spark.sql("ALTER TABLE tgm.ops.t UNSET TBLPROPERTIES ('tag.emial')")
    assert(row1().toSeq == Seq("#a@x.com", "111", "-"))

    // duplicate tag names in one list are ONE tag, not a conflict
    spark.sql("ALTER TABLE tgm.ops.t SET TBLPROPERTIES ('tag.ssn' = 'pii,pii')")
    assert(row1().toSeq == Seq("#a@x.com", "#111", "-"),
      "a duplicated tag name was counted as a second tag mask")
    // tags attach to whole columns — a dotted tag key refuses at ALTER
    val dotted = intercept[Exception] {
      spark.sql("""ALTER TABLE tgm.ops.t SET TBLPROPERTIES
        ('tag.payload.ssn' = 'pii')""")
    }
    assert(dotted.getMessage.contains("whole columns"),
      s"unexpected error: ${dotted.getMessage}")

    // CREATE TABLE enforces the SAME declaration checks ALTER does — a
    // dotted tag key, an empty tag list, or an unparsable maskForTag
    // previously succeeded at declaration and then every READ threw
    val createDotted = intercept[Exception] {
      spark.sql("""CREATE TABLE tgm.ops.bad1 (id BIGINT, p STRING)
        USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='1',
          'tag.payload.ssn' = 'pii')""")
    }
    assert(createDotted.getMessage.contains("whole columns"),
      s"unexpected error: ${createDotted.getMessage}")
    val createEmpty = intercept[Exception] {
      spark.sql("""CREATE TABLE tgm.ops.bad2 (id BIGINT, p STRING)
        USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='1',
          'tag.p' = ' , ')""")
    }
    assert(createEmpty.getMessage.contains("empty"),
      s"unexpected error: ${createEmpty.getMessage}")
    val createBadMask = intercept[Exception] {
      spark.sql("""CREATE TABLE tgm.ops.bad3 (id BIGINT, p STRING)
        USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='1',
          'tag.p' = 'pii', 'maskForTag.pii' = 'concat(((')""")
    }
    assert(createBadMask.getMessage.contains("does not parse"),
      s"unexpected error: ${createBadMask.getMessage}")
    Seq("bad1", "bad2", "bad3").foreach(t =>
      assert(!spark.catalog.tableExists(s"tgm.ops.$t"),
        s"a refused CREATE left '$t' behind"))
  }

  test("named snapshot refs: VERSION AS OF '<name>' resolves ref.<name> props, a ref pins its version against retention until UNSET") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ref").toString
    spark.conf.set("spark.sql.catalog.ref", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ref.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS ref.ops")
    // tight retention so the pin is what keeps the version alive
    spark.sql("""CREATE TABLE ref.ops.t (id BIGINT, v BIGINT)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='1',
        'retainVersions'='1')""")
    spark.sql("INSERT INTO ref.ops.t VALUES (1, 10)")
    val root = new File(wh, "ops")
    val audited = graft.sources.ManifestTable.read(root).get.version
    spark.sql("INSERT INTO ref.ops.t VALUES (2, 20)")
    val unpinned = graft.sources.ManifestTable.read(root).get.version

    // declare the ref while the version is still retained
    spark.sql(s"""ALTER TABLE ref.ops.t SET TBLPROPERTIES
      ('ref.audited' = '$audited')""")
    // resolves by name, serving the pinned snapshot exactly
    assert(spark.sql(
      "SELECT id FROM ref.ops.t VERSION AS OF 'audited' ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    // the `t$refs` metadata table lists the pin
    val refRows = spark.sql(
      "SELECT name, version FROM ref.ops.`t$refs`").collect()
    assert(refRows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("audited", audited)), s"t$$refs wrong: ${refRows.toSeq}")

    // age both versions far out of the count window (each INSERT's
    // post-commit gc sweeps as it goes)
    (3 to 8).foreach(i =>
      spark.sql(s"INSERT INTO ref.ops.t VALUES ($i, ${i * 10})"))

    // the UNPINNED old version aged out...
    val aged = intercept[Exception] {
      spark.sql(s"SELECT count(*) FROM ref.ops.t VERSION AS OF $unpinned")
        .collect()
    }
    assert(aged.getMessage.contains("not retained"),
      s"unexpected error: ${aged.getMessage}")
    // ...while the PINNED one still serves — by name and by number
    assert(spark.sql(
      "SELECT id FROM ref.ops.t VERSION AS OF 'audited'")
      .collect().map(_.getLong(0)).toSeq == Seq(1L),
      "a named ref failed to pin its version against retention")
    assert(spark.sql(
      s"SELECT count(*) FROM ref.ops.t VERSION AS OF $audited")
      .head.getLong(0) == 1L)

    // an unknown name refuses with the remedy
    val bad = intercept[Exception] {
      spark.sql("SELECT * FROM ref.ops.t VERSION AS OF 'nope'").collect()
    }
    assert(bad.getMessage.contains("named ref"),
      s"unexpected error: ${bad.getMessage}")
    // pinning a version that is already gone refuses
    val dead = intercept[Exception] {
      spark.sql(s"""ALTER TABLE ref.ops.t SET TBLPROPERTIES
        ('ref.dead' = '$unpinned')""")
    }
    assert(dead.getMessage.contains("not reconstructible"),
      s"unexpected error: ${dead.getMessage}")
    // a NUMERIC ref name could never resolve (VERSION AS OF parses
    // numbers as commit versions first) — refuse at declaration
    val numeric = intercept[Exception] {
      spark.sql(s"""ALTER TABLE ref.ops.t SET TBLPROPERTIES
        ('ref.7' = '$audited')""")
    }
    assert(numeric.getMessage.contains("numeric"),
      s"unexpected error: ${numeric.getMessage}")

    // UNSET drops the pin: after the next commit's gc the version ages
    // out like any other
    spark.sql("ALTER TABLE ref.ops.t UNSET TBLPROPERTIES ('ref.audited')")
    spark.sql("INSERT INTO ref.ops.t VALUES (9, 90)")
    val gone = intercept[Exception] {
      spark.sql(s"SELECT count(*) FROM ref.ops.t VERSION AS OF $audited")
        .collect()
    }
    assert(gone.getMessage.contains("not retained"),
      s"unexpected error: ${gone.getMessage}")
  }

  test("atomic CREATE OR REPLACE TABLE [AS SELECT]: one manifest swap per statement, a failed RTAS publishes nothing, replaced state stays time-travelable") {
    val wh = java.nio.file.Files.createTempDirectory("graft_cor").toString
    spark.conf.set("spark.sql.catalog.cor", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cor.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cor.ops")
    spark.sql("""CREATE TABLE cor.ops.t (id BIGINT, v BIGINT)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')""")
    spark.sql("INSERT INTO cor.ops.t VALUES (1, 10), (2, 20)")
    val root = new File(wh, "ops")
    val preReplace = graft.sources.ManifestTable.read(root).get.version

    // the reference's canonical DDL verb (sql/02): plain CREATE OR
    // REPLACE swaps schema + state
    spark.sql("""CREATE OR REPLACE TABLE cor.ops.t
      (id BIGINT, name STRING, amt DECIMAL(12,2))
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')""")
    assert(spark.table("cor.ops.t").schema.fieldNames.toSeq ==
      Seq("id", "name", "amt"))
    assert(spark.sql("SELECT count(*) FROM cor.ops.t").head.getLong(0) == 0L)
    // the replaced state stays time-travelable within retention
    assert(spark.sql(
      s"SELECT count(*) FROM cor.ops.t VERSION AS OF $preReplace")
      .head.getLong(0) == 2L,
      "CREATE OR REPLACE erased the pre-replace snapshot")

    // RTAS lands create + data as ONE commit
    val preRtas = graft.sources.ManifestTable.read(root).get.version
    spark.sql("""CREATE OR REPLACE TABLE cor.ops.t
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')
      AS SELECT id * 10 AS id, CAST(id AS STRING) AS tag
      FROM range(1, 4)""")
    val postRtas = graft.sources.ManifestTable.read(root).get.version
    assert(postRtas == preRtas + 1,
      s"RTAS took ${postRtas - preRtas} commits, expected 1 (atomic)")
    assert(spark.sql("SELECT sum(id) FROM cor.ops.t").head.getLong(0) == 60L)

    // a FAILING RTAS publishes nothing — the envelope aborts
    val boom = intercept[Exception] {
      spark.sql("""CREATE OR REPLACE TABLE cor.ops.t
        USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')
        AS SELECT CASE WHEN assert_true(id < 0) IS NULL THEN id END AS id
        FROM range(1, 3)""")
    }
    assert(boom.getMessage != null)
    assert(graft.sources.ManifestTable.read(root).get.version == postRtas,
      "a failed RTAS published a commit")
    assert(spark.sql("SELECT sum(id) FROM cor.ops.t").head.getLong(0) == 60L,
      "a failed RTAS mutated the table")

    // plain CREATE still refuses on an existing table; REPLACE refuses
    // on a missing one
    intercept[Exception] {
      spark.sql("CREATE TABLE cor.ops.t (x BIGINT) USING graft")
    }
    intercept[Exception] {
      spark.sql("REPLACE TABLE cor.ops.missing (x BIGINT) USING graft")
    }
    // and a fresh CTAS (no replace) is atomic through the same path
    val preCtas = graft.sources.ManifestTable.read(root).get.version
    spark.sql("""CREATE TABLE cor.ops.c USING graft
      TBLPROPERTIES ('mergeKeys'='k', 'buckets'='1')
      AS SELECT id AS k FROM range(0, 5)""")
    assert(graft.sources.ManifestTable.read(root).get.version == preCtas + 1)
    assert(spark.sql("SELECT count(*) FROM cor.ops.c").head.getLong(0) == 5L)

    // a staged DDL inside an EXPLICITLY-open envelope buffers INTO it
    // like any other statement (it used to refuse): nothing publishes
    // until the session's commit, which lands the earlier buffered
    // write and the CTAS as ONE manifest swap
    val preEnv = graft.sources.ManifestTable.read(root).get.version
    spark.sql("CALL cor.system.begin('ops')")
    spark.sql("INSERT INTO cor.ops.c VALUES (100)")
    spark.sql("""CREATE OR REPLACE TABLE cor.ops.e
      USING graft TBLPROPERTIES ('mergeKeys'='k', 'buckets'='1')
      AS SELECT id AS k FROM range(0, 3)""")
    // read() serves the OVERLAY inside an open envelope (read-your-own-
    // writes), so "nothing published" is the DISK's version-file absence
    assert(!new File(root, s"MANIFEST.v${preEnv + 1}").exists,
      "a staged DDL published from inside an open envelope")
    spark.sql("CALL cor.system.commit('ops')")
    assert(graft.sources.ManifestTable.read(root).get.version == preEnv + 1,
      "the envelope must publish the buffered write + CTAS as ONE commit")
    assert(!new File(root, s"MANIFEST.v${preEnv + 2}").exists,
      "the envelope published more than one commit")
    assert(spark.sql("SELECT count(*) FROM cor.ops.e").head.getLong(0) == 3L)
    assert(spark.sql("SELECT count(*) FROM cor.ops.c").head.getLong(0) == 6L)

    // a FAILING staged DDL inside the envelope rewinds only ITS piece —
    // the session's earlier buffered statements still publish
    spark.sql("CALL cor.system.begin('ops')")
    spark.sql("INSERT INTO cor.ops.c VALUES (101)")
    intercept[Exception] {
      spark.sql("""CREATE OR REPLACE TABLE cor.ops.e2
        USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='1')
        AS SELECT CASE WHEN assert_true(id < 0) IS NULL THEN id END AS id
        FROM range(1, 3)""")
    }
    spark.sql("CALL cor.system.commit('ops')")
    assert(spark.sql("SELECT count(*) FROM cor.ops.c").head.getLong(0) == 7L,
      "a failed staged DDL threw away the envelope's earlier statements")
    assert(!spark.catalog.tableExists("cor.ops.e2"),
      "a failed staged DDL left its table behind in the envelope")
  }

  test("CREATE/DROP VIEW against a graft catalog: the SQL verb persists the definition, reads expand with row policies applied, cycles and typos refuse at the right time") {
    val wh = java.nio.file.Files.createTempDirectory("graft_vw").toString
    spark.conf.set("spark.sql.catalog.vw", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.vw.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS vw.ops")
    spark.sql("""CREATE TABLE vw.ops.g (id BIGINT, client STRING, v BIGINT)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2',
        'rowPolicy' = "client = graft_session_attr('client')")""")
    spark.sql("""INSERT INTO vw.ops.g VALUES
      (1, 'ACME', 10), (2, 'BETA', 20), (3, 'ACME', 30)""")
    val root = new File(wh, "ops")

    // the reference's literal verb (sql/07_ops_views.sql): CREATE OR
    // REPLACE VIEW by SQL — one manifest commit
    val pre = graft.sources.ManifestTable.read(root).get.version
    spark.sql("""CREATE OR REPLACE VIEW vw.ops.acme_totals AS
      SELECT client, sum(v) AS total FROM vw.ops.g GROUP BY client""")
    assert(graft.sources.ManifestTable.read(root).get.version == pre + 1)

    // a view is GOVERNANCE-TRANSPARENT: the underlying table's row
    // policy plants inside the expanded plan — each context sees only
    // its own rows THROUGH the view
    spark.conf.set("graft.session.client", "ACME")
    try {
      val acme = spark.sql(
        "SELECT client, total FROM vw.ops.acme_totals ORDER BY client")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(acme == Seq(("ACME", 40L)),
        s"policy not applied through the view: $acme")
      spark.conf.set("graft.session.client", "BETA")
      val beta = spark.sql(
        "SELECT client, total FROM vw.ops.acme_totals ORDER BY client")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(beta == Seq(("BETA", 20L)),
        s"stale context served through the view: $beta")
    } finally spark.conf.unset("graft.session.client")

    // view-over-view expands recursively
    spark.sql("""CREATE VIEW vw.ops.grand AS
      SELECT sum(total) AS grand FROM vw.ops.acme_totals""")
    spark.conf.set("graft.session.client", "ACME")
    try assert(spark.sql("SELECT grand FROM vw.ops.grand").head.getLong(0)
      == 40L)
    finally spark.conf.unset("graft.session.client")

    // REPLACE swaps the definition; plain CREATE refuses on an existing
    // view; a typo'd definition refuses at DECLARATION, not first read
    spark.sql("""CREATE OR REPLACE VIEW vw.ops.grand AS
      SELECT count(*) AS grand FROM vw.ops.g""")
    intercept[Exception] {
      spark.sql("CREATE VIEW vw.ops.grand AS SELECT 1 AS one")
    }
    intercept[Exception] {
      spark.sql("""CREATE VIEW vw.ops.broken AS
        SELECT no_such_col FROM vw.ops.g""")
    }
    assert(spark.sql("CALL vw.system.show_views('ops')").collect()
      .map(_.getString(0)).toSeq == Seq("acme_totals", "grand"))

    // views and tables stay distinct verbs both ways
    intercept[Exception] { spark.sql("DROP TABLE vw.ops.acme_totals") }
    assert(!spark.sql("SHOW TABLES IN vw.ops").collect()
      .map(_.getString(1)).contains("acme_totals"),
      "SHOW TABLES listed a view it cannot load")
    // a definition CYCLE refuses at read with the chain
    spark.sql("""CREATE OR REPLACE VIEW vw.ops.grand AS
      SELECT grand FROM vw.ops.grand""")
    val cyc = intercept[Exception] {
      spark.sql("SELECT * FROM vw.ops.grand").collect()
    }
    assert(cyc.getMessage.contains("cycle"),
      s"unexpected error: ${cyc.getMessage}")

    // DROP VIEW; IF EXISTS tolerates absence; the bare form refuses
    spark.sql("DROP VIEW vw.ops.grand")
    spark.sql("DROP VIEW IF EXISTS vw.ops.grand")
    intercept[Exception] { spark.sql("DROP VIEW vw.ops.grand") }

    // a declared COLUMN LIST renames the output positionally (recorded
    // as a wrapping projection, so the stored SQL stays self-contained);
    // an arity mismatch refuses at declaration
    spark.sql("""CREATE VIEW vw.ops.named (cid, amount) AS
      SELECT id, v FROM vw.ops.g""")
    assert(spark.sql("SELECT * FROM vw.ops.named").schema.fieldNames.toSeq
      == Seq("cid", "amount"), "the view column list did not rename")
    intercept[Exception] {
      spark.sql("""CREATE VIEW vw.ops.badarity (a, b, c) AS
        SELECT id, v FROM vw.ops.g""")
    }
    spark.sql("DROP VIEW vw.ops.named")

    // the procedure surface records the same entry (the extension-less
    // declaration path)
    spark.sql("""CALL vw.system.create_view('ops', 'by_client',
      'SELECT client, count(*) AS n FROM vw.ops.g GROUP BY client')""")
    spark.conf.set("graft.session.client", "BETA")
    try assert(spark.sql("SELECT n FROM vw.ops.by_client").head.getLong(0)
      == 1L)
    finally spark.conf.unset("graft.session.client")
    assert(spark.sql("CALL vw.system.drop_view('ops', 'by_client')")
      .head.getBoolean(0))
  }

  test("view definer context: relative names bind where the CREATE session pointed (incl. inside subqueries), bare view names resolve after USE, temp views shadow reads and refuse as view sources") {
    val wh = java.nio.file.Files.createTempDirectory("graft_vdc").toString
    spark.conf.set("spark.sql.catalog.dc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.dc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dc.ops")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dc.alt")
    // same-named table in BOTH namespaces — the trap the definer
    // context exists to defuse
    spark.sql("""CREATE TABLE dc.ops.t (id BIGINT, v BIGINT)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')""")
    spark.sql("INSERT INTO dc.ops.t VALUES (1, 100), (2, 200)")
    spark.sql("""CREATE TABLE dc.alt.t (id BIGINT, v BIGINT)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')""")
    spark.sql("INSERT INTO dc.alt.t VALUES (7, 777)")
    spark.sql("""CREATE TABLE dc.ops.s (id BIGINT)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')""")
    spark.sql("INSERT INTO dc.ops.s VALUES (1)")

    try {
      spark.sql("USE dc.ops")
      // stored under dc.ALT, declared while the session pointed at
      // dc.OPS: the definer context is the SESSION's, so the bare `t`
      // must bind dc.ops.t — the namespace the validation analyzed
      // against — not the same-named dc.alt.t next to the view
      spark.sql("""CREATE VIEW dc.alt.crossns AS
        SELECT sum(v) AS sv FROM t""")
      // relative names INSIDE subquery expressions qualify the same way
      spark.sql("""CREATE VIEW dc.ops.subq AS
        SELECT id, v FROM t WHERE id IN (SELECT id FROM s)""")
      // a bare single-part name resolves against the current
      // catalog+namespace after USE
      assert(spark.sql("SELECT id, v FROM subq").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 100L)),
        "bare view name did not resolve after USE dc.ops")
      // ... but a session TEMP VIEW always shadows the bare name
      spark.range(1).selectExpr("id AS shadow_probe")
        .createOrReplaceTempView("subq")
      try assert(spark.sql("SELECT * FROM subq").schema.fieldNames.toSeq
        == Seq("shadow_probe"), "graft view shadowed a temp view")
      finally spark.catalog.dropTempView("subq")
      // a view defined over a TEMP VIEW refuses at declaration — it
      // would validate against session state the reader doesn't have
      spark.range(3).createOrReplaceTempView("ephemeral")
      try intercept[Exception] {
        spark.sql("CREATE VIEW dc.ops.overtmp AS SELECT * FROM ephemeral")
      } finally spark.catalog.dropTempView("ephemeral")
    } finally spark.sql("USE spark_catalog.default")

    // read from a DIFFERENT context: both views still bind the tables
    // their definitions validated against
    assert(spark.sql("SELECT sv FROM dc.alt.crossns").head.getLong(0)
      == 300L, "definer context lost: bare `t` re-bound under the reader")
    assert(spark.sql("SELECT id, v FROM dc.ops.subq").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 100L)),
      "subquery relation re-bound under the reader's context")

    // a cycle reached ONLY through a subquery expression still refuses
    spark.sql("""CREATE VIEW dc.ops.cyc AS
      SELECT id FROM dc.ops.t""")
    spark.sql("""CREATE OR REPLACE VIEW dc.ops.cyc AS
      SELECT id FROM dc.ops.t
      WHERE id IN (SELECT id FROM dc.ops.cyc)""")
    val cyc = intercept[Exception] {
      spark.sql("SELECT * FROM dc.ops.cyc").collect()
    }
    assert(cyc.getMessage.contains("cycle"),
      s"subquery-only cycle not detected: ${cyc.getMessage}")
  }

  test("view definer namespace with a dotted part round-trips: a view declared under USE cat.`x.y` still binds its bare names there on read") {
    val wh = java.nio.file.Files.createTempDirectory("graft_vdd").toString
    spark.conf.set("spark.sql.catalog.dcd", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.dcd.warehouse", wh)
    // a namespace whose single PART contains '.' — legal via backticks;
    // the old dot-joined definer record mis-split it into two parts
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dcd.`x.y`")
    spark.sql("""CREATE TABLE dcd.`x.y`.t (id BIGINT, v BIGINT)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')""")
    spark.sql("INSERT INTO dcd.`x.y`.t VALUES (1, 100), (2, 200)")
    try {
      spark.sql("USE dcd.`x.y`")
      spark.sql("""CREATE VIEW dcd.`x.y`.dotted AS
        SELECT sum(v) AS sv FROM t""")
    } finally spark.sql("USE spark_catalog.default")
    // read from a different context: the bare `t` must re-qualify to
    // dcd.`x.y`.t (one dotted part), never dcd.x.y.t (two parts)
    assert(spark.sql("SELECT sv FROM dcd.`x.y`.dotted").head.getLong(0)
      == 300L, "dotted definer namespace part mis-split on read")
  }

  test("SHOW VIEWS and DESCRIBE VIEW: the SQL verbs list and describe stored graft views (patterns, temp views, EXTENDED block), tables keep their own DESCRIBE path") {
    val wh = java.nio.file.Files.createTempDirectory("graft_sdv").toString
    spark.conf.set("spark.sql.catalog.sdv", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.sdv.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS sdv.ops")
    spark.sql("""CREATE TABLE sdv.ops.t (id BIGINT, v BIGINT)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')""")
    spark.sql("INSERT INTO sdv.ops.t VALUES (1, 10)")
    spark.sql("CREATE VIEW sdv.ops.v_tot AS SELECT sum(v) AS sv FROM sdv.ops.t")
    spark.sql("CREATE VIEW sdv.ops.v_ids AS SELECT id FROM sdv.ops.t")

    // SHOW VIEWS IN <catalog>.<ns> — stored views, not tables
    val listed = spark.sql("SHOW VIEWS IN sdv.ops").collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSeq
    assert(listed.filterNot(_._3) ==
      Seq(("ops", "v_ids", false), ("ops", "v_tot", false)),
      s"SHOW VIEWS wrong: $listed")
    // LIKE pattern filters ('*' glob, '|' alternation)
    assert(spark.sql("SHOW VIEWS IN sdv.ops LIKE 'v_t*'").collect()
      .map(_.getString(1)).toSeq == Seq("v_tot"))
    // a temp view rides the listing flagged temporary, Spark's contract
    spark.range(1).createOrReplaceTempView("sdv_tmp")
    try assert(spark.sql("SHOW VIEWS IN sdv.ops LIKE 'sdv_tmp'").collect()
      .map(r => (r.getString(1), r.getBoolean(2))).toSeq
      == Seq(("sdv_tmp", true)))
    finally spark.catalog.dropTempView("sdv_tmp")
    // bare SHOW VIEWS after USE (stored rows only — the shared test
    // session carries other suites' temp views, correctly listed too)
    try {
      spark.sql("USE sdv.ops")
      assert(spark.sql("SHOW VIEWS").collect()
        .filterNot(_.getBoolean(2)).map(_.getString(1)).toSeq
        == Seq("v_ids", "v_tot"))
    } finally spark.sql("USE spark_catalog.default")

    // DESCRIBE a view: the recorded output schema
    val desc = spark.sql("DESCRIBE sdv.ops.v_tot").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(desc == Seq(("sv", "bigint")), s"DESCRIBE VIEW wrong: $desc")
    // EXTENDED appends the view-information block with the stored text
    val ext = spark.sql("DESCRIBE EXTENDED sdv.ops.v_tot").collect()
      .map(_.getString(0)).toSeq
    assert(ext.contains("# View Information") && ext.contains("View Text"))
    val text = spark.sql("DESCRIBE EXTENDED sdv.ops.v_tot").collect()
      .find(_.getString(0) == "View Text").get.getString(1)
    assert(text.contains("sum(v)"), s"stored text wrong: $text")
    // DESCRIBE on a graft TABLE keeps Spark's own path
    val tdesc = spark.sql("DESCRIBE sdv.ops.t").collect()
      .map(_.getString(0)).toSeq
    assert(tdesc.contains("id") && tdesc.contains("v"))

    // ALTER VIEW SET/UNSET TBLPROPERTIES maintains properties (the
    // stored SQL stays immutable — replace to change the definition)
    spark.sql(
      "ALTER VIEW sdv.ops.v_tot SET TBLPROPERTIES ('team' = 'ops')")
    def vprops(): Map[String, String] = {
      val m = spark.sessionState.catalogManager.catalog("sdv")
        .asInstanceOf[GraftCatalog]
        .loadView(org.apache.spark.sql.connector.catalog.Identifier.of(
          Array("ops"), "v_tot")).properties()
      val it = m.entrySet().iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
      b.result()
    }
    assert(vprops().get("team").contains("ops"))
    spark.sql("ALTER VIEW sdv.ops.v_tot UNSET TBLPROPERTIES ('team')")
    assert(!vprops().contains("team"))
    // UNSET without IF EXISTS refuses a missing key; IF EXISTS ignores
    intercept[Exception] {
      spark.sql("ALTER VIEW sdv.ops.v_tot UNSET TBLPROPERTIES ('nope')")
    }
    spark.sql(
      "ALTER VIEW sdv.ops.v_tot UNSET TBLPROPERTIES IF EXISTS ('nope')")
    // a temp view's ALTER keeps Spark's own path (refused there — temp
    // views carry no catalog properties)
    spark.range(1).createOrReplaceTempView("sdv_alt_tmp")
    try intercept[Exception] {
      spark.sql("ALTER VIEW sdv_alt_tmp SET TBLPROPERTIES ('x' = '1')")
    } finally spark.catalog.dropTempView("sdv_alt_tmp")

    // SHOW CREATE TABLE on a view renders a re-runnable CREATE VIEW
    // with the stored text; on a graft TABLE the existing round-trip
    // path keeps serving
    spark.sql(
      "ALTER VIEW sdv.ops.v_tot SET TBLPROPERTIES ('team' = 'ops')")
    val ddl = spark.sql("SHOW CREATE TABLE sdv.ops.v_tot")
      .head.getString(0)
    assert(ddl.startsWith("CREATE VIEW sdv.ops.v_tot") &&
      ddl.contains("sum(v)") && ddl.contains("'team' = 'ops'"),
      s"view DDL wrong:\n$ddl")
    assert(spark.sql("SHOW CREATE TABLE sdv.ops.t").head.getString(0)
      .contains("CREATE TABLE"), "table SHOW CREATE path broken")

    // DESCRIBE freshness: a `SELECT *` view's reads re-analyze the
    // stored text, so an underlying ADD COLUMNS surfaces the new column
    // in SELECT — DESCRIBE must agree with the reader, not with the
    // CREATE-time snapshot
    spark.sql("CREATE VIEW sdv.ops.v_star AS SELECT * FROM sdv.ops.t")
    assert(spark.sql("DESCRIBE sdv.ops.v_star").collect()
      .map(_.getString(0)).toSeq == Seq("id", "v"))
    spark.sql("ALTER TABLE sdv.ops.t ADD COLUMNS (w BIGINT)")
    assert(spark.sql("SELECT * FROM sdv.ops.v_star").schema.fieldNames
      .toSeq == Seq("id", "v", "w"), "SELECT * view missed ADD COLUMNS")
    assert(spark.sql("DESCRIBE sdv.ops.v_star").collect()
      .map(_.getString(0)).toSeq == Seq("id", "v", "w"),
      "DESCRIBE VIEW served the stale CREATE-time schema")
  }

  test("TRUNCATE TABLE and bare DELETE FROM: one logical commit each, pre-truncate snapshots stay travelable") {
    val wh = java.nio.file.Files.createTempDirectory("graft_trc").toString
    spark.conf.set("spark.sql.catalog.trc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.trc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS trc.ops")
    spark.sql("""CREATE TABLE trc.ops.t (id BIGINT, v BIGINT)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')""")
    spark.sql("INSERT INTO trc.ops.t VALUES (1, 10), (2, 20), (3, 30)")
    val root = new File(wh, "ops")
    val full = graft.sources.ManifestTable.read(root).get.version

    spark.sql("TRUNCATE TABLE trc.ops.t")
    assert(spark.sql("SELECT count(*) FROM trc.ops.t").head.getLong(0) == 0L)
    // a logical delete, not an erase: the old snapshot still serves
    assert(spark.sql(
      s"SELECT count(*) FROM trc.ops.t VERSION AS OF $full")
      .head.getLong(0) == 3L, "TRUNCATE erased retained history")

    // bare DELETE FROM (no WHERE) is the same verb through SQL DELETE
    spark.sql("INSERT INTO trc.ops.t VALUES (4, 40), (5, 50)")
    val pre = graft.sources.ManifestTable.read(root).get.version
    spark.sql("DELETE FROM trc.ops.t")
    assert(spark.sql("SELECT count(*) FROM trc.ops.t").head.getLong(0) == 0L)
    assert(graft.sources.ManifestTable.read(root).get.version == pre + 1,
      "bare DELETE took more than one commit")
  }
}
