package graft

import java.io.File
import java.nio.file.{Files, Path, Paths}

import graft.ingest.{CanonicalChain, Canonicalizer, HeaderNormalizer}
import graft.sources.{FileIngest, ManifestTable}
import graft.streaming.CanonicalStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end canonical pipeline (VERDICT r3 #1/#7): the streaming
  * file-source job and the batch incremental maintainer must both converge
  * the stored ManifestTable canonical tables to EXACTLY what the one-shot
  * batch chain derives over the same landed files — including across a
  * second incremental drop that updates survivorship groups committed by
  * the first.
  */
class CanonicalStreamSpec extends SparkSpec {

  /** Write synthesized raw payloads out as real landing-zone files with
    * strictly increasing, distinct mtimes (ingest_ts must totally order
    * survivorship across files; same-second mtimes would make the latest-
    * wins tie-break nondeterministic between independent recomputes).
    * Returns file name → path.
    */
  private def writeFiles(dir: Path, raws: Seq[(String, Long, String)],
      mtimeBase: Long): Map[String, Path] = {
    Files.createDirectories(dir)
    raws.groupBy(_._1).toSeq.sortBy(_._1).zipWithIndex.map {
      case ((srcFile, rows), i) =>
        val name = srcFile.replace('/', '_')
        val p = Paths.get(dir.toString, name)
        val body = rows.sortBy(_._2).map(_._3).mkString("\n")
        Files.write(p, body.getBytes("UTF-8"))
        assert(p.toFile.setLastModified(mtimeBase + i * 1000L))
        name -> p
    }.toMap
  }

  private def payloads(df: DataFrame): Seq[(String, Long, String)] =
    df.select(col("src_file"), col("src_row_number"),
        col("payload").cast("string"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.getString(2)).getOrElse("")))
      .toSeq

  // CSV payloads are positional arrays — land them as comma-joined lines
  // (the exact inverse of FileIngest.csvPayload)
  private def csvPayloads(df: DataFrame): Seq[(String, Long, String)] =
    payloads(df.withColumn("payload", array_join(col("payload"), ",")))

  /** The one-shot batch chain over the landed files — the oracle both
    * incremental paths must hash-equal.
    */
  private def batchChain(jsonDir: Path, xmlDir: Path, csvDir: Path)
      : (DataFrame, DataFrame, DataFrame) = {
    val staged = CanonicalChain.unionHeaders(
      HeaderNormalizer.fromJson(FileIngest.jsonLines(spark, jsonDir.toString)),
      HeaderNormalizer.fromXml(FileIngest.xmlLines(spark, xmlDir.toString)),
      HeaderNormalizer.fromCsv(FileIngest.csvLines(spark, csvDir.toString)))
    val surv = Canonicalizer.survivors(staged)
    val lines = CanonicalChain.linesFrom(surv)
    (CanonicalChain.headerModel(surv), CanonicalChain.lineModel(lines),
      CanonicalChain.anomaliesFrom(surv, lines))
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Two landing drops engineered so survivorship groups SPAN them:
    * drop 1 = all JSON + even-indexed XML files, drop 2 = the rest (the
    * pair = orderkey DIV 2 synthesis guarantees cross-format duplicate
    * keys, so drop 2 updates groups drop 1 already committed).
    */
  private def twoDrops(base: Path): (Seq[() => Unit], Seq[() => Unit]) = {
    val jsonDir = base.resolve("json"); val xmlDir = base.resolve("xml")
    val csvDir = base.resolve("csv")
    Seq(jsonDir, xmlDir, csvDir).foreach(Files.createDirectories(_))
    val json = payloads(ingest.RawSynth.jsonRaw(spark, sf))
    val xml = payloads(ingest.RawSynth.xmlRaw(spark, sf))
    val csv = csvPayloads(ingest.RawSynth.csvRaw(spark, sf))
    val xmlFiles = xml.map(_._1).distinct.sorted
    val xmlEarly = xmlFiles.zipWithIndex.filter(_._2 % 2 == 0).map(_._1).toSet
    val t0 = 1700000000000L
    val drop1 = Seq(
      () => { writeFiles(jsonDir, json, t0); () },
      () => { writeFiles(xmlDir,
        xml.filter(r => xmlEarly(r._1)), t0 + 100000L); () })
    val drop2 = Seq(
      () => { writeFiles(xmlDir,
        xml.filterNot(r => xmlEarly(r._1)), t0 + 200000L); () },
      () => { writeFiles(csvDir, csv, t0 + 300000L); () })
    (drop1, drop2)
  }

  test("streaming canonical pipeline converges to the batch chain across two incremental drops") {
    val base = Files.createTempDirectory("graft_canstream")
    val jsonDir = base.resolve("json"); val xmlDir = base.resolve("xml")
    val csvDir = base.resolve("csv")
    val (drop1, drop2) = twoDrops(base)
    val root = base.resolve("table").toString
    val ckpt = base.resolve("ckpt").toString

    def drain(): Unit = {
      val q = CanonicalStream.start(spark, jsonDir.toString, xmlDir.toString,
        csvDir.toString, root, ckpt)
      // generous budget: the drain is seconds of work, but a loaded box
      // has been observed to stretch it past five minutes
      try assert(q.awaitTermination(900000), "AvailableNow run did not stop")
      finally q.stop()
    }

    drop1.foreach(_.apply())
    drain()
    val headerAfter1 = CanonicalStream.canTxn(spark, root)
      .select("canonical_txn_id", "source_system", "dup_cnt")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(headerAfter1.nonEmpty)

    drop2.foreach(_.apply())
    drain()

    val (expHdr, expLine, expAnom) = batchChain(jsonDir, xmlDir, csvDir)
    assert(canon(CanonicalStream.canTxn(spark, root)) == canon(expHdr))
    assert(canon(CanonicalStream.canTxnLine(spark, root)) == canon(expLine))
    assert(canon(CanonicalStream.canTxnAnomaly(spark, root)) == canon(expAnom))
    assert(expHdr.count() > 0 && expLine.count() > 0 && expAnom.count() > 0)

    // drop 2 must have UPDATED groups drop 1 already committed (cross-batch
    // survivorship maintenance, not just appends): some canonical id kept
    // from run 1 changed its surviving source or dup count
    val headerAfter2 = CanonicalStream.canTxn(spark, root)
      .select("canonical_txn_id", "source_system", "dup_cnt")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    val changed = headerAfter1.keySet.intersect(headerAfter2.keySet)
      .count(k => headerAfter1(k) != headerAfter2(k))
    assert(changed > 0, "no survivorship group spanned the two drops")
  }

  test("batch incremental maintenance reads only fresh files and equals a from-scratch rebuild") {
    val base = Files.createTempDirectory("graft_caninc")
    val jsonDir = base.resolve("json"); val xmlDir = base.resolve("xml")
    val csvDir = base.resolve("csv")
    val (drop1, drop2) = twoDrops(base)
    val dirs = Map("JSON" -> jsonDir.toString, "XML" -> xmlDir.toString,
      "CSV" -> csvDir.toString)
    val root = new File(base.toFile, "table")

    drop1.foreach(_.apply())
    val inc1 = CanonicalStream.ingestIncrement(spark, dirs, root)
    assert(inc1.newFiles.values.flatten.nonEmpty && inc1.skippedFiles.isEmpty)
    val v1 = ManifestTable.read(root).get.version

    drop2.foreach(_.apply())
    val inc2 = CanonicalStream.ingestIncrement(spark, dirs, root)
    // only the NEW files are read; everything from drop 1 is skipped via
    // the committed ledger (file-granularity pushdown, zero old bytes)
    assert(inc2.skippedFiles.values.flatten.toSet ==
      inc1.newFiles.values.flatten.toSet)
    assert(inc2.newFiles.values.flatten.nonEmpty)
    assert(inc2.newFiles.values.flatten.toSet
      .intersect(inc1.newFiles.values.flatten.toSet).isEmpty)

    // the published grains carry a change feed: rolling each table's
    // drop-1 snapshot forward through the feed reproduces the live table
    // exactly — including the LINE grain, whose several rows per
    // canonical id exercise the group-replacement reconstruction rule
    for (t <- Seq(CanonicalStream.HeaderTable, CanonicalStream.LineTable,
        CanonicalStream.AnomalyTable)) {
      val snap = ManifestTable.readTable(spark, root.toString,
        version = Some(v1), table = t)
      val feed = ManifestTable.readChangeFeed(spark, root.toString, v1 + 1,
        table = t)
      val rolled = ManifestTable.applyChanges(snap, feed,
        Seq("canonical_txn_id"))
      assert(canon(rolled) ==
        canon(ManifestTable.readTable(spark, root.toString, table = t)),
        s"table $t: CDF roll-forward diverged from the live snapshot")
    }

    // a third run over the unchanged landing zone is an exact no-op
    val vBefore = ManifestTable.read(root).get.version
    val inc3 = CanonicalStream.ingestIncrement(spark, dirs, root)
    assert(inc3.newFiles.isEmpty)
    assert(ManifestTable.read(root).get.version == vBefore)

    // the incrementally-maintained tables hash-equal a from-scratch rebuild
    val scratch = new File(base.toFile, "scratch")
    CanonicalStream.ingestIncrement(spark, dirs, scratch)
    for (t <- Seq(CanonicalStream.HeaderTable, CanonicalStream.LineTable,
        CanonicalStream.AnomalyTable)) {
      val a = canon(ManifestTable.readTable(spark, root.toString, table = t))
      val b = canon(ManifestTable.readTable(spark, scratch.toString, table = t))
      assert(a == b && a.nonEmpty, s"table $t diverged from scratch rebuild")
    }
    // and the batch chain over the same files agrees (shared-chain parity)
    val (expHdr, _, _) = batchChain(jsonDir, xmlDir, csvDir)
    assert(canon(ManifestTable.readTable(spark, root.toString,
      table = CanonicalStream.HeaderTable)) == canon(expHdr))

    // fresh-checkpoint replay: the SAME files arrive again under a new
    // query identity with batch ids reset to 0 (the scenario the
    // (queryId,batchId) logic deliberately does NOT skip). The row-identity
    // dedup + replace-by-group staging must make it a semantic no-op —
    // no doubled dup_cnt, no duplicated staging rows, tables unchanged.
    val replayStaged = CanonicalChain.unionHeaders(
      HeaderNormalizer.fromJson(FileIngest.jsonLines(spark, jsonDir.toString)),
      HeaderNormalizer.fromXml(FileIngest.xmlLines(spark, xmlDir.toString)),
      HeaderNormalizer.fromCsv(FileIngest.csvLines(spark, csvDir.toString)))
    CanonicalStream.maintainBatch(root, "fresh-ckpt-replay", 0L, replayStaged)
    assert(canon(ManifestTable.readTable(spark, root.toString,
      table = CanonicalStream.HeaderTable)) == canon(expHdr))
    val staging = ManifestTable.readTable(spark, root.toString,
      table = CanonicalStream.StagingTable)
    assert(staging.groupBy("src_file", "src_row_number").count()
      .filter(col("count") > 1).count() == 0, "replay duplicated staging rows")
  }

  test("a single-group increment rewrites only that group's buckets") {
    val base = Files.createTempDirectory("graft_canone")
    val jsonDir = base.resolve("json"); val xmlDir = base.resolve("xml")
    val csvDir = base.resolve("csv")
    val (drop1, drop2) = twoDrops(base)
    val dirs = Map("JSON" -> jsonDir.toString, "XML" -> xmlDir.toString,
      "CSV" -> csvDir.toString)
    val root = new File(base.toFile, "table")
    drop1.foreach(_.apply()); drop2.foreach(_.apply())
    CanonicalStream.ingestIncrement(spark, dirs, root)

    def dataFiles(): Set[String] = {
      def walk(f: File): Seq[File] =
        if (f.isDirectory) f.listFiles.flatMap(walk).toSeq else Seq(f)
      val data = new File(root, "data")
      walk(data).map(_.getPath.stripPrefix(root.getPath)).toSet
    }
    val before = dataFiles()

    // one new file, one brand-new group (C7, TXN990001)
    val p = Paths.get(jsonDir.toString, "client_7_extra.json")
    Files.write(p, ("{\"transaction_id\":\"TXN990001\"," +
      "\"transaction_ts\":\"1995-01-01\",\"currency\":\"USD\"," +
      "\"total_amount\":10.00,\"customer_id\":\"CUST7\"}").getBytes("UTF-8"))
    assert(p.toFile.setLastModified(1700009999000L))
    val inc = CanonicalStream.ingestIncrement(spark, dirs, root)
    assert(inc.newFiles == Map("JSON" -> Seq("client_7_extra.json")))

    val groupBucket = spark.range(1).select(
      pmod(xxhash64(lit("C7"), lit("TXN990001")),
        lit(CanonicalStream.Buckets))).head.getLong(0)
    val idBucket = spark.range(1).select(
      pmod(xxhash64(sha2(concat(lit("C7"), lit("|"), lit("TXN990001")), 256)),
        lit(CanonicalStream.Buckets))).head.getLong(0)
    val auditBucket = spark.range(1).select(
      pmod(xxhash64(lit("client_7_extra.json")),
        lit(CanonicalStream.Buckets))).head.getLong(0)
    val allowed = Seq(
      s"/data/${CanonicalStream.StagingTable}/b$groupBucket-",
      s"/data/${CanonicalStream.HeaderTable}/b$idBucket-",
      s"/data/${CanonicalStream.LineTable}/b$idBucket-",
      s"/data/${CanonicalStream.AnomalyTable}/b$idBucket-",
      s"/data/${CanonicalStream.LedgerTable}/b0-",
      // the one new file's audit row lands in exactly its bucket
      s"/data/${CanonicalStream.AuditTable}/b$auditBucket-",
      // the commit's change-feed deltas are per-commit dirs, not bucket
      // rewrites — expected, and checked below to hold ONLY the new group
      s"/data/${CanonicalStream.HeaderTable}/chg-",
      s"/data/${CanonicalStream.LineTable}/chg-",
      s"/data/${CanonicalStream.AnomalyTable}/chg-",
      s"/data/${CanonicalStream.AuditTable}/chg-")
    val added = dataFiles() -- before
    assert(added.nonEmpty)
    val stray = added.filterNot(a => allowed.exists(a.startsWith))
    assert(stray.isEmpty, s"increment touched unrelated buckets: $stray")

    // the increment's feed delta carries exactly the one new group
    val v = ManifestTable.read(root).get.version
    val delta = ManifestTable.readChangeFeed(spark, root.toString, v,
      table = CanonicalStream.HeaderTable).collect()
    assert(delta.length == 1 &&
      delta.head.getAs[String]("source_txn_id") == "TXN990001" &&
      delta.head.getAs[String](ManifestTable.ChangeTypeCol) == "insert")

    // the new group is live and correct in the committed table
    val row = ManifestTable.readTable(spark, root.toString,
      table = CanonicalStream.HeaderTable)
      .filter(col("client_id") === "C7").collect()
    assert(row.length == 1 && row.head.getAs[String]("source_txn_id") == "TXN990001")
  }

  test("ops views run as CDF-fed marts, equal to the batch aggregates after every incremental drop") {
    import graft.streaming.OpsMarts
    val base = Files.createTempDirectory("graft_opsmart")
    val jsonDir = base.resolve("json"); val xmlDir = base.resolve("xml")
    val csvDir = base.resolve("csv")
    val (drop1, drop2) = twoDrops(base)
    val dirs = Map("JSON" -> jsonDir.toString, "XML" -> xmlDir.toString,
      "CSV" -> csvDir.toString)
    val root = new File(base.toFile, "table")
    val martRoot = base.resolve("marts").toString
    val ckpt = base.resolve("mart_ckpt").toString

    // after each sync, every mart must equal the reference view's batch
    // aggregate (sql/07_ops_views.sql) over the LIVE canonical tables
    def checkMarts(): Unit = {
      OpsMarts.syncAll(spark, root.toString, martRoot, ckpt)
      val expCanon = CanonicalStream.canTxn(spark, root.toString)
        .groupBy("client_id", "source_system")
        .agg(count(lit(1)).as("txn_count"),
          sum(when(col("is_valid"), 1L).otherwise(0L)).as("valid_txn_count"),
          sum(when(col("is_valid"), 0L).otherwise(1L)).as("invalid_txn_count"))
      assert(canon(OpsMarts.canonCounts(spark, martRoot)) == canon(expCanon),
        "VW_CANON_COUNTS mart diverged")
      val expAnom = CanonicalStream.canTxnAnomaly(spark, root.toString)
        .groupBy("client_id", "source_system", "anomaly_code")
        .agg(count(lit(1)).as("anomaly_count"))
      assert(canon(OpsMarts.anomalyCounts(spark, martRoot)) == canon(expAnom),
        "VW_ANOMALY_COUNTS mart diverged")
      val expAudit = ManifestTable.readTable(spark, root.toString,
          table = CanonicalStream.AuditTable)
        .groupBy("file_type", "load_status")
        .agg(count(lit(1)).as("batch_count"),
          sum("rows_parsed").as("total_rows_parsed"),
          sum("rows_loaded").as("total_rows_loaded"),
          sum("errors_seen").as("total_errors_seen"),
          max("load_ts").as("latest_load_ts"))
      assert(canon(OpsMarts.loadAuditSummary(spark, martRoot))
        == canon(expAudit), "VW_LOAD_AUDIT_SUMMARY mart diverged")
    }

    drop1.foreach(_.apply())
    CanonicalStream.ingestIncrement(spark, dirs, root)
    val validBefore = CanonicalStream.canTxn(spark, root.toString)
      .select("canonical_txn_id", "is_valid")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    checkMarts()

    drop2.foreach(_.apply())
    CanonicalStream.ingestIncrement(spark, dirs, root)
    checkMarts()

    // the second drop must have MIGRATED some txn across valid/invalid
    // (drop-2 duplicates flip DUPLICATE_TXN on drop-1 survivors): the
    // canon-counts mart absorbed a preimage/postimage pair that moved a
    // row between the valid and invalid sums, not just fresh inserts
    val validAfter = CanonicalStream.canTxn(spark, root.toString)
      .select("canonical_txn_id", "is_valid")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    val migrated = validBefore.keySet.intersect(validAfter.keySet)
      .count(k => validBefore(k) != validAfter(k))
    assert(migrated > 0, "no txn migrated across valid/invalid between drops")

    // a fresh-checkpoint replay of ALL files upserts identical rows: the
    // feeds carry identical preimage/postimage pairs (and audit
    // retractions drive the max-recompute path) — every mart must come
    // through unchanged and still exact
    val replayStaged = CanonicalChain.unionHeaders(
      HeaderNormalizer.fromJson(FileIngest.jsonLines(spark, jsonDir.toString)),
      HeaderNormalizer.fromXml(FileIngest.xmlLines(spark, xmlDir.toString)),
      HeaderNormalizer.fromCsv(FileIngest.csvLines(spark, csvDir.toString)))
    CanonicalStream.maintainBatch(root, "mart-replay", 0L, replayStaged)
    checkMarts()
  }
}
