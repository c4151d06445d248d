package graft

import java.io.File

import graft.sources.{GraftCatalog, ManifestTable}

/** The multi-statement transaction envelope (`CALL graft.system.begin /
  * commit / rollback`, Scala `ManifestTable.transaction`) — the
  * reference runbook's one-session semantics: consecutive verbs land as
  * ONE manifest swap, later statements read earlier statements' writes,
  * a crash or rollback publishes nothing, and a conflicting external
  * commit aborts the whole envelope. Plus zero-copy CLONE: a
  * pure-metadata commit sharing the source's generation dirs, with
  * reference-aware GC.
  */
class TransactionSpec extends SparkSpec {

  private def catalog(name: String): String = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft_$name").toString
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    wh
  }

  test("begin/commit: three MERGEs publish as ONE version, read-your-writes inside, nothing on disk before commit") {
    val wh = catalog("txn1")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS txn1.canon")
    for (t <- Seq("hdr", "line", "anom"))
      spark.sql(s"""CREATE TABLE txn1.canon.$t (id BIGINT, v DOUBLE)
        USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')""")
    val root = new File(wh, "canon")
    val vBase = ManifestTable.read(root).get.version

    spark.sql("CALL txn1.system.begin('canon')")
    // the runbook shape: header merge, then a line merge derived from
    // the header rows THIS transaction wrote (read-your-own-writes),
    // then the anomaly grain
    spark.sql("""MERGE INTO txn1.canon.hdr t
      USING (SELECT id, cast(id as double) AS v FROM range(10)) s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET t.v = s.v
      WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""")
    spark.sql("""MERGE INTO txn1.canon.line t
      USING (SELECT id, v * 2 AS v FROM txn1.canon.hdr) s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET t.v = s.v
      WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""")
    spark.sql("""MERGE INTO txn1.canon.anom t
      USING (SELECT id, v FROM txn1.canon.line WHERE v >= 10) s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET t.v = s.v
      WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""")

    // read-your-writes confirmed by the line derivation; meanwhile the
    // DISK still holds only the base state — no version files landed
    assert(spark.sql("SELECT count(*) FROM txn1.canon.line")
      .head.getLong(0) == 10L)
    assert(!new File(root, s"MANIFEST.v${vBase + 1}").exists,
      "an open envelope must publish nothing")

    val committed = spark.sql("CALL txn1.system.commit('canon')")
      .head.getLong(0)
    assert(committed == vBase + 1,
      s"three MERGEs must publish as ONE version, got $committed")
    assert(ManifestTable.read(root).get.version == vBase + 1)

    // one history entry for the whole envelope
    val hist = ManifestTable.history(spark, root).collect()
    assert(hist.head.getLong(0) == vBase + 1)
    assert(hist.head.getString(1).startsWith("TXN:"),
      s"envelope commit op wrong: ${hist.head.getString(1)}")
    assert(hist.head.getSeq[String](3).toSet == Set("hdr", "line", "anom"))

    // and the published state is the full three-table result
    assert(spark.sql("SELECT count(*) FROM txn1.canon.hdr")
      .head.getLong(0) == 10L)
    assert(spark.sql("SELECT count(*) FROM txn1.canon.anom")
      .head.getLong(0) == 5L)
  }

  test("rollback (the crash path) publishes nothing; a conflicting external commit aborts the envelope") {
    val wh = catalog("txn2")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS txn2.ops")
    spark.sql("""CREATE TABLE txn2.ops.t (id BIGINT, v DOUBLE)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')""")
    spark.sql("INSERT INTO txn2.ops.t SELECT id, 1.0 FROM range(5)")
    val root = new File(wh, "ops")
    val vBase = ManifestTable.read(root).get.version

    // crash mid-script ≡ the envelope never commits: rollback
    spark.sql("CALL txn2.system.begin('ops')")
    spark.sql("UPDATE txn2.ops.t SET v = -1.0 WHERE id = 0")
    assert(spark.sql("SELECT v FROM txn2.ops.t WHERE id = 0")
      .head.getDouble(0) == -1.0) // visible inside the envelope
    assert(spark.sql("CALL txn2.system.rollback('ops')").head.getBoolean(0))
    assert(ManifestTable.read(root).get.version == vBase,
      "rollback must leave the disk untouched")
    assert(spark.sql("SELECT v FROM txn2.ops.t WHERE id = 0")
      .head.getDouble(0) == 1.0, "rolled-back write leaked")

    // conflicting external commit: simulate another PROCESS winning the
    // version by dropping a file at the envelope's commit point
    ManifestTable.begin(root)
    spark.sql("UPDATE txn2.ops.t SET v = -2.0 WHERE id = 1")
    val winner = new File(root, s"MANIFEST.v${vBase + 1}")
    java.nio.file.Files.write(winner.toPath,
      "{}".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val err = intercept[Exception] { ManifestTable.commitTxn(root) }
    assert(err.getMessage.contains("NOTHING was published"),
      s"conflict must abort loudly: ${err.getMessage}")
    java.nio.file.Files.delete(winner.toPath) // clean the fake winner
    assert(spark.sql("SELECT v FROM txn2.ops.t WHERE id = 1")
      .head.getDouble(0) == 1.0, "aborted envelope leaked a write")
  }

  test("transaction{} with an active change feed: the envelope's deltas serve as ONE commit version") {
    val wh = catalog("txn3")
    val root = new File(wh, "ops")
    root.mkdirs()
    import spark.implicits._
    (0L until 10L).map(i => (i, i.toDouble)).toDF("id", "v")
      .write.format("graft").option("path", root.toString)
      .option("table", "t").option("mergeKeys", "id")
      .option("changeFeed", "true").mode("append").save()
    val vBase = ManifestTable.read(root).get.version

    ManifestTable.transaction(root) {
      (10L until 12L).map(i => (i, i.toDouble)).toDF("id", "v")
        .write.format("graft").option("path", root.toString)
        .option("table", "t").option("mergeKeys", "id")
        .option("changeFeed", "true").mode("append").save()
      (12L until 13L).map(i => (i, i.toDouble)).toDF("id", "v")
        .write.format("graft").option("path", root.toString)
        .option("table", "t").option("mergeKeys", "id")
        .option("changeFeed", "true").mode("append").save()
    }
    assert(ManifestTable.read(root).get.version == vBase + 1)
    val feed = ManifestTable
      .readChangeFeed(spark, root.toString, vBase + 1, None, "t")
    assert(feed.count() == 3L)
    // every envelope delta is stamped with the ONE published version
    assert(feed.select(ManifestTable.CommitVersionCol).distinct()
      .collect().map(_.getLong(0)).toSeq == Seq(vBase + 1))
  }

  test("zero-copy CLONE: metadata-only, pinned-version reads, independent evolution, reference-aware GC") {
    val wh = catalog("txn4")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS txn4.ops")
    spark.sql("""CREATE TABLE txn4.ops.src (id BIGINT, v DOUBLE)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')""")
    spark.sql("INSERT INTO txn4.ops.src SELECT id, 1.0 FROM range(100)")
    val root = new File(wh, "ops")
    val vPin = ManifestTable.read(root).get.version
    val srcGens =
      ManifestTable.read(root).get.table("src").gens.map(_.path).toSet

    // clone at the pinned version; -1 sentinel = current
    spark.sql(s"CALL txn4.system.clone('ops', 'src', 'dev', ${vPin}L)")
    val cloneGens =
      ManifestTable.read(root).get.table("dev").gens.map(_.path).toSet
    assert(cloneGens == srcGens, "clone must share the source's dirs")
    assert(spark.sql("SELECT count(*) FROM txn4.ops.dev")
      .head.getLong(0) == 100L)

    // independent evolution: writes to either side leave the other
    spark.sql("UPDATE txn4.ops.dev SET v = 2.0 WHERE id < 50")
    spark.sql("DELETE FROM txn4.ops.src WHERE id >= 90")
    assert(spark.sql("SELECT sum(v) FROM txn4.ops.dev")
      .head.getDouble(0) == 150.0)
    assert(spark.sql("SELECT count(*) FROM txn4.ops.src")
      .head.getLong(0) == 90L)

    // GC over several more commits: the clone still reads every row —
    // shared dirs it references were never collected even though the
    // source rewrote its buckets
    for (i <- 0 until 5)
      spark.sql(s"INSERT INTO txn4.ops.src SELECT ${1000 + i}L, 0.0")
    assert(spark.sql("SELECT count(*) FROM txn4.ops.dev")
      .head.getLong(0) == 100L, "GC collected a dir the clone references")

    // dropping the source keeps the clone whole
    spark.sql("DROP TABLE txn4.ops.src")
    for (i <- 0 until 3) // post-drop commits run more GCs
      spark.sql(s"INSERT INTO txn4.ops.dev SELECT ${2000 + i}L, 0.0")
    assert(spark.sql("SELECT count(*) FROM txn4.ops.dev")
      .head.getLong(0) == 103L,
      "GC collected shared dirs after the source dropped")
  }
}
