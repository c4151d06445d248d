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

  test("envelope CDF netting: a key touched by several statements publishes ONE net pre/post pair — applyChanges reconstructs without duplicates") {
    val wh = catalog("txn3n")
    val root = new File(wh, "ops")
    root.mkdirs()
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def write(rows: Seq[(Long, Double)]): Unit =
      rows.toDF("id", "v")
        .write.format("graft").option("path", root.toString)
        .option("table", "t").option("mergeKeys", "id")
        .option("changeFeed", "true").mode("append").save()
    write((0L until 6L).map(i => (i, i.toDouble)))
    val vBase = ManifestTable.read(root).get.version

    ManifestTable.transaction(root) {
      write(Seq((0L, 100.0), (10L, 10.0), (11L, 11.0))) // update 0, insert 10+11
      write(Seq((0L, 200.0), (10L, 20.0))) // re-update 0, update fresh 10
      ManifestTable.deleteWhere(spark, root,
        col("id") === 11L, "t") // insert+delete inside the envelope: nets away
    }
    val vPub = ManifestTable.read(root).get.version
    assert(vPub == vBase + 1)
    val feed = ManifestTable
      .readChangeFeed(spark, root.toString, vPub, None, "t").persist()
    try {
      // key 0: exactly ONE pre (base image 0.0) and ONE post (200.0)
      val k0 = feed.filter(col("id") === 0L)
        .collect().map(r => (r.getAs[String](ManifestTable.ChangeTypeCol),
          r.getAs[Double]("v"))).toSet
      assert(k0 == Set(("update_preimage", 0.0), ("update_postimage", 200.0)),
        s"netted key-0 changes wrong: $k0")
      // key 10 (born inside the envelope): one INSERT with the final value
      val k10 = feed.filter(col("id") === 10L)
        .collect().map(r => (r.getAs[String](ManifestTable.ChangeTypeCol),
          r.getAs[Double]("v"))).toSet
      assert(k10 == Set(("insert", 20.0)), s"netted key-10 changes wrong: $k10")
      // key 11 (insert + delete): nothing published
      assert(feed.filter(col("id") === 11L).isEmpty,
        "insert-then-delete must net to nothing")

      // the reconstruction contract: base snapshot + the envelope's feed
      // == the published snapshot, with exactly one row per key
      val rebuilt = ManifestTable.applyChanges(
        ManifestTable.readTable(spark, root.toString,
          version = Some(vBase), table = "t"),
        feed, Seq("id"))
      val now = ManifestTable.readTable(spark, root.toString, table = "t")
      assert(rebuilt.collect().map(_.toString).toSet
        == now.collect().map(_.toString).toSet,
        "feed-based reconstruction diverged from the published snapshot")
      assert(rebuilt.groupBy("id").count().filter(col("count") > 1).isEmpty,
        "reconstruction produced duplicate rows")
    } finally { feed.unpersist(); () }
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

  test("cross-root CLONE: hard-linked zero-copy registration — reads ≡ source@version, neither side's vacuum sweeps data the other references") {
    val wh = catalog("txnx")
    val rootA = new File(wh, "dba")
    val rootB = new File(wh, "dbb")
    rootA.mkdirs(); rootB.mkdirs()
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def writeA(rows: Seq[(Long, Double)], overwrite: Boolean = false): Unit =
      rows.toDF("id", "v")
        .write.format("graft").option("path", rootA.toString)
        .option("table", "t").option("mergeKeys", "id")
        .mode(if (overwrite) "overwrite" else "append").save()
    writeA((0L until 30L).map(i => (i, i.toDouble)))
    val vSrc = ManifestTable.read(rootA).get.version
    val expect = ManifestTable.readTable(spark, rootA.toString, table = "t")
      .collect().map(_.toString).toSet

    // the SQL verb: CALL …clone_across(source_ns, source, target_ns,
    // target, version); -1 = current
    spark.sql(
      "CALL txnx.system.clone_across('dba', 't', 'dbb', 'tc', -1)").collect()
    def readClone(): Set[String] = ManifestTable
      .readTable(spark, rootB.toString, table = "tc")
      .collect().map(_.toString).toSet
    assert(readClone() == expect, "clone must read the source's snapshot")

    // zero-copy: the clone's files are HARD LINKS of the source's (same
    // inode), not copies
    val srcGen = ManifestTable.read(rootA).get.table("t").gens.head
    val cloneGen = ManifestTable.read(rootB).get.table("tc").gens.head
    def fileKeys(root: File, rel: String): Set[Any] =
      new File(root, rel).listFiles.filter(_.isFile)
        .map(f => java.nio.file.Files.readAttributes(f.toPath,
          classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey)
        .toSet
    assert(fileKeys(rootA, srcGen.path).intersect(
      fileKeys(rootB, cloneGen.path)).nonEmpty,
      "cross-root clone copied bytes instead of linking")

    // a PINNED cross-root clone, registered while the source still
    // retains the version — it must keep serving that snapshot even
    // after the source ages it out below
    ManifestTable.cloneTableAcross(rootA, "t", rootB, "tc2", Some(vSrc))

    // the SOURCE rewrites everything and its vacuum ages the original
    // generations out of ITS retention — the filesystem link count keeps
    // the clone's data alive: no cross-root GC coordination to go stale
    writeA(Seq((1000L, -1.0)), overwrite = true)
    (0 until ManifestTable.RetainVersions + 1).foreach(i =>
      writeA(Seq((2000L + i, 0.0))))
    assert(!new File(rootA, srcGen.path).exists,
      "setup: the source's original generation should have aged out")
    assert(readClone() == expect,
      "source-side vacuum broke the cross-root clone")

    // …and dropping the clone (plus aging its version out) releases the
    // last reference without touching the source's live state
    assert(ManifestTable.dropTable(rootB, "tc"))
    (0 until ManifestTable.RetainVersions + 1).foreach { i =>
      Seq((i.toLong, 0.0)).toDF("id", "v")
        .write.format("graft").option("path", rootB.toString)
        .option("table", "other").option("mergeKeys", "id")
        .mode("append").save()
    }
    assert(!new File(rootB, cloneGen.path).exists,
      "dropped clone's links survived retention")
    assert(ManifestTable.readTable(spark, rootA.toString, table = "t")
      .filter(col("id") === 1000L).count() == 1L)

    // the pinned clone still serves the historical snapshot the source
    // itself can no longer time-travel to
    intercept[Exception] {
      ManifestTable.readTable(spark, rootA.toString, Some(vSrc), "t")
    }
    assert(ManifestTable.readTable(spark, rootB.toString, table = "tc2")
      .collect().map(_.toString).toSet == expect)
  }

  test("cross-namespace envelope: one atomic publish across roots, rollback leaves both untouched") {
    val wh = catalog("txn5")
    for (ns <- Seq("sales", "risk")) {
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS txn5.$ns")
      spark.sql(s"""CREATE TABLE txn5.$ns.t (id BIGINT, v DOUBLE)
        USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')""")
    }
    val (ra, rb) = (new File(wh, "sales"), new File(wh, "risk"))
    val (va, vb) = (ManifestTable.read(ra).get.version,
      ManifestTable.read(rb).get.version)

    // abort path first: statements against BOTH roots, rollback → disk
    // byte-identical on both
    spark.sql("CALL txn5.system.begin('sales,risk')")
    spark.sql("INSERT INTO txn5.sales.t SELECT id, 1.0 FROM range(5)")
    spark.sql("INSERT INTO txn5.risk.t SELECT id, 2.0 FROM range(5)")
    spark.sql("CALL txn5.system.rollback('sales,risk')")
    assert(!new File(ra, s"MANIFEST.v${va + 1}").exists &&
      !new File(rb, s"MANIFEST.v${vb + 1}").exists,
      "rollback published something")
    assert(spark.sql("SELECT count(*) FROM txn5.sales.t").head.getLong(0) == 0L)

    // happy path: one envelope, statements on both roots, ONE commit
    // version per root, cross-root reads inside the envelope
    spark.sql("CALL txn5.system.begin('sales,risk')")
    spark.sql("INSERT INTO txn5.sales.t SELECT id, 1.0 FROM range(10)")
    spark.sql("""INSERT INTO txn5.risk.t
      SELECT id, v * 10 FROM txn5.sales.t""") // reads the sibling's writes
    assert(!new File(ra, s"MANIFEST.v${va + 1}").exists,
      "open cross-root envelope must publish nothing")
    val out = spark.sql("CALL txn5.system.commit('sales,risk')")
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(va + 1, vb + 1))
    assert(spark.sql("SELECT count(*) FROM txn5.risk.t").head.getLong(0) == 10L)
    assert(spark.sql("SELECT sum(v) FROM txn5.risk.t").head.getDouble(0)
      == 100.0) // 10 sibling-envelope rows x (1.0 * 10)
    // both roots advanced exactly one version; the envelope's op recorded
    for ((r, v0) <- Seq(ra -> va, rb -> vb)) {
      val m = ManifestTable.read(r).get
      assert(m.version == v0 + 1)
      assert(m.info.operation.startsWith("TXN:"), m.info.operation)
    }
    // no staging leftovers
    assert(!ManifestTable.read(ra).get.tables.isEmpty)
    assert(Option(ra.listFiles).get.forall(!_.getName.endsWith(".prepared")))
    assert(Option(rb.listFiles).get.forall(!_.getName.endsWith(".prepared")))
  }

  test("cross-namespace recovery: a decided-but-unpromoted root promotes on read; an undecided prepare stays invisible") {
    val wh = catalog("txn6")
    for (ns <- Seq("a", "b")) {
      spark.sql(s"CREATE NAMESPACE IF NOT EXISTS txn6.$ns")
      spark.sql(s"""CREATE TABLE txn6.$ns.t (id BIGINT, v DOUBLE)
        USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')""")
    }
    val (ra, rb) = (new File(wh, "a"), new File(wh, "b"))
    spark.sql("CALL txn6.system.begin('a,b')")
    spark.sql("INSERT INTO txn6.a.t SELECT id, 1.0 FROM range(8)")
    spark.sql("INSERT INTO txn6.b.t SELECT id, 2.0 FROM range(8)")
    spark.sql("CALL txn6.system.commit('a,b')")
    val vb = ManifestTable.read(rb).get.version

    // simulate the crash-between-decide-and-promote: demote root b's
    // newest version file back into a prepared+decided staging pair
    import java.nio.file.Files
    import java.nio.charset.StandardCharsets.UTF_8
    val vf = new File(rb, s"MANIFEST.v$vb")
    val snapshot = new String(Files.readAllBytes(vf.toPath), UTF_8)
    assert(vf.delete())
    // drop the stale pointer too, so the fold must pass through v(b)
    Files.deleteIfExists(new File(rb, "MANIFEST").toPath): Unit
    def stage(decided: Boolean): Unit = {
      val body = org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(org.json4s.JObject(List(
          "coordinator" -> (org.json4s.JString(ra.getPath): org.json4s.JValue),
          "txid" -> (org.json4s.JString("simcrash"): org.json4s.JValue),
          "manifest" -> (org.json4s.JString(snapshot): org.json4s.JValue)))))
      Files.write(new File(rb, s"MANIFEST.v$vb.prepared").toPath,
        body.getBytes(UTF_8)): Unit
      val d = new File(new File(ra, "_txn"), "simcrash.committed")
      if (decided) {
        Files.createDirectories(d.getParentFile.toPath)
        Files.write(d.toPath, "sim".getBytes(UTF_8)): Unit
      } else Files.deleteIfExists(d.toPath): Unit
    }
    // UNDECIDED: the prepared version must stay invisible
    stage(decided = false)
    assert(ManifestTable.read(rb).get.version == vb - 1,
      "an undecided prepare leaked")
    // DECIDED: any read promotes — the root catches up to its siblings
    stage(decided = true)
    val recovered = ManifestTable.read(rb).get
    assert(recovered.version == vb, "decided prepare did not promote")
    assert(spark.sql("SELECT count(*) FROM txn6.b.t").head.getLong(0) == 8L)
    assert(!new File(rb, s"MANIFEST.v$vb.prepared").exists,
      "promotion must consume the staging file")
  }
}
