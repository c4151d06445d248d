package graft

import java.io.File

import graft.sources.{GraftCatalog, ManifestTable}

/** Merge-on-read row-level operations (`SupportsDelta`,
  * TBLPROPERTIES rowLevelMode='merge-on-read'): MERGE/UPDATE/DELETE
  * write only changed rows + key tombstones as per-bucket DELTA
  * generations; reads reconcile latest-wins and hash-equal the
  * copy-on-write result; write volume scales with changed rows, not
  * touched-bucket size; the change feed stays exact; compact() folds
  * the deltas away.
  */
class MergeOnReadSpec extends SparkSpec {

  private def catalog(name: String): String = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft_$name").toString
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    wh
  }

  private def dirSize(f: File): Long =
    if (f.isFile) f.length
    else Option(f.listFiles).getOrElse(Array.empty).map(dirSize).sum

  test("MoR MERGE: delta generations only, reads ≡ copy-on-write, write volume tracks changed rows") {
    val wh = catalog("mor1")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mor1.ops")
    for (mode <- Seq("copy-on-write", "merge-on-read"))
      spark.sql(s"""CREATE TABLE mor1.ops.${mode.take(3).replace("-", "")}
        (id BIGINT, grp STRING, v DOUBLE, pad STRING) USING graft
        TBLPROPERTIES ('mergeKeys'='id', 'buckets'='8',
          'rowLevelMode'='$mode')""")
    for (t <- Seq("cop", "mer"))
      spark.sql(s"""INSERT INTO mor1.ops.$t
        SELECT id, concat('g', id % 4), cast(id as double),
          repeat(md5(cast(id as string)), 16) FROM range(4000)""")

    val root = new File(wh, "ops")
    val baseBefore =
      ManifestTable.read(root).get.table("mer").gens.map(_.path).toSet
    val bytesBefore = dirSize(root)

    // the same selective three-verb MERGE on both tables: 10 updates,
    // 5 inserts, 5 deletes out of 4000 rows spread over every bucket
    for (t <- Seq("cop", "mer"))
      spark.sql(s"""
        MERGE INTO mor1.ops.$t t
        USING (
          SELECT id * 100 AS id, -1.0 AS v FROM range(20)
        ) s
        ON t.id = s.id
        WHEN MATCHED AND s.id >= 1500 THEN DELETE
        WHEN MATCHED THEN UPDATE SET t.v = s.v
        WHEN NOT MATCHED THEN INSERT (id, grp, v, pad)
        VALUES (s.id, 'new', s.v, 'p')""")

    val ts = ManifestTable.read(root).get.table("mer")
    // base generations byte-untouched; the commit added ONLY deltas
    assert(ts.gens.map(_.path).toSet == baseBefore,
      "MoR MERGE must not rewrite base generations")
    assert(ts.deltas.nonEmpty, "MoR MERGE must record delta generations")
    // the recorded delta rows are exactly the statement's changed rows:
    // 10 updates (ids 0,100,...,1400 minus deleted range) + 5 inserts
    // (ids 2000..3900 step 100 > 3999) + 5 tombstones
    val deltaRows = ts.deltaGens.map(_.rows).sum
    assert(deltaRows == 20L, s"expected 20 delta rows, got $deltaRows")

    // reads reconcile and hash-equal the copy-on-write twin
    val cow = spark.sql("SELECT * FROM mor1.ops.cop ORDER BY id").collect()
    val mor = spark.sql("SELECT * FROM mor1.ops.mer ORDER BY id").collect()
    assert(cow.length == mor.length && cow.sameElements(mor),
      "merge-on-read reconciliation diverges from copy-on-write")

    // write volume: the MoR commit's new bytes (20 thin rows over ≤8
    // bucket delta dirs, dominated by per-file parquet overhead) must
    // be a small fraction of the base bytes the CoW twin rewrote — the
    // CoW MERGE touched every one of the 8 buckets and re-wrote each
    // touched generation wholesale
    val morBytes = ts.deltaGens.map(g => dirSize(new File(root, g.path))).sum
    val baseBytes = ts.gens.map(g => dirSize(new File(root, g.path))).sum
    val cowTs = ManifestTable.read(root).get.table("cop")
    val cowRewritten = cowTs.gens
      .filter(g => g.path.contains("-m")) // generations the MERGE wrote
      .map(g => dirSize(new File(root, g.path))).sum
    assert(morBytes * 3 < baseBytes,
      s"delta bytes $morBytes not << base bytes $baseBytes")
    assert(morBytes * 3 < cowRewritten,
      s"delta bytes $morBytes not << CoW rewrite bytes $cowRewritten")
    assert(bytesBefore > 0)

    // point lookups and filters still correct through reconciliation
    assert(spark.sql("SELECT v FROM mor1.ops.mer WHERE id = 100")
      .head.getDouble(0) == -1.0)
    assert(spark.sql("SELECT count(*) FROM mor1.ops.mer WHERE id = 1500")
      .head.getLong(0) == 0L)
    assert(spark.sql("SELECT count(*) FROM mor1.ops.mer")
      .head.getLong(0) == 3995L)
  }

  test("MoR DELETE and UPDATE: tombstones and upserts stack, latest wins") {
    val wh = catalog("mor2")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mor2.ops")
    spark.sql("""CREATE TABLE mor2.ops.t (id BIGINT, v DOUBLE)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='4',
        'rowLevelMode'='merge-on-read')""")
    spark.sql(
      "INSERT INTO mor2.ops.t SELECT id, cast(id as double) FROM range(100)")
    val root = new File(wh, "ops")
    val baseBefore =
      ManifestTable.read(root).get.table("t").gens.map(_.path).toSet

    // plain translatable DELETE routes through the delta path on a MoR
    // table (canDeleteWhere refuses, Spark falls to the row-level op)
    spark.sql("DELETE FROM mor2.ops.t WHERE id < 10")
    // UPDATE stacks a second delta; for ids 5..9 the tombstone came
    // first so there is nothing to update
    spark.sql("UPDATE mor2.ops.t SET v = v + 1000 WHERE id < 20")
    // re-insert one deleted key: the newest upsert must win over the
    // earlier tombstone
    spark.sql("""
      MERGE INTO mor2.ops.t t USING (SELECT 3L AS id, 333.0 AS v) s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET t.v = s.v
      WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""")

    val ts = ManifestTable.read(root).get.table("t")
    assert(ts.gens.map(_.path).toSet == baseBefore,
      "MoR verbs must not rewrite base generations")
    assert(ts.deltas.values.flatten.size >= 2, "deltas must stack")

    assert(spark.sql("SELECT count(*) FROM mor2.ops.t").head.getLong(0)
      == 91L) // 100 - 10 deleted + 1 reinserted
    assert(spark.sql("SELECT v FROM mor2.ops.t WHERE id = 3")
      .head.getDouble(0) == 333.0, "newest upsert must beat tombstone")
    assert(spark.sql("SELECT v FROM mor2.ops.t WHERE id = 15")
      .head.getDouble(0) == 1015.0)
    assert(spark.sql("SELECT count(*) FROM mor2.ops.t WHERE id = 5")
      .head.getLong(0) == 0L)

    // the format("graft") read path reconciles identically
    val v1 = spark.read.format("graft").option("path", root.toString)
      .option("table", "t").load().orderBy("id").collect()
    val v2 = spark.sql("SELECT * FROM mor2.ops.t ORDER BY id").collect()
    assert(v1.sameElements(v2), "provider read path missed deltas")

    // metadata COUNT must NOT answer from stale base counts
    assert(ts.rowCount.isEmpty,
      "metadata row count must be disabled while deltas are outstanding")
  }

  test("MoR change feed stays exact; compact() folds deltas away; CoW verbs collapse first") {
    val wh = catalog("mor3")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mor3.ops")
    // retainVersions widened so the time-travel read at the end of the
    // test still resolves after the collapse/compact/insert commits
    spark.sql("""CREATE TABLE mor3.ops.t (id BIGINT, v DOUBLE)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2',
        'rowLevelMode'='merge-on-read', 'retainVersions'='10')""")
    val root = new File(wh, "ops")
    import spark.implicits._
    (0L until 20L).map(i => (i, i.toDouble)).toDF("id", "v")
      .write.format("graft").option("path", root.toString)
      .option("table", "t").option("mergeKeys", "id")
      .option("changeFeed", "true").mode("append").save()
    val vBefore = ManifestTable.read(root).get.version

    spark.sql("""
      MERGE INTO mor3.ops.t t
      USING (SELECT * FROM VALUES (7L, -7.0), (8L, 0.0), (100L, 100.0)
             AS s(id, v)) s
      ON t.id = s.id
      WHEN MATCHED AND s.id = 8 THEN DELETE
      WHEN MATCHED THEN UPDATE SET t.v = s.v
      WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""")

    val feed = ManifestTable
      .readChangeFeed(spark, root.toString, vBefore + 1, None, "t")
      .select("id", "v", ManifestTable.ChangeTypeCol)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
      .toSet
    assert(feed == Set(
      (7L, 7.0, "update_preimage"),
      (7L, -7.0, "update_postimage"),
      (8L, 8.0, "delete"),
      (100L, 100.0, "insert")),
      s"MoR feed diff wrong: $feed")

    // compact() collapses: identical rows, zero deltas, feed intact
    val before = spark.sql("SELECT * FROM mor3.ops.t ORDER BY id").collect()
    ManifestTable.compact(spark, root, "t")
    val tsAfter = ManifestTable.read(root).get.table("t")
    assert(tsAfter.deltas.isEmpty, "compact must erase deltas")
    assert(tsAfter.feedFrom >= 0, "collapse must not reset the feed")
    val after = spark.sql("SELECT * FROM mor3.ops.t ORDER BY id").collect()
    assert(before.sameElements(after), "collapse changed the table's rows")
    // with deltas folded, metadata counts come back
    assert(tsAfter.rowCount.contains(20L))

    // a fresh delta then an INSERT (a CoW-path writer): the insert
    // collapses outstanding deltas first and the result stays exact
    spark.sql("DELETE FROM mor3.ops.t WHERE id = 0")
    assert(ManifestTable.read(root).get.table("t").deltas.nonEmpty)
    spark.sql("INSERT INTO mor3.ops.t SELECT 500L, 500.0")
    val ts2 = ManifestTable.read(root).get.table("t")
    assert(ts2.deltas.isEmpty,
      "CoW-path INSERT must collapse outstanding deltas first")
    assert(spark.sql("SELECT count(*) FROM mor3.ops.t").head.getLong(0)
      == 20L) // 20 - 1 deleted + 1 inserted
    assert(spark.sql("SELECT count(*) FROM mor3.ops.t WHERE id = 0")
      .head.getLong(0) == 0L, "collapse resurrected a tombstoned row")

    // time travel across the delta commits still reconciles as-of
    val asOf = spark.read.format("graft").option("path", root.toString)
      .option("table", "t").option("version", (vBefore + 1).toString)
      .load()
    assert(asOf.count() == 20L)
    assert(asOf.filter($"id" === 7L).head.getDouble(1) == -7.0)
  }

  test("per-table TBLPROPERTIES: retention windows and checkpoint interval are honored") {
    val wh = catalog("mor4")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS mor4.ops")
    spark.sql("""CREATE TABLE mor4.ops.t (id BIGINT, v DOUBLE)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2',
        'retainVersions'='6', 'checkpointInterval'='3')""")
    val root = new File(wh, "ops")
    val ts0 = ManifestTable.read(root).get.table("t")
    assert(ts0.props("retainVersions") == "6")
    assert(ts0.props("checkpointInterval") == "3")

    for (i <- 0 until 8)
      spark.sql(s"INSERT INTO mor4.ops.t SELECT $i, $i.0")
    val current = ManifestTable.read(root).get.version

    // default window is 3; the declared 6 keeps version current-5
    // reconstructible and readable
    val oldV = current - 5
    assert(oldV >= 1)
    val pinned = spark.read.format("graft").option("path", root.toString)
      .option("table", "t").option("version", oldV.toString).load()
    assert(pinned.count() >= 0L) // resolves without retention error

    // beyond the table's own window → clean retention error
    intercept[Exception] {
      ManifestTable.readTable(spark, root.toString, Some(current - 7), "t")
        .count()
    }

    // ALTER TABLE widens the window for future commits
    spark.sql(
      "ALTER TABLE mor4.ops.t SET TBLPROPERTIES ('retainVersions'='8')")
    assert(ManifestTable.read(root).get.table("t").props("retainVersions")
      == "8")

    // checkpointInterval=3: version files at multiples of 3 are FULL
    // snapshots (parse as manifests, not deltas), others are deltas
    val v3 = new File(root, "MANIFEST.v3")
    val v4 = new File(root, "MANIFEST.v4")
    if (v3.exists) {
      val s3 = new String(java.nio.file.Files.readAllBytes(v3.toPath))
      assert(!s3.contains("\"delta\""), "v3 should be a full snapshot")
    }
    if (v4.exists) {
      val s4 = new String(java.nio.file.Files.readAllBytes(v4.toPath))
      assert(s4.contains("\"delta\""), "v4 should be a delta entry")
    }
  }
}
