package graft

import java.io.File

import graft.sources.{GraftCatalog, ManifestTable}

/** Writable branches — the write-audit-publish workflow (the Iceberg
  * `spark.wap.branch` shape) over the manifest commit protocol: a
  * session with `graft.session.branch` set writes a persisted side
  * lineage, main stays untouched and visible to everyone else, the
  * audit step reads the branch, and publish squashes the whole branch
  * onto main as ONE commit — fast-forwarding when main still sits at
  * the fork, REBASING onto the new head when main's intervening commits
  * touched provably disjoint tables, and refusing (publishing nothing)
  * on a genuine overlap.
  */
class BranchSpec extends SparkSpec {

  test("write-audit-publish: branch writes isolate from main, publish lands as one commit, a concurrent main commit refuses the publish, GC keeps branch dirs alive") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wap").toString
    spark.conf.set("spark.sql.catalog.wap", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.wap.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS wap.ops")
    spark.sql("""CREATE TABLE wap.ops.t (id BIGINT, v BIGINT)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')""")
    spark.sql("INSERT INTO wap.ops.t VALUES (1, 10), (2, 20)")
    val root = new File(wh, "ops")
    def mainV(): Long = ManifestTable.read(root).get.version
    def count(): Long =
      spark.sql("SELECT count(*) FROM wap.ops.t").head.getLong(0)

    // WRITE: fork, switch the session onto the branch, write twice
    val fork = spark.sql("CALL wap.system.branch_create('ops', 'wap1')")
      .head.getLong(0)
    assert(fork == mainV())
    spark.conf.set("graft.session.branch", "wap1")
    try {
      spark.sql("INSERT INTO wap.ops.t VALUES (3, 30)")
      spark.sql("INSERT INTO wap.ops.t VALUES (4, 40)")
      // AUDIT: the branch session sees its writes ...
      assert(count() == 4L, "branch session must read its own writes")
    } finally spark.conf.unset("graft.session.branch")
    // ... while main is byte-untouched for everyone else
    assert(mainV() == fork, "branch writes leaked a main commit")
    assert(count() == 2L, "branch rows visible outside the branch")

    // main GC runs (e.g. via an unrelated maintenance pass) must keep
    // the UNPUBLISHED branch dirs alive
    val sweep = ManifestTable.gc(root, ManifestTable.read(root).get)
    spark.conf.set("graft.session.branch", "wap1")
    try assert(count() == 4L,
      s"a main-side sweep collected live branch data (swept $sweep)")
    finally spark.conf.unset("graft.session.branch")

    // PUBLISH: both branch commits squash into ONE main commit
    val published = spark.sql(
      "CALL wap.system.branch_publish('ops', 'wap1')").head.getLong(0)
    assert(published == fork + 1,
      s"publish must fast-forward as one commit, got $published")
    assert(count() == 4L)
    assert(spark.sql("CALL wap.system.show_branches('ops')").count() == 0L,
      "a published branch must be consumed")

    // CONFLICT: a branch whose base gets overtaken by a main commit TO
    // THE SAME TABLE refuses to publish, publishing NOTHING
    spark.sql("CALL wap.system.branch_create('ops', 'wap2')")
    spark.conf.set("graft.session.branch", "wap2")
    try spark.sql("INSERT INTO wap.ops.t VALUES (5, 50)")
    finally spark.conf.unset("graft.session.branch")
    spark.sql("INSERT INTO wap.ops.t VALUES (9, 90)") // main advances
    val headBefore = mainV()
    val lost = intercept[Exception] {
      spark.sql("CALL wap.system.branch_publish('ops', 'wap2')").collect()
    }
    assert(lost.getMessage.contains("modified by BOTH"),
      s"unexpected error: ${lost.getMessage}")
    assert(mainV() == headBefore, "a refused publish committed something")
    assert(count() == 5L) // rows 1,2,3,4,9 — never 5
    // the dead branch drops; its dirs orphan for the next sweep
    assert(spark.sql("CALL wap.system.branch_drop('ops', 'wap2')")
      .head.getBoolean(0))

    // branch identity keys the Dataset cache: a cached MAIN read must
    // not serve the branch session (and vice versa)
    spark.sql("CALL wap.system.branch_create('ops', 'wap3')")
    val mainDf = spark.table("wap.ops.t")
    mainDf.cache(); mainDf.count()
    try {
      spark.conf.set("graft.session.branch", "wap3")
      try {
        spark.sql("INSERT INTO wap.ops.t VALUES (6, 60)")
        assert(count() == 6L,
          "a cached main Dataset served a branch read")
      } finally spark.conf.unset("graft.session.branch")
      // disk truth first: the branch INSERT must not have touched main
      val diskRows = ManifestTable.readTable(spark, root.toString,
        table = "t").count()
      assert(diskRows == 5L,
        s"branch INSERT leaked into the MAIN manifest ($diskRows rows)")
      assert(count() == 5L,
        "a branch-context recompute refreshed a MAIN cache entry")
    } finally {
      mainDf.unpersist(blocking = true)
      spark.sql("CALL wap.system.branch_drop('ops', 'wap3')").collect()
    }

    // GC pin for branch-referenced COLUMNAR CHECKPOINTS: a branch over
    // a generation count past the inline cap spills its lists to
    // _ckpt/ (the main log's proven writeCkpt path — what's new is the
    // pin, so that is what this probes): a checkpoint dir a live
    // branch head references must survive the anchor-based sweep even
    // when its version sits below the anchor, and orphan once the
    // branch drops
    val ckDir = new File(root, "_ckpt/ckpt-v0-pinprobe")
    ckDir.mkdirs()
    java.nio.file.Files.write(new File(ckDir, "part-0").toPath,
      "x".getBytes)
    val bf = new File(root, "BRANCH.pinprobe")
    java.nio.file.Files.write(bf.toPath,
      """{"ckpt" : "_ckpt/ckpt-v0-pinprobe"}""".getBytes)
    try {
      ManifestTable.gc(root, ManifestTable.read(root).get)
      assert(ckDir.exists, "a live branch's checkpoint dir was swept")
    } finally bf.delete()
    ManifestTable.gc(root, ManifestTable.read(root).get)
    assert(!ckDir.exists,
      "an orphaned branch checkpoint survived the sweep")
  }

  test("branch time travel: VERSION/TIMESTAMP AS OF and $history follow the branch lineage; main's parallel commits stay invisible inside the branch") {
    val wh = java.nio.file.Files.createTempDirectory("graft_btt").toString
    spark.conf.set("spark.sql.catalog.btt", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.btt.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS btt.ops")
    spark.sql("""CREATE TABLE btt.ops.t (id BIGINT, v BIGINT)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')""")
    spark.sql("INSERT INTO btt.ops.t VALUES (1, 10)")
    val root = new File(wh, "ops")
    val fork = spark.sql("CALL btt.system.branch_create('ops', 'tt')")
      .head.getLong(0)
    // main advances IN PARALLEL — same version numbers, different lineage
    spark.sql("INSERT INTO btt.ops.t VALUES (9, 90)")

    def sumAt(v: Long): Long = spark.sql(
      s"SELECT sum(v) FROM btt.ops.t VERSION AS OF $v").head.getLong(0)
    def historyVersions(): Seq[Long] = spark.sql(
      "SELECT version FROM btt.ops.`t$history`")
      .collect().map(_.getLong(0)).toSeq

    spark.conf.set("graft.session.branch", "tt")
    try {
      spark.sql("INSERT INTO btt.ops.t VALUES (2, 20)") // branch fork+1
      spark.sql("INSERT INTO btt.ops.t VALUES (3, 30)") // branch fork+2
      // the audit step is time-travelable: each branch commit resolves
      // from ITS lineage — fork+1 must be (1,2), never main's (1,9)
      assert(sumAt(fork) == 10L, "shared prehistory unreachable")
      assert(sumAt(fork + 1) == 30L,
        s"branch AS OF ${fork + 1} served main's parallel commit")
      assert(sumAt(fork + 2) == 60L)
      // a version that exists ONLY on main past the fork refuses
      // rather than silently crossing lineages
      val cross = intercept[Exception] {
        spark.sql(s"SELECT * FROM btt.ops.t VERSION AS OF ${fork + 3}")
          .collect()
      }
      assert(cross.getMessage.contains("not on branch"),
        s"unexpected: ${cross.getMessage}")
      // $history lists the branch lineage exactly once per version:
      // prehistory 1..fork from main, fork+1..fork+2 from the branch
      val hv = historyVersions()
      assert(hv.sorted == (1L to fork + 2).toSeq,
        s"branch \\$$history wrong: $hv")
      // TIMESTAMP AS OF resolves through the same lineage — both the
      // API (versionAt) and the SQL string form
      assert(ManifestTable.versionAt(root,
        System.currentTimeMillis() + 3600000L).contains(fork + 2))
      assert(spark.sql("""SELECT sum(v) FROM btt.ops.t
        TIMESTAMP AS OF '2100-01-01 00:00:00'""").head.getLong(0) == 60L,
        "SQL TIMESTAMP AS OF crossed lineages inside the branch")
    } finally spark.conf.unset("graft.session.branch")

    // outside the branch, the SAME version number is main's commit and
    // history is main's log
    assert(sumAt(fork + 1) == 100L, "main AS OF served the branch")
    assert(historyVersions().sorted == (1L to fork + 1).toSeq)
    assert(ManifestTable.versionAt(root,
      System.currentTimeMillis() + 3600000L).contains(fork + 1))
    assert(spark.sql("""SELECT sum(v) FROM btt.ops.t
      TIMESTAMP AS OF '2100-01-01 00:00:00'""").head.getLong(0) == 100L)
    spark.sql("CALL btt.system.branch_drop('ops', 'tt')").collect()
  }

  test("branch change feed: CDF inside a branch serves the branch lineage, main's parallel entries stay invisible, publish lands the squashed feed on main") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft_bcf").toString
    spark.conf.set("spark.sql.catalog.bcf", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.bcf.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS bcf.ops")
    spark.sql("""CREATE TABLE bcf.ops.t (id BIGINT, v BIGINT)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')""")
    val root = new File(wh, "ops")
    // open the feed through the provider writer
    Seq((1L, 10L), (2L, 20L)).toDF("id", "v")
      .write.format("graft").option("path", root.toString)
      .option("table", "t").option("mergeKeys", "id")
      .option("changeFeed", "true").mode("append").save()
    def feed(): Map[Long, Set[Long]] = {
      val from = ManifestTable.read(root).get.table("t").feedFrom
      ManifestTable
        .readChangeFeed(spark, root.toString, from, None, "t")
        .select("_commit_version", "id").collect()
        .groupBy(_.getLong(0)).map { case (v, rs) =>
          v -> rs.map(_.getLong(1)).toSet }
    }
    val base = ManifestTable.read(root).get.version

    val fork = spark.sql("CALL bcf.system.branch_create('ops', 'cf')")
      .head.getLong(0)
    spark.conf.set("graft.session.branch", "cf")
    try {
      spark.sql("INSERT INTO bcf.ops.t VALUES (3, 30)") // branch fork+1
      spark.sql("INSERT INTO bcf.ops.t VALUES (4, 40)") // branch fork+2
      // the branch session's feed is ITS lineage: shared prehistory +
      // the branch's own entries
      assert(feed() == Map(base -> Set(1L, 2L),
        (fork + 1) -> Set(3L), (fork + 2) -> Set(4L)),
        s"branch feed wrong: ${feed()}")
    } finally spark.conf.unset("graft.session.branch")
    // outside, main's feed has only the prehistory
    assert(feed() == Map(base -> Set(1L, 2L)),
      s"branch feed leaked into main: ${feed()}")

    // publish squashes the branch's feed into ONE main version
    val pubV = spark.sql("CALL bcf.system.branch_publish('ops', 'cf')")
      .head.getLong(0)
    assert(feed() == Map(base -> Set(1L, 2L), pubV -> Set(3L, 4L)),
      s"published feed wrong: ${feed()}")

    // a second branch racing a main commit: each lineage's feed shows
    // its OWN entry under the same version number
    spark.sql("CALL bcf.system.branch_create('ops', 'cf2')")
    spark.sql("INSERT INTO bcf.ops.t VALUES (9, 90)") // main pubV+1
    spark.conf.set("graft.session.branch", "cf2")
    try {
      spark.sql("INSERT INTO bcf.ops.t VALUES (5, 50)") // branch pubV+1
      assert(feed()(pubV + 1) == Set(5L),
        s"branch feed served main's parallel entry: ${feed()}")
    } finally spark.conf.unset("graft.session.branch")
    assert(feed()(pubV + 1) == Set(9L),
      s"main feed served the branch entry: ${feed()}")
    spark.sql("CALL bcf.system.branch_drop('ops', 'cf2')").collect()
  }

  test("publish crash recovery: a branch left behind after its publish commit landed is consumed idempotently on retry, and a torn branch pointer never breaks show_branches") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wapc").toString
    spark.conf.set("spark.sql.catalog.wapc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.wapc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS wapc.ops")
    spark.sql("""CREATE TABLE wapc.ops.t (id BIGINT, v BIGINT)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')""")
    spark.sql("INSERT INTO wapc.ops.t VALUES (1, 10), (2, 20)")
    val root = new File(wh, "ops")
    def mainV(): Long = ManifestTable.read(root).get.version

    spark.sql("CALL wapc.system.branch_create('ops', 'crash')")
    spark.conf.set("graft.session.branch", "crash")
    try spark.sql("INSERT INTO wapc.ops.t VALUES (3, 30)")
    finally spark.conf.unset("graft.session.branch")

    // simulate the crash window (publish = commit THEN drop): stash the
    // branch files, publish for real, then restore them — main now holds
    // the PUBLISH commit while the branch still exists at its old base
    val branchFiles = root.listFiles
      .filter(_.getName.startsWith("BRANCH.crash")).toSeq
    val stash = branchFiles.map { f =>
      f -> java.nio.file.Files.readAllBytes(f.toPath)
    }
    val published = spark.sql(
      "CALL wapc.system.branch_publish('ops', 'crash')").head.getLong(0)
    stash.foreach { case (f, bytes) =>
      java.nio.file.Files.write(f.toPath, bytes)
    }
    assert(mainV() == published)

    // retry must NOT refuse (the r13 message directed the operator to
    // re-create and re-run the script — double-applying the changes):
    // it detects its own PUBLISH at base+1, consumes the branch, and
    // returns the landed version without committing anything new
    val retried = spark.sql(
      "CALL wapc.system.branch_publish('ops', 'crash')").head.getLong(0)
    assert(retried == published,
      s"retry published v$retried, crash-landed v$published")
    assert(mainV() == published, "the retry committed a second publish")
    assert(spark.sql("SELECT count(*) FROM wapc.ops.t").head.getLong(0)
      == 3L, "rows double-applied or lost across the retry")
    assert(spark.sql("CALL wapc.system.show_branches('ops')").count()
      == 0L, "the recovered branch was not consumed")

    // a DIFFERENT op at base+1 (someone else advanced main, SAME table)
    // still refuses — idempotency never swallows a genuine conflict
    spark.sql("CALL wapc.system.branch_create('ops', 'late')")
    spark.conf.set("graft.session.branch", "late")
    try spark.sql("INSERT INTO wapc.ops.t VALUES (4, 40)")
    finally spark.conf.unset("graft.session.branch")
    spark.sql("INSERT INTO wapc.ops.t VALUES (9, 90)") // main advances
    val refused = intercept[Exception] {
      spark.sql("CALL wapc.system.branch_publish('ops', 'late')").collect()
    }
    assert(refused.getMessage.contains("modified by BOTH"))
    spark.sql("CALL wapc.system.branch_drop('ops', 'late')").collect()

    // crash window + the branch kept LIVING: restore the stash again
    // after a real publish, then commit MORE work to the branch — the
    // retry must NOT silently consume it (the landed publish covers only
    // the old head; the post-publish commits would be dropped). The
    // marker's @<branchHead> pin is what detects this.
    spark.sql("CALL wapc.system.branch_create('ops', 'adv')")
    spark.conf.set("graft.session.branch", "adv")
    try spark.sql("INSERT INTO wapc.ops.t VALUES (5, 50)")
    finally spark.conf.unset("graft.session.branch")
    val advStash = root.listFiles
      .filter(_.getName.startsWith("BRANCH.adv")).toSeq
      .map(f => f -> java.nio.file.Files.readAllBytes(f.toPath))
    spark.sql("CALL wapc.system.branch_publish('ops', 'adv')").collect()
    advStash.foreach { case (f, bytes) =>
      java.nio.file.Files.write(f.toPath, bytes)
    }
    spark.conf.set("graft.session.branch", "adv")
    try spark.sql("INSERT INTO wapc.ops.t VALUES (6, 60)")
    finally spark.conf.unset("graft.session.branch")
    val advanced = intercept[Exception] {
      spark.sql("CALL wapc.system.branch_publish('ops', 'adv')").collect()
    }
    assert(advanced.getMessage.contains("never published"),
      s"advanced-branch retry not refused loudly: ${advanced.getMessage}")
    assert(spark.sql("CALL wapc.system.show_branches('ops')")
      .collect().map(_.getString(0)).toSeq == Seq("adv"),
      "the refusal must leave the advanced branch alive for recovery")
    spark.sql("CALL wapc.system.branch_drop('ops', 'adv')").collect()

    // a torn/unreadable branch pointer (a concurrent drop mid-listing
    // leaves exactly this window) is OMITTED by show_branches, never an
    // exception for every OTHER branch's reader
    spark.sql("CALL wapc.system.branch_create('ops', 'good')")
    java.nio.file.Files.write(new File(root, "BRANCH.ghost").toPath,
      "not json".getBytes)
    try {
      val listed = spark.sql("CALL wapc.system.show_branches('ops')")
        .collect().map(_.getString(0)).toSeq
      assert(listed == Seq("good"),
        s"torn pointer not omitted cleanly: $listed")
    } finally {
      new File(root, "BRANCH.ghost").delete()
      spark.sql("CALL wapc.system.branch_drop('ops', 'good')").collect()
    }
  }

  test("disjoint-table rebase publish: main advancing on OTHER tables no longer refuses; the publish rebases onto the new head, survives a mid-publish OCC race, and still refuses a true overlap") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wapr").toString
    spark.conf.set("spark.sql.catalog.wapr", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.wapr.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS wapr.ops")
    spark.sql("""CREATE TABLE wapr.ops.a (id BIGINT, v BIGINT)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')""")
    spark.sql("""CREATE TABLE wapr.ops.b (id BIGINT, v BIGINT)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')""")
    spark.sql("INSERT INTO wapr.ops.a VALUES (1, 10)")
    spark.sql("INSERT INTO wapr.ops.b VALUES (1, 100)")
    val root = new File(wh, "ops")
    def mainV(): Long = ManifestTable.read(root).get.version
    def rows(t: String): Set[Long] = spark
      .sql(s"SELECT id FROM wapr.ops.$t").collect().map(_.getLong(0)).toSet

    // WRITE on the branch (table a only); main advances on table b TWICE
    val fork = spark.sql("CALL wapr.system.branch_create('ops', 'reb')")
      .head.getLong(0)
    spark.conf.set("graft.session.branch", "reb")
    try {
      spark.sql("INSERT INTO wapr.ops.a VALUES (2, 20)")
      spark.sql("INSERT INTO wapr.ops.a VALUES (3, 30)")
    } finally spark.conf.unset("graft.session.branch")
    spark.sql("INSERT INTO wapr.ops.b VALUES (2, 200)")
    spark.sql("INSERT INTO wapr.ops.b VALUES (3, 300)")
    val headBefore = mainV()
    assert(headBefore == fork + 2)

    // PUBLISH rebases: one commit on top of main's new head, with BOTH
    // sides' rows present and the branch consumed
    val pubV = spark.sql("CALL wapr.system.branch_publish('ops', 'reb')")
      .head.getLong(0)
    assert(pubV == headBefore + 1,
      s"rebase publish must land as ONE commit on the new head, got $pubV")
    assert(rows("a") == Set(1L, 2L, 3L), s"branch rows lost: ${rows("a")}")
    assert(rows("b") == Set(1L, 2L, 3L), s"main rows lost: ${rows("b")}")
    assert(spark.sql("CALL wapr.system.show_branches('ops')").count() == 0L)

    // OCC race mid-publish: a DISJOINT main commit lands between the
    // publish's head read and its CAS — the publish must lose the
    // version, re-read, re-prove disjointness, and land on the next one
    // with zero lost rows on either side
    spark.sql("CALL wapr.system.branch_create('ops', 'race')")
    spark.conf.set("graft.session.branch", "race")
    try spark.sql("INSERT INTO wapr.ops.a VALUES (4, 40)")
    finally spark.conf.unset("graft.session.branch")
    var fired = false
    ManifestTable.commitFaultInjector = { (r, _) =>
      if (r == root && !fired) {
        fired = true
        ManifestTable.commitFaultInjector = (_, _) => ()
        spark.sql("INSERT INTO wapr.ops.b VALUES (4, 400)")
      }
    }
    val racedV =
      try spark.sql("CALL wapr.system.branch_publish('ops', 'race')")
        .head.getLong(0)
      finally ManifestTable.commitFaultInjector = (_, _) => ()
    assert(fired, "injector never fired")
    assert(racedV == mainV(),
      s"raced publish v$racedV is not the head ${mainV()}")
    assert(rows("a") == Set(1L, 2L, 3L, 4L),
      s"branch row lost in the race: ${rows("a")}")
    assert(rows("b") == Set(1L, 2L, 3L, 4L),
      s"racing main row lost: ${rows("b")}")

    // true overlap still refuses loudly, naming the table
    spark.sql("CALL wapr.system.branch_create('ops', 'clash')")
    spark.conf.set("graft.session.branch", "clash")
    try spark.sql("INSERT INTO wapr.ops.a VALUES (5, 50)")
    finally spark.conf.unset("graft.session.branch")
    spark.sql("INSERT INTO wapr.ops.a VALUES (9, 90)")
    val clashHead = mainV()
    val refused = intercept[Exception] {
      spark.sql("CALL wapr.system.branch_publish('ops', 'clash')").collect()
    }
    assert(refused.getMessage.contains("modified by BOTH") &&
      refused.getMessage.contains("[a]"),
      s"overlap refusal wrong: ${refused.getMessage}")
    assert(mainV() == clashHead, "a refused publish committed something")
    assert(rows("a") == Set(1L, 2L, 3L, 4L, 9L))
    spark.sql("CALL wapr.system.branch_drop('ops', 'clash')").collect()

    // a branch that DROPS a table rebases too, as long as main left that
    // table alone: the published head must lose the table
    spark.sql("CALL wapr.system.branch_create('ops', 'dropb')")
    spark.conf.set("graft.session.branch", "dropb")
    try spark.sql("DROP TABLE wapr.ops.b")
    finally spark.conf.unset("graft.session.branch")
    spark.sql("INSERT INTO wapr.ops.a VALUES (6, 60)") // main, disjoint
    spark.sql("CALL wapr.system.branch_publish('ops', 'dropb')").collect()
    assert(ManifestTable.read(root).get.tables.get("b").isEmpty,
      "branch-side DROP TABLE did not survive the rebase publish")
    assert(rows("a") == Set(1L, 2L, 3L, 4L, 9L, 6L))
  }
}
