package graft

import java.io.File
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.ManifestTable
import graft.sources.ManifestTable.TableBatch

/** Time-based retention (`TBLPROPERTIES ('retainHours'='N')` — the
  * warehouse DATA_RETENTION_TIME semantics): versions inside the time
  * window stay time-travelable and GC-protected past the version-count
  * window; once their commit timestamps age out (simulated here by
  * backdating the version files' recorded `ts`), GC sweeps their data
  * and time travel refuses them.
  */
class RetentionSpec extends SparkSpec {

  import spark.implicits._

  private def mk(v: Double): DataFrame =
    (0L until 8L).map(i => (i, v)).toDF("id", "value")

  /** Rewrite the recorded commit timestamp of version `v` to `ts`. */
  private def backdate(root: File, v: Long, ts: Long): Unit = {
    val f = new File(root, s"MANIFEST.v$v")
    val body = new String(Files.readAllBytes(f.toPath), UTF_8)
    val aged = body.replaceFirst(""""ts"\s*:\s*\d+""", s""""ts" : $ts""")
    assert(aged != body, s"no ts field found in MANIFEST.v$v")
    Files.write(f.toPath, aged.getBytes(UTF_8)): Unit
  }

  test("retainHours keeps versions travelable and their data alive past the count window; aged-out versions sweep and refuse") {
    val root = new File(
      java.nio.file.Files.createTempDirectory("graft_ret").toString)
    def commit(b: Long): Unit =
      ManifestTable.mergeBatch(root, "q", b, Seq(
        TableBatch("t", mk(b.toDouble), Seq("id"), 2,
          props = Map("retainVersions" -> "1", "retainHours" -> "48"))))

    (0L until 8L).foreach(commit) // versions 1..8, each a full rewrite
    val current = ManifestTable.read(root).get.version
    assert(current == 8L)

    // version 2 is far outside every count window (table 1, root
    // default 3) but inside 48h — still served, with ITS data
    val old = ManifestTable.readTable(spark, root.toString,
      version = Some(2L), table = "t")
    assert(old.agg(max("value")).head.getDouble(0) == 1.0)

    // and GC kept the superseded generations alive: more than the last
    // 3 versions' worth of data dirs survive
    def genDirs: Int = new File(root, "data/t").listFiles.count(_.isDirectory)
    val aliveDirs = genDirs
    assert(aliveDirs > 6,
      s"time window should hold superseded generations, found $aliveDirs")

    // age versions 1-5 out of the window; the next commit's GC sweeps
    (1L to 5L).foreach(backdate(root, _, 1000L))
    commit(8L) // version 9
    assert(genDirs < aliveDirs, "aged-out generations must sweep")

    // aged-out time travel refuses loudly …
    intercept[java.io.FileNotFoundException] {
      ManifestTable.readTable(spark, root.toString,
        version = Some(2L), table = "t").collect()
    }
    // … while a version beyond the count window but inside the time
    // window still serves
    assert(ManifestTable.readTable(spark, root.toString,
      version = Some(6L), table = "t")
      .agg(max("value")).head.getDouble(0) == 5.0)
  }

  test("a named ref on one table pins its data manifest-wide but does NOT widen a sibling table's own travel window") {
    val root = new File(
      java.nio.file.Files.createTempDirectory("graft_refscope").toString)
    def commit(b: Long, extra: Map[String, String] = Map.empty): Unit =
      ManifestTable.mergeBatch(root, "q", b, Seq(
        TableBatch("t", mk(b.toDouble), Seq("id"), 2,
          props = Map("retainVersions" -> "1") ++ extra),
        TableBatch("s", mk(b.toDouble), Seq("id"), 2,
          props = Map("retainVersions" -> "1"))))
    commit(0L) // version 1
    val pinV = ManifestTable.read(root).get.version
    // pin version 1 through a ref declared on table t only, then age it
    // far out of every count window
    commit(1L, Map("ref.keep" -> pinV.toString))
    (2L to 7L).foreach(commit(_))
    assert(ManifestTable.read(root).get.version == 8L)

    // t's own ref serves the pinned snapshot through t ...
    assert(ManifestTable.readTable(spark, root.toString,
      version = Some(pinV), table = "t").count() == 8L,
      "the declaring table must travel to its own pinned version")
    // ... but the SAME version through s refuses: a sibling's ref keeps
    // the DATA alive (GC protection is rightly manifest-global) without
    // silently widening s's declared table-scoped window
    intercept[java.io.FileNotFoundException] {
      ManifestTable.readTable(spark, root.toString,
        version = Some(pinV), table = "s").collect()
    }
  }

  test("without retainHours the count window alone governs (previous behavior intact)") {
    val root = new File(
      java.nio.file.Files.createTempDirectory("graft_ret2").toString)
    def commit(b: Long): Unit =
      ManifestTable.mergeBatch(root, "q", b, Seq(
        TableBatch("t", mk(b.toDouble), Seq("id"), 2)))
    (0L until 6L).foreach(commit) // versions 1..6
    intercept[java.io.FileNotFoundException] {
      ManifestTable.readTable(spark, root.toString,
        version = Some(2L), table = "t").collect()
    }
    assert(ManifestTable.readTable(spark, root.toString,
      version = Some(5L), table = "t")
      .agg(max("value")).head.getDouble(0) == 4.0)
  }
}
