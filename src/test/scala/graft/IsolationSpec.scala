package graft

import java.io.File

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{GraftCatalog, ManifestTable}
import graft.sources.ManifestTable.TableBatch

/** Row-level operation isolation levels: `serializable` (default)
  * aborts a statement on ANY concurrent same-table commit; tables
  * declaring `TBLPROPERTIES ('isolationLevel'='snapshot')` narrow the
  * conflict to the statement's bucket footprint — bucket-disjoint
  * concurrent commits rebase and BOTH publish (sound because a merge key
  * only ever lives in its hash bucket), overlapping or layout-changing
  * commits still abort.
  */
class IsolationSpec extends SparkSpec {

  import spark.implicits._

  private val Buckets = 4

  /** ids 0..199 partitioned by their graft bucket (the writer's own
    * hash), so tests can aim commits at chosen buckets.
    */
  private lazy val idsByBucket: Map[Long, Seq[Long]] =
    (0L until 200L).toDF("id")
      .withColumn("b", pmod(xxhash64(col("id")), lit(Buckets)))
      .collect().map(r => (r.getLong(1), r.getLong(0)))
      .groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).toSeq }

  private def mk(ids: Seq[Long], v: Double): DataFrame =
    ids.map(i => (i, v)).toDF("id", "v")

  private def build(name: String, iso: Option[String],
      mode: String = "copy-on-write"): File = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft_$name").toString
    spark.conf.set(s"spark.sql.catalog.$name", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $name.ops")
    val isoProp = iso.fold("")(l => s", 'isolationLevel'='$l'")
    spark.sql(s"""CREATE TABLE $name.ops.t (id BIGINT NOT NULL, v DOUBLE)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='$Buckets',
        'rowLevelMode'='$mode'$isoProp)""")
    val seed = idsByBucket.values.flatten.toSeq.sorted.take(40)
    ManifestTable.mergeBatch(new File(wh, "ops"), "seed", 0L, Seq(
      TableBatch("t", mk(seed, 1.0), Seq("id"), Buckets)))
    new File(wh, "ops")
  }

  /** One parquet file inside each generation dir of `bucket` — the
    * `replacedFiles` a row-level scan of that bucket would have planned.
    */
  private def filesOf(root: File, bucket: Long): Seq[String] =
    ManifestTable.read(root).get.table("t").buckets(bucket).flatMap { g =>
      new File(root, g.path).listFiles.filter(_.getName.endsWith(".parquet"))
        .map(_.toString).toSeq
    }

  /** The seed rows living in `bucket` (the seed is exactly ids 0-39). */
  private def seeded(bucket: Long): Seq[Long] =
    idsByBucket(bucket).filter(_ < 40L)

  test("snapshot isolation: a bucket-disjoint concurrent commit rebases — both effects publish") {
    val root = build("iso1", Some("snapshot"))
    val bA = idsByBucket.keys.min
    val bB = idsByBucket.keys.max
    val base = ManifestTable.read(root).get.version
    val victims = seeded(bA)
    val planned = filesOf(root, bA)

    // the interleaved commit: an append landing ONLY in bucket B
    ManifestTable.mergeBatch(root, "rival", 0L, Seq(TableBatch("t",
      mk(idsByBucket(bB).filter(_ >= 100L).take(3), 9.0),
      Seq("id"), Buckets, append = true)))
    assert(ManifestTable.read(root).get.version == base + 1)

    // the statement computed against `base` replaces bucket A's groups
    ManifestTable.replaceGroups(spark, root, "t", planned,
      mk(victims, -5.0), "MERGE", base)

    val now = ManifestTable.readTable(spark, root.toString, table = "t")
    // the rewrite landed …
    assert(now.filter(col("v") === -5.0).count() == victims.size)
    // … and the rival's rows SURVIVED the rebase
    assert(now.filter(col("v") === 9.0).count() == 3)
  }

  test("snapshot isolation: an overlapping-bucket concurrent commit still aborts, publishing nothing") {
    val root = build("iso2", Some("snapshot"))
    val bA = idsByBucket.keys.min
    val base = ManifestTable.read(root).get.version
    val victims = seeded(bA)
    val planned = filesOf(root, bA)

    // rival lands in the SAME bucket the statement replaces
    ManifestTable.mergeBatch(root, "rival", 0L, Seq(TableBatch("t",
      mk(idsByBucket(bA).filter(_ >= 100L).take(2), 9.0),
      Seq("id"), Buckets, append = true)))

    intercept[ManifestTable.ConcurrentCommitException] {
      ManifestTable.replaceGroups(spark, root, "t", planned,
        mk(victims, -5.0), "MERGE", base)
    }
    val now = ManifestTable.readTable(spark, root.toString, table = "t")
    assert(now.filter(col("v") === -5.0).count() == 0, "nothing published")
    assert(now.filter(col("v") === 9.0).count() == 2)

    // a concurrent LAYOUT change aborts even when bucket-disjoint
    val base2 = ManifestTable.read(root).get.version
    spark.sql("ALTER TABLE iso2.ops.t ADD COLUMNS (note STRING)")
    intercept[ManifestTable.ConcurrentCommitException] {
      ManifestTable.replaceGroups(spark, root, "t", filesOf(root, bA),
        mk(victims, -7.0), "MERGE", base2)
    }
  }

  test("serializable (the default) aborts even bucket-disjoint concurrent commits") {
    val root = build("iso3", None)
    val bA = idsByBucket.keys.min
    val bB = idsByBucket.keys.max
    val base = ManifestTable.read(root).get.version
    val planned = filesOf(root, bA)
    ManifestTable.mergeBatch(root, "rival", 0L, Seq(TableBatch("t",
      mk(idsByBucket(bB).filter(_ >= 100L).take(1), 9.0),
      Seq("id"), Buckets, append = true)))
    intercept[ManifestTable.ConcurrentCommitException] {
      ManifestTable.replaceGroups(spark, root, "t", planned,
        mk(seeded(bA), -5.0), "MERGE", base)
    }
  }

  test("merge-on-read path: bucket-disjoint delta commits rebase under snapshot isolation, overlapping abort") {
    val root = build("iso4", Some("snapshot"), mode = "merge-on-read")
    val bA = idsByBucket.keys.min
    val bB = idsByBucket.keys.max
    val base = ManifestTable.read(root).get.version
    val touch = seeded(bA).take(2)

    ManifestTable.mergeBatch(root, "rival", 0L, Seq(TableBatch("t",
      mk(idsByBucket(bB).filter(_ >= 100L).take(2), 9.0),
      Seq("id"), Buckets, append = true)))

    val staged = touch.map(i => (i, -3.0, "u"))
      .toDF("id", "v", ManifestTable.RowOpCol)
    ManifestTable.applyRowDeltas(spark, root, "t", staged, "UPDATE", base)
    // reconciled read (the graft reader folds the outstanding deltas)
    val now = spark.read.format("graft")
      .option("path", root.toString).option("table", "t").load()
    assert(now.filter(col("v") === -3.0).count() == touch.size)
    assert(now.filter(col("v") === 9.0).count() == 2)

    // overlap: a second stale statement into the SAME bucket as a
    // concurrent delta commit aborts
    val base2 = ManifestTable.read(root).get.version
    ManifestTable.applyRowDeltas(spark, root, "t",
      Seq((idsByBucket(bA).filter(_ >= 100L).head, 8.0, "i"))
        .toDF("id", "v", ManifestTable.RowOpCol), "MERGE", base2)
    intercept[ManifestTable.ConcurrentCommitException] {
      ManifestTable.applyRowDeltas(spark, root, "t",
        mk(touch, -4.0).withColumn(ManifestTable.RowOpCol, lit("u")),
        "UPDATE", base2)
    }
  }
}
