package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dependency-free atomic-commit table layout — the engine's analogue of the
  * reference's transactional MERGE target (reference
  * sql/05_merge_canonical.sql:1, a Snowflake MERGE whose visibility is
  * governed by the warehouse's commit protocol).
  *
  * Layout: immutable data directories under `data/`, and ONE mutable object —
  * the `MANIFEST` file at the table root. Readers resolve the table's file
  * list exclusively through the manifest, so data files are invisible until
  * a commit publishes them; writers write data first, then atomically
  * replace the manifest (`Files.move` with `ATOMIC_MOVE`, a single rename
  * syscall on POSIX). A crash at ANY point before the rename leaves the
  * previously-committed table byte-identical and fully readable; the
  * orphaned data dirs are garbage-collected by the next successful commit.
  * This is the same two-phase shape Delta/Iceberg use (write files → swap
  * one metadata pointer), restated with zero dependencies; on real object
  * storage the rename becomes the table format's metadata-swap primitive.
  *
  * The manifest also records the last committed streaming batch id, making
  * foreachBatch replays after a crash detectable as exact no-ops (micro-batch
  * ids are stable across restarts — the Structured Streaming sink contract).
  */
object ManifestTable {

  val ManifestName = "MANIFEST"

  /** version: monotonically increasing commit counter.
    * lastBatch: highest streaming batch id folded in (-1 = none).
    * buckets: merge-key bucket → relative path of its current data dir.
    */
  case class Manifest(version: Long, lastBatch: Long, buckets: Map[Long, String]) {
    def advance(batchId: Long, replaced: Map[Long, String]): Manifest =
      Manifest(version + 1, math.max(lastBatch, batchId), buckets ++ replaced)
  }

  val empty: Manifest = Manifest(0L, -1L, Map.empty)

  /** Plain line format (no parser deps): `version`, `lastBatch`, then one
    * `bucket<TAB>relativePath` line per bucket.
    */
  private def render(m: Manifest): String = {
    val header = s"version=${m.version}\nlastBatch=${m.lastBatch}\n"
    header + m.buckets.toSeq.sortBy(_._1)
      .map { case (b, p) => s"$b\t$p\n" }.mkString
  }

  private def parse(text: String): Manifest = {
    val lines = text.split("\n").filter(_.nonEmpty)
    val version = lines(0).stripPrefix("version=").toLong
    val lastBatch = lines(1).stripPrefix("lastBatch=").toLong
    val buckets = lines.drop(2).map { l =>
      val Array(b, p) = l.split("\t", 2)
      b.toLong -> p
    }.toMap
    Manifest(version, lastBatch, buckets)
  }

  def read(root: File): Option[Manifest] = {
    val f = new File(root, ManifestName)
    if (!f.exists) None
    else Some(parse(new String(Files.readAllBytes(f.toPath), UTF_8)))
  }

  /** Snapshots retained by [[gc]]: readers may time-travel this many
    * versions back (current + RetainVersions-1 older), and a reader still
    * iterating a recent pre-GC snapshot keeps its files — the same
    * retention contract a Delta VACUUM window provides.
    */
  val RetainVersions = 3

  /** Publish: the live pointer swaps FIRST (atomic rename), then the
    * immutable per-version manifest (`.v{N}`, the time-travel handle) is
    * written — also through a tmp + ATOMIC_MOVE, so a version-addressed
    * reader can never parse a torn file. The ordering matters: writing
    * the `.v` file before the live swap would let time travel serve a
    * never-committed snapshot after a crash in the window between the
    * two writes. With live-first, that crash only leaves the committed
    * version's `.v` file missing — `readTable(Some(v))` falls back to
    * the live manifest when the versions match, so even that window
    * reads cleanly.
    */
  def commit(root: File, m: Manifest): Unit = {
    Files.createDirectories(root.toPath)
    val tmp = new File(root, s".${ManifestName}.tmp")
    Files.write(tmp.toPath, render(m).getBytes(UTF_8))
    Files.move(tmp.toPath, new File(root, ManifestName).toPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING): Unit
    val vtmp = new File(root, s".${ManifestName}.v.tmp")
    Files.write(vtmp.toPath, render(m).getBytes(UTF_8))
    Files.move(vtmp.toPath, versionFile(root, m.version).toPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING): Unit
  }

  private def versionFile(root: File, v: Long): File =
    new File(root, s"$ManifestName.v$v")

  /** Bucket paths a retained version resolves; Nil if the version's
    * manifest is gone (aged out or never published).
    */
  def readVersionBuckets(root: File, v: Long): Seq[String] = {
    val f = versionFile(root, v)
    if (f.exists)
      parse(new String(Files.readAllBytes(f.toPath), UTF_8)).buckets.values.toSeq
    else Nil
  }

  private def retainedVersions(root: File, current: Long): Seq[Long] =
    ((current - RetainVersions + 1) max 0) to current

  /** Vacuum: drop every `data/` directory no RETAINED snapshot references
    * (superseded generations past the retention window, and orphans from
    * crashed writers), plus per-version manifests that aged out of the
    * window or were never published. Runs strictly AFTER a successful
    * commit, so nothing a retained snapshot resolves is ever deleted.
    */
  def gc(root: File, m: Manifest): Unit = {
    val retained = retainedVersions(root, m.version)
    val live: Set[String] =
      retained.flatMap(readVersionBuckets(root, _)).toSet ++ m.buckets.values
    val children = new File(root, "data").listFiles
    if (children != null)
      children.filterNot(d => live.contains(s"data/${d.getName}"))
        .foreach(deleteRecursively)
    val stale = root.listFiles
    if (stale != null)
      stale.filter { f =>
        val n = f.getName
        n.startsWith(s"$ManifestName.v") &&
          !retained.contains(n.stripPrefix(s"$ManifestName.v").toLong)
      }.foreach(deleteRecursively)
  }

  /** Resolve a committed snapshot — the live one, or `version` within the
    * retention window (time travel). Missing manifest or evicted version →
    * clean error, never a partial read.
    */
  def readTable(spark: SparkSession, root: String,
      version: Option[Long] = None): DataFrame = {
    val rootF = new File(root)
    val m = version match {
      case None =>
        read(rootF).getOrElse(throw new java.io.FileNotFoundException(
          s"no $ManifestName under $root"))
      case Some(v) =>
        val f = versionFile(rootF, v)
        if (f.exists) parse(new String(Files.readAllBytes(f.toPath), UTF_8))
        else {
          // crash window: live pointer swapped but the .v file didn't land
          // — the live manifest IS that version, serve it
          val live = read(rootF)
          if (live.exists(_.version == v)) live.get
          else throw new java.io.FileNotFoundException(
            s"version $v of $root is not retained (window $RetainVersions)")
        }
    }
    val dirs = m.buckets.values.toSeq.sorted.map(rel => new File(root, rel).toString)
    spark.read.parquet(dirs: _*)
  }

  /** Manifest-level file skipping for point lookups: the sink hash-buckets
    * its rows on the merge key, so a key can only live in ONE bucket — a
    * lookup resolves just the covering bucket dirs from the manifest and
    * never opens the rest (the bucketed-table analogue of partition
    * pruning, done at the table-metadata layer). `numBuckets` must match
    * the writer's bucketing.
    */
  def bucketsForKeys(spark: SparkSession, keys: Seq[Long],
      numBuckets: Int): Seq[Long] = {
    // evaluate the SAME Catalyst expression the writer's
    // pmod(xxhash64(col), lit(n)) compiles to, driver-side: a point
    // lookup must stay metadata-only — launching a Spark job to hash five
    // literals would pay the very scheduling latency pruning avoids
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    keys.map { k =>
      val h = XxHash64(Seq(Literal(k)), 42L).eval(null).asInstanceOf[Long]
      ((h % numBuckets) + numBuckets) % numBuckets
    }.distinct
  }

  def readTableForKeys(spark: SparkSession, root: String, keyCol: String,
      keys: Seq[Long], numBuckets: Int): DataFrame = {
    import org.apache.spark.sql.functions.col
    val m = read(new File(root)).getOrElse(
      throw new java.io.FileNotFoundException(s"no $ManifestName under $root"))
    val covering = bucketsForKeys(spark, keys, numBuckets).toSet
    val dirs = m.buckets.filter { case (b, _) => covering.contains(b) }
      .values.toSeq.sorted.map(rel => new File(root, rel).toString)
    if (dirs.isEmpty) readTable(spark, root).limit(0)
    else spark.read.parquet(dirs: _*)
      .filter(col(keyCol).isin(keys: _*))
  }

  def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) f.listFiles.foreach(deleteRecursively)
    f.delete(): Unit
  }
}
