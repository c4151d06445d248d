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

  /** Publish: write the new manifest beside the live one, then one atomic
    * rename. REPLACE_EXISTING + ATOMIC_MOVE means a reader either sees the
    * old complete manifest or the new complete manifest, never a partial
    * write and never a missing file.
    */
  def commit(root: File, m: Manifest): Unit = {
    Files.createDirectories(root.toPath)
    val tmp = new File(root, s".${ManifestName}.tmp")
    Files.write(tmp.toPath, render(m).getBytes(UTF_8))
    Files.move(tmp.toPath, new File(root, ManifestName).toPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING): Unit
  }

  /** Drop every directory under `data/` the current manifest doesn't
    * reference: superseded generations and orphans from crashed writers.
    * Runs strictly AFTER a successful commit, so nothing a reader can
    * resolve is ever deleted. (Local caveat, as in any snapshot table
    * without retention: a reader still iterating a pre-GC snapshot loses
    * its files — real deployments keep N snapshots before vacuuming.)
    */
  def gc(root: File, m: Manifest): Unit = {
    val live = m.buckets.values.toSet
    val dataDir = new File(root, "data")
    val children = dataDir.listFiles
    if (children != null)
      children.filterNot(d => live.contains(s"data/${d.getName}"))
        .foreach(deleteRecursively)
  }

  /** Resolve the committed snapshot. Missing manifest or zero buckets →
    * empty-table semantics are the caller's concern; here it's an error to
    * read a table that was never committed.
    */
  def readTable(spark: SparkSession, root: String): DataFrame = {
    val m = read(new File(root)).getOrElse(
      throw new java.io.FileNotFoundException(s"no $ManifestName under $root"))
    val dirs = m.buckets.values.toSeq.sorted.map(rel => new File(root, rel).toString)
    spark.read.parquet(dirs: _*)
  }

  def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) f.listFiles.foreach(deleteRecursively)
    f.delete(): Unit
  }
}
