package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** File-based raw ingestion: point the engine at a directory of real
  * client batch files and get the same staging-row contract the in-memory
  * synthesizer produces (`src_row_number, client_id, src_file, ingest_ts,
  * file_type, payload`), ready for the HeaderNormalizer branches —
  * mirroring the reference's stage→COPY ingestion
  * (reference sql/01_raw_ingestion.sql) with `spark.read` + file metadata.
  *
  * Line numbering derives from a per-file window over the read order —
  * stable while each file maps to a single split (client batch files are
  * small; large files should carry explicit row ids or use a
  * row-index-capable format). `ingest_ts` is the file's modification time,
  * the load-audit timestamp a real landing zone provides.
  */
object FileIngest {

  /** One JSON document per line (JSONL client batches). */
  def jsonLines(s: SparkSession, path: String): DataFrame =
    textLines(s, path, "JSON")

  /** The CSV payload contract in ONE place: positional split to
    * array<string>, the shape the CSV HeaderNormalizer branch consumes —
    * the full-load, incremental, and streaming paths all route through it
    * so a future delimiter/quote change can't drift between them.
    */
  private[graft] def csvPayload(df: DataFrame): DataFrame =
    df.withColumn("payload", split(col("payload").cast("string"), ","))

  /** Positional CSV: payload surfaces as array<string>. */
  def csvLines(s: SparkSession, path: String): DataFrame =
    csvPayload(textLines(s, path, "CSV"))

  /** One XML document per line. */
  def xmlLines(s: SparkSession, path: String): DataFrame =
    textLines(s, path, "XML")

  // ------------------------------------------------------------------
  // COPY INTO-style load-history idempotence (reference
  // sql/01_raw_ingestion.sql:66-75 relies on COPY silently skipping
  // already-loaded files so the whole script is re-runnable). The ledger
  // is a plain text file of loaded file NAMES, consulted BEFORE the read:
  // already-loaded files are excluded from the scan path list entirely
  // (file-granularity pushdown — a re-run reads zero bytes of old data,
  // exactly COPY's behavior), and commits replace the ledger atomically.
  // File listing is driver-side metadata, the same scale class as Spark's
  // own file index; row data never touches the driver.
  // ------------------------------------------------------------------

  /** Outcome of an incremental load: rows of the NEW files only, plus the
    * file names that were read and the ones skipped as already loaded.
    * Call [[commitLoaded]] with `newFiles` after the rows are durably
    * written; a crash before the commit re-reads those files next run
    * (at-least-once, the COPY model) — never silently drops them.
    */
  final case class Incremental(rows: DataFrame, newFiles: Seq[String],
    skippedFiles: Seq[String])

  /** File names recorded as loaded (empty if the ledger doesn't exist). */
  def ledgerContents(ledger: java.io.File): Set[String] =
    if (!ledger.exists) Set.empty
    else {
      val src = scala.io.Source.fromFile(ledger, "UTF-8")
      try src.getLines().filter(_.nonEmpty).toSet finally src.close()
    }

  /** Record `files` as loaded: rewrite-and-atomic-rename of the (small)
    * ledger, so readers never observe a partial ledger.
    */
  def commitLoaded(ledger: java.io.File, files: Seq[String]): Unit = {
    val all = (ledgerContents(ledger) ++ files).toSeq.sorted
    val tmp = new java.io.File(ledger.getParentFile, "." + ledger.getName + ".tmp")
    java.nio.file.Files.write(tmp.toPath,
      (all.mkString("\n") + "\n").getBytes("UTF-8"))
    java.nio.file.Files.move(tmp.toPath, ledger.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  /** Idempotent directory load: only files absent from the ledger are
    * read. Re-running over an unchanged directory returns 0 rows and
    * reports every file as skipped.
    */
  def incremental(s: SparkSession, dir: String, fmt: String,
      ledger: java.io.File): Incremental = {
    val all = listDataFiles(dir)
    val loaded = ledgerContents(ledger)
    val (skip, fresh) = all.partition(loaded)
    val base =
      if (fresh.isEmpty) emptyLines(s)
      else textLines(s, fresh.map(n => new java.io.File(dir, n).toString), fmt)
    val rows = if (fmt == "CSV") csvPayload(base) else base
    Incremental(rows, fresh, skip)
  }

  /** The staging-row contract as a schema constant — emptyLines derives
    * from it and textLines' output is asserted against it in
    * IngestionSpec, so the empty-directory path cannot drift from the
    * real one when a column is added or renamed.
    */
  private[graft] val stagingSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("src_row_number", LongType),
      StructField("client_id", StringType),
      StructField("src_file", StringType),
      StructField("ingest_ts", TimestampType),
      StructField("file_type", StringType),
      StructField("payload", StringType)))
  }

  private[graft] def emptyLines(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      stagingSchema)

  private def textLines(s: SparkSession, path: String, fmt: String): DataFrame =
    textLines(s, Seq(path), fmt)

  private[graft] def textLines(s: SparkSession, paths: Seq[String],
      fmt: String): DataFrame =
    stageRaw(
      s.read.text(paths: _*)
        .select(
          col("value").as("payload"),
          col("_metadata.file_name").as("src_file"),
          col("_metadata.file_modification_time").as("ingest_ts")),
      fmt)

  /** Raw (payload, src_file, ingest_ts) lines → the staging-row contract:
    * per-file line numbering under the read order, client id from the file
    * name. Shared by the batch readers above and the streaming canonical
    * sink (whose micro-batches carry whole files — the file-source unit —
    * so per-file numbering is identical in both modes).
    */
  private[graft] def stageRaw(raw: DataFrame, fmt: String): DataFrame = {
    val byFile = Window.partitionBy("src_file").orderBy("_read_pos")
    raw
      .withColumn("_read_pos", monotonically_increasing_id())
      .withColumn("src_row_number", row_number().over(byFile).cast("long"))
      .withColumn("client_id",
        concat(lit("C"), regexp_extract(col("src_file"), "client_([0-9]+)", 1)))
      .withColumn("file_type", lit(fmt))
      .select("src_row_number", "client_id", "src_file", "ingest_ts",
        "file_type", "payload")
  }

  /** Landing-zone data files of a directory (driver-side metadata listing,
    * the same scale class as Spark's own file index).
    */
  private[graft] def listDataFiles(dir: String): Seq[String] =
    Option(new java.io.File(dir).listFiles).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
      .map(_.getName).sorted.toSeq
}
