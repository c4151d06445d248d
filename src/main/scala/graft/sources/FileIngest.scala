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

  /** Positional CSV: payload surfaces as array<string>, the same shape the
    * CSV HeaderNormalizer branch consumes.
    */
  def csvLines(s: SparkSession, path: String): DataFrame =
    textLines(s, path, "CSV")
      .withColumn("payload", split(col("payload"), ","))

  /** One XML document per line. */
  def xmlLines(s: SparkSession, path: String): DataFrame =
    textLines(s, path, "XML")

  private def textLines(s: SparkSession, path: String, fmt: String): DataFrame = {
    val byFile = Window.partitionBy("src_file").orderBy("_read_pos")
    s.read.text(path)
      .select(
        col("value").as("payload"),
        col("_metadata.file_name").as("src_file"),
        col("_metadata.file_modification_time").as("ingest_ts"),
        monotonically_increasing_id().as("_read_pos"))
      .withColumn("src_row_number", row_number().over(byFile).cast("long"))
      .withColumn("client_id",
        concat(lit("C"), regexp_extract(col("src_file"), "client_([0-9]+)", 1)))
      .withColumn("file_type", lit(fmt))
      .select("src_row_number", "client_id", "src_file", "ingest_ts",
        "file_type", "payload")
  }
}
