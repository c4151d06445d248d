package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Load telemetry (reference sql/01_raw_ingestion.sql RAW_LOAD_AUDIT):
  * per-file rows parsed/loaded/errors + first error pointer + status,
  * computed from the normalized staging rows' parse_ok flag — the Spark
  * equivalent of COPY INTO ... ON_ERROR='CONTINUE' + RESULT_SCAN capture.
  */
object LoadAudit {

  /** headers: any staging frame with src_file, file_type, parse_ok,
    * src_row_number.
    */
  def audit(headers: DataFrame): DataFrame = headers
    .groupBy(col("src_file"), col("file_type"))
    .agg(
      count(lit(1)).as("rows_parsed"),
      sum(when(col("parse_ok"), 1L).otherwise(0L)).as("rows_loaded"),
      sum(when(col("parse_ok"), 0L).otherwise(1L)).as("errors_seen"),
      min(when(!col("parse_ok"), col("src_row_number"))).as("first_error_row"),
      // RAW_LOAD_AUDIT.first_error (reference sql/01:56): the TEXT of the
      // first error, not just its row — what an operator reads during an
      // incident. min_by over the error rows only (FILTER).
      expr("min_by(parse_error, src_row_number) FILTER (WHERE NOT parse_ok)")
        .as("first_error"),
      // RAW_LOAD_AUDIT.load_ts analogue (reference sql/01:57): wall-clock
      // load time isn't reproducible, so the deterministic stand-in is the
      // latest ingest timestamp the file contributed.
      max(col("ingest_ts")).as("load_ts"))
    .withColumn("load_status",
      when(col("errors_seen") === 0, "LOADED")
        .when(col("rows_loaded") === 0, "LOAD_FAILED")
        .otherwise("PARTIALLY_LOADED"))

  /** Audit including COPY-skip telemetry: files the ledger excluded from
    * the read (FileIngest.incremental) surface as zero-row
    * SKIPPED_ALREADY_LOADED entries, mirroring COPY INTO's load_history
    * report on a re-run.
    */
  def auditWithSkips(headers: DataFrame,
      skipped: Seq[(String, String)]): DataFrame = {
    val s = headers.sparkSession
    import s.implicits._
    val skipDf = skipped.toDF("src_file", "file_type")
      .withColumn("rows_parsed", lit(0L))
      .withColumn("rows_loaded", lit(0L))
      .withColumn("errors_seen", lit(0L))
      .withColumn("first_error_row", lit(null).cast("long"))
      .withColumn("first_error", lit(null).cast("string"))
      .withColumn("load_ts", lit(null).cast("timestamp"))
      .withColumn("load_status", lit("SKIPPED_ALREADY_LOADED"))
    audit(headers).unionByName(skipDf)
  }
}
