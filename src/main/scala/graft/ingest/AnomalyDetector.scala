package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quality-event grain (reference sql/06_anomaly_detection.sql): header
  * anomaly arrays exploded to one row per rule hit, plus line-level
  * negative-value rules. Both are map-only over already-shuffled inputs.
  */
object AnomalyDetector {

  val headerDetail = "Header-level anomaly from canonical header validation"
  val lineDetail = "Line-level negative value detected"

  /** One row per (surviving txn, anomaly code). */
  def headerAnomalies(survivors: DataFrame): DataFrame = survivors
    .select(
      col("canonical_txn_id"), col("client_id"), col("source_system"),
      explode(col("anomaly_codes")).as("anomaly_code"),
      lit(null).cast("int").as("line_number"),
      col("src_file"),
      lit(headerDetail).as("anomaly_detail"))

  /** NEGATIVE_QTY / NEGATIVE_AMOUNT_LINE rule hits on the line grain. */
  def lineAnomalies(lines: DataFrame): DataFrame = lines
    .filter(col("quantity") < 0 || col("line_amount") < 0)
    .select(
      col("canonical_txn_id"), col("client_id"), col("source_system"),
      when(col("quantity") < 0, lit("NEGATIVE_QTY"))
        .otherwise(lit("NEGATIVE_AMOUNT_LINE")).as("anomaly_code"),
      col("line_number"),
      col("src_file"),
      lit(lineDetail).as("anomaly_detail"))
}
