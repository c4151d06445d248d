package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The canonical derivation chain shared by the batch operators
  * (graft.operators.Ingestion) and the streaming/incremental maintainer
  * (graft.streaming.CanonicalStream): staged headers → survivors → line
  * grain → anomaly grain, plus the stored canonical-model projections
  * (reference sql/03_transform_headers.sql → sql/06_anomaly_detection.sql).
  * One copy — a change to a branch's flatten/union rule cannot diverge the
  * batch queries from the incrementally-maintained tables, whose specs
  * assert hash-equality against each other.
  */
object CanonicalChain {

  /** The reference's all_hdr: JSON ∪ XML ∪ CSV staging rows
    * (sql/03_transform_headers.sql:26,59) — union order fixed so the
    * staged schema's column order is stable everywhere.
    */
  def unionHeaders(json: DataFrame, xml: DataFrame, csv: DataFrame): DataFrame =
    json.unionByName(xml, allowMissingColumns = true)
      .unionByName(csv, allowMissingColumns = true)

  /** Line grain from the surviving headers: each source branch flattens its
    * own nested shape (sql/04_transform_lines.sql).
    */
  def linesFrom(surv: DataFrame): DataFrame =
    LineFlattener.fromJsonSurvivors(
        surv.filter(col("source_system") === "JSON" && col("parse_ok")))
      .unionByName(LineFlattener.fromXmlSurvivors(
        surv.filter(col("source_system") === "XML" && col("parse_ok"))))
      .unionByName(LineFlattener.fromCsvSurvivors(
        surv.filter(col("source_system") === "CSV" && col("parse_ok"))))

  /** Quality-event grain: header rule hits ∪ line rule hits
    * (sql/06_anomaly_detection.sql).
    */
  def anomaliesFrom(surv: DataFrame, lines: DataFrame): DataFrame =
    AnomalyDetector.headerAnomalies(surv)
      .unionByName(AnomalyDetector.lineAnomalies(lines))

  /** The stored CAN_TXN projection of a survivor row (SURVEY §3 / the
    * CanTxn case class), the header-table shape the maintainer commits.
    */
  def headerModel(surv: DataFrame): DataFrame = surv.select(
    col("canonical_txn_id"), col("client_id"), col("source_system"),
    col("effective_source_txn_id").as("source_txn_id"),
    col("txn_timestamp"), col("currency"), col("total_amount"),
    col("customer_id"), col("account_id"), col("merchant"),
    col("src_file"), col("ingest_ts"), col("dup_cnt"),
    col("anomaly_codes"), col("is_valid"), col("attributes"))

  /** The stored CAN_TXN_LINE projection (SURVEY §3 / CanTxnLine). */
  def lineModel(lines: DataFrame): DataFrame = lines.select(
    col("canonical_txn_id"), col("client_id"), col("source_system"),
    col("line_number"), col("line_txn_id"), col("item_id"),
    col("description"), col("quantity"), col("unit_price"),
    col("line_amount"), col("currency"), col("src_file"),
    col("ingest_ts"), col("attributes"))
}
