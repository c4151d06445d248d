package graft

import java.sql.Timestamp

/** Typed canonical model (reference sql/02_canonical_ddl.sql), the
  * Dataset[T] face of the pipeline for callers who want compile-time
  * schemas; the DataFrame operators remain the primary (schema-dynamic)
  * surface. `attributes` is the VARIANT analogue: the raw payload +
  * source_format as a JSON string, keeping the RAW layer re-processable
  * from the canonical grain alone.
  */
case class CanTxn(
  canonical_txn_id: String,
  client_id: String,
  source_system: String,
  source_txn_id: String,
  txn_timestamp: Timestamp,       // null when TRY_TO_TIMESTAMP failed
  currency: String,
  total_amount: BigDecimal,       // null when TRY_TO_NUMBER failed
  customer_id: String,
  account_id: String,
  merchant: String,
  src_file: String,
  ingest_ts: Timestamp,
  dup_cnt: Long,
  anomaly_codes: Seq[String],
  is_valid: Boolean,
  attributes: String)

case class CanTxnLine(
  canonical_txn_id: String,
  client_id: String,
  source_system: String,
  line_number: Int,
  line_txn_id: String,
  item_id: String,
  description: String,
  quantity: BigDecimal,
  unit_price: BigDecimal,
  line_amount: BigDecimal,
  currency: String,
  src_file: String,
  ingest_ts: Timestamp,
  attributes: String)

case class CanTxnAnomaly(
  canonical_txn_id: String,
  client_id: String,
  source_system: String,
  anomaly_code: String,
  line_number: Option[Int],       // None for header-grain anomalies
  src_file: String,
  anomaly_detail: String)
