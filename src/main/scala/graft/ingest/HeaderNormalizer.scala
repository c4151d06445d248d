package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}
import scala.jdk.CollectionConverters._

/** Multi-format header normalization (reference sql/03_transform_headers.sql):
  * wide COALESCE key pathing, TRY_TO_* resilient casts, UPPER(currency),
  * SHA2 payload hash. Spark-first: ONE `from_json` per document (the
  * reference re-parses per field; Catalyst would too with repeated
  * get_json_object) with a corrupt-record column for load-audit telemetry.
  * All leaf fields are declared string and converted with try_cast —
  * matching the reference's `::STRING` + TRY_TO_NUMBER semantics.
  */
object HeaderNormalizer {

  val lineSchemaDdl: String =
    """array<struct<
      |  line_number:string, line_id:string, id:string,
      |  item_id:string, sku:string, product_id:string,
      |  description:string, item_name:string, name:string,
      |  quantity:string, qty:string,
      |  unit_price:string, price:string,
      |  line_amount:string, amount:string, total:string,
      |  currency:string>>""".stripMargin.replaceAll("\\s+", " ")

  val headerSchema: StructType = StructType.fromDDL(
    s"""transaction_id string, txn_id string, id string,
       |transaction_ts string, transaction_time string, `timestamp` string, txn_timestamp string,
       |currency string, ccy string,
       |total_amount string, amount string, total string,
       |customer_id string, customerId string,
       |account_id string, accountId string,
       |merchant string, payee string,
       |line_items $lineSchemaDdl,
       |_corrupt string""".stripMargin.replaceAll("\n", " "))

  /** The canonical header staging columns every source branch produces. */
  val headerCols: Seq[String] = Seq(
    "client_id", "source_system", "source_txn_id", "txn_timestamp", "currency",
    "total_amount", "customer_id", "account_id", "merchant",
    "src_file", "src_row_number", "ingest_ts", "payload_hash", "parse_ok",
    "parse_error", "file_type", "line_items", "raw_currency", "attributes")

  /** VARIANT analogue (reference sql/03 OBJECT_CONSTRUCT('raw_payload', …,
    * 'source_format', …), sql/02_canonical_ddl.sql:21,39): the raw payload
    * rides the canonical grain as a JSON string, keeping the RAW layer
    * re-processable from CAN_TXN alone. Field order and escaping are plain
    * JSON, so the DuckDB oracle rebuilds identical bytes via struct_pack.
    */
  private def attrs(payloadKey: String, fmt: String): Column =
    to_json(struct(col("payload").as(payloadKey), lit(fmt).as("source_format")))

  /** TRY_TO_TIMESTAMP / TRY_TO_NUMBER equivalents: null on bad input, never
    * an ANSI error. Applied over an intermediate column so the try_cast SQL
    * stays a plain column reference.
    */
  private def tryCasts(df: DataFrame): DataFrame = df
    .withColumn("txn_timestamp", expr("try_cast(ts_raw as timestamp)"))
    .withColumn("total_amount", expr("try_cast(amt_raw as decimal(18,2))"))
    .drop("ts_raw", "amt_raw")

  /** JSON branch: raw (payload string) → normalized header staging rows. */
  def fromJson(raw: DataFrame): DataFrame = {
    val p = raw.withColumn("parsed",
      from_json(col("payload"), headerSchema,
        Map("columnNameOfCorruptRecord" -> "_corrupt")))
    tryCasts(p.select(
      col("client_id"),
      lit("JSON").as("source_system"),
      coalesce(col("parsed.transaction_id"), col("parsed.txn_id"), col("parsed.id"))
        .as("source_txn_id"),
      coalesce(col("parsed.transaction_ts"), col("parsed.transaction_time"),
        col("parsed.timestamp"), col("parsed.txn_timestamp")).as("ts_raw"),
      upper(coalesce(col("parsed.currency"), col("parsed.ccy"))).as("currency"),
      coalesce(col("parsed.total_amount"), col("parsed.amount"),
        col("parsed.total")).as("amt_raw"),
      coalesce(col("parsed.customer_id"), col("parsed.customerId")).as("customer_id"),
      coalesce(col("parsed.account_id"), col("parsed.accountId")).as("account_id"),
      coalesce(col("parsed.merchant"), col("parsed.payee")).as("merchant"),
      col("src_file"), col("src_row_number"), col("ingest_ts"),
      sha2(col("payload"), 256).as("payload_hash"),
      col("parsed._corrupt").isNull.as("parse_ok"),
      // RAW_LOAD_AUDIT.first_error fidelity (reference sql/01:56): WHAT
      // failed, with the offending bytes — the column an operator reads
      // during an incident
      when(col("parsed._corrupt").isNotNull,
        concat(lit("malformed JSON: "), substring(col("payload"), 1, 48)))
        .as("parse_error"),
      col("file_type"),
      col("parsed.line_items").as("line_items"),
      coalesce(col("parsed.currency"), col("parsed.ccy")).as("raw_currency"),
      attrs("raw_payload", "JSON").as("attributes")))
  }

  /** CSV branch: raw (payload array<string>, positional) → header staging.
    * try_element_at: short/corrupt rows yield nulls, never errors (ANSI).
    */
  def fromCsv(raw: DataFrame): DataFrame = {
    def at(i: Int): Column = expr(s"nullif(try_element_at(payload, $i), '')")
    tryCasts(raw.select(
      col("client_id"),
      lit("CSV").as("source_system"),
      at(1).as("source_txn_id"),
      at(2).as("ts_raw"),
      upper(at(3)).as("currency"),
      at(4).as("amt_raw"),
      at(5).as("customer_id"),
      at(6).as("account_id"),
      at(7).as("merchant"),
      col("src_file"), col("src_row_number"), col("ingest_ts"),
      sha2(array_join(col("payload"), "|"), 256).as("payload_hash"),
      (size(col("payload")) === 12).as("parse_ok"),
      when(size(col("payload")) =!= 12,
        concat(lit("expected 12 fields, got "),
          size(col("payload")).cast("string"))).as("parse_error"),
      col("file_type"),
      lit(null).cast(org.apache.spark.sql.types.DataTypes.createArrayType(
        headerSchema("line_items").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType))
        .as("line_items"),
      at(3).as("raw_currency"),
      attrs("csv_payload", "CSV").as("attributes"),
      // CSV line fields ride along for LineFlattener's positional branch
      at(8).as("csv_item"), at(9).as("csv_desc"), at(10).as("csv_qty"),
      at(11).as("csv_price"), at(12).as("csv_amount")))
  }

  /** XML branch via Spark 4 native from_xml: header fields as attributes
    * (`_`-prefixed), nested <line> children (reference sql/03 xml_hdr).
    * A corrupt-record column marks structurally-broken documents (the
    * COPY ON_ERROR=CONTINUE analogue), feeding parse_ok and load audit.
    */
  def fromXml(raw: DataFrame): DataFrame = {
    val xmlSchema = StructType.fromDDL(
      """_transaction_id string, _transaction_ts string, _currency string,
        |_total_amount string, _customer_id string, _account_id string,
        |_merchant string,
        |line array<struct<_item_id:string,_description:string,_quantity:string,_unit_price:string,_line_amount:string>>,
        |_corrupt string"""
        .stripMargin.replaceAll("\n", " "))
    tryCasts(raw.withColumn("parsed",
      from_xml(col("payload"), xmlSchema,
        Map("columnNameOfCorruptRecord" -> "_corrupt").asJava))
      .select(
        col("client_id"),
        lit("XML").as("source_system"),
        col("parsed._transaction_id").as("source_txn_id"),
        col("parsed._transaction_ts").as("ts_raw"),
        upper(col("parsed._currency")).as("currency"),
        col("parsed._total_amount").as("amt_raw"),
        col("parsed._customer_id").as("customer_id"),
        col("parsed._account_id").as("account_id"),
        col("parsed._merchant").as("merchant"),
        col("src_file"), col("src_row_number"), col("ingest_ts"),
        sha2(col("payload"), 256).as("payload_hash"),
        col("parsed._corrupt").isNull.as("parse_ok"),
        when(col("parsed._corrupt").isNotNull,
          concat(lit("malformed XML: "), substring(col("payload"), 1, 48)))
          .as("parse_error"),
        col("file_type"),
        col("parsed.line").as("xml_lines"),
        col("parsed._currency").as("raw_currency"),
        attrs("raw_payload", "XML").as("attributes")))
  }
}
