package graft.ingest

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Deterministic multi-format raw-batch synthesis.
  *
  * The reference ingests financial transactions from JSON/XML/CSV client
  * files (reference sql/01_raw_ingestion.sql). The driver's test schema has
  * no such files, so we synthesize byte-deterministic payloads from
  * `orders`/`lineitem`: orders %3=0 become JSON documents (two key-name
  * dialects to exercise the COALESCE pathing of sql/03_transform_headers.sql),
  * orders %3=1 become XML documents (attribute headers + <line> children,
  * the sql/03 xml_hdr branch), orders %3=2 become positional CSV rows
  * (sql/04 csv branch). Because pair = orderkey DIV 2 spans mod-3 classes,
  * the same (client_id, source_txn_id) arrives through different formats —
  * cross-source survivorship, exactly the reference's all_hdr union shape.
  * Engineered defects mirror the reference's anomaly matrix (all three
  * formats):
  *   - %97: source id omitted  → payload-hash fallback key
  *   - %101: amount "N/A"      → TRY_TO_NUMBER null → MISSING_REQUIRED
  *   - %89: negative amount    → NEGATIVE_AMOUNT
  *   - %103: truncated payload → structural parse failure (load audit)
  *   - orderkey DIV 2 pairing  → guaranteed (client_id, source_txn_id) dups
  *   - lineitem %113: negative quantity → NEGATIVE_QTY
  * The DuckDB oracle rebuilds identical strings (see OracleFrags), so
  * sha2 payload hashes and every parsed field hash-match cross-engine.
  *
  * Scale note: synthesis is map-only over orders except one groupBy to
  * aggregate line JSON per order — the same single shuffle a real
  * order⋈lines denormalization costs.
  */
object RawSynth {
  private val dec2 = DecimalType(18, 2)
  private def d2s(c: Column): Column = c.cast(dec2).cast("string")
  private def s(c: Column): Column = c.cast("string")

  /** Line amount as EXACT decimal arithmetic (scale 4): price and discount
    * are 2-dp values, so their product is exact at 4 dp — no double→decimal
    * rounding, whose midpoint behavior differs across engines.
    */
  private def lineAmtStr: Column =
    (col("l_extendedprice").cast(dec2) *
      (lit(1) - col("l_discount").cast(DecimalType(4, 2)))).cast("string")

  /** Deterministic per-order line position: l_linenumber has dups/gaps in
    * the test data, so line identity is positional under a total order.
    */
  private val posWindow = Window.partitionBy(col("l_orderkey"))
    .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))

  private def linesWithPos(sp: SparkSession, dir: String): DataFrame =
    Tables.lineitem(sp, dir)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount")
      .withColumn("pos", row_number().over(posWindow))

  /** ONE pass over lineitem shared by all three format branches: each
    * line row builds exactly the string its order's format (orderkey %3)
    * needs — JSON object, XML element, or (for CSV) nothing — and one
    * keyed aggregation produces per-order `lines_json`, `lines_xml` and
    * the CSV first-line fields. Previously each branch ran its own
    * row_number window and its own collect_list aggregation over ALL
    * lineitem rows (building strings that 2/3 of orders then discarded):
    * 3 windows + 2 aggregations + 1 filtered join → 1 window + 1
    * aggregation, and per-row string work drops ~2/3 (guide §1.2/§2.4 —
    * fewer passes, fewer shuffles). Payload bytes are unchanged: the
    * conditional `when(m3 = k, …)` feeds collect_list, which skips null
    * inputs, so each order aggregates exactly the strings its own format
    * branch used to build, in the same pos order.
    */
  private def lineAgg(sp: SparkSession, dir: String): DataFrame = {
    val lp = linesWithPos(sp, dir)
      .withColumn("m3", col("l_orderkey") % 3)
      .withColumn("v0", col("l_orderkey") % 2 === 0)
    val jsonObj = concat(lit("{"), concat_ws(",",
      when(col("pos") % 4 =!= 0, concat(lit("\"line_number\":"), s(col("pos")))),
      concat(when(col("v0"), lit("\"item_id\":\"ITEM")).otherwise(lit("\"sku\":\"ITEM")),
        s(col("l_partkey")), lit("\"")),
      concat(when(col("v0"), lit("\"description\":\"part ")).otherwise(lit("\"item_name\":\"part ")),
        s(col("l_partkey")), lit("\"")),
      concat(when(col("v0"), lit("\"quantity\":")).otherwise(lit("\"qty\":")), qtyStr),
      concat(when(col("v0"), lit("\"unit_price\":")).otherwise(lit("\"price\":")),
        d2s(col("l_extendedprice"))),
      concat(when(col("v0"), lit("\"line_amount\":")).otherwise(lit("\"amount\":")),
        lineAmtStr)
    ), lit("}"))
    val xmlObj = concat(lit("<line item_id=\"ITEM"), s(col("l_partkey")),
      lit("\" description=\"part "), s(col("l_partkey")),
      lit("\" quantity=\""), qtyStr,
      lit("\" unit_price=\""), d2s(col("l_extendedprice")),
      lit("\" line_amount=\""), lineAmtStr,
      lit("\"/>"))
    lp.groupBy(col("l_orderkey"))
      .agg(
        array_join(transform(array_sort(collect_list(
          when(col("m3") === 0, struct(col("pos"), jsonObj.as("obj"))))),
          x => x.getField("obj")), ",").as("lines_json"),
        array_join(transform(array_sort(collect_list(
          when(col("m3") === 1, struct(col("pos"), xmlObj.as("obj"))))),
          x => x.getField("obj")), "").as("lines_xml"),
        min_by(struct(col("l_partkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount")), col("pos")).as("fl"))
  }

  private val lineAggCache = graft.Caches.dfCache()

  /** The shared aggregation is referenced by all three branches of the
    * headers union; exchange reuse would already collapse the identical
    * subtrees inside ONE query, but the three raw batches are also read
    * as separate queries (ing_json_normalize etc.), so the one-pass
    * result is persisted like the other session-scoped staging tables.
    */
  private[graft] def lineAggCached(sp: SparkSession, dir: String): DataFrame =
    lineAggCache.getOrElseUpdate(sp, dir)(
      graft.Caches.pinLayout(lineAgg(sp, dir),
        Seq(col("l_orderkey")), Seq(col("l_orderkey"))))

  private def qtyStr: Column =
    when(col("l_partkey") % 113 === 0, concat(lit("-"), d2s(col("l_quantity"))))
      .otherwise(d2s(col("l_quantity")))

  /** Order-level shared fields: client, file, ingest time, raw currency. */
  private def withBase(o: DataFrame): DataFrame = o
    .withColumn("v0", col("o_orderkey") % 2 === 0)
    .withColumn("pair", expr("o_orderkey DIV 2"))
    .withColumn("client_id", concat(lit("C"), s(col("pair") % 3)))
    .withColumn("ingest_ts",
      expr("o_orderdate + make_dt_interval(cast(o_orderkey % 5 AS INT), 0, 0, 0)"))
    .withColumn("ccy0",
      element_at(array(lit("USD"), lit("EUR"), lit("GBP")),
        (col("o_custkey") % 3 + 1).cast("int")))
    .withColumn("ccy_raw",
      when(col("o_orderkey") % 7 === 0, lower(col("ccy0"))).otherwise(col("ccy0")))

  /** JSON raw batch: src_row_number, client_id, src_file, ingest_ts,
    * file_type, payload (string).
    */
  def jsonRaw(sp: SparkSession, dir: String): DataFrame = {
    val ljson = lineAggCached(sp, dir).select("l_orderkey", "lines_json")
      // an order whose rows all fed the OTHER branches aggregates an
      // empty string; the pre-refactor per-branch aggregation never saw
      // such orders (they are filtered below anyway — %3 partitions the
      // key space), so this select is total-result-identical
    val o = withBase(Tables.orders(sp, dir).filter(col("o_orderkey") % 3 === 0))
      .join(ljson, col("o_orderkey") === col("l_orderkey"), "left")

    val payload = concat(lit("{"), concat_ws(",",
      when(col("o_orderkey") % 97 === 0, lit(null).cast("string"))
        .otherwise(concat(
          when(col("v0"), lit("\"transaction_id\":\"TXN")).otherwise(lit("\"txn_id\":\"TXN")),
          s(col("pair")), lit("\""))),
      concat(when(col("v0"), lit("\"transaction_ts\":\"")).otherwise(lit("\"timestamp\":\"")),
        s(col("o_orderdate")), lit("\"")),
      concat(when(col("v0"), lit("\"currency\":\"")).otherwise(lit("\"ccy\":\"")),
        col("ccy_raw"), lit("\"")),
      concat(when(col("v0"), lit("\"total_amount\":")).otherwise(lit("\"amount\":")),
        when(col("o_orderkey") % 101 === 0, lit("\"N/A\""))
          .when(col("o_orderkey") % 89 === 0, concat(lit("-"), d2s(col("o_totalprice"))))
          .otherwise(d2s(col("o_totalprice")))),
      concat(when(col("v0"), lit("\"customer_id\":\"CUST")).otherwise(lit("\"customerId\":\"CUST")),
        s(col("o_custkey")), lit("\"")),
      when(col("v0"), concat(lit("\"account_id\":\"ACC"), s(col("o_custkey")), lit("\""))),
      concat(when(col("v0"), lit("\"merchant\":\"M")).otherwise(lit("\"payee\":\"M")),
        s(col("o_custkey") % 50), lit("\"")),
      when(col("lines_json").isNotNull,
        concat(lit("\"line_items\":["), col("lines_json"), lit("]")))
    ), lit("}"))

    o.select(
      col("o_orderkey").as("src_row_number"),
      col("client_id"),
      concat(lit("client_"), s(col("pair") % 3), lit("/json/batch_"),
        s(col("o_orderkey") % 10), lit(".json")).as("src_file"),
      col("ingest_ts"),
      lit("JSON").as("file_type"),
      when(col("o_orderkey") % 103 === 0, substring(payload, 1, 20))
        .otherwise(payload).as("payload"))
  }

  /** CSV raw batch: payload is a positional array<string>,
    * 1..7 = header (txn,ts,ccy,amt,cust,acct,merch), 8..12 = first line
    * (item,desc,qty,price,amount) — mirroring the reference's
    * "0..6=header, 7..11=line" mapping_assumption.
    */
  def csvRaw(sp: SparkSession, dir: String): DataFrame = {
    // first-line fields come from the shared aggregation's min_by struct —
    // the same row the old `filter(pos === 1)` join selected
    val l1 = lineAggCached(sp, dir)
      .select(col("l_orderkey"), col("fl.l_partkey").as("l_partkey"),
        col("fl.l_quantity").as("l_quantity"),
        col("fl.l_extendedprice").as("l_extendedprice"),
        col("fl.l_discount").as("l_discount"))
    val o = withBase(Tables.orders(sp, dir).filter(col("o_orderkey") % 3 === 2))
      .join(l1, col("o_orderkey") === col("l_orderkey"), "left")
    val fields = array(
      when(col("o_orderkey") % 97 === 0, lit(""))
        .otherwise(concat(lit("TXN"), s(col("pair")))),
      s(col("o_orderdate")),
      col("ccy_raw"),
      when(col("o_orderkey") % 101 === 0, lit("N/A"))
        .when(col("o_orderkey") % 89 === 0, concat(lit("-"), d2s(col("o_totalprice"))))
        .otherwise(d2s(col("o_totalprice"))),
      concat(lit("CUST"), s(col("o_custkey"))),
      concat(lit("ACC"), s(col("o_custkey"))),
      concat(lit("M"), s(col("o_custkey") % 50)),
      coalesce(concat(lit("ITEM"), s(col("l_partkey"))), lit("")),
      coalesce(concat(lit("part "), s(col("l_partkey"))), lit("")),
      coalesce(qtyStr, lit("")),
      coalesce(d2s(col("l_extendedprice")), lit("")),
      coalesce(lineAmtStr, lit("")))
    o.select(
      col("o_orderkey").as("src_row_number"),
      col("client_id"),
      concat(lit("client_"), s(col("pair") % 3), lit("/csv/transactions_"),
        s(col("o_orderkey") % 4), lit(".csv")).as("src_file"),
      col("ingest_ts"),
      lit("CSV").as("file_type"),
      when(col("o_orderkey") % 103 === 0, slice(fields, 1, 5))
        .otherwise(fields).as("payload"))
  }

  /** XML raw batch (header attributes + <line> children), the third source
    * branch of the canonical pipeline (reference sql/03 xml_hdr + sql/04
    * xml_line). DuckDB has no XML type, but every payload is a deterministic
    * string concat, so the oracle rebuilds identical bytes (and sha2 hashes)
    * without parsing XML — parsed-field expectations derive straight from
    * `orders` ground truth.
    */
  def xmlRaw(sp: SparkSession, dir: String): DataFrame = {
    val lxml = lineAggCached(sp, dir).select("l_orderkey", "lines_xml")
    val o = withBase(Tables.orders(sp, dir).filter(col("o_orderkey") % 3 === 1))
      .join(lxml, col("o_orderkey") === col("l_orderkey"), "left")
    val payload = concat(
      lit("<txn "),
      when(col("o_orderkey") % 97 === 0, lit(""))
        .otherwise(concat(lit("transaction_id=\"TXN"), s(col("pair")), lit("\" "))),
      lit("transaction_ts=\""), s(col("o_orderdate")),
      lit("\" currency=\""), col("ccy_raw"),
      lit("\" total_amount=\""),
      when(col("o_orderkey") % 101 === 0, lit("N/A"))
        .when(col("o_orderkey") % 89 === 0, concat(lit("-"), d2s(col("o_totalprice"))))
        .otherwise(d2s(col("o_totalprice"))),
      lit("\" customer_id=\"CUST"), s(col("o_custkey")),
      lit("\" account_id=\"ACC"), s(col("o_custkey")),
      lit("\" merchant=\"M"), s(col("o_custkey") % 50),
      lit("\">"), coalesce(col("lines_xml"), lit("")), lit("</txn>"))
    o.select(
      col("o_orderkey").as("src_row_number"),
      col("client_id"),
      concat(lit("client_"), s(col("pair") % 3), lit("/xml/batch_"),
        s(col("o_orderkey") % 10), lit(".xml")).as("src_file"),
      col("ingest_ts"),
      lit("XML").as("file_type"),
      when(col("o_orderkey") % 103 === 0, substring(payload, 1, 20))
        .otherwise(payload).as("payload"))
  }
}
