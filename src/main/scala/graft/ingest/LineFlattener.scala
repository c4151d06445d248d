package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Nested line-item normalization (reference sql/04_transform_lines.sql):
  * LATERAL FLATTEN ≡ posexplode_outer, with the reference's index-fallback
  * line numbering (`COALESCE(value:line_number, index + 1)`) and
  * line-currency inheritance from the header payload. All three source
  * branches (JSON / XML / CSV-positional) flatten to the same grain.
  *
  * Operates on the already-canonicalized survivor rows, so the line grain
  * inherits canonical_txn_id without a re-join (the reference re-joins the
  * staged header to the raw table; doing it in one pass avoids a second
  * shuffle of the raw data at scale).
  *
  * `attributes` is the line-grain VARIANT analogue (reference sql/04
  * OBJECT_CONSTRUCT('raw_line', li.value, 'source_format', …)). Snowflake's
  * li.value is itself a re-serialized parse (not original payload bytes),
  * so the faithful equivalent is the NORMALIZED field snapshot: the
  * post-cast values rendered at canonical scale — deterministic across
  * engines, unlike raw JSON number tokens which Jackson re-renders through
  * double. Nulls are serialized explicitly (ignoreNullFields=false).
  */
object LineFlattener {

  private def tryCasts(df: DataFrame): DataFrame = df
    .withColumn("line_number",
      coalesce(expr("try_cast(ln_raw as int)"), (col("pos") + 1).cast("int")))
    .withColumn("quantity", expr("try_cast(qty_raw as decimal(18,2))"))
    .withColumn("unit_price", expr("try_cast(price_raw as decimal(18,2))"))
    // scale 4: line_amount = price(2dp) × (1-discount(2dp)) is exact at 4dp;
    // parsing at the payload's native scale avoids any midpoint rounding
    .withColumn("line_amount", expr("try_cast(amt_raw as decimal(18,4))"))
    .withColumn("attributes", to_json(
      struct(
        struct(col("line_number").cast("string").as("line_number"),
          col("line_txn_id"), col("item_id"), col("description"),
          col("quantity").cast("string").as("quantity"),
          col("unit_price").cast("string").as("unit_price"),
          col("line_amount").cast("string").as("line_amount")).as("raw_line"),
        col("source_system").as("source_format")),
      Map("ignoreNullFields" -> "false")))
    .drop("ln_raw", "qty_raw", "price_raw", "amt_raw", "pos")

  /** JSON survivors → canonical line rows. */
  def fromJsonSurvivors(survivors: DataFrame): DataFrame = {
    val exploded = survivors
      .select(
        col("canonical_txn_id"), col("client_id"), col("source_system"),
        col("src_file"), col("ingest_ts"), col("currency").as("hdr_currency"),
        posexplode_outer(col("line_items")).as(Seq("pos", "li")))
      .filter(col("li").isNotNull)
    tryCasts(exploded.select(
      col("canonical_txn_id"), col("client_id"), col("source_system"),
      col("li.line_number").as("ln_raw"),
      col("pos"),
      coalesce(col("li.line_id"), col("li.id")).as("line_txn_id"),
      coalesce(col("li.item_id"), col("li.sku"), col("li.product_id")).as("item_id"),
      coalesce(col("li.description"), col("li.item_name"), col("li.name"))
        .as("description"),
      coalesce(col("li.quantity"), col("li.qty")).as("qty_raw"),
      coalesce(col("li.unit_price"), col("li.price")).as("price_raw"),
      coalesce(col("li.line_amount"), col("li.amount"), col("li.total")).as("amt_raw"),
      coalesce(upper(col("li.currency")), col("hdr_currency")).as("currency"),
      col("src_file"), col("ingest_ts")))
  }

  /** XML survivors → canonical line rows (reference sql/04 xml_line:
    * attribute-addressed fields, index-fallback numbering, header-currency
    * inheritance).
    */
  def fromXmlSurvivors(survivors: DataFrame): DataFrame = {
    val exploded = survivors
      .select(
        col("canonical_txn_id"), col("client_id"), col("source_system"),
        col("src_file"), col("ingest_ts"), col("currency").as("hdr_currency"),
        posexplode_outer(col("xml_lines")).as(Seq("pos", "li")))
      .filter(col("li").isNotNull)
    tryCasts(exploded.select(
      col("canonical_txn_id"), col("client_id"), col("source_system"),
      lit(null).cast("string").as("ln_raw"),
      col("pos"),
      lit(null).cast("string").as("line_txn_id"),
      col("li._item_id").as("item_id"),
      col("li._description").as("description"),
      col("li._quantity").as("qty_raw"),
      col("li._unit_price").as("price_raw"),
      col("li._line_amount").as("amt_raw"),
      col("hdr_currency").as("currency"),
      col("src_file"), col("ingest_ts")))
  }

  /** CSV survivors → single positional line per transaction (reference
    * mapping assumption: one line in columns 7..11).
    */
  def fromCsvSurvivors(survivors: DataFrame): DataFrame = {
    tryCasts(survivors
      .filter(col("csv_item").isNotNull || col("csv_desc").isNotNull ||
        col("csv_amount").isNotNull)
      .select(
        col("canonical_txn_id"), col("client_id"), col("source_system"),
        lit("1").as("ln_raw"),
        lit(0).as("pos"),
        lit(null).cast("string").as("line_txn_id"),
        col("csv_item").as("item_id"),
        col("csv_desc").as("description"),
        col("csv_qty").as("qty_raw"),
        col("csv_price").as("price_raw"),
        col("csv_amount").as("amt_raw"),
        col("currency"),
        col("src_file"), col("ingest_ts")))
  }
}
