package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Nested line-item normalization (reference sql/04_transform_lines.sql):
  * LATERAL FLATTEN ≡ posexplode_outer, with the reference's index-fallback
  * line numbering (`COALESCE(value:line_number, index + 1)`) and
  * line-currency inheritance from the header payload.
  *
  * Operates on the already-canonicalized survivor rows, so the line grain
  * inherits canonical_txn_id without a re-join (the reference re-joins the
  * staged header to the raw table; doing it in one pass avoids a second
  * shuffle of the raw data at scale).
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
