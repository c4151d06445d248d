package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic canonical keys + survivorship + header anomaly flags
  * (reference sql/03_transform_headers.sql enriched/ranked CTEs).
  *
  * - canonical_txn_id = SHA2(client_id | source_txn_id), falling back to the
  *   payload hash when the source id is missing — same key on every replay,
  *   which is what makes the downstream merge idempotent.
  * - Survivorship: latest ingest wins within (client_id, source_txn_id);
  *   NULL ids group together, exactly like the reference's window. Tie-broken
  *   on src_row_number so results are deterministic under any partitioning.
  * - One hash shuffle (the window partition key); no global sort. At 100 TB
  *   this is the minimal-cost formulation of MERGE-style dedup.
  */
object Canonicalizer {

  val survivorshipWindow = Window
    .partitionBy(col("client_id"), col("source_txn_id"))
    .orderBy(col("ingest_ts").desc, col("src_row_number").desc)

  def canonicalize(headers: DataFrame): DataFrame = headers
    .withColumn("effective_source_txn_id",
      coalesce(col("source_txn_id"), col("payload_hash")))
    .withColumn("canonical_txn_id",
      sha2(concat(col("client_id"), lit("|"), col("effective_source_txn_id")), 256))
    .withColumn("rn", row_number().over(survivorshipWindow))
    .withColumn("dup_cnt",
      count(lit(1)).over(Window.partitionBy(col("client_id"), col("source_txn_id"))))
    .withColumn("anomaly_codes", array_compact(array(
      when(col("dup_cnt") > 1, lit("DUPLICATE_TXN")),
      when(col("txn_timestamp").isNull || col("total_amount").isNull,
        lit("MISSING_REQUIRED")),
      when(col("total_amount") < 0, lit("NEGATIVE_AMOUNT")))))
    .withColumn("is_valid", size(col("anomaly_codes")) === 0)

  /** The surviving (latest) row per canonical key.
    *
    * NOT `canonicalize().filter(rn = 1)`: survivorship only needs the
    * winner per key, so it runs as ONE hash aggregation — `max_by` of the
    * whole row struct ordered by (ingest_ts, src_row_number) — instead of
    * a full-row shuffle + per-partition sort + two window passes. The
    * aggregate collapses map-side (partial max_by keeps one candidate row
    * per key per mapper before the exchange) and never sorts; `max_by` of
    * the ASC struct ≡ rn = 1 under the DESC window order, with the same
    * null placement (DESC puts null ingest_ts last; ASC max prefers
    * non-null). Output schema, order, and values are identical —
    * IngestionSpec + the DuckDB window-SQL oracles pin the equivalence.
    */
  def survivors(headers: DataFrame): DataFrame = {
    val enriched = headers
      .withColumn("effective_source_txn_id",
        coalesce(col("source_txn_id"), col("payload_hash")))
      .withColumn("canonical_txn_id",
        sha2(concat(col("client_id"), lit("|"),
          col("effective_source_txn_id")), 256))
    enriched
      .groupBy(col("client_id").as("k_client"),
        col("source_txn_id").as("k_txn"))
      .agg(max_by(struct(enriched.columns.map(col): _*),
        struct(col("ingest_ts"), col("src_row_number"))).as("w"),
        count(lit(1)).as("dup_cnt"))
      .select(col("w.*"), lit(1).as("rn"), col("dup_cnt"))
      .withColumn("anomaly_codes", array_compact(array(
        when(col("dup_cnt") > 1, lit("DUPLICATE_TXN")),
        when(col("txn_timestamp").isNull || col("total_amount").isNull,
          lit("MISSING_REQUIRED")),
        when(col("total_amount") < 0, lit("NEGATIVE_AMOUNT")))))
      .withColumn("is_valid", size(col("anomaly_codes")) === 0)
  }
}
