package graft.streaming

import graft.sources.ManifestTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's ops views (sql/07_ops_views.sql) deployed as LIVE
  * CDF-fed marts over the streamed canonical tables — the composition of
  * [[CanonicalStream]] (which publishes change feeds on its grains) and
  * [[IncrementalMart]] (which folds a feed into a persisted rollup).
  *
  * Each view's aggregate decomposes into the mart algebra:
  *  - VW_CANON_COUNTS (sql/07_ops_views.sql:16): `COUNT(*)` is the mart's
  *    row count; `SUM(IFF(is_valid, 1, 0))` is the sum of a prepared 0/1
  *    column — all additive, so the mart maintains itself from the feed
  *    alone, one touched group per changed (client_id, source_system);
  *  - VW_ANOMALY_COUNTS (sql/07_ops_views.sql:24): pure `COUNT(*)` per
  *    (client_id, source_system, anomaly_code) — additive;
  *  - VW_LOAD_AUDIT_SUMMARY (sql/07_ops_views.sql:6): counts and sums are
  *    additive; `MAX(load_ts)` rides the maxCols fast-path/fallback rule.
  *
  * A warehouse deployment calls [[syncAll]] after (or concurrently with)
  * each canonical increment; per-sync cost scales with the increment's
  * churn, never with table size. Readers get the exact reference view
  * shape from [[canonCounts]]/[[anomalyCounts]]/[[loadAuditSummary]].
  */
object OpsMarts {

  val CanonCountsMart = "vw_canon_counts"
  val AnomalyCountsMart = "vw_anomaly_counts"
  val LoadAuditMart = "vw_load_audit_summary"

  /** VW_CANON_COUNTS maintainer config over the canonical header feed. */
  def canonCountsConfig(tableRoot: String, martRoot: String)
      : IncrementalMart.Config =
    IncrementalMart.Config(
      sourceRoot = tableRoot,
      martRoot = martRoot,
      groupCols = Seq("client_id", "source_system"),
      valueCols = Seq("valid", "invalid"),
      sourceTable = CanonicalStream.HeaderTable,
      martTable = CanonCountsMart,
      prepare = df => df
        .withColumn("valid", when(col("is_valid"), 1L).otherwise(0L))
        .withColumn("invalid", when(col("is_valid"), 0L).otherwise(1L)))

  /** VW_ANOMALY_COUNTS maintainer config over the anomaly-grain feed. */
  def anomalyCountsConfig(tableRoot: String, martRoot: String)
      : IncrementalMart.Config =
    IncrementalMart.Config(
      sourceRoot = tableRoot,
      martRoot = martRoot,
      groupCols = Seq("client_id", "source_system", "anomaly_code"),
      valueCols = Nil,
      sourceTable = CanonicalStream.AnomalyTable,
      martTable = AnomalyCountsMart)

  /** VW_LOAD_AUDIT_SUMMARY maintainer config over the audit-grain feed —
    * the non-additive mart: `latest_load_ts` is a maxCols column.
    */
  def loadAuditConfig(tableRoot: String, martRoot: String)
      : IncrementalMart.Config =
    IncrementalMart.Config(
      sourceRoot = tableRoot,
      martRoot = martRoot,
      groupCols = Seq("file_type", "load_status"),
      valueCols = Seq("rows_parsed", "rows_loaded", "errors_seen"),
      sourceTable = CanonicalStream.AuditTable,
      martTable = LoadAuditMart,
      maxCols = Seq("load_ts"))

  private def all(tableRoot: String, martRoot: String) = Seq(
    "canon_counts" -> canonCountsConfig(tableRoot, martRoot),
    "anomaly_counts" -> anomalyCountsConfig(tableRoot, martRoot),
    "load_audit" -> loadAuditConfig(tableRoot, martRoot))

  /** Drain every canonical feed backlog into its mart (AvailableNow). Each
    * mart owns a checkpoint under `checkpointRoot`, so repeated calls — and
    * restarts after a crash — resume exactly-once from the last folded
    * commit version.
    */
  def syncAll(spark: SparkSession, tableRoot: String, martRoot: String,
      checkpointRoot: String): Unit =
    all(tableRoot, martRoot).foreach { case (name, cfg) =>
      IncrementalMart.sync(spark, cfg, s"$checkpointRoot/$name")
    }

  // ---- readers: the committed marts in the reference view shape ----

  /** VW_CANON_COUNTS (client_id, source_system, txn_count,
    * valid_txn_count, invalid_txn_count).
    */
  def canonCounts(spark: SparkSession, martRoot: String): DataFrame =
    ManifestTable.readTable(spark, martRoot, table = CanonCountsMart)
      .select(col("client_id"), col("source_system"),
        col(IncrementalMart.RowsCol).as("txn_count"),
        col("sum_valid").as("valid_txn_count"),
        col("sum_invalid").as("invalid_txn_count"))

  /** VW_ANOMALY_COUNTS (client_id, source_system, anomaly_code,
    * anomaly_count).
    */
  def anomalyCounts(spark: SparkSession, martRoot: String): DataFrame =
    ManifestTable.readTable(spark, martRoot, table = AnomalyCountsMart)
      .select(col("client_id"), col("source_system"), col("anomaly_code"),
        col(IncrementalMart.RowsCol).as("anomaly_count"))

  /** VW_LOAD_AUDIT_SUMMARY (file_type, load_status, batch_count,
    * total_rows_parsed, total_rows_loaded, total_errors_seen,
    * latest_load_ts).
    */
  def loadAuditSummary(spark: SparkSession, martRoot: String): DataFrame =
    ManifestTable.readTable(spark, martRoot, table = LoadAuditMart)
      .select(col("file_type"), col("load_status"),
        col(IncrementalMart.RowsCol).as("batch_count"),
        col("sum_rows_parsed").as("total_rows_parsed"),
        col("sum_rows_loaded").as("total_rows_loaded"),
        col("sum_errors_seen").as("total_errors_seen"),
        col("max_load_ts").as("latest_load_ts"))
}
