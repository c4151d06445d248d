package graft.streaming

import java.io.File

import graft.sources.ManifestTable
import graft.sources.ManifestTable.TableBatch
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Self-maintaining aggregate mart over a [[ManifestTable]] change data
  * feed — the downstream half of the CDF contract, and the Spark-native
  * analogue of the reference's stream-fed summary marts (a Snowflake task
  * consuming a STREAM to keep OPS_* rollups current;
  * sql/07_operational_views.sql derives them on demand, a warehouse
  * deployment materializes them exactly this way).
  *
  * The maintainer subscribes with `format("graft-cdf")` and, per
  * micro-batch, folds the commit deltas into a persisted mart table:
  *
  *   1. [[ManifestTable.deltaAggregate]] nets the batch's change rows into
  *      per-group deltas (inserts/postimages `+`, preimages/deletes `−`) —
  *      one row per TOUCHED group, never a table scan;
  *   2. the mart rows for exactly those groups are loaded via the mart's
  *      own hash-bucketing ([[ManifestTable.readTableBuckets]] — opens
  *      only covering buckets);
  *   3. old state ⊕ delta is merged back replace-by-key under the same
  *      (queryId, batchId) idempotence and atomic-manifest commit as every
  *      other sink — a group netted to zero rows is deleted, a group the
  *      update MIGRATED gets `−` in its old group and `+` in its new one
  *      by construction of the preimage rows.
  *
  * Per-trigger cost therefore scales with CHURN (changed groups × bucket
  * width), never with mart or source size: at 100 TB the mart never
  * rescans its source, and a restart resumes exactly-once from the
  * checkpointed feed version. Invariant (spec-locked):
  * `mart == source.groupBy(groupCols).agg(count(*), sum(valueCols))` after
  * every drained commit, from any retained starting point.
  */
object IncrementalMart {

  /** `count(*)` column name in the mart; value sums land as `sum_<col>`. */
  val RowsCol = "n_rows"

  final case class Config(
      sourceRoot: String,
      martRoot: String,
      groupCols: Seq[String],
      valueCols: Seq[String],
      sourceTable: String = ManifestTable.DefaultTable,
      martTable: String = ManifestTable.DefaultTable,
      numBuckets: Int = 8)

  /** Subscribe and maintain continuously (caller owns the trigger). */
  def start(spark: SparkSession, cfg: Config, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream.format("graft-cdf")
      .option("path", cfg.sourceRoot).option("table", cfg.sourceTable)
      .load()
      .writeStream.option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch((batch: DataFrame, batchId: Long) =>
        applyBatch(cfg, batch, batchId))
      .start()

  /** Drain the feed backlog into the mart and return (AvailableNow). */
  def sync(spark: SparkSession, cfg: Config, checkpoint: String): Unit = {
    val q = start(spark, cfg, checkpoint)
    q.awaitTermination()
  }

  /** One micro-batch of feed rows → one atomic mart commit. Also usable
    * directly over a batch [[ManifestTable.readChangeFeed]] range.
    */
  def applyBatch(cfg: Config, batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return // empty feed version: nothing to fold
    val spark = batch.sparkSession
    val deltas = ManifestTable
      .deltaAggregate(batch, cfg.groupCols, cfg.valueCols)
      .persist()
    try {
      // covering mart buckets of the touched groups — the writer's own
      // hash, evaluated over the already-aggregated (churn-sized) frame;
      // at most numBuckets distinct values come back
      val bucketExpr =
        pmod(xxhash64(cfg.groupCols.map(col).toIndexedSeq: _*),
          lit(cfg.numBuckets))
      val touched = deltas.select(bucketExpr.as("__b")).distinct()
        .collect().map(_.getLong(0)).toSet
      val sumCols = cfg.valueCols.map(c => s"sum_$c")
      val martSchema = StructType(
        cfg.groupCols.map(k => deltas.schema(k))
          ++ Seq(StructField(RowsCol, LongType))
          ++ cfg.valueCols.map(c =>
            StructField(s"sum_$c", deltas.schema(s"delta_$c").dataType)))
      val bucketRows = ManifestTable
        .readTableBuckets(spark, cfg.martRoot, touched, cfg.martTable)
        .getOrElse(spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], martSchema))
      // only the touched groups participate; co-bucketed strangers stay
      // out of the rewrite (replace-by-key deletes just the touched keys)
      val keyCond = cfg.groupCols
        .map(k => col(s"m.$k") <=> col(s"d.$k")).reduce(_ && _)
      val merged = bucketRows.alias("m")
        .join(deltas.alias("d"), keyCond, "left_semi")
        .alias("m")
        .join(deltas.alias("d"), keyCond, "full_outer")
        .select(
          cfg.groupCols.map(k => coalesce(col(s"m.$k"), col(s"d.$k")).as(k))
            ++ Seq((coalesce(col(s"m.$RowsCol"), lit(0L))
              + col(s"d.delta_rows")).as(RowsCol))
            ++ cfg.valueCols.map(c =>
              (coalesce(col(s"m.sum_$c"), lit(0).cast(
                deltas.schema(s"delta_$c").dataType))
                + coalesce(col(s"d.delta_$c"), lit(0)))
                .as(s"sum_$c")): _*)
        .filter(col(RowsCol) > 0)
      ManifestTable.mergeBatch(new File(cfg.martRoot),
        EventPipeline.currentQueryId(spark), batchId,
        Seq(TableBatch(cfg.martTable, merged, cfg.groupCols, cfg.numBuckets,
          deleteKeys =
            Some(deltas.select(cfg.groupCols.map(col).toIndexedSeq: _*)))))
    } finally { deltas.unpersist(); () }
  }
}
