package graft

import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._

import graft.sources.GraftCatalog

/** The DSv2 statistics surface (`GraftBatchScan.estimateStatistics`):
  * manifest-derived rows/bytes for the PRUNED selection, so Catalyst
  * sizes joins from what the scan actually reads — a small or
  * well-pruned graft table auto-broadcasts with no hint.
  */
class StatsSpec extends SparkSpec {

  test("pruned scans report pruned stats; a small catalog table auto-broadcasts in a join") {
    val wh = java.nio.file.Files.createTempDirectory("graft_stats").toString
    spark.conf.set("spark.sql.catalog.st", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.st.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS st.ops")
    spark.sql("""CREATE TABLE st.ops.dim (id BIGINT NOT NULL, name STRING)
      USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='4')""")
    spark.sql(
      "INSERT INTO st.ops.dim SELECT id, concat('n', id) FROM range(200)")

    // relation-level stats: the real table size, not defaultSizeInBytes
    val full = spark.sql("SELECT * FROM st.ops.dim")
    val fullStats = full.queryExecution.optimizedPlan.stats
    assert(fullStats.sizeInBytes > 0 &&
      fullStats.sizeInBytes < 10L * 1024 * 1024,
      s"expected real bytes, got ${fullStats.sizeInBytes}")

    // scan-level stats after pushdown: the bucket-pruned selection
    val pruned = spark.sql("SELECT * FROM st.ops.dim WHERE id = 7")
    val scanStats = pruned.queryExecution.optimizedPlan.collect {
      case s: DataSourceV2ScanRelation => s.stats
    }
    assert(scanStats.nonEmpty)
    assert(scanStats.head.sizeInBytes < fullStats.sizeInBytes,
      s"bucket pruning must shrink reported bytes: " +
        s"${scanStats.head.sizeInBytes} vs ${fullStats.sizeInBytes}")
    assert(scanStats.head.rowCount.exists(rc => rc > 0 && rc < 200),
      s"pruned rowCount should be one bucket's, got ${scanStats.head.rowCount}")

    // the payoff: joining a big frame against the dim table broadcasts
    // the dim side with NO hint
    val big = spark.range(0, 50000).select(
      (col("id") % 200).as("id"), col("id").as("x"))
    val joined = big.join(spark.table("st.ops.dim"), "id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected an auto-broadcast join, got:\n$plan")
    assert(joined.count() == 50000L)
  }
}
