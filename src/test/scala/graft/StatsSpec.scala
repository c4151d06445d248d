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

  test("manifest NDV sketches: distinct counts merge across overlapping generations, prune with the scan, and feed CBO column stats") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ndv").toString
    spark.conf.set("spark.sql.catalog.nv", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.nv.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS nv.ops")
    spark.sql("""CREATE TABLE nv.ops.t (
      id BIGINT NOT NULL, grp BIGINT, name STRING) USING graft
      TBLPROPERTIES ('mergeKeys'='id', 'buckets'='4',
        'statsCols'='grp', 'searchCols'='name')""")
    // two commits whose grp domains fully OVERLAP: per-generation
    // sketch sums would read ~2× the truth; the union must not
    spark.sql("""INSERT INTO nv.ops.t
      SELECT id, id % 10, concat('n', id) FROM range(0, 200)""")
    spark.sql("""INSERT INTO nv.ops.t
      SELECT id, id % 10, concat('n', id) FROM range(200, 400)""")

    // table-level NDV through the detail verb (exercises the manifest
    // JSON round-trip too)
    val det = spark.sql("CALL nv.system.detail('ops', 't')").head
    val ndv = det.getAs[Map[String, Long]]("ndv")
    assert(math.abs(ndv("grp") - 10L) <= 1,
      s"grp distinct must union-dedup across generations, got ${ndv("grp")}")
    assert(math.abs(ndv("name") - 400L) <= 40,
      s"name distinct ~400 expected, got ${ndv("name")}")

    // scan-level: a bucket-pruned selection reports the pruned NDV
    def colStats(df: org.apache.spark.sql.DataFrame): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      df.queryExecution.optimizedPlan.collect {
        case s: DataSourceV2ScanRelation =>
          s.scan.asInstanceOf[graft.sources.GraftBatchScan]
            .estimateStatistics().columnStats().asScala.flatMap {
              case (k, v) =>
                if (v.distinctCount().isPresent)
                  Some(k.describe() -> v.distinctCount().getAsLong)
                else None
            }.toMap
      }.head
    }
    val full = colStats(spark.sql("SELECT * FROM nv.ops.t"))
    val pruned = colStats(spark.sql("SELECT * FROM nv.ops.t WHERE id = 7"))
    assert(pruned("name") < full("name"),
      s"bucket pruning must shrink name NDV: $pruned vs $full")

    // with CBO on, the scan's column stats land in catalyst attribute
    // stats — what join reordering/sizing consumes
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val st = spark.sql("SELECT grp, name FROM nv.ops.t")
        .queryExecution.optimizedPlan.collect {
          case s: DataSourceV2ScanRelation => s.stats
        }.head
      val byName = st.attributeStats.map { case (a, cs) => a.name -> cs }
      assert(byName.get("name").exists(_.distinctCount.exists(dc =>
        dc.toLong > 300 && dc.toLong < 500)),
        s"expected name NDV in catalyst stats, got $byName")
      // numeric stats columns additionally carry an equi-height
      // histogram from the merged KLL sketches — bins span the real
      // value range and land in catalyst stats for CBO selectivity
      val grpHist = byName.get("grp").flatMap(_.histogram)
      assert(grpHist.exists(h => h.bins.length == 64 &&
        h.bins.head.lo <= 0.0 && h.bins.last.hi >= 9.0 &&
        h.height > 0.0),
        s"expected a KLL-backed histogram on grp, got $grpHist")
    } finally spark.conf.unset("spark.sql.cbo.enabled")
  }
}
