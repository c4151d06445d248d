package graft.sources

import java.io.File

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** METADATA TABLES — the Iceberg `db.t$history` / Delta DESCRIBE-DETAIL
  * / Snowflake INFORMATION_SCHEMA surface as plain SQL relations:
  *
  * {{{
  *   SELECT * FROM graft.ops.events$history     -- commits touching it
  *   SELECT * FROM graft.ops.events$files       -- live generation files
  *   SELECT * FROM graft.ops.events$properties  -- table properties
  *   SELECT * FROM graft.ops.events$snapshots   -- retained versions × size
  *   SELECT * FROM graft.ops.events$metrics     -- the DMF time series
  *   SELECT * FROM graft.ops.events$partitions  -- per-bucket skew view
  * }}}
  *
  * history/files/properties/snapshots answer ENTIRELY from the manifest
  * — a `LocalScan` whose rows compute driver-side at metadata rate, zero
  * data files opened — so an operator can join `$files` row counts or
  * watch `$history` without ever scanning the 100 TB the metadata
  * describes. `$metrics` is the per-table cut of the `_metrics` ops
  * table (a bounded read: one row per metric × sweep). Read-only by
  * construction (no write capabilities), always the CURRENT snapshot.
  */
private[sources] class GraftMetaTable(root: File, table: String,
    kind: String) extends Table with SupportsRead {

  override def name(): String = s"$root/$table$$$kind"

  override def schema(): StructType = GraftMetaTable.schemaOf(kind)

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.Collections.singleton(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new ScanBuilder {
    override def build(): Scan = new LocalScan {
      override def readSchema(): StructType = schema()
      override def rows(): Array[InternalRow] =
        GraftMetaTable.rowsOf(root, table, kind)
      override def description(): String = name()
    }
  }
}

private[sources] object GraftMetaTable {

  val Kinds: Set[String] =
    Set("history", "files", "properties", "snapshots", "metrics",
      "partitions", "refs")

  def schemaOf(kind: String): StructType = kind match {
    case "history" => StructType(Seq(
      StructField("version", LongType),
      StructField("operation", StringType),
      StructField("commit_ts", TimestampType),
      StructField("query_id", StringType),
      StructField("batch_id", LongType)))
    case "files" => StructType(Seq(
      StructField("bucket", LongType),
      StructField("path", StringType),
      StructField("rows", LongType),
      StructField("file_kind", StringType), // base | delta
      StructField("stats_cols", ArrayType(StringType)),
      StructField("search_cols", ArrayType(StringType))))
    case "properties" => StructType(Seq(
      StructField("key", StringType),
      StructField("value", StringType)))
    case "snapshots" => StructType(Seq(
      StructField("version", LongType),
      StructField("operation", StringType),
      StructField("commit_ts", TimestampType),
      StructField("files", LongType),
      StructField("rows", LongType),
      StructField("delta_files", LongType),
      StructField("delta_rows", LongType)))
    case "metrics" => StructType(Seq(
      StructField("metric_name", StringType),
      StructField("version", LongType),
      StructField("value", DoubleType),
      StructField("measured_at", TimestampType)))
    case "partitions" => StructType(Seq(
      StructField("bucket", LongType),
      StructField("files", LongType),
      StructField("rows", LongType),
      StructField("delta_files", LongType),
      StructField("delta_rows", LongType),
      StructField("row_share", DoubleType)))
    case "refs" => StructType(Seq(
      StructField("name", StringType),
      StructField("version", LongType),
      StructField("commit_ts", TimestampType)))
    case other => throw new IllegalArgumentException(
      s"unknown metadata table kind '$other' (one of $Kinds)")
  }

  private def s(v: String): UTF8String = UTF8String.fromString(v)

  def rowsOf(root: File, table: String, kind: String): Array[InternalRow] = {
    val m = ManifestTable.read(root).getOrElse(
      throw new IllegalStateException(s"no manifest under $root"))
    val ts = m.table(table)
    require(ts.schemaJson.nonEmpty, s"table '$table' does not exist")
    kind match {
      case "history" =>
        // the root's commit history filtered to commits that touched
        // THIS table (one namespace = one manifest, so the root history
        // spans every table — the $history view is the per-table cut)
        ManifestTable.history(SparkSession.active, root).collect()
          .filter(r => r.isNullAt(3) ||
            r.getSeq[String](3).isEmpty || r.getSeq[String](3).contains(table))
          .map { r =>
            InternalRow(
              r.getLong(0),
              if (r.isNullAt(1)) null else s(r.getString(1)),
              if (r.isNullAt(2)) null
              else r.getTimestamp(2).getTime * 1000L,
              if (r.isNullAt(4)) null else s(r.getString(4)),
              r.getLong(5))
          }
      case "files" =>
        def arr(xs: Seq[String]) = new GenericArrayData(xs.map(s))
        val base = ts.buckets.toSeq.sortBy(_._1).flatMap { case (b, gens) =>
          gens.map(g => InternalRow(b, s(g.path), g.rows, s("base"),
            arr(g.stats.keys.toSeq.sorted), arr(g.search)))
        }
        val deltas = ts.deltas.toSeq.sortBy(_._1).flatMap { case (b, gens) =>
          gens.map(g => InternalRow(b, s(g.path), g.rows, s("delta"),
            arr(g.stats.keys.toSeq.sorted), arr(g.search)))
        }
        (base ++ deltas).toArray
      case "properties" =>
        ts.props.toSeq.sortBy(_._1).map { case (k, v) =>
          InternalRow(s(k), s(v))
        }.toArray
      case "snapshots" =>
        // one row per RETAINED version at which the table existed — the
        // Iceberg $snapshots listing: state sizes resolve from each
        // version's manifest (checkpoints + deltas), zero data files
        // opened; bounded by the retention window like $history
        ManifestTable.history(SparkSession.active, root).collect()
          .flatMap { r =>
            val v = r.getLong(0)
            val tv = ManifestTable.resolve(root, Some(v)).table(table)
            if (tv.schemaJson.isEmpty) None
            else Some(InternalRow(
              v,
              if (r.isNullAt(1)) null else s(r.getString(1)),
              if (r.isNullAt(2)) null
              else r.getTimestamp(2).getTime * 1000L,
              tv.gens.size.toLong, tv.gens.map(_.rows).sum,
              tv.deltaGens.size.toLong, tv.deltaGens.map(_.rows).sum))
          }
      case "metrics" =>
        // the DMF time series for THIS table, cut from the `_metrics`
        // ops table ([[ManifestTable.runMetrics]]) — a bounded read
        // (one row per metric × sweep), collected at planning like the
        // other meta views
        if (m.table(ManifestTable.MetricsTable).schemaJson.isEmpty)
          Array.empty[InternalRow]
        else {
          import org.apache.spark.sql.functions.col
          ManifestTable.readTable(SparkSession.active, root.toString,
            table = ManifestTable.MetricsTable)
            .filter(col("table_name") === table)
            .orderBy("version", "metric_name")
            .collect().map { r =>
              InternalRow(
                s(r.getString(1)), r.getLong(2),
                if (r.isNullAt(3)) null else r.getDouble(3),
                if (r.isNullAt(4)) null
                else r.getTimestamp(4).getTime * 1000L)
            }
        }
      case "partitions" =>
        // per-BUCKET live state (the Iceberg $partitions analogue over
        // graft's hash buckets): file/row counts per bucket plus each
        // bucket's share of the table's rows — the skew-triage view an
        // operator reads before reclustering/rebucketing at 100 TB;
        // manifest-only, zero data files opened
        val totalRows = math.max(1L,
          ts.gens.map(_.rows).sum + ts.deltaGens.map(_.rows).sum)
        val allBuckets = (ts.buckets.keySet ++ ts.deltas.keySet).toSeq.sorted
        allBuckets.map { b =>
          val base = ts.buckets.getOrElse(b, Nil)
          val del = ts.deltas.getOrElse(b, Nil)
          val rows = base.map(_.rows).sum
          val dRows = del.map(_.rows).sum
          InternalRow(b, base.size.toLong, rows, del.size.toLong, dRows,
            (rows + dRows).toDouble / totalRows)
        }.toArray
      case "refs" =>
        // named snapshot refs (`ref.<name>` props): one row per pin,
        // with the pinned commit's timestamp when its log entry is
        // still in the listed history window (a pin far below the
        // window keeps serving — the ts is best-effort metadata)
        val ts2 = ManifestTable.history(SparkSession.active, root)
          .collect().map(r => r.getLong(0) ->
            (if (r.isNullAt(2)) null else r.getTimestamp(2))).toMap
        ts.props.toSeq.collect {
          case (k, v) if k.startsWith("ref.") =>
            k.stripPrefix("ref.") -> scala.util.Try(v.trim.toLong).toOption
        }.collect { case (n, Some(v)) => (n, v) }.sortBy(_._1).map {
          case (n, v) =>
            InternalRow(s(n), v,
              ts2.get(v).flatMap(Option(_))
                .map(_.getTime * 1000L).map(Long.box).orNull)
        }.toArray
      case other => throw new IllegalArgumentException(
        s"unknown metadata table kind '$other'")
    }
  }
}
