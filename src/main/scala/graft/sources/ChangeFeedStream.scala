package graft.sources

import java.io.File

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.catalyst.util.CaseInsensitiveMap
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset => OffsetV2, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.{FilePartition, LogicalRelation, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetOptions
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetPartitionReaderFactory
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** Structured Streaming source over a [[ManifestTable]] change data feed —
  * the streaming half of the CDF contract (the Delta `readChangeFeed`
  * streaming-source shape; the reference's consumers poll Snowflake STREAM
  * objects for table deltas, sql/05_merge_canonical.sql:1 feeding
  * downstream marts). A downstream incremental pipeline subscribes with
  *
  * {{{
  * spark.readStream.format("graft-cdf")
  *   .option("path", tableRoot).option("table", "hdr").load()
  * }}}
  *
  * and receives every committed change row (`_change_type` tagged insert /
  * update_postimage / delete, plus `_commit_version`), exactly once across
  * restarts — so a 100 TB table's consumers read per-commit deltas that
  * scale with churn, never the table.
  *
  * Offsets ARE manifest versions: `getOffset` reads the manifest (one tiny
  * file — no data listing, no scan) and offers the latest committed
  * version; batch (start, end] maps to the feed dirs of exactly those
  * versions, read as an ordinary pruned parquet scan. Only COMMITTED
  * versions are ever offered, so in-flight writer dirs (pre-commit, or
  * racing losers under the OCC protocol) are invisible here for the same
  * reason they are invisible to batch readers: visibility flows from the
  * manifest, not the filesystem. Feed gaps fail loudly instead of
  * delivering partial history: a feed reset (non-feed commit) or a restart
  * from before [[ManifestTable.ChangeRetainVersions]] surfaces the
  * underlying `readChangeFeed` error rather than silently skipping
  * versions — an incremental consumer fed a delta with holes would diverge
  * without noticing.
  *
  * `maxVersionsPerTrigger` bounds how many commits one micro-batch spans
  * (admission control for a consumer catching up on a long backlog). The
  * source implements the modern admission-control contract
  * ([[SupportsTriggerAvailableNow]] ⊃ SupportsAdmissionControl): the
  * engine hands `latestOffset(start, limit)` the CHECKPOINTED start
  * offset, so the cap holds on the first trigger after a restart too —
  * including under Trigger.AvailableNow, where the drain runs one capped
  * micro-batch per trigger up to the end pinned at query start. (The scan
  * side deliberately stays on the v1 `Source.getBatch` DataFrame path:
  * the feed dirs are ordinary committed parquet, and returning a
  * DataFrame keeps Spark's own vectorized reader, pruning, and pushdown —
  * a custom MicroBatchStream PartitionReader would re-implement that scan
  * worse. This v1-plumbing + v2-admission hybrid is the same shape the
  * Delta Lake streaming source ships.)
  */
class ChangeFeedStreamProvider extends StreamSourceProvider with DataSourceRegister
  with TableProvider {
  import ChangeFeedStream._

  override def shortName(): String = "graft-cdf"

  // ---- v1 Source contract: kept for direct-driver callers; the engine
  // resolves the TableProvider (DSv2) path below once it sees one ----

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    shortName() -> feedSchema(parameters)

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new ChangeFeedStream(sqlContext.sparkSession, parameters)

  // ---- DSv2 TableProvider: `readStream.format("graft-cdf")` resolves
  // here, planning through [[CdfMicroBatchStream]] ----

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    feedSchema(options.asCaseSensitiveMap.asScala.toMap)

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new GraftCdfTable(properties.asScala.toMap)
}

/** DSv2 table over a [[ManifestTable]] change data feed: one capability
  * (micro-batch read), schema pinned at resolution like every streaming
  * source.
  */
class GraftCdfTable(params: Map[String, String]) extends Table with SupportsRead {
  private val cim = CaseInsensitiveMap(params)

  override def name(): String = {
    val t = cim.getOrElse("table", ManifestTable.DefaultTable)
    s"graft-cdf:${cim.getOrElse("path", "?")}/$t"
  }

  override def schema(): StructType = ChangeFeedStream.feedSchema(params)

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.Collections.singleton(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = GraftCdfTable.this.schema()
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new CdfMicroBatchStream(SparkSession.active, params)
      }
    }
}

object ChangeFeedStream {

  /** Version-count read limit (`maxVersionsPerTrigger`): the natural unit
    * for a commit-log feed, where one version's delta dir is the atomic
    * read granule — none of the built-in row/file/byte limits map to it.
    */
  final case class ReadMaxVersions(maxVersions: Long) extends ReadLimit

  /** Stream schema = the table's committed schema + the two CDF metadata
    * columns. Pinned at query start: the table (and an ACTIVE feed) must
    * exist before a consumer subscribes, and a mid-stream sink-side schema
    * evolution surfaces on the consumer's next restart, when the query
    * re-resolves — the usual streaming-source contract.
    */
  def feedSchema(parameters: Map[String, String]): StructType = {
    val params = CaseInsensitiveMap(parameters)
    val root = params.getOrElse("path",
      throw new IllegalArgumentException("option 'path' (table root) is required"))
    val table = params.getOrElse("table", ManifestTable.DefaultTable)
    val m = ManifestTable.read(new File(root)).getOrElse(
      throw new IllegalStateException(s"no committed table at $root"))
    val ts = m.table(table)
    if (ts.feedFrom < 0) throw new IllegalStateException(
      s"table $table has no active change feed to stream")
    ts.schema.add(ManifestTable.ChangeTypeCol, "string")
      .add(ManifestTable.CommitVersionCol, "long")
  }
}

class ChangeFeedStream(spark: SparkSession, parameters: Map[String, String])
  extends Source with SupportsTriggerAvailableNow {
  import ChangeFeedStream.ReadMaxVersions

  private val params = CaseInsensitiveMap(parameters)
  private val root = params("path")
  private val table = params.getOrElse("table", ManifestTable.DefaultTable)
  private val maxVersions = params.get("maxVersionsPerTrigger").map(_.toLong)

  /** First version this subscription serves, resolved ONCE at source
    * creation: an explicit `startingVersion`, else the feed's earliest
    * retained version — "everything the feed can still serve", which for a
    * feed opened at table creation is the full history.
    */
  private val startVersion: Long = {
    val explicit = params.get("startingVersion").map(_.toLong)
    explicit.getOrElse {
      val m = ManifestTable.read(new File(root)).getOrElse(
        throw new IllegalStateException(s"no committed table at $root"))
      m.table(table).feedFrom
    }
  }

  /** Trigger.AvailableNow end pin: versions committed after the drain
    * started are left for the next run, so the drain terminates.
    */
  @volatile private var availableNowCap: Option[Long] = None

  override val schema: StructType = ChangeFeedStream.feedSchema(parameters)

  /** A missing manifest at prepare time (e.g. the table was dropped after
    * the subscription resolved) pins an EMPTY drain rather than leaving
    * the cap unset: an unpinned cap would let commits landing mid-drain
    * keep extending it, and a sustained writer could prevent the
    * "bounded" AvailableNow drain from ever terminating.
    */
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(ManifestTable.read(new File(root))
      .map(_.version).getOrElse(startVersion - 1L))

  override def getDefaultReadLimit: ReadLimit =
    maxVersions.map(v => ReadMaxVersions(v): ReadLimit)
      .getOrElse(ReadLimit.allAvailable())

  /** Admission control with the checkpointed floor in hand: `start` is the
    * engine's last end offset (the CHECKPOINT on the first trigger after a
    * restart — the information the legacy `getOffset` contract never
    * provided, which forced its first trigger to run uncapped). One
    * manifest read — O(1) in the table's size.
    */
  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val floor = Option(start).map(ver).getOrElse(startVersion - 1L)
    ManifestTable.read(new File(root)).map { m =>
      val avail = availableNowCap.fold(m.version)(math.min(m.version, _))
      val target = limit match {
        case rv: ReadMaxVersions => math.min(avail, floor + rv.maxVersions)
        case _ => avail
      }
      if (target <= floor || target < startVersion) start
      else LongOffset(target): OffsetV2
    }.getOrElse(start)
  }

  /** Legacy polling entry — not used once the engine sees
    * [[SupportsTriggerAvailableNow]], but kept correct (uncapped latest)
    * for any caller driving the v1 contract directly.
    */
  override def getOffset: Option[OffsetV1] =
    ManifestTable.read(new File(root)).flatMap { m =>
      if (m.version < startVersion) None else Some(LongOffset(m.version))
    }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val from = start.map(ver(_) + 1L).getOrElse(startVersion)
    val to = ver(end)
    // versions with no feed entry for this table contribute no rows;
    // versions the feed can no longer serve completely (reset or vacuumed)
    // make readChangeFeed throw — the loud-gap contract
    asStreaming(
      ManifestTable.readChangeFeed(spark, root, from, Some(to), table))
  }

  /** Offsets round-trip through the checkpoint as JSON, so a restarted
    * query hands back SerializedOffset rather than LongOffset.
    */
  private def ver(o: OffsetV2): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json().trim.toLong
  }

  /** MicroBatchExecution requires `getBatch` frames to carry
    * `isStreaming=true`; the underlying scan is an ordinary batch read of
    * immutable committed files, so the flag is flipped on the leaves (the
    * Delta-source pattern) — the parquet scan, its pruning, and its
    * pushdown survive untouched.
    */
  private def asStreaming(df: DataFrame): DataFrame = {
    val flipped = df.queryExecution.analyzed.transform {
      case lr: LogicalRelation if !lr.isStreaming => lr.copy(isStreaming = true)
    }
    // an empty feed range has no file scan to flip — an all-empty
    // micro-batch is a streaming-flagged empty relation instead
    Bridge.ofRows(spark,
      if (flipped.isStreaming) flipped
      else LocalRelation(
        DataTypeUtils.toAttributes(schema), Nil, isStreaming = true))
  }

  override def stop(): Unit = ()

  override def toString: String = s"ChangeFeedStream[$root/$table)"
}

/** The modern (DSv2 `MicroBatchStream`) change-feed scan — same offset
  * algebra, admission control, and AvailableNow pinning as the v1
  * [[ChangeFeedStream]], with the scan itself planned natively:
  *
  *  - offsets ARE manifest versions; `planInputPartitions(start, end]`
  *    maps to the feed dirs of exactly those committed versions via the
  *    same validated [[ManifestTable.feedGens]] gate batch readers use,
  *    so feed gaps fail loudly on every path;
  *  - each feed file becomes a [[PartitionedFile]] whose PARTITION VALUE
  *    is its commit version — `_commit_version` is injected by the
  *    stock v2 parquet machinery as a partition column, not computed
  *    per row; `_change_type` is real data in the delta files;
  *  - [[ParquetPartitionReaderFactory]] (the engine's own v2 parquet
  *    reader) does the reading — vectorized/columnar batches, null
  *    backfill for columns added by sink-side schema evolution — so the
  *    port keeps every scan property the v1 hybrid was kept around for;
  *  - files pack into input partitions with the engine's own
  *    split-size/bin-packing rule ([[FilePartition.getFilePartitions]]),
  *    so a many-file backlog drain parallelizes like any batch scan.
  */
class CdfMicroBatchStream(spark: SparkSession, parameters: Map[String, String],
    governance: Option[Map[String, String]] = None)
  extends MicroBatchStream with SupportsAdmissionControl
  with SupportsTriggerAvailableNow {
  import ChangeFeedStream.ReadMaxVersions

  private val params = CaseInsensitiveMap(parameters)
  private val root = params("path")
  private val table = params.getOrElse("table", ManifestTable.DefaultTable)
  private val maxVersions = params.get("maxVersionsPerTrigger").map(_.toLong)

  private val startVersion: Long = {
    val explicit = params.get("startingVersion").map(_.toLong)
    explicit.getOrElse {
      val m = ManifestTable.read(new File(root)).getOrElse(
        throw new IllegalStateException(s"no committed table at $root"))
      m.table(table).feedFrom
    }
  }

  /** Table schema pinned at stream creation (the v1 source's contract:
    * sink-side evolution surfaces on the consumer's next restart).
    */
  private val dataSchema: StructType = {
    val m = ManifestTable.read(new File(root)).getOrElse(
      throw new IllegalStateException(s"no committed table at $root"))
    m.table(table).schema.add(ManifestTable.ChangeTypeCol, "string")
  }

  private val partitionSchema =
    StructType(Seq(StructField(ManifestTable.CommitVersionCol, LongType)))

  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(ManifestTable.read(new File(root))
      .map(_.version).getOrElse(startVersion - 1L))

  override def getDefaultReadLimit: ReadLimit =
    maxVersions.map(v => ReadMaxVersions(v): ReadLimit)
      .getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val floor = Option(start).map(ver).getOrElse(startVersion - 1L)
    ManifestTable.read(new File(root)).map { m =>
      val avail = availableNowCap.fold(m.version)(math.min(m.version, _))
      val target = limit match {
        case rv: ReadMaxVersions => math.min(avail, floor + rv.maxVersions)
        case _ => avail
      }
      if (target <= floor || target < startVersion) start
      else LongOffset(target): OffsetV2
    }.getOrElse(start)
  }

  override def latestOffset(): OffsetV2 =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead " +
        "(SupportsAdmissionControl)")

  override def reportLatestOffset(): OffsetV2 =
    ManifestTable.read(new File(root))
      .map(m => LongOffset(m.version): OffsetV2).orNull

  override def initialOffset(): OffsetV2 = LongOffset(startVersion - 1L)

  override def deserializeOffset(json: String): OffsetV2 =
    LongOffset(json.trim.toLong)

  override def commit(end: OffsetV2): Unit = ()

  override def stop(): Unit = ()

  override def planInputPartitions(start: OffsetV2,
      end: OffsetV2): Array[InputPartition] = {
    val from = ver(start) + 1L
    val to = ver(end)
    if (to < from) return Array.empty
    val (_, sel) = ManifestTable.feedGens(root, from, Some(to), table)
    val conf = spark.sessionState.newHadoopConf()
    val files = sel.flatMap { c =>
      val p = new Path(new File(root, c.path).toString)
      val fs = p.getFileSystem(conf)
      fs.listStatus(p)
        .filter { f =>
          val n = f.getPath.getName
          f.isFile && !n.startsWith("_") && !n.startsWith(".")
        }
        .map(f => PartitionedFile(InternalRow(c.version),
          SparkPath.fromPath(f.getPath), 0L, f.getLen))
    }
    FilePartition.getFilePartitions(spark, files,
      FilePartition.maxSplitBytes(spark, files.map(_.length).sum))
      .toArray
  }

  /** The GOVERNED POSTIMAGE-ONLY view (`governance` = the table's props,
    * set by the catalog when the subscriber opted in): only
    * policy-visible inserts and update postimages flow, masked — the
    * well-defined governed slice of a feed (preimages and deletes of
    * rows the session cannot see are ill-posed, so they never flow; an
    * update that moves a row OUT of policy simply stops emitting it).
    * The change-type restriction rides the same compiled predicate as
    * the policy: the catalog rewrites `rowPolicy` to
    * `(policy) AND _change_type IN ('insert','update_postimage')`
    * before handing the props over, so one bound predicate drives both.
    */
  override def createReaderFactory(): PartitionReaderFactory =
    governance match {
      case Some(props) =>
        // the feed serves its full schema, so the read prunes nothing
        // here — the governed slice still pays one row-path projection
        val full = StructType(dataSchema.fields ++ partitionSchema.fields)
        GovernedRows.governing(spark, full, full, props, table, rs =>
          GraftParquetRead.readerFactory(spark, dataSchema,
            StructType(rs.fields.filterNot(f =>
              partitionSchema.fieldNames.contains(f.name))),
            partitionSchema, Array.empty))
      case None =>
        GraftParquetRead.readerFactory(spark, dataSchema, dataSchema,
          partitionSchema, Array.empty)
    }

  private def ver(o: OffsetV2): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json().trim.toLong
  }

  override def toString: String = s"CdfMicroBatchStream[$root/$table]"
}

/** Plain streaming TABLE read — `spark.readStream.table("graft.ns.t")`
  * with no `readChangeFeed` option: the Delta-shaped "initial snapshot +
  * appends" stream. Offsets are manifest versions; the FIRST micro-batch
  * serves the full snapshot at its end offset, and every later batch
  * serves exactly the generation files commits ADDED since the previous
  * offset — no change feed required, because on an append-only table the
  * new generation dirs ARE the appended rows. Valid only while the table
  * evolves append-only: a commit that rewrote or dropped a served
  * generation (merge, delete/update, compact, recluster, overwrite) or
  * left merge-on-read deltas fails the NEXT batch loudly instead of
  * silently re-serving or missing rows — churny tables subscribe with
  * `option("readChangeFeed", true)` instead. Admission control
  * (`maxVersionsPerTrigger`) and AvailableNow pinning mirror
  * [[CdfMicroBatchStream]]; version-resolution past retention fails with
  * the usual time-travel error (a subscriber can't restart from a swept
  * snapshot).
  */
class TableMicroBatchStream(spark: SparkSession, rootPath: String,
    table: String, readSchema: StructType, tableSchema: StructType,
    options: Map[String, String],
    governance: Option[Map[String, String]] = None)
  extends MicroBatchStream with SupportsAdmissionControl
  with SupportsTriggerAvailableNow {
  import ChangeFeedStream.ReadMaxVersions

  private val params = CaseInsensitiveMap(options)
  private val maxVersions = params.get("maxVersionsPerTrigger").map(_.toLong)

  /** Delta's `skipChangeCommits`: a commit that rewrote or dropped
    * served generations (merge, update/delete, compact, recluster,
    * overwrite) is SKIPPED WHOLESALE instead of failing the stream —
    * the subscriber keeps receiving pure appends and accepts that
    * updates/deletes never reach it. Off by default: silently missing
    * churn is an explicit opt-in.
    */
  private val skipChangeCommits =
    params.get("skipChangeCommits").exists(_.toBoolean)

  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(ManifestTable.read(new File(rootPath))
      .map(_.version).getOrElse(-1L))

  override def getDefaultReadLimit: ReadLimit =
    maxVersions.map(v => ReadMaxVersions(v): ReadLimit)
      .getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val floor = Option(start).map(ver).getOrElse(-1L)
    ManifestTable.read(new File(rootPath)).map { m =>
      val avail = availableNowCap.fold(m.version)(math.min(m.version, _))
      val target = limit match {
        // the INITIAL SNAPSHOT batch (floor < 0) is never version-capped:
        // it must land on a real committed version, and a snapshot is one
        // read whatever version it pins (capping it to floor+max could
        // target a version before the table's first commit)
        case rv: ReadMaxVersions if floor >= 0 =>
          math.min(avail, floor + rv.maxVersions)
        case _ => avail
      }
      if (target <= floor) start else LongOffset(target): OffsetV2
    }.getOrElse(start)
  }

  override def latestOffset(): OffsetV2 =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead " +
        "(SupportsAdmissionControl)")

  override def reportLatestOffset(): OffsetV2 =
    ManifestTable.read(new File(rootPath))
      .map(m => LongOffset(m.version): OffsetV2).orNull

  /** -1 = "snapshot not yet served": the first planned batch (-1, v]
    * reads the whole table AT v, later ones only the delta of
    * generation paths.
    */
  override def initialOffset(): OffsetV2 = LongOffset(-1L)

  override def deserializeOffset(json: String): OffsetV2 =
    LongOffset(json.trim.toLong)

  override def commit(end: OffsetV2): Unit = ()

  override def stop(): Unit = ()

  override def planInputPartitions(start: OffsetV2,
      end: OffsetV2): Array[InputPartition] = {
    val sv = ver(start)
    val ev = ver(end)
    if (ev <= sv) return Array.empty
    val tsEnd = ManifestTable.resolve(new File(rootPath), Some(ev))
      .table(table)
    if (tsEnd.schemaJson.isEmpty) throw new IllegalStateException(
      s"table $table does not exist at version $ev")
    // merge-on-read deltas mutate served rows in place; the INITIAL
    // SNAPSHOT must refuse them always (it would serve stale base rows),
    // incremental batches tolerate them under skipChangeCommits (they
    // are precisely the churn the subscriber opted out of)
    if (tsEnd.deltas.nonEmpty && (sv < 0L || !skipChangeCommits))
      throw new UnsupportedOperationException(
        s"table $table carries merge-on-read deltas at version $ev — " +
          "their rows mutate served generations in place; plain " +
          "streaming table reads require append-only evolution. " +
          "Subscribe with " +
          s"option(\"${GraftSqlTable.ReadChangeFeedOption}\", true), or " +
          "collapse the deltas (CALL graft.system.maintain) first")
    val endPaths = tsEnd.gens.map(_.path)
    val newPaths =
      if (sv < 0L) endPaths // initial snapshot
      else if (!skipChangeCommits) {
        val startSet = ManifestTable.resolve(new File(rootPath), Some(sv))
          .table(table).gens.map(_.path).toSet
        val gone = startSet -- endPaths.toSet
        if (gone.nonEmpty) throw new UnsupportedOperationException(
          s"table $table changed non-append-only between versions $sv " +
            s"and $ev (${gone.size} served generation(s) rewritten or " +
            "dropped, e.g. by a merge, update/delete, compact, or " +
            "recluster); a plain streaming table read cannot represent " +
            "that — subscribe with " +
            s"option(\"${GraftSqlTable.ReadChangeFeedOption}\", true), " +
            "or opt into silently dropping churn with " +
            "option(\"skipChangeCommits\", true)")
        endPaths.filterNot(startSet)
      } else {
        // skipChangeCommits: walk the range COMMIT BY COMMIT (manifest
        // reads — metadata-rate) and serve only append commits' new
        // generations; a churn commit's rewritten generations carry OLD
        // rows merged in, so serving its "new" dirs would re-deliver
        // them — the whole commit skips, exactly Delta's contract
        var prev = ManifestTable.resolve(new File(rootPath), Some(sv))
          .table(table).gens.map(_.path).toSet
        (sv + 1 to ev).flatMap { v =>
          val cur = ManifestTable.resolve(new File(rootPath), Some(v))
            .table(table).gens.map(_.path)
          val curSet = cur.toSet
          val appendOnly = prev.subsetOf(curSet)
          val added = cur.filterNot(prev)
          prev = curSet
          if (appendOnly) added else Nil
        }
      }
    val conf = spark.sessionState.newHadoopConf()
    val files = newPaths.flatMap { rel =>
      val p = new Path(new File(rootPath, rel).toString)
      val fs = p.getFileSystem(conf)
      fs.listStatus(p)
        .filter { f =>
          val n = f.getPath.getName
          f.isFile && !n.startsWith("_") && !n.startsWith(".")
        }
        .map(f => PartitionedFile(InternalRow.empty,
          SparkPath.fromPath(f.getPath), 0L, f.getLen))
    }
    FilePartition.getFilePartitions(spark, files,
      FilePartition.maxSplitBytes(spark, files.map(_.length).sum))
      .toArray
  }

  /** Governed tables pipe rows through the compiled policy/mask
    * decorator ([[GovernedRows.governing]]), which widens the base read
    * only to the columns the governance itself references — a policy on
    * one column of a wide table costs that column, not all of them.
    */
  override def createReaderFactory(): PartitionReaderFactory =
    governance match {
      case Some(props) =>
        GovernedRows.governing(spark, tableSchema, readSchema, props,
          table, rs => GraftParquetRead.readerFactory(spark, tableSchema,
            rs, new StructType(), Array.empty))
      case None =>
        GraftParquetRead.readerFactory(spark, tableSchema, readSchema,
          new StructType(), Array.empty)
    }

  private def ver(o: OffsetV2): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json().trim.toLong
  }

  override def toString: String = s"TableMicroBatchStream[$rootPath/$table]"
}

/** The conf plumbing `ParquetScan.createReaderFactory` performs before
  * handing the engine's v2 parquet reader its broadcast configuration:
  * the reader resolves its ReadSupport and requested schema from here.
  * Shared by every graft v2 scan — the change-feed stream and the
  * catalog's batch scan — so both read through the SAME stock
  * vectorized/columnar machinery (null backfill for evolved columns,
  * row-group statistics + bloom pushdown via `filters`).
  */
object GraftParquetRead {
  def readerFactory(spark: SparkSession, dataSchema: StructType,
      readSchema: StructType, partitionSchema: StructType,
      filters: Array[org.apache.spark.sql.sources.Filter])
      : ParquetPartitionReaderFactory = {
    import org.apache.spark.sql.execution.datasources.parquet.{ParquetReadSupport, ParquetWriteSupport}
    import org.apache.spark.sql.internal.SQLConf
    val sqlConf = spark.sessionState.conf
    val hadoopConf = spark.sessionState.newHadoopConf()
    val schemaJson = readSchema.json
    hadoopConf.set(
      org.apache.parquet.hadoop.ParquetInputFormat.READ_SUPPORT_CLASS,
      classOf[ParquetReadSupport].getName)
    hadoopConf.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, schemaJson)
    hadoopConf.set(ParquetWriteSupport.SPARK_ROW_SCHEMA, schemaJson)
    hadoopConf.set(SQLConf.SESSION_LOCAL_TIMEZONE.key,
      sqlConf.sessionLocalTimeZone)
    hadoopConf.setBoolean(SQLConf.NESTED_SCHEMA_PRUNING_ENABLED.key,
      sqlConf.nestedSchemaPruningEnabled)
    hadoopConf.setBoolean(SQLConf.CASE_SENSITIVE.key,
      sqlConf.caseSensitiveAnalysis)
    ParquetWriteSupport.setSchema(readSchema, hadoopConf)
    hadoopConf.setBoolean(SQLConf.PARQUET_BINARY_AS_STRING.key,
      sqlConf.isParquetBinaryAsString)
    hadoopConf.setBoolean(SQLConf.PARQUET_INT96_AS_TIMESTAMP.key,
      sqlConf.isParquetINT96AsTimestamp)
    hadoopConf.setBoolean(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key,
      sqlConf.legacyParquetNanosAsLong)
    hadoopConf.setBoolean(SQLConf.PARQUET_FIELD_ID_READ_ENABLED.key,
      sqlConf.parquetFieldIdReadEnabled)
    hadoopConf.setBoolean(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key,
      sqlConf.parquetInferTimestampNTZEnabled)
    val bcast = spark.sparkContext.broadcast(
      new SerializableConfiguration(hadoopConf))
    ParquetPartitionReaderFactory(sqlConf, bcast,
      dataSchema, readSchema, partitionSchema, filters, None,
      new ParquetOptions(Map.empty[String, String], sqlConf))
  }
}
