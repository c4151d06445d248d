package graft.sources

import java.io.File

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.catalyst.util.CaseInsensitiveMap
import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

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
class ChangeFeedStreamProvider extends StreamSourceProvider with DataSourceRegister {
  import ChangeFeedStream._

  override def shortName(): String = "graft-cdf"

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    shortName() -> feedSchema(parameters)

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new ChangeFeedStream(sqlContext.sparkSession, parameters)
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
