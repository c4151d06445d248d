package graft.sources

import java.io.File
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, NoSuchViewException, TableAlreadyExistsException, ViewAlreadyExistsException}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{Identifier, ProcedureCatalog, StagedTable, StagingTableCatalog, SupportsDelete, SupportsNamespaces, SupportsRead, SupportsWrite, Table, TableCapability, TableCatalog, TableChange, TableInfo, NamespaceChange, View, ViewCatalog, ViewChange, ViewInfo}
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, LocalScan, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.sources.{Filter, InsertableRelation}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A Spark `TableCatalog` over a warehouse of [[ManifestTable]] roots —
  * the surface that lets the reference's users run their SQL verbs
  * unchanged against graft tables by NAME:
  *
  * {{{
  * spark.sql.catalog.graft           = graft.sources.GraftCatalog
  * spark.sql.catalog.graft.warehouse = /data/graft
  *
  * CREATE TABLE graft.ops.events (…) USING graft
  *   TBLPROPERTIES ('mergeKeys'='event_id', 'buckets'='16')
  * INSERT INTO graft.ops.events SELECT …
  * SELECT … FROM graft.ops.events WHERE ts BETWEEN …   -- pruned scan
  * SELECT … FROM graft.ops.events VERSION AS OF 7      -- time travel
  * DELETE FROM graft.ops.events WHERE client_id = '…'
  * TRUNCATE TABLE graft.ops.events
  * }}}
  *
  * Mapping: one NAMESPACE = one manifest root directory under the
  * warehouse — so every table of a namespace shares the root's atomic
  * multi-table commit (the reference's header/lines/anomalies grains
  * publish under one swap; here that is `graft.ops.*`), and the catalog
  * adds naming on top of, never beside, the transactional layer. All
  * DDL (create/drop/rename) is itself a manifest commit: versioned,
  * OCC-serialized, time-travelable, and visible in `history()`.
  *
  * Reads plan through [[GraftBatchScan]] — a native DSv2 scan that prunes
  * generations from the pushed filters with the SAME window/needle/bucket
  * algebra as the `format("graft")` path (one algebra, two entry points:
  * [[ManifestFileIndex.filesForFilters]]), prunes COLUMNS via
  * `SupportsPushDownRequiredColumns`, and reads through the engine's own
  * vectorized parquet factory ([[GraftParquetRead]]) with the pushed
  * filters forwarded for row-group statistics + bloom skipping. Writes go
  * through the `V1Write` fallback to [[ManifestTable.mergeBatch]] — the
  * same commit protocol as every other writer, so SQL INSERTs interleave
  * safely with streaming sinks and compaction.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog with StagingTableCatalog with ViewCatalog {

  private var catalogName: String = "graft"
  private var warehouse: File = _

  /** Engine-native column DEFAULTs and IDENTITY columns: advertising
    * these lets Spark's parser/analyzer accept `DEFAULT <expr>` and
    * `GENERATED ALWAYS AS IDENTITY` in CREATE/REPLACE TABLE against
    * this catalog — the resolved metadata arrives in the createTable
    * schema's field metadata (CURRENT_DEFAULT / EXISTS_DEFAULT,
    * identity.start / identity.step), which the manifest persists
    * verbatim and the write path honors
    * ([[ManifestTable.identityOf]], the mergeTable defaults fill).
    */
  override def capabilities()
      : java.util.Set[org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    java.util.EnumSet.of(
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORT_COLUMN_DEFAULT_VALUE,
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS)

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = new File(options.asScala.getOrElse("warehouse",
      throw new IllegalArgumentException(
        s"catalog '$name' needs option 'warehouse' (root directory)")))
    // catalog users get the metadata-count rewrite without wiring
    // GraftExtensions — same dual registration as the format("graft")
    // provider; idempotent, and re-registered per scan build
    // (GraftSqlTable.newScanBuilder) so in multi-session applications
    // EVERY session that queries through this catalog gets the rule,
    // not just the one active at first catalog use
    graft.plans.MetadataAggRule.register(SparkSession.active)
    graft.plans.MergeOnReadRule.register(SparkSession.active)
    graft.plans.MartRewriteRule.register(SparkSession.active)
    graft.plans.RowPolicyRule.register(SparkSession.active)
    graft.plans.CtasTagLineage.register(SparkSession.active)
  }

  override def name(): String = catalogName

  /** Eager parse check for declared expressions (policies, masks,
    * metrics, generated/default columns). `functions.expr` no longer
    * parses at call time (Spark 4 columns defer SQL strings to
    * analysis), so `Try(expr(s)).isSuccess` never fails — route through
    * the session parser, which throws on malformed input immediately.
    */
  private def parses(sql: String): Boolean =
    scala.util.Try(SparkSession.active
      .sessionState.sqlParser.parseExpression(sql)).isSuccess

  private def rootOf(namespace: Array[String]): File = {
    require(namespace.length == 1,
      s"graft namespaces are single-level (one manifest root per " +
        s"namespace), got ${namespace.mkString(".")}")
    new File(warehouse, namespace.head)
  }

  // ---- namespaces: one manifest root each ----

  override def listNamespaces(): Array[Array[String]] =
    Option(warehouse.listFiles).getOrElse(Array.empty)
      .filter(_.isDirectory).map(d => Array(d.getName)).sortBy(_.head)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty // single-level: no children
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && rootOf(namespace).isDirectory

  override def loadNamespaceMetadata(
      namespace: Array[String]): java.util.Map[String, String] =
    if (namespaceExists(namespace))
      Map("location" -> rootOf(namespace).toString).asJava
    else throw new NoSuchNamespaceException(namespace)

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = {
    rootOf(namespace).mkdirs(); ()
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    val root = rootOf(namespace)
    if (!root.isDirectory) false
    else if (!cascade && ManifestTable.read(root).exists(_.tables.nonEmpty))
      throw new IllegalStateException(
        s"namespace ${namespace.head} still holds tables (use CASCADE)")
    else {
      def rm(f: File): Unit = {
        Option(f.listFiles).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(root); true
    }
  }

  // ---- tables ----

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val root = rootOf(namespace)
    if (!root.isDirectory) throw new NoSuchNamespaceException(namespace)
    // view entries list through listViews (SHOW TABLES must not offer a
    // name loadTable then refuses)
    ManifestTable.read(root).map(_.tables
      .collect { case (t, ts) if !ManifestTable.isView(ts) => t }
      .toArray.sorted
      .map(t => Identifier.of(namespace, t))).getOrElse(Array.empty)
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace.length == 1 &&
      ManifestTable.read(rootOf(ident.namespace))
        .exists(_.tables.get(ident.name).exists(ts =>
          ts.schemaJson.nonEmpty && !ManifestTable.isView(ts)))

  override def loadTable(ident: Identifier): Table = {
    // a REAL table wins over meta-table resolution: a created table
    // whose name happens to contain '$' (legal in createTable) must stay
    // reachable, never shadowed by the meta view of its '$'-prefix
    if (tableExists(ident))
      return new GraftSqlTable(rootOf(ident.namespace), ident.name, None)
    // metadata tables: `SELECT * FROM cat.ns.t$history|$files|$properties`
    // — answered from the manifest alone ([[GraftMetaTable]])
    val di = ident.name.lastIndexOf('$')
    if (di > 0) {
      val (base, kind) =
        (ident.name.substring(0, di), ident.name.substring(di + 1))
      if (GraftMetaTable.Kinds.contains(kind) &&
          namespaceExists(ident.namespace)) {
        val root = rootOf(ident.namespace)
        if (ManifestTable.read(root)
            .exists(_.table(base).schemaJson.nonEmpty))
          return new GraftMetaTable(root, base, kind)
      }
    }
    throw new NoSuchTableException(ident)
  }

  /** SQL time travel: `SELECT … FROM graft.ns.t VERSION AS OF 7` resolves
    * here — the pinned snapshot rides the same retention window as every
    * other time-travel read.
    */
  /** `VERSION AS OF <v>` — a commit version, or a NAMED REF (`VERSION
    * AS OF 'audited'`) resolving through the table's `ref.<name>`
    * properties at HEAD. A ref pins its version against retention
    * (see [[ManifestTable]]'s refVersionsOf), so `AS OF '<name>'` keeps
    * serving after the count/time windows passed it.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val root = rootOf(ident.namespace)
    val v = scala.util.Try(version.trim.toLong).toOption.getOrElse {
      ManifestTable.read(root)
        .flatMap(_.table(ident.name).props.get(s"ref.$version"))
        .flatMap(s => scala.util.Try(s.trim.toLong).toOption)
        .getOrElse(throw new IllegalArgumentException(
          s"'$version' is neither a commit version nor a named ref on " +
            s"'${ident.name}' — declare one with ALTER TABLE … SET " +
            s"TBLPROPERTIES ('ref.$version' = '<version>')"))
    }
    new GraftSqlTable(root, ident.name, Some(v))
  }

  /** `TIMESTAMP AS OF` (the warehouse `AT(TIMESTAMP => …)` shape):
    * resolves through the commit timestamps the version files record —
    * the newest retained commit at-or-before the asked instant.
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val root = rootOf(ident.namespace)
    val v = ManifestTable.versionAt(root, timestampMicros / 1000L)
      .getOrElse(throw new IllegalArgumentException(
        s"no retained commit of ${ident.name} at or before the asked " +
          "timestamp (outside the retention window, or pre-history)"))
    new GraftSqlTable(root, ident.name, Some(v))
  }

  /** The v2-Column CREATE path: Spark's built-in column→StructType
    * conversion carries DEFAULT metadata but not IDENTITY specs (those
    * are the catalog's to interpret), so this override encodes
    * `identity.start` / `identity.step` / `identity.allowExplicitInsert`
    * into the field metadata the manifest persists — the write path's
    * [[ManifestTable.identityOf]] reads them back from any snapshot.
    */
  override def createTable(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField}
    val schema = StructType(columns.map { c =>
      val mb = new MetadataBuilder()
      Option(c.metadataInJSON())
        .foreach(j => mb.withMetadata(Metadata.fromJson(j)))
      Option(c.comment()).foreach(mb.putString("comment", _))
      Option(c.defaultValue()).foreach { d =>
        val cur = Option(d.getSql).getOrElse(
          Option(d.getValue).map(v =>
            org.apache.spark.sql.catalyst.expressions
              .Literal(v.value(), v.dataType()).sql)
            .getOrElse(throw new IllegalArgumentException(
              s"default for column '${c.name}' has neither SQL nor value")))
        mb.putString(org.apache.spark.sql.catalyst.util
          .ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY, cur)
        mb.putString(org.apache.spark.sql.catalyst.util
          .ResolveDefaultColumns.EXISTS_DEFAULT_COLUMN_METADATA_KEY,
          Option(d.getValue).map(v =>
            org.apache.spark.sql.catalyst.expressions
              .Literal(v.value(), v.dataType()).sql).getOrElse(cur))
      }
      Option(c.identityColumnSpec()).foreach { s =>
        mb.putLong("identity.start", s.getStart)
        mb.putLong("identity.step", s.getStep)
        mb.putBoolean("identity.allowExplicitInsert", s.isAllowExplicitInsert)
      }
      require(c.generationExpression() == null,
        "graft declares generated columns via TBLPROPERTIES " +
          "('generated.<col>' = '<sql expr>'), not GENERATED ALWAYS AS")
      StructField(c.name, c.dataType, c.nullable, mb.build())
    })
    createTable(ident, schema, partitions, properties)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft tables bucket internally on their merge keys; SQL PARTITIONED " +
        "BY is not supported (set 'mergeKeys'/'buckets' table properties)")
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val props = properties.asScala
    val mergeKeys = props.get("mergekeys").orElse(props.get("mergeKeys"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq(schema.fieldNames.head))
    mergeKeys.foreach(k => require(schema.fieldNames.contains(k),
      s"mergeKeys column '$k' not in the table schema"))
    val buckets = props.get("buckets").map(_.toInt).getOrElse(16)
    def propCols(k: String): Seq[String] =
      props.get(k.toLowerCase).orElse(props.get(k))
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    // per-table operating properties ride TBLPROPERTIES: retention
    // windows, checkpoint interval, and the row-level write mode
    // (copy-on-write default, merge-on-read for heavy-update tables)
    val recorded = ManifestTable.KnownProps.flatMap(k =>
      props.get(k.toLowerCase).orElse(props.get(k)).map(k -> _)).toMap ++
      // CHECK constraints declare at creation (empty table: trivially
      // valid) and enforce on every write from the first row on;
      // generated columns derive on every write from the first row on
      props.collect { case (k, v)
        if k.startsWith("constraint.") || k.startsWith("generated.") ||
          k.startsWith("default.") || k.startsWith("metric.") ||
          k.startsWith("metricGoverned.") ||
          k.startsWith("mask.") || k.startsWith("tag.") ||
          k.startsWith("maskForTag.") =>
          k -> v } ++
      // row access policy: parse-checked, and incompatible with
      // merge-on-read (its reads re-plan into reconciliation unions the
      // policy filter placement does not govern)
      props.get("rowpolicy").orElse(props.get("rowPolicy")).map { sql =>
        require(parses(sql),
          s"row policy does not parse: $sql")
        require(!props.get("rowlevelmode").orElse(props.get("rowLevelMode"))
          .contains(GraftSqlTable.MergeOnRead),
          "rowPolicy is not supported on merge-on-read tables")
        GraftSqlTable.RowPolicyKey -> sql
      }
    recorded.get("rowLevelMode").foreach(m =>
      require(GraftSqlTable.RowLevelModes.contains(m),
        s"rowLevelMode must be one of ${GraftSqlTable.RowLevelModes}, got '$m'"))
    // declaration-time validation, same require()s alterTable enforces —
    // without it a CREATE TABLE with a dotted tag key, an empty tag
    // list, or an unparsable mask/metric/generated expression succeeded
    // at declaration and then every READ of the table threw from
    // effectiveMasks
    recorded.foreach {
      case (k, v) if k.startsWith("tag.") =>
        require(!k.stripPrefix("tag.").contains('.'),
          s"tag key '$k' addresses a struct field — tags attach to " +
            "whole columns; mask one field with mask.<col>.<field> instead")
        require(v.split(",").exists(_.trim.nonEmpty),
          s"tag list for '$k' is empty")
      case (k, v) if k.startsWith("maskForTag.") || k.startsWith("mask.") ||
          k.startsWith("metric.") || k.startsWith("generated.") =>
        require(parses(v),
          s"expression for '$k' does not parse: $v")
      case (k, v) if k.startsWith("metricGoverned.") =>
        require(Seq("true", "false").contains(v.trim.toLowerCase),
          s"'$k' must be true or false, got '$v'")
      case _ => ()
    }
    ManifestTable.createTable(rootOf(ident.namespace), ident.name, schema,
      mergeKeys, buckets, propCols("statsCols"), propCols("searchCols"),
      recorded)
    new GraftSqlTable(rootOf(ident.namespace), ident.name, None)
  }

  // ---- atomic CREATE OR REPLACE (StagingTableCatalog) ----
  //
  // The reference's canonical DDL verb — `CREATE OR REPLACE TABLE`
  // (sql/02_canonical_ddl.sql:6) — and atomic CTAS/RTAS. Staging rides
  // the TRANSACTION ENVELOPE: stage* opens an envelope on the root, the
  // drop+create (and the CTAS write, which the envelope's overlay makes
  // read-your-own-writes) land invisibly, and commitStagedChanges
  // publishes everything as ONE manifest swap — readers keep the old
  // table until the commit point, a crash/abort publishes NOTHING, and
  // the replaced state stays time-travelable/UNDROP-able within
  // retention (the Snowflake CREATE OR REPLACE contract).

  private def staged(ident: Identifier, info: TableInfo,
      orReplace: Boolean, mustExist: Boolean): StagedTable = {
    val root = rootOf(ident.namespace)
    val key = root.getCanonicalPath
    val exists = tableExists(ident)
    if (!orReplace && exists) throw new TableAlreadyExistsException(ident)
    if (mustExist && !exists) throw new NoSuchTableException(ident)
    // Two flavors (the ownership flag decides what commit/abort do):
    //  - no envelope open → open a PRIVATE one; commitStagedChanges
    //    publishes it, abort rolls it back — the standalone atomic
    //    CREATE OR REPLACE [AS SELECT].
    //  - an EXPLICIT envelope is open (CALL graft.system.begin) → stage
    //    INTO it like any other buffered statement: publication waits
    //    for the session's commit, and abort rewinds to a savepoint
    //    taken here, compensating only the DDL's own piece.
    //  - an envelope opened by ANOTHER in-flight staged DDL → refuse:
    //    sharing would publish two unrelated DDLs together; the caller
    //    retries after the first commits (the same wait-and-retry any
    //    optimistic writer performs).
    val savepoint = ManifestTable.savepointTxn(root)
    val owned = savepoint.isEmpty
    if (owned) {
      // reservation BEFORE begin(): a sibling staged DDL racing between
      // our begin() and a later put would see an open envelope with no
      // reservation, misread it as user-opened, and stage into ours —
      // publishing two unrelated DDLs together
      if (GraftCatalog.stagedOwned.putIfAbsent(key, ()).nonEmpty)
        throw new UnsupportedOperationException(
          s"cannot stage CREATE [OR REPLACE] on '${ident.name}': " +
            "another staged DDL is in flight on this namespace — retry " +
            "after it commits")
      try ManifestTable.begin(root): Unit
      catch {
        case e: IllegalArgumentException =>
          GraftCatalog.stagedOwned.remove(key)
          throw new UnsupportedOperationException(
            s"cannot stage CREATE [OR REPLACE] on '${ident.name}': an " +
              "envelope opened on this namespace concurrently — retry " +
              "after it commits", e)
      }
    } else if (GraftCatalog.stagedOwned.contains(key))
      throw new UnsupportedOperationException(
        s"cannot stage CREATE [OR REPLACE] on '${ident.name}': another " +
          "staged DDL is in flight on this namespace — retry after it " +
          "commits")
    def undo(): Unit =
      if (owned) { GraftCatalog.stagedOwned.remove(key); ManifestTable.rollback(root): Unit }
      else savepoint.foreach(_.apply())
    // tag/mask propagation through REPLACE lineage (the Snowflake
    // shape): the replaced table's governance props carry onto the new
    // declaration — tag.<col>/mask.<col> for columns that SURVIVE into
    // the new schema (a CTAS that projects a tagged column keeps its
    // tag), maskForTag.* policies wholesale — unless the new
    // declaration sets the same key itself. Cross-TABLE column lineage
    // (CTAS from a different tagged source) is out of the catalog's
    // sight: Spark hands it the result schema, never the query plan.
    val carried: Map[String, String] =
      if (!exists) Map.empty
      else {
        val cols = info.columns.map(_.name).toSet
        val declared = info.properties.asScala.keySet
        ManifestTable.read(root).map(_.table(ident.name).props)
          .getOrElse(Map.empty)
          .filter { case (k, _) =>
            !declared.contains(k) && (k.split("\\.", 3) match {
              case Array("tag", c) => cols.contains(c)
              case Array("maskForTag", _) => true
              case Array("mask", c, _*) => cols.contains(c)
              case _ => false
            })
          }
      }
    // REPLACE stages under a TEMP name and swaps at commit: the old
    // table stays live in the overlay until the commit point, so a
    // SELF-REFERENTIAL RTAS (`CREATE OR REPLACE t AS SELECT … FROM t`,
    // the Snowflake idiom) reads the PRE-replace rows — an upfront drop
    // made the source scan resolve the freshly-emptied table
    val stagingName =
      if (exists) s"${ident.name}__stage_${UUID.randomUUID.toString.take(8)}"
      else ident.name
    val inner =
      try {
        val t = createTable(Identifier.of(ident.namespace, stagingName),
          info.columns, info.partitions, info.properties)
          .asInstanceOf[GraftSqlTable]
        if (carried.nonEmpty)
          ManifestTable.alterTable(root, stagingName, props = carried)
        t
      } catch {
        case e: Throwable => undo(); throw e
      }
    new GraftStagedTable(root, inner, owned,
      onCommit = () => {
        if (exists) { // the swap: both verbs buffer into the envelope
          ManifestTable.dropTable(root, ident.name): Unit
          ManifestTable.renameTable(root, stagingName, ident.name)
        }
        if (owned) {
          GraftCatalog.stagedOwned.remove(key)
          ManifestTable.commitTxn(root): Unit
        } // shared envelope: stays staged until CALL graft.system.commit
      },
      onAbort = () => undo())
  }

  override def stageCreate(ident: Identifier, info: TableInfo): StagedTable =
    staged(ident, info, orReplace = false, mustExist = false)

  override def stageReplace(ident: Identifier, info: TableInfo): StagedTable =
    staged(ident, info, orReplace = true, mustExist = true)

  override def stageCreateOrReplace(ident: Identifier, info: TableInfo)
      : StagedTable =
    staged(ident, info, orReplace = true, mustExist = false)

  /** `ALTER TABLE … ADD COLUMNS (…)` (append-only, nullable — the same
    * unify-on-merge evolution the write path applies, as a pure metadata
    * commit: old generations null-backfill, zero rewrites) and
    * `ALTER TABLE … SET TBLPROPERTIES ('statsCols'='…'|'searchCols'='…')`
    * (recorded-layout adoption — pair with `CALL graft.system.index` to
    * backfill EXISTING generations). Anything else — renames, drops,
    * retypes, repositioning — is refused: those change committed bytes'
    * meaning, which an immutable-generation layout answers with
    * rewrite verbs, not metadata edits.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val root = rootOf(ident.namespace)
    val adds = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.types.StructField]
    var statsCols: Seq[String] = Nil
    var searchCols: Seq[String] = Nil
    val props = scala.collection.mutable.Map.empty[String, String]
    val colDefaults = scala.collection.mutable.Map.empty[String, String]
    def cols(v: String): Seq[String] =
      v.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    def knownProp(name: String): Option[String] =
      ManifestTable.KnownProps.find(_.equalsIgnoreCase(name))
    changes.foreach {
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          "graft supports top-level ADD COLUMNS only")
        require(a.isNullable,
          "added columns must be nullable (existing rows null-backfill)")
        require(a.position == null,
          "added columns append at the end (no FIRST/AFTER)")
        // ADD COLUMN … DEFAULT <expr>: the default applies to FUTURE
        // writes (CURRENT_DEFAULT); existing rows null-backfill — the
        // engine deliberately does NOT adopt exists-default rewriting of
        // history (committed bytes keep their meaning)
        val meta = Option(a.defaultValue()).fold(
          org.apache.spark.sql.types.Metadata.empty) { d =>
          val cur = Option(d.getSql).getOrElse(
            Option(d.getValue).map(v =>
              org.apache.spark.sql.catalyst.expressions
                .Literal(v.value(), v.dataType()).sql)
              .getOrElse(throw new IllegalArgumentException(
                s"default for added column '${a.fieldNames.head}' has " +
                  "neither SQL nor value")))
          new org.apache.spark.sql.types.MetadataBuilder()
            .putString(org.apache.spark.sql.catalyst.util
              .ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY,
              cur)
            .build()
        }
        adds += org.apache.spark.sql.types.StructField(
          a.fieldNames.head, a.dataType, nullable = true, meta)
      case p: TableChange.SetProperty
          if p.property.equalsIgnoreCase("statsCols") =>
        statsCols = cols(p.value)
      case p: TableChange.SetProperty
          if p.property.equalsIgnoreCase("searchCols") =>
        searchCols = cols(p.value)
      case p: TableChange.SetProperty
          if p.property.equalsIgnoreCase("buckets") =>
        throw new UnsupportedOperationException(
          "changing the bucket count rewrites every row under the new " +
            "hash — run CALL <catalog>.system.rebucket(namespace, table, " +
            "buckets) instead of ALTER TABLE")
      case u: TableChange.UpdateColumnDefaultValue =>
        // engine-native `ALTER COLUMN <c> SET DEFAULT <expr>` / `DROP
        // DEFAULT` (Spark signals DROP with an empty default): lands in
        // the field's CURRENT_DEFAULT metadata, affecting future writes
        // that omit the column; committed rows keep their values
        require(u.fieldNames.length == 1,
          "graft supports top-level column defaults only")
        val sql = Option(u.newDefaultValue()).getOrElse("")
        if (sql.nonEmpty)
          require(parses(sql),
            s"default expression does not parse: $sql")
        colDefaults += u.fieldNames.head -> sql
      case p: TableChange.SetProperty
          if p.property.startsWith("constraint.") =>
        props += p.property -> p.value
      case p: TableChange.SetProperty
          if p.property.startsWith("default.") =>
        // applies to writes that OMIT the column from here on
        require(parses(p.value),
          s"default expression does not parse: ${p.value}")
        props += p.property -> p.value
      case p: TableChange.SetProperty
          if p.property.equalsIgnoreCase(GraftSqlTable.RowPolicyKey) =>
        require(parses(p.value),
          s"row policy does not parse: ${p.value}")
        props += GraftSqlTable.RowPolicyKey -> p.value
      case p: TableChange.SetProperty
          if p.property.startsWith("mask.") ||
            p.property.startsWith("maskForTag.") =>
        // dynamic data masking — column-attached or tag-attached (the
        // tag policy is written against the placeholder `val`):
        // parse-checked; type/nullability validated at plan time
        // against the live schema
        require(parses(p.value),
          s"mask expression does not parse: ${p.value}")
        props += p.property -> p.value
      case p: TableChange.SetProperty
          if p.property.startsWith("ref.") =>
        // named snapshot ref: pins a commit version against retention
        // and resolves through VERSION AS OF '<name>'. Must point at a
        // version that is still reconstructible — a dead pin would
        // never serve
        // a numeric ref NAME could never resolve: VERSION AS OF tries
        // the numeric parse first, so 'ref.7' would pin a version no
        // query can reach by name
        require(scala.util.Try(
            p.property.stripPrefix("ref.").trim.toLong).isFailure,
          s"named ref '${p.property}' has a numeric name — VERSION AS " +
            "OF would read it as a commit version; pick a non-numeric " +
            "name")
        val v = scala.util.Try(p.value.trim.toLong).toOption
        require(v.exists(_ >= 0),
          s"named ref '${p.property}' must pin a commit version, " +
            s"got '${p.value}'")
        require(scala.util.Try(
            ManifestTable.resolve(root, v)).isSuccess,
          s"cannot pin '${p.property}' to version ${v.get}: that " +
            "version is not reconstructible (aged out of retention?)")
        props += p.property -> p.value.trim
      case p: TableChange.SetProperty
          if p.property.startsWith("tag.") =>
        // object tagging: a comma-separated tag list per column —
        // free-form names; masking binds through maskForTag.<tag>.
        // Tags attach to WHOLE columns (field-grain masking is
        // mask.<col>.<field>'s job)
        require(!p.property.stripPrefix("tag.").contains('.'),
          s"tag key '${p.property}' addresses a struct field — tags " +
            "attach to whole columns; mask one field with " +
            "mask.<col>.<field> instead")
        require(p.value.split(",").exists(_.trim.nonEmpty),
          s"tag list for '${p.property}' is empty")
        props += p.property -> p.value
      case p: TableChange.SetProperty
          if p.property.startsWith("metric.") =>
        // data metric function: recorded (not enforced) on maintenance
        // sweeps into the _metrics ops table
        require(parses(p.value),
          s"metric expression does not parse: ${p.value}")
        props += p.property -> p.value
      case p: TableChange.SetProperty
          if p.property.startsWith("metricGoverned.") =>
        // scope metric.<name>'s sweep to the session's policy-visible
        // rows (tenant-scoped metric consumers); default = owner view
        require(Seq("true", "false").contains(p.value.trim.toLowerCase),
          s"'${p.property}' must be true or false, got '${p.value}'")
        props += p.property -> p.value
      case p: TableChange.SetProperty
          if p.property.startsWith("generated.") =>
        // applies to FUTURE writes; existing rows keep their values (run
        // a rewrite verb, e.g. update_where over TRUE, to re-derive)
        require(parses(p.value),
          s"generated column expression does not parse: ${p.value}")
        props += p.property -> p.value
      case p: TableChange.SetProperty if knownProp(p.property).nonEmpty =>
        val key = knownProp(p.property).get
        if (key == "rowLevelMode")
          require(GraftSqlTable.RowLevelModes.contains(p.value),
            s"rowLevelMode must be one of ${GraftSqlTable.RowLevelModes}, " +
              s"got '${p.value}'")
        else if (key == "isolationLevel")
          require(ManifestTable.IsolationLevels.contains(p.value),
            s"isolationLevel must be one of " +
              s"${ManifestTable.IsolationLevels}, got '${p.value}'")
        else if (key == "martSourceVersion")
          require(scala.util.Try(p.value.trim.toLong).isSuccess,
            s"martSourceVersion must be a commit version, got '${p.value}'")
        else if (ManifestTable.IntProps.contains(key))
          require(scala.util.Try(p.value.trim.toInt).toOption.exists(_ > 0),
            s"table property '$key' must be a positive integer, " +
              s"got '${p.value}'")
        // remaining mart declaration keys are free-form name lists
        props += key -> p.value
      case rm: TableChange.RemoveProperty =>
        // UNSET TBLPROPERTIES: drop a row policy, mask, constraint,
        // metric, default/generated expression, or operating property —
        // a removal sentinel rides the same metadata commit and the
        // manifest fold deletes the key
        val k = rm.property
        val key =
          if (k.equalsIgnoreCase(GraftSqlTable.RowPolicyKey))
            GraftSqlTable.RowPolicyKey
          else knownProp(k).getOrElse(k)
        val removable = key == GraftSqlTable.RowPolicyKey ||
          knownProp(k).nonEmpty ||
          Seq("mask.", "constraint.", "metric.", "metricGoverned.",
            "default.", "generated.", "tag.", "maskForTag.", "ref.")
            .exists(key.startsWith)
        require(removable,
          s"property '$k' is not removable (layout properties like " +
            "mergeKeys/buckets define committed bytes' meaning)")
        // unsetting rowLevelMode on a merge-on-read table with LIVE
        // deltas would route later UPDATE/DELETE through the
        // copy-on-write builder, whose base rewrite leaves the old delta
        // upserts/tombstones in place to shadow it — committed bytes
        // would change meaning, exactly what removability protects
        if (key == "rowLevelMode")
          require(ManifestTable.read(root)
              .forall(_.table(ident.name).deltas.isEmpty),
            s"cannot UNSET rowLevelMode on '${ident.name}': outstanding " +
              "merge-on-read deltas still shadow the base generations — " +
              "collapse them first (CALL graft.system.compact)")
        props += key -> ManifestTable.PropRemoved
      case other => throw new UnsupportedOperationException(
        s"unsupported ALTER TABLE change: $other (graft supports ADD " +
          "COLUMNS and SET/UNSET TBLPROPERTIES statsCols/searchCols/" +
          ManifestTable.KnownProps.toSeq.sorted.mkString("/") + ")")
    }
    // rowPolicy and merge-on-read stay mutually exclusive through ALTER
    // from either direction
    if (props.contains(GraftSqlTable.RowPolicyKey) ||
        props.get("rowLevelMode").contains(GraftSqlTable.MergeOnRead)) {
      val eff = ManifestTable.read(root)
        .map(_.table(ident.name).props).getOrElse(Map.empty) ++ props
      require(!(eff.contains(GraftSqlTable.RowPolicyKey) &&
        eff.get("rowLevelMode").contains(GraftSqlTable.MergeOnRead)),
        "rowPolicy is not supported on merge-on-read tables")
    }
    // ADDING a CHECK constraint validates EXISTING data first (the
    // Delta ADD CONSTRAINT contract): a declared constraint is an
    // invariant over the whole table, not just future writes
    val newConstraints = props.toMap.filter(_._1.startsWith("constraint."))
    if (newConstraints.nonEmpty)
      ManifestTable.enforceConstraints(ident.name, newConstraints,
        ManifestTable.readTable(SparkSession.active, root.toString,
          table = ident.name))
    ManifestTable.alterTable(root, ident.name, adds.toSeq,
      statsCols, searchCols, props.toMap, colDefaults.toMap)
    new GraftSqlTable(root, ident.name, None)
  }

  override def dropTable(ident: Identifier): Boolean = {
    if (ident.namespace.length != 1) return false
    val root = rootOf(ident.namespace)
    // DROP TABLE on a view is a different verb — refuse with the remedy
    require(ManifestTable.viewSql(root, ident.name).isEmpty,
      s"'${ident.name}' is a view — use DROP VIEW")
    ManifestTable.dropTable(root, ident.name)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    require(oldIdent.namespace.sameElements(newIdent.namespace),
      "rename cannot move a table across namespaces (manifest roots)")
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    ManifestTable.renameTable(rootOf(oldIdent.namespace), oldIdent.name,
      newIdent.name)
  }

  // ---- maintenance procedures: the warehouse's `CALL` verbs ----
  // `CALL graft.system.compact(...)` / recluster / update_where /
  // delete_where / history — the operational surface (OPTIMIZE,
  // clustering, audited row mutations returning counts) a SQL-only user
  // otherwise can't reach.

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.Names.map(n => Identifier.of(Array("system"), n)).toArray

  // ---- named views ----
  //
  // The DSv2 `ViewCatalog` surface (API users + future Spark exec
  // wiring) over [[ManifestTable]] view entries; the SQL verbs route
  // through [[graft.plans.GraftSqlParser]] → create/dropGraftView, and
  // reads expand at analysis ([[graft.plans.ResolveGraftViews]]) — see
  // plans/GraftViews.scala for why Spark 4.1.2 can't drive this
  // interface from SQL itself.

  private[graft] def viewDefinition(ns: String, name: String)
      : Option[String] =
    ManifestTable.viewSql(rootOf(Array(ns)), name)

  /** (sql, definer catalog, definer namespace parts) of a stored
    * view — what expansion needs to qualify the definition's RELATIVE
    * references against the context it was declared in. The definer
    * context is the creating SESSION's current catalog/namespace (what
    * declaration-time validation analyzed under), recorded at CREATE —
    * not this catalog — so a view declared while the session pointed at
    * `spark_catalog.default` resolves its bare names there on read too.
    */
  /** The definer namespace is a SEQUENCE of parts — stored as a JSON
    * array so an empty namespace and a part that itself contains '.'
    * (legal in Spark via backticks) round-trip exactly. Values written
    * before the array form (plain dot-joined strings, including the
    * single-part `show_views` procedure path) decode via the legacy
    * split — a part can't contain '[', so the dispatch is unambiguous.
    */
  private def encodeNsParts(parts: Seq[String]): String =
    org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        org.json4s.JArray(parts.map(org.json4s.JString(_)).toList)))

  private def decodeNsParts(s: String): Seq[String] =
    if (s.startsWith("["))
      org.json4s.jackson.JsonMethods.parse(s) match {
        case org.json4s.JArray(ps) =>
          ps.collect { case org.json4s.JString(p) => p }
        case _ => Seq.empty
      }
    else if (s.isEmpty) Seq.empty
    else s.split('.').toSeq

  private[graft] def viewEntry(ns: String, name: String)
      : Option[(String, String, Seq[String])] =
    ManifestTable.read(rootOf(Array(ns)))
      .flatMap(_.tables.get(name))
      .filter(ManifestTable.isView)
      .map { ts =>
        (ts.props(ManifestTable.ViewSqlKey),
          ts.props.getOrElse("viewCatalog", catalogName),
          ts.props.get("viewNamespace").map(decodeNsParts)
            .getOrElse(Seq(ns)))
      }

  private[graft] def createGraftView(ns: String, name: String, sql: String,
      replace: Boolean, schema: StructType, defCatalog: String,
      defNamespace: Seq[String], extraProps: Map[String, String]): Unit =
    ManifestTable.createView(rootOf(Array(ns)), name, sql, replace,
      extraProps ++ Map(
        "viewSchemaJson" -> schema.json,
        "viewCatalog" -> defCatalog,
        "viewNamespace" -> encodeNsParts(defNamespace)))

  private[graft] def dropGraftView(ns: String, name: String): Boolean =
    ManifestTable.dropView(rootOf(Array(ns)), name)

  override def listViews(namespace: String*): Array[Identifier] = {
    val root = rootOf(namespace.toArray)
    if (!root.isDirectory)
      throw new NoSuchNamespaceException(namespace.toArray)
    ManifestTable.read(root).map(_.tables
      .collect { case (t, ts) if ManifestTable.isView(ts) => t }
      .toArray.sorted
      .map(t => Identifier.of(namespace.toArray, t)))
      .getOrElse(Array.empty)
  }

  override def loadView(ident: Identifier): View = {
    val entry = ManifestTable.read(rootOf(ident.namespace))
      .flatMap(_.tables.get(ident.name))
      .filter(ManifestTable.isView)
      .getOrElse(throw new NoSuchViewException(ident))
    val p = entry.props
    val hidden = Set(ManifestTable.ViewSqlKey, "viewSchemaJson",
      "viewCatalog", "viewNamespace")
    new View {
      override def name(): String =
        (catalogName +: ident.namespace :+ ident.name).mkString(".")
      override def query(): String = p(ManifestTable.ViewSqlKey)
      override def currentCatalog(): String =
        p.getOrElse("viewCatalog", catalogName)
      override def currentNamespace(): Array[String] =
        p.get("viewNamespace").map(decodeNsParts(_).toArray)
          .getOrElse(Array(ident.namespace.head))
      override def schema(): StructType = p.get("viewSchemaJson")
        .map(j => org.apache.spark.sql.types.DataType.fromJson(j)
          .asInstanceOf[StructType])
        .getOrElse(new StructType())
      override def queryColumnNames(): Array[String] = schema().fieldNames
      override def columnAliases(): Array[String] = Array.empty
      override def columnComments(): Array[String] = Array.empty
      override def properties(): java.util.Map[String, String] =
        (p -- hidden).asJava
    }
  }

  override def viewExists(ident: Identifier): Boolean =
    ident.namespace.length == 1 &&
      viewDefinition(ident.namespace.head, ident.name).isDefined

  override def createView(info: ViewInfo): View = {
    if (viewExists(info.ident))
      throw new ViewAlreadyExistsException(info.ident)
    createGraftView(info.ident.namespace.head, info.ident.name, info.sql,
      replace = false, info.schema, info.currentCatalog,
      info.currentNamespace.toSeq, info.properties.asScala.toMap)
    loadView(info.ident)
  }

  override def replaceView(info: ViewInfo, orCreate: Boolean): View = {
    if (!orCreate && !viewExists(info.ident))
      throw new NoSuchViewException(info.ident)
    createGraftView(info.ident.namespace.head, info.ident.name, info.sql,
      replace = true, info.schema, info.currentCatalog,
      info.currentNamespace.toSeq, info.properties.asScala.toMap)
    loadView(info.ident)
  }

  override def alterView(ident: Identifier, changes: ViewChange*): View = {
    val entry = ManifestTable.read(rootOf(ident.namespace))
      .flatMap(_.tables.get(ident.name))
      .filter(ManifestTable.isView)
      .getOrElse(throw new NoSuchViewException(ident))
    val props = changes.foldLeft(entry.props) {
      case (acc, sp: ViewChange.SetProperty) =>
        require(sp.property != ManifestTable.ViewSqlKey,
          "replace the view to change its definition")
        acc + (sp.property -> sp.value)
      case (acc, rp: ViewChange.RemoveProperty) => acc - rp.property
      case (_, other) => throw new IllegalArgumentException(
        s"unsupported view change: $other")
    }
    ManifestTable.createView(rootOf(ident.namespace), ident.name,
      entry.props(ManifestTable.ViewSqlKey), orReplace = true, props)
    loadView(ident)
  }

  override def dropView(ident: Identifier): Boolean =
    ident.namespace.length == 1 &&
      dropGraftView(ident.namespace.head, ident.name)

  override def renameView(fromIdent: Identifier, toIdent: Identifier)
      : Unit = {
    require(fromIdent.namespace.sameElements(toIdent.namespace),
      "rename cannot move a view across namespaces (manifest roots)")
    if (!viewExists(fromIdent)) throw new NoSuchViewException(fromIdent)
    if (viewExists(toIdent) || tableExists(toIdent))
      throw new ViewAlreadyExistsException(toIdent)
    ManifestTable.renameTable(rootOf(fromIdent.namespace), fromIdent.name,
      toIdent.name)
  }

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    require(ident.namespace.sameElements(Array("system")),
      s"procedures live in the 'system' namespace, got ${ident.namespace.mkString(".")}")
    GraftProcedures.load(ident.name, rootOf)
  }
}

/** The catalog's `CALL` procedures. Each binds positionally, runs its
  * manifest verb on the driver (launching whatever Spark jobs the verb
  * needs), and returns its result rows as a [[LocalScan]].
  */
object GraftProcedures {
  import org.apache.spark.sql.types._
  import org.apache.spark.unsafe.types.UTF8String

  val Names = Seq("compact", "recluster", "zorder", "index", "history",
    "delete_where", "update_where", "detail", "vacuum",
    "begin", "commit", "rollback", "clone", "clone_across", "restore",
    "rebucket", "refresh_mart",
    "refresh_joined_mart", "refresh_star_mart", "maintain",
    "create_view", "drop_view", "show_views",
    "branch_create", "branch_publish", "branch_drop", "show_branches")

  private def in(n: String, dt: DataType) =
    ProcedureParameter.in(n, dt).build()

  private def str(row: InternalRow, i: Int): String = row.getUTF8String(i).toString

  private def scanOf(schema: StructType, rs: InternalRow*)
      : java.util.Iterator[Scan] =
    java.util.Collections.singletonList[Scan](new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] = rs.toArray
    }).iterator()

  private def bound(name0: String, params: Seq[ProcedureParameter],
      out: StructType)(run: InternalRow => Seq[InternalRow]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = name0
      override def description(): String = s"graft $name0"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = name0
          override def description(): String = s"graft $name0"
          override def parameters(): Array[ProcedureParameter] = params.toArray
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] =
            scanOf(out, run(input): _*)
        }
    }

  private val CountSchema = StructType(Seq(StructField("rows", LongType)))

  def load(name: String, rootOf: Array[String] => java.io.File): UnboundProcedure = {
    def root(ns: String) = rootOf(Array(ns))
    def spark = SparkSession.active
    name match {
      // optional small_rows >= 0 makes compaction MINOR: only
      // generations at or under that many rows fold; large ones keep
      // their dirs (the OPTIMIZE-binpack shape)
      case "compact" => bound("compact",
        Seq(in("namespace", StringType), in("table", StringType),
          ProcedureParameter.in("small_rows", LongType)
            .defaultValue("-1").build()),
        new StructType()) { row =>
        ManifestTable.compact(spark, root(str(row, 0)), str(row, 1),
          smallRows = if (row.isNullAt(2)) -1L else row.getLong(2))
        Nil
      }
      // optional overlap_budget >= 0 makes the recluster INCREMENTAL:
      // only generations overlapping more than that many siblings on
      // the primary clustering column rewrite (rewrite_data_files WHERE)
      case "recluster" => bound("recluster",
        Seq(in("namespace", StringType), in("table", StringType),
          in("columns", StringType), in("slices", IntegerType),
          ProcedureParameter.in("overlap_budget", IntegerType)
            .defaultValue("-1").build()),
        StructType(Seq(StructField("rewritten", LongType)))) { row =>
        val n = ManifestTable.reclusterBy(spark, root(str(row, 0)),
          str(row, 2).split(",").map(_.trim).filter(_.nonEmpty).toSeq,
          str(row, 1), row.getInt(3),
          overlapBudget = if (row.isNullAt(4)) -1 else row.getInt(4))
        Seq(InternalRow(n))
      }
      case "zorder" => bound("zorder",
        Seq(in("namespace", StringType), in("table", StringType),
          in("columns", StringType), in("slices", IntegerType),
          ProcedureParameter.in("overlap_budget", IntegerType)
            .defaultValue("-1").build()),
        StructType(Seq(StructField("rewritten", LongType)))) { row =>
        val n = ManifestTable.reclusterBy(spark, root(str(row, 0)),
          str(row, 2).split(",").map(_.trim).filter(_.nonEmpty).toSeq,
          str(row, 1), row.getInt(3), zorder = true,
          overlapBudget = if (row.isNullAt(4)) -1 else row.getInt(4))
        Seq(InternalRow(n))
      }
      case "index" => bound("index",
        Seq(in("namespace", StringType), in("table", StringType),
          in("search_cols", StringType), in("stats_cols", StringType)),
        StructType(Seq(StructField("generations", LongType)))) { row =>
        def cols(i: Int) =
          str(row, i).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val n = ManifestTable.buildIndexes(spark, root(str(row, 0)),
          str(row, 1), cols(2), cols(3))
        Seq(InternalRow(n))
      }
      case "history" => bound("history",
        Seq(in("namespace", StringType)),
        StructType(Seq(
          StructField("version", LongType),
          StructField("operation", StringType),
          StructField("commit_ts", TimestampType),
          StructField("touched_tables", ArrayType(StringType)),
          StructField("query_id", StringType),
          StructField("batch_id", LongType)))) { row =>
        ManifestTable.history(spark, root(str(row, 0))).collect().toSeq
          .map { r =>
            InternalRow(r.getLong(0),
              Option(r.getString(1)).map(UTF8String.fromString).orNull,
              if (r.isNullAt(2)) null
              else r.getTimestamp(2).getTime * 1000L,
              new GenericArrayData(r.getSeq[String](3)
                .map(UTF8String.fromString)),
              UTF8String.fromString(r.getString(4)), r.getLong(5))
          }
      }
      // optional session_enforced = true runs the verb UNDER the
      // session's row policy (current-like + session attrs folded at
      // call time): only policy-visible rows match, hidden rows are
      // untouchable — the audited-operator variant of the owner verbs.
      // Default stays the OWNER view (policies gate the SQL surface).
      case "delete_where" => bound("delete_where",
        Seq(in("namespace", StringType), in("table", StringType),
          in("condition", StringType),
          ProcedureParameter.in("session_enforced", BooleanType)
            .defaultValue("false").build()), CountSchema) { row =>
        val cond0 = org.apache.spark.sql.functions.expr(str(row, 2))
        val cond =
          if (!row.isNullAt(3) && row.getBoolean(3))
            GovernedRows.sessionPolicy(spark, root(str(row, 0)), str(row, 1))
              .map(cond0 && _).getOrElse(cond0)
          else cond0
        val n = ManifestTable.deleteWhere(spark, root(str(row, 0)),
          cond, str(row, 1))
        Seq(InternalRow(n))
      }
      case "update_where" => bound("update_where",
        Seq(in("namespace", StringType), in("table", StringType),
          in("condition", StringType), in("set_column", StringType),
          in("set_expr", StringType),
          ProcedureParameter.in("session_enforced", BooleanType)
            .defaultValue("false").build()), CountSchema) { row =>
        val cond0 = org.apache.spark.sql.functions.expr(str(row, 2))
        val cond =
          if (!row.isNullAt(5) && row.getBoolean(5))
            GovernedRows.sessionPolicy(spark, root(str(row, 0)), str(row, 1))
              .map(cond0 && _).getOrElse(cond0)
          else cond0
        val n = ManifestTable.updateWhere(spark, root(str(row, 0)),
          cond,
          Map(str(row, 3) ->
            org.apache.spark.sql.functions.expr(str(row, 4))), str(row, 1))
        Seq(InternalRow(n))
      }
      case "detail" => bound("detail",
        Seq(in("namespace", StringType), in("table", StringType)),
        StructType(Seq(
          StructField("table", StringType),
          StructField("version", LongType),
          StructField("merge_keys", ArrayType(StringType)),
          StructField("num_buckets", IntegerType),
          StructField("stats_cols", ArrayType(StringType)),
          StructField("search_cols", ArrayType(StringType)),
          StructField("num_generations", LongType),
          StructField("row_count", LongType),
          StructField("feed_from", LongType),
          StructField("ndv", MapType(StringType, LongType))))) { row =>
        val m = ManifestTable.read(root(str(row, 0))).getOrElse(
          throw new IllegalStateException(
            s"no committed tables in namespace ${str(row, 0)}"))
        val t = str(row, 1)
        val ts = m.table(t)
        require(ts.schemaJson.nonEmpty, s"table '$t' does not exist")
        def arr(ss: Seq[String]) =
          new GenericArrayData(ss.map(UTF8String.fromString))
        // table-level NDV: merged sketches over every base generation
        // (same every-generation/no-deltas contract as the scan's CBO
        // column stats)
        val gens = ts.gens
        val ndv: Map[String, Long] =
          if (ts.deltas.nonEmpty || gens.isEmpty) Map.empty
          else gens.map(_.ndv.keySet).reduce(_ intersect _).flatMap { c =>
            ManifestTable.ndvUnion(gens.map(_.ndv(c))).map(c -> _)
          }.toMap
        val ndvSorted = ndv.toSeq.sortBy(_._1)
        Seq(InternalRow(UTF8String.fromString(t), m.version,
          arr(ts.mergeKeys), ts.numBuckets, arr(ts.statsCols),
          arr(ts.searchCols), ts.gens.size.toLong,
          ts.rowCount.map(Long.box).orNull, ts.feedFrom,
          new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
            new GenericArrayData(ndvSorted.map(kv =>
              UTF8String.fromString(kv._1))),
            new GenericArrayData(ndvSorted.map(_._2)))))
      }
      // -- multi-statement transaction envelope: CALL begin(ns), run
      //    any number of SQL verbs against the namespace's tables, then
      //    CALL commit(ns) — ONE manifest swap, nothing visible before
      //    it, rollback/crash publishes nothing (the reference runbook's
      //    one-session semantics, main.sql)
      // a comma-separated namespace list opens/publishes ONE envelope
      // ACROSS roots (two-phase: per-root prepares, one decide record,
      // reader-recoverable promotes) — the cross-domain runbook shape
      case "begin" => bound("begin",
        Seq(in("namespace", StringType)),
        StructType(Seq(StructField("base_version", LongType)))) { row =>
        val nss = str(row, 0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        if (nss.size == 1) Seq(InternalRow(ManifestTable.begin(root(nss.head))))
        else {
          ManifestTable.beginAll(nss.map(root))
          nss.map(ns => InternalRow(
            ManifestTable.read(root(ns)).map(_.version).getOrElse(0L)))
        }
      }
      case "commit" => bound("commit",
        Seq(in("namespace", StringType)),
        StructType(Seq(StructField("version", LongType)))) { row =>
        val nss = str(row, 0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        if (nss.size == 1) Seq(InternalRow(ManifestTable.commitTxn(root(nss.head))))
        else {
          val vs = ManifestTable.commitTxnAll(nss.map(root))
          nss.map(ns => InternalRow(vs(root(ns).getName)))
        }
      }
      case "rollback" => bound("rollback",
        Seq(in("namespace", StringType)),
        StructType(Seq(StructField("rolled_back", BooleanType)))) { row =>
        val nss = str(row, 0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        Seq(InternalRow(ManifestTable.rollbackAll(nss.map(root))))
      }
      case "clone" => bound("clone",
        Seq(in("namespace", StringType), in("source", StringType),
          in("target", StringType), in("version", LongType)),
        StructType(Seq(StructField("version", LongType)))) { row =>
        val v = row.getLong(3)
        Seq(InternalRow(ManifestTable.cloneTable(root(str(row, 0)),
          str(row, 1), str(row, 2), if (v < 0) None else Some(v))))
      }
      // -- STAR joined mart: several dims, each equi-joined to the
      //    source on its own key set; per-dim fields ';'-separated
      //    between dims, ','-separated within one. Later calls may pass
      //    empty column args — the recorded declaration fills them in.
      case "refresh_star_mart" => bound("refresh_star_mart",
        Seq(in("namespace", StringType), in("source", StringType),
          in("mart", StringType), in("dims", StringType),
          in("dim_src_keys", StringType), in("dim_keys", StringType),
          in("dim_group_cols", StringType), in("src_group_cols", StringType),
          in("value_cols", StringType),
          ProcedureParameter.in("max_cols", StringType)
            .defaultValue("''").build(),
          ProcedureParameter.in("min_cols", StringType)
            .defaultValue("''").build(),
          // ';'-joined per-dim namespace ROOT PATHS for dims living in
          // other roots (empty entry = this namespace)
          ProcedureParameter.in("dim_roots", StringType)
            .defaultValue("''").build()),
        StructType(Seq(StructField("current_through", LongType)))) { row =>
        import graft.streaming.JoinedMart
        def dims(i: Int): Seq[Seq[String]] = str(row, i)
          .split(";", -1).toSeq.map(
            _.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        def cols(i: Int): Seq[String] =
          if (row.isNullAt(i)) Nil
          else str(row, i).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val names = str(row, 3).split(";").map(_.trim)
          .filter(_.nonEmpty).toSeq
        val (sks, dks, dgs) = (dims(4), dims(5), dims(6))
        def at(rows: Seq[Seq[String]], i: Int): Seq[String] =
          if (i < rows.length) rows(i) else Nil
        val dimRoots: Seq[String] =
          if (row.isNullAt(11)) Nil
          else str(row, 11).split(";", -1).toSeq.map(_.trim)
        val specs = names.zipWithIndex.map { case (n, i) =>
          JoinedMart.DimSpec(n, at(sks, i), at(dks, i), at(dgs, i),
            root = if (i < dimRoots.length && dimRoots(i).nonEmpty)
              Some(dimRoots(i)) else None)
        }
        Seq(InternalRow(JoinedMart.refreshStar(SparkSession.active,
          root(str(row, 0)), str(row, 1), specs, str(row, 2),
          cols(7), cols(8), cols(9), cols(10))))
      }
      // -- RESTORE a table to a retained version (incl. UNDROP from a
      //    pre-drop snapshot); an active feed gets the exact keyed diff
      case "restore" => bound("restore",
        Seq(in("namespace", StringType), in("table", StringType),
          in("version", LongType)),
        StructType(Seq(StructField("version", LongType)))) { row =>
        Seq(InternalRow(ManifestTable.restoreTable(SparkSession.active,
          root(str(row, 0)), str(row, 1), row.getLong(2))))
      }
      // -- cross-NAMESPACE clone: hard-linked zero-copy registration of
      //    source_ns.source@version as target_ns.target (version -1 =
      //    current)
      case "clone_across" => bound("clone_across",
        Seq(in("source_namespace", StringType), in("source", StringType),
          in("target_namespace", StringType), in("target", StringType),
          in("version", LongType)),
        StructType(Seq(StructField("version", LongType)))) { row =>
        val v = row.getLong(4)
        Seq(InternalRow(ManifestTable.cloneTableAcross(root(str(row, 0)),
          str(row, 1), root(str(row, 2)), str(row, 3),
          if (v < 0) None else Some(v))))
      }
      // -- CREATE/REFRESH MATERIALIZED VIEW, the one-shot verb: fold the
      //    unseen feed range into the named mart; with the declaration
      //    recorded, later calls need only (ns, source, mart, '', '')
      case "refresh_mart" => bound("refresh_mart",
        Seq(in("namespace", StringType), in("source", StringType),
          in("mart", StringType), in("group_cols", StringType),
          in("value_cols", StringType), in("max_cols", StringType),
          in("min_cols", StringType)),
        StructType(Seq(StructField("current_through", LongType)))) { row =>
        def cols(i: Int): Seq[String] = str(row, i)
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        Seq(InternalRow(graft.streaming.IncrementalMart.refreshMart(
          SparkSession.active, root(str(row, 0)), str(row, 1), str(row, 2),
          cols(3), cols(4), cols(5), cols(6))))
      }
      // -- JOIN-AWARE materialized view: a (source ⋈ dim) rollup kept
      //    current from both change feeds (graft.streaming.JoinedMart);
      //    with the declaration recorded, later calls need only
      //    (ns, source, dim, mart, '', '', '', '', '')
      case "refresh_joined_mart" => bound("refresh_joined_mart",
        Seq(in("namespace", StringType), in("source", StringType),
          in("dim", StringType), in("mart", StringType),
          in("src_keys", StringType), in("dim_keys", StringType),
          in("src_group_cols", StringType), in("dim_group_cols", StringType),
          in("value_cols", StringType),
          ProcedureParameter.in("max_cols", StringType)
            .defaultValue("''").build(),
          ProcedureParameter.in("min_cols", StringType)
            .defaultValue("''").build()),
        StructType(Seq(StructField("current_through", LongType)))) { row =>
        def cols(i: Int): Seq[String] =
          if (row.isNullAt(i)) Nil
          else str(row, i).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        Seq(InternalRow(graft.streaming.JoinedMart.refresh(
          SparkSession.active, root(str(row, 0)), str(row, 1), str(row, 2),
          str(row, 3), cols(4), cols(5), cols(6), cols(7), cols(8),
          cols(9), cols(10))))
      }
      // -- bucket-count evolution: one atomic physical-only rewrite
      //    under the new merge-key hash (ManifestTable.rebucket)
      case "rebucket" => bound("rebucket",
        Seq(in("namespace", StringType), in("table", StringType),
          in("buckets", IntegerType)),
        StructType(Seq(StructField("num_buckets", IntegerType)))) { row =>
        ManifestTable.rebucket(SparkSession.active, root(str(row, 0)),
          str(row, 1), row.getInt(2))
        Seq(InternalRow(row.getInt(2)))
      }
      case "vacuum" => bound("vacuum",
        Seq(in("namespace", StringType),
          // dry_run reports what the sweep WOULD collect without
          // deleting (optional; plain CALL vacuum('ns') still sweeps)
          ProcedureParameter.in("dry_run", BooleanType)
            .defaultValue("false").build()),
        StructType(Seq(StructField("files", LongType),
          StructField("bytes", LongType),
          StructField("dry_run", BooleanType)))) { row =>
        // GC runs after every commit; the explicit verb exists for roots
        // whose writers stopped (orphans from a crashed writer linger
        // until SOME commit GCs them)
        val r = root(str(row, 0))
        val dry = !row.isNullAt(1) && row.getBoolean(1)
        val s = ManifestTable.read(r)
          .map(m => ManifestTable.gc(r, m, dryRun = dry))
          .getOrElse(ManifestTable.GcStats(0L, 0L))
        Seq(InternalRow(s.files, s.bytes, dry))
      }
      // -- the policy sweep: each table's declared maintenance
      //    thresholds (maintCompactSmallRows / maintReclusterCols / …)
      //    applied in one scheduled call
      case "maintain" => bound("maintain",
        Seq(in("namespace", StringType)),
        StructType(Seq(StructField("table", StringType),
          StructField("verb", StringType),
          StructField("result", LongType)))) { row =>
        ManifestTable.maintain(spark, root(str(row, 0))).map {
          case (t, verb, n) => InternalRow(UTF8String.fromString(t),
            UTF8String.fromString(verb), n)
        }
      }
      // named views, the extension-less surface: without the injected
      // parser the literal CREATE VIEW verb can't reach a graft catalog,
      // but CALL create_view records the same entry (and SELECTs still
      // need the extensions' resolution rule to expand — the documented
      // deployment path)
      case "create_view" => bound("create_view",
        Seq(in("namespace", StringType), in("name", StringType),
          in("sql", StringType),
          ProcedureParameter.in("or_replace", BooleanType)
            .defaultValue("false").build()),
        new StructType()) { row =>
        val sql = str(row, 2)
        // the text must be a QUERY: spark.sql alone would eagerly
        // EXECUTE a command smuggled in as the "view" (an INSERT would
        // run as a side effect of a metadata verb) — parseQuery refuses
        // non-query statements before anything touches the session
        spark.sessionState.sqlParser.parseQuery(sql): Unit
        val schema = spark.sql(sql).schema // declaration-time validation
        ManifestTable.createView(root(str(row, 0)), str(row, 1), sql,
          orReplace = !row.isNullAt(3) && row.getBoolean(3),
          Map("viewSchemaJson" -> schema.json,
            "viewNamespace" -> str(row, 0)))
        Nil
      }
      case "drop_view" => bound("drop_view",
        Seq(in("namespace", StringType), in("name", StringType)),
        StructType(Seq(StructField("dropped", BooleanType)))) { row =>
        Seq(InternalRow(
          ManifestTable.dropView(root(str(row, 0)), str(row, 1))))
      }
      case "show_views" => bound("show_views",
        Seq(in("namespace", StringType)),
        StructType(Seq(StructField("name", StringType),
          StructField("sql", StringType)))) { row =>
        ManifestTable.read(root(str(row, 0))).toSeq
          .flatMap(_.tables.toSeq)
          .collect { case (n, ts) if ManifestTable.isView(ts) => n -> ts }
          .sortBy(_._1)
          .map { case (n, ts) => InternalRow(UTF8String.fromString(n),
            UTF8String.fromString(ts.props(ManifestTable.ViewSqlKey))) }
      }
      // writable branches (write-audit-publish): fork, then SET
      // graft.session.branch = <name> to write/audit the branch;
      // publish fast-forwards it onto main as ONE commit
      case "branch_create" => bound("branch_create",
        Seq(in("namespace", StringType), in("name", StringType)),
        StructType(Seq(StructField("fork_version", LongType)))) { row =>
        Seq(InternalRow(
          ManifestTable.branchCreate(root(str(row, 0)), str(row, 1))))
      }
      case "branch_publish" => bound("branch_publish",
        Seq(in("namespace", StringType), in("name", StringType)),
        StructType(Seq(StructField("published_version", LongType)))) { row =>
        Seq(InternalRow(
          ManifestTable.branchPublish(root(str(row, 0)), str(row, 1))))
      }
      case "branch_drop" => bound("branch_drop",
        Seq(in("namespace", StringType), in("name", StringType)),
        StructType(Seq(StructField("dropped", BooleanType)))) { row =>
        Seq(InternalRow(
          ManifestTable.branchDrop(root(str(row, 0)), str(row, 1))))
      }
      case "show_branches" => bound("show_branches",
        Seq(in("namespace", StringType)),
        StructType(Seq(StructField("name", StringType),
          StructField("fork_version", LongType),
          StructField("head_version", LongType)))) { row =>
        ManifestTable.branches(root(str(row, 0))).map { case (n, b, h) =>
          InternalRow(UTF8String.fromString(n), b, h)
        }
      }
      case other => throw new UnsupportedOperationException(
        s"unknown procedure 'system.$other' (have: ${Names.mkString(", ")})")
    }
  }
}

/** A staged table inside an open transaction envelope — the handle
  * Spark's atomic CREATE OR REPLACE [AS SELECT] paths hold between
  * stage* and commit. Reads and writes delegate to the (overlay-visible)
  * inner table; commit publishes the envelope as one manifest swap,
  * abort publishes nothing.
  */
private[sources] class GraftStagedTable(root: File, inner: GraftSqlTable,
    owned: Boolean, onCommit: () => Unit, onAbort: () => Unit)
  extends StagedTable with SupportsRead with SupportsWrite {

  override def name(): String = inner.name()
  override def schema(): StructType = inner.schema()
  override def properties(): java.util.Map[String, String] =
    inner.properties()
  override def capabilities(): java.util.Set[TableCapability] =
    inner.capabilities()
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = inner.newScanBuilder(options)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    inner.newWriteBuilder(info)
  override def commitStagedChanges(): Unit = onCommit()
  override def abortStagedChanges(): Unit = onAbort()
}

private[sources] object GraftCatalog {
  /** Roots with an in-flight PRIVATELY-opened staged-DDL envelope — the
    * discriminator between "stage into the user's explicit envelope"
    * and "refuse to share another staged DDL's" (see
    * [[GraftCatalog.staged]]).
    */
  val stagedOwned =
    scala.collection.concurrent.TrieMap.empty[String, Unit]
}

/** One named graft table as a DSv2 `Table`: pruned columnar batch reads,
  * V1-fallback writes onto the manifest commit protocol, and filter-based
  * DELETE/TRUNCATE mapped to [[ManifestTable.deleteWhere]].
  */
class GraftSqlTable(root: File, table: String, version: Option[Long],
    private[graft] val raw: Boolean = false)
  extends Table with SupportsRead with SupportsWrite with SupportsDelete
  with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {

  private def spark: SparkSession = SparkSession.active

  /** Snapshot-pinned index: resolved lazily so the TABLE object (which
    * Spark caches in plans) always reflects the version it was loaded
    * at — and for the live (None) case, the version current when the
    * QUERY resolved, the same once-per-query snapshot isolation as the
    * `format("graft")` path.
    */
  lazy val index: ManifestFileIndex =
    new ManifestFileIndex(spark, root.toString, table, version, raw)

  private[graft] def rootDir: File = root

  private[graft] def tableName: String = table

  private[graft] def pinnedVersion: Option[Long] = version

  /** Cache identity — what makes `df.cache()` on a graft table work
    * across queries WITHOUT ever serving another governance context's
    * rows. Spark's CacheManager matches cached plans by equality of
    * their relations, and a `DataSourceV2Relation` compares its `Table`;
    * the default reference equality made every fresh `spark.table` miss
    * (caching inert across queries). So:
    *
    *  - an UNGOVERNED table's identity is (root, table, pinned version,
    *    raw): fresh reads reuse the cache, catalog writes (INSERT/
    *    MERGE/…) REFRESH the entry through Spark's own recache hook
    *    (the write's relation equals the cached one, so `recacheByPlan`
    *    recomputes it against the new snapshot — spec-verified),
    *    `REFRESH TABLE` resolves by name and finds the entry, and
    *    pinned (`VERSION AS OF`) reads key separately from live ones.
    *    Out-of-band writes (the provider path, streaming sinks, owner
    *    verbs) don't pass through Spark's hook — standard v2-connector
    *    cache semantics: `REFRESH TABLE` (or unpersist) after them.
    *  - a GOVERNED table (rowPolicy/mask/tag-mask at the manifest HEAD)
    *    keeps IDENTITY equality: a governed read NEVER serves from a
    *    cross-query cache — policies and masks re-evaluate per query
    *    under the session's current attributes (governance plants in
    *    the OPTIMIZER, after cache lookup, so no cache key could see
    *    the policy context — strict miss is the only safe answer), and
    *    an ALTER adding a policy instantly orphans every pre-policy
    *    entry (governedness resolves from HEAD on BOTH sides of the
    *    comparison, so either side post-ALTER kills the match).
    *
    * Frozen at first use (hashCode stability); resolution failure falls
    * back to identity — never a false hit.
    */
  /** The session branch CAPTURED AT CONSTRUCTION (load) time. The lazy
    * cacheKey would otherwise stamp the branch at first-EQUALITY time —
    * after the session may have switched lineages, which let an entry
    * materialized under a branch key itself as a main entry once the
    * conf flipped (BranchSpec's cache-identity case).
    */
  private[graft] val branchAtLoad: Option[String] =
    try ManifestTable.sessionBranch(root)
    catch { case scala.util.control.NonFatal(_) => None }

  private lazy val cacheKey
      : Option[(String, String, Option[Long], Boolean, Option[String])] =
    try {
      val props = ManifestTable.read(root)
        .map(_.table(table).props).getOrElse(Map.empty)
      if (GovernedRows.governs(props, table)) None
      // the session's active BRANCH is part of the identity: a branch
      // read and a main read share (root, table, None) but resolve
      // different lineages — equality across them would let a cached
      // main Dataset serve branch reads (and vice versa)
      else Some((root.getCanonicalPath, table, version, raw, branchAtLoad))
    } catch { case scala.util.control.NonFatal(_) => None }

  override def equals(other: Any): Boolean = other match {
    case t: GraftSqlTable =>
      (this eq t) || (cacheKey.isDefined && cacheKey == t.cacheKey)
    case _ => false
  }

  override def hashCode(): Int =
    cacheKey.fold(System.identityHashCode(this))(_.##)

  /** This table re-pinned to the index's exact snapshot, marked as a
    * merge-on-read reconciliation base leg so
    * [[graft.plans.ResolveMergeOnRead]] never re-wraps it.
    */
  private[graft] def rawClone: GraftSqlTable =
    new GraftSqlTable(root, table, Some(index.snapshotVersion), raw = true)

  override def name(): String = s"$root/$table" +
    version.fold("")(v => s"@v$v")

  override def schema(): StructType =
    ManifestTable.resolve(root, version).table(table).schema

  /** Declared table properties — what `SHOW TBLPROPERTIES` / `DESCRIBE
    * EXTENDED` render (without this override Spark shows an empty set
    * for every graft table). Internal high-water marks ride along: they
    * are real committed state an operator debugging identity blocks
    * wants visible.
    */
  override def properties(): java.util.Map[String, String] = {
    val ts = ManifestTable.resolve(root, version).table(table)
    val m = new java.util.HashMap[String, String]()
    ts.props.foreach { case (k, v) => m.put(k, v) }
    // the LAYOUT state (recorded outside the props map because it
    // defines committed bytes' meaning) renders too, so SHOW CREATE
    // TABLE round-trips the full declaration
    m.put("mergeKeys", ts.mergeKeys.mkString(","))
    m.put("buckets", ts.numBuckets.toString)
    if (ts.statsCols.nonEmpty) m.put("statsCols", ts.statsCols.mkString(","))
    if (ts.searchCols.nonEmpty)
      m.put("searchCols", ts.searchCols.mkString(","))
    // reserved keys Spark's SHOW CREATE TABLE / DESCRIBE EXTENDED render
    // as the USING clause and location line
    m.put(org.apache.spark.sql.connector.catalog.TableCatalog.PROP_PROVIDER,
      "graft")
    m.put(org.apache.spark.sql.connector.catalog.TableCatalog.PROP_LOCATION,
      new File(new File(root, "data"), table).toString)
    m
  }

  override def capabilities(): java.util.Set[TableCapability] =
    // BATCH_WRITE alongside V1_BATCH_WRITE: INSERTs still dispatch on
    // the V1Write the builder returns; BATCH_WRITE is what the
    // row-level ReplaceData write path requires. MICRO_BATCH_READ is
    // the named change-feed subscription (readChangeFeed option).
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.MICRO_BATCH_READ,
      TableCapability.STREAMING_WRITE,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  /** SQL `MERGE INTO` / `UPDATE` / subquery `DELETE` plan natively:
    * through the group-based copy-on-write plumbing
    * ([[GraftRowLevelBuilder]]) by default, or — when the table declares
    * `TBLPROPERTIES ('rowLevelMode'='merge-on-read')` — through the
    * delta-based `SupportsDelta` path ([[GraftDeltaBuilder]]), which
    * writes only the CHANGED rows plus key tombstones instead of
    * rewriting every touched generation. Translatable DELETEs keep
    * resolving to the metadata [[ManifestTable.deleteWhere]] path
    * (Spark's OptimizeMetadataOnlyDeleteFromTable prefers
    * [[SupportsDelete]]).
    */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    // POLICY-AWARE row-level DML (the Snowflake contract: MERGE/UPDATE/
    // DELETE on a governed table act on policy-VISIBLE rows only): the
    // operation's scan filters to visible rows, and the commit carries
    // the scanned groups' HIDDEN slice through unmodified — compiled
    // here so an unexpressible policy (subquery) fails the statement
    // fast with the remedy, not mid-write. Masks never apply to DML:
    // the row-level read leg is the owner view, rewrites persist TRUE
    // values. Merge-on-read tables can't carry a policy (declaration-
    // time exclusion), so the delta path stays policy-free.
    val policy = index.state.props.get(GraftSqlTable.RowPolicyKey)
      .map { sql =>
        GovernedRows.compile(spark, index.tableSchema, sql,
          s"row policy on '$table'")
      }
    if (index.state.props.get("rowLevelMode")
        .contains(GraftSqlTable.MergeOnRead))
      new GraftDeltaBuilder(root, table, index, info)
    else new GraftRowLevelBuilder(root, table, index, info, policy)
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // scan-build time is the first moment the PLANNING session is known
    // for certain — register the metadata-agg rewrite there, so every
    // session that reads a graft table by name gets it (idempotent);
    // ditto the merge-on-read reconciliation fallback
    graft.plans.MetadataAggRule.register(spark)
    graft.plans.MergeOnReadRule.register(spark)
    graft.plans.MartRewriteRule.register(spark)
    graft.plans.RowPolicyRule.register(spark)
    graft.functions.SessionAttr.register(spark)
    if (options.getBoolean(GraftSqlTable.ReadChangeFeedOption, false)) {
      // named feed subscription: plan the SAME CdfMicroBatchStream as
      // format("graft-cdf"), so offsets/checkpoints/admission control
      // are identical between the two entry points; pacing options
      // (startingVersion, maxVersionsPerTrigger) pass straight through
      import scala.jdk.CollectionConverters._
      val params = options.asCaseSensitiveMap.asScala.toMap ++
        Map("path" -> root.toString, "table" -> table)
      new ScanBuilder {
        override def build(): org.apache.spark.sql.connector.read.Scan =
          new org.apache.spark.sql.connector.read.Scan {
            override def readSchema(): StructType =
              ChangeFeedStream.feedSchema(params)
            override def toMicroBatchStream(checkpointLocation: String)
                : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
              val props = index.state.props
              if (!GraftSqlTable.governedProps(props, index.tableName))
                new CdfMicroBatchStream(spark, params)
              else if (options.getBoolean(
                  GraftSqlTable.GovernedPostimagesOption, false)) {
                // the well-defined governed slice of a feed: only
                // policy-visible inserts/update postimages, masked —
                // the downstream-sync (upsert) consumer shape. Full
                // feeds stay refused: preimages of rows the session
                // cannot see are ill-posed. The change-type cut rides
                // the same compiled predicate as the policy.
                val ct = s"${ManifestTable.ChangeTypeCol} IN " +
                  "('insert', 'update_postimage')"
                val gProps = props +
                  (GraftSqlTable.RowPolicyKey ->
                    props.get(GraftSqlTable.RowPolicyKey)
                      .fold(ct)(p => s"($p) AND $ct"))
                new CdfMicroBatchStream(spark, params, Some(gProps))
              } else
                throw new UnsupportedOperationException(
                  s"table '$table' carries a row policy or column " +
                    "mask: a change-feed subscription by name would " +
                    "serve raw changes past the governance plan. " +
                    "Opt into the governed POSTIMAGE-ONLY view with " +
                    s"option(\"${GraftSqlTable.GovernedPostimagesOption}" +
                    "\", true) (policy-visible inserts/update " +
                    "postimages, masked — no preimages/deletes), " +
                    "subscribe through format(\"graft-cdf\") — the " +
                    "owner path — or drop the policy/mask")
            }
            override def description(): String =
              s"GraftNamedCdfScan($root/$table)"
          }
      }
    } else {
      import scala.jdk.CollectionConverters._
      new GraftScanBuilder(index, schema(),
        options.asCaseSensitiveMap.asScala.toMap)
    }
  }

  // ---- writes: INSERT INTO appends, INSERT OVERWRITE replaces ----

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    // SupportsStreamingUpdateAsAppend: streaming Update mode lands as the
    // same per-epoch merge (each updated group row replaces its previous
    // version — that IS the upsert); Complete comes through truncate()
    new WriteBuilder with SupportsTruncate
        with org.apache.spark.sql.internal.connector.SupportsStreamingUpdateAsAppend {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toStreaming
            : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
          import scala.jdk.CollectionConverters._
          new GraftStreamingWrite(root, table, info.queryId(), info.schema(),
            info.options().asCaseSensitiveMap.asScala.toMap, overwrite)
        }
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, ignored: Boolean): Unit = {
              val existing = ManifestTable.read(root)
                .map(_.table(table)).filter(_.schemaJson.nonEmpty)
              // a table with an active change feed must keep publishing
              // deltas through SQL INSERTs too — a non-feed data commit
              // would reset the feed and break running CDF consumers
              // (deleteWhere/updateWhere already honor this contract);
              // INSERT OVERWRITE is a wholesale replacement and resets
              // the feed by design, like every other overwrite
              val feedActive = existing.exists(_.feedFrom >= 0)
              val params = org.apache.spark.sql.catalyst.util
                .CaseInsensitiveMap(
                  (if (overwrite) Map("mode" -> "overwrite")
                   else Map("appendOnly" -> "true")) ++
                  (if (feedActive && !overwrite)
                     Map("changeFeed" -> "true")
                   else Map.empty[String, String]))
              ManifestTable.mergeBatch(root,
                s"sql-insert-${UUID.randomUUID()}", 0L,
                Seq(GraftDataSource.tableBatch(table, data, params, existing,
                  overwrite = overwrite && existing.nonEmpty)))
            }
          }
      }
    }

  // ---- DELETE FROM / TRUNCATE ----

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    // a merge-on-read table routes EVERY delete through the delta path
    // (key tombstones, no generation rewrite) — refusing here makes
    // Spark fall back to the row-level operation; a policy-bearing
    // table refuses too, so every delete takes the POLICY-AWARE
    // row-level path (a metadata delete drops whole generations and
    // would erase policy-hidden rows the statement must not touch)
    !index.state.props.get("rowLevelMode")
      .contains(GraftSqlTable.MergeOnRead) &&
      !index.state.props.contains(GraftSqlTable.RowPolicyKey) &&
      filters.forall(f => GraftSqlTable.filterToColumn(f).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val cond = filters.flatMap(GraftSqlTable.filterToColumn)
      .reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    ManifestTable.deleteWhere(spark, root, cond, table)
    ()
  }

  override def toString: String = s"GraftSqlTable(${name()})"
}

object GraftSqlTable {
  import org.apache.spark.sql.Column

  /** Read option selecting the change feed instead of the table rows —
    * Delta's option name, so a reader migrating over keeps its spelling.
    */
  val ReadChangeFeedOption = "readChangeFeed"

  /** Opt-in for the governed POSTIMAGE-ONLY change-feed view on a
    * policy/mask-bearing table: policy-visible inserts and update
    * postimages flow (masked); preimages and deletes never do.
    */
  val GovernedPostimagesOption = "governedPostimages"

  /** Row-level write modes a table may declare via
    * `TBLPROPERTIES ('rowLevelMode'='…')`.
    */
  val CopyOnWrite = "copy-on-write"
  val MergeOnRead = "merge-on-read"
  val RowLevelModes: Set[String] = Set(CopyOnWrite, MergeOnRead)

  /** Table property holding a row access policy predicate
    * ([[graft.plans.RowPolicyRule]]).
    */
  val RowPolicyKey: String = graft.plans.RowPolicyRule.PolicyKey

  /** Does this property set declare read governance (a row policy or
    * any column mask)? Streaming subscriptions refuse on governed
    * tables: a micro-batch stream serves raw rows/changes that would
    * bypass the plan-time filter/mask — the provider CDF path remains
    * as the explicit OWNER subscription for engine maintainers.
    */
  def governedProps(props: Map[String, String],
      table: String = "table"): Boolean =
    GovernedRows.governs(props, table)
  import org.apache.spark.sql.functions.{col, lit, not}
  import org.apache.spark.sql.sources

  /** Source filter → the Column [[ManifestTable.deleteWhere]] evaluates.
    * None = untranslatable; `canDeleteWhere` then refuses and Spark falls
    * back to an error rather than a wrong delete.
    */
  private[sources] def filterToColumn(f: Filter): Option[Column] = f match {
    case sources.AlwaysTrue() => Some(lit(true))
    case sources.AlwaysFalse() => Some(lit(false))
    case sources.EqualTo(c, v) => Some(col(c) === lit(v))
    case sources.EqualNullSafe(c, v) => Some(col(c) <=> lit(v))
    case sources.GreaterThan(c, v) => Some(col(c) > lit(v))
    case sources.GreaterThanOrEqual(c, v) => Some(col(c) >= lit(v))
    case sources.LessThan(c, v) => Some(col(c) < lit(v))
    case sources.LessThanOrEqual(c, v) => Some(col(c) <= lit(v))
    case sources.In(c, vs) => Some(col(c).isin(vs.toIndexedSeq: _*))
    case sources.IsNull(c) => Some(col(c).isNull)
    case sources.IsNotNull(c) => Some(col(c).isNotNull)
    case sources.StringStartsWith(c, p) => Some(col(c).startsWith(p))
    case sources.StringEndsWith(c, p) => Some(col(c).endsWith(p))
    case sources.StringContains(c, p) => Some(col(c).contains(p))
    case sources.And(l, r) =>
      for (a <- filterToColumn(l); b <- filterToColumn(r)) yield a && b
    case sources.Or(l, r) =>
      for (a <- filterToColumn(l); b <- filterToColumn(r)) yield a || b
    case sources.Not(c) => filterToColumn(c).map(not)
    case _ => None
  }
}

/** DSv2 scan over one pinned snapshot: filters push for generation
  * pruning (and forward to parquet for row-group skipping), columns
  * prune, files bin-pack with the engine's split rule.
  */
class GraftScanBuilder(index: ManifestFileIndex, tableSchema: StructType,
    scanOptions: Map[String, String] = Map.empty)
  extends ScanBuilder with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  protected var requiredSchema: StructType = tableSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    filters // all filters stay post-scan: pruning is advisory, exactness
  }         // is the engine re-applying every predicate on the rows

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(rs: StructType): Unit =
    requiredSchema = rs

  override def build(): Scan = new GraftBatchScan(index, tableSchema,
    requiredSchema, pushed, scanOptions)
}

class GraftBatchScan(val index: ManifestFileIndex, dataSchema: StructType,
    required: StructType, val pushed: Array[Filter],
    scanOptions: Map[String, String] = Map.empty) extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  /** Manifest-derived statistics for the PRUNED selection — a
    * bucket/window-pruned scan reports its kept rows/bytes, not the
    * table's, so Catalyst auto-broadcasts the genuinely-small side of a
    * join (without this a DSv2 relation defaults to
    * `spark.sql.defaultSizeInBytes` = never broadcast). Called both
    * pre-pushdown (relation-level: full-table stats) and post-pushdown
    * (scan-level: pruned stats); zero scan jobs either way.
    */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = {
    val (rows, bytes) = index.statsForFilters(effectiveFilters)
    // per-column NDV from the manifest's merged HLL sketches —
    // DataSourceV2Relation.transformV2Stats folds these into catalyst
    // attribute stats, which is what CBO join sizing/reordering reads
    // (spark.sql.cbo.enabled); zero scan jobs either way
    // distinct ≤ rows always; capping at the pruned row count tightens
    // the estimate for selective scans whose surviving generations are
    // shared with much wider selections
    val ndv = index.ndvForFilters(effectiveFilters)
      .view.mapValues(n => math.min(n, rows)).toMap
    // equi-height histograms from the merged KLL sketches (64 bins ≈
    // the k=200 sketch's rank resolution); per-bin NDV approximates as
    // an equal split of the column's distinct count — the standard
    // assumption when bins don't track it exactly
    val klls = index.kllForFilters(effectiveFilters)
    val colStats = new java.util.HashMap[
      org.apache.spark.sql.connector.expressions.NamedReference,
      org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
    (ndv.keySet ++ klls.keySet).foreach { c =>
      val dc = ndv.get(c)
      val hist = klls.get(c).map { sk =>
        val nBins = 64
        val qs = sk.getQuantiles((0 to nBins).map(_.toDouble / nBins).toArray,
          org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE)
        val binNdv = math.max(1L,
          dc.getOrElse(math.max(1L, rows)) / nBins)
        val binArr = (0 until nBins).map { i =>
          new org.apache.spark.sql.connector.read.colstats.HistogramBin {
            override def lo(): Double = qs(i)
            override def hi(): Double = qs(i + 1)
            override def ndv(): Long = binNdv
          }
        }.toArray
        new org.apache.spark.sql.connector.read.colstats.Histogram {
          override def height(): Double = rows.toDouble / nBins
          override def bins(): Array[
            org.apache.spark.sql.connector.read.colstats.HistogramBin] = binArr
        }
      }
      colStats.put(
        org.apache.spark.sql.connector.expressions.Expressions.column(c),
        new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
          override def distinctCount(): java.util.OptionalLong =
            dc.map(java.util.OptionalLong.of)
              .getOrElse(java.util.OptionalLong.empty)
          override def histogram(): java.util.Optional[
            org.apache.spark.sql.connector.read.colstats.Histogram] =
            hist.map(java.util.Optional.of(_)).getOrElse(
              java.util.Optional.empty[
                org.apache.spark.sql.connector.read.colstats.Histogram]())
        })
    }
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(rows)
      override def columnStats(): java.util.Map[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] =
        colStats
    }
  }

  /** Files the pruned listing kept, observable by specs (the v2 scan has
    * no numFiles metric of its own).
    */
  @volatile var plannedFiles: Int = -1

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  /** Filters the listing prunes with — subclasses (the row-level scan)
    * append runtime group filters on top of the pushed set.
    */
  protected def effectiveFilters: Seq[Filter] = pushed.toIndexedSeq

  /** Hook: the exact files this scan planned (the row-level operation
    * records them as the groups its write replaces).
    */
  protected def planned(
      files: Array[org.apache.hadoop.fs.FileStatus]): Unit = ()

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val files = index.filesForFilters(effectiveFilters)
    plannedFiles = files.length
    planned(files)
    // slice each file into maxSplitBytes chunks BEFORE bin-packing —
    // parquet splits at row-group boundaries, so a single multi-GB
    // generation file fans out across tasks instead of serializing in
    // one (the same split rule FileSourceScanExec applies on the
    // format("graft") path)
    val maxSplit = FilePartition.maxSplitBytes(spark, files.map(_.getLen).sum)
    val parts = files.flatMap { f =>
      val path = org.apache.spark.paths.SparkPath.fromPath(f.getPath)
      (0L until f.getLen by maxSplit).map(off =>
        org.apache.spark.sql.execution.datasources.PartitionedFile(
          InternalRow.empty, path, off, math.min(maxSplit, f.getLen - off)))
    }
    FilePartition.getFilePartitions(spark, parts.toIndexedSeq, maxSplit)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftParquetRead.readerFactory(SparkSession.active, dataSchema,
      required, new StructType(), pushed)

  /** A plain `spark.readStream.table("graft.ns.t")` (no readChangeFeed
    * option) streams "initial snapshot + appended generations" through
    * [[TableMicroBatchStream]] — the Delta plain-table-stream shape,
    * valid while the table evolves append-only (the stream itself
    * enforces that per batch and fails loudly on churn). Time-traveled
    * relations can't stream: a pinned snapshot has no future.
    */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    if (index.pinnedVersion.nonEmpty || index.raw)
      throw new UnsupportedOperationException(
        "a time-traveled or raw graft relation cannot stream — it is " +
          "pinned to one snapshot")
    // a governed table streams through the SAME policy/mask semantics
    // as its batch reads: the stream compiles the governance once
    // (policy filter + mask projection, current-like folded) and every
    // micro-batch's reader applies it before rows leave the scan —
    // stateless, so per-batch application equals the plan-time plant.
    // Only the CDF feed stays refused (preimages of newly-hidden rows
    // are ill-posed); see the readChangeFeed branch of newScanBuilder.
    val governance =
      if (GraftSqlTable.governedProps(index.state.props, index.tableName))
        Some(index.state.props)
      else None
    new TableMicroBatchStream(SparkSession.active, index.rootPath,
      index.tableName, required, dataSchema, scanOptions, governance)
  }

  override def description(): String =
    s"GraftBatchScan($index, pushed=${pushed.mkString(",")})"
}
