package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.StructType

/** Row-governance compiled OUTSIDE the optimizer — the machinery that
  * lets a row policy govern plans Catalyst never re-enters:
  *
  *  - the policy-aware row-level scan (SQL MERGE/UPDATE/DELETE on a
  *    rowPolicy table reads only policy-VISIBLE rows; the commit carries
  *    the hidden complement through unmodified — see
  *    [[GraftRowLevelOperation]]);
  *  - the governed plain micro-batch stream (each batch's reader
  *    filters/masks rows before they reach the stream).
  *
  * The predicate compiles ONCE on the driver: parsed with the session's
  * own parser (so `graft_session_attr` resolves), analyzed against the
  * table schema, current-like expressions (`current_user()`,
  * `current_date()`, …) folded to literals — one statement sees ONE
  * instant/user, and executors never need driver state. Policies that
  * need a full plan (subqueries) refuse loudly here; the plan-time
  * [[graft.plans.RowPolicyRule]] remains the read path that supports
  * them.
  */
/** One effective column mask: `key` is the column (or dotted
  * `col.path.to.field`), `sql` the masking expression. `fromTag` marks a
  * mask derived from OBJECT TAGGING (`tag.<col>` = comma-separated tag
  * names; `maskForTag.<tag>` = one policy expression written against the
  * placeholder `val`, the Snowflake masking-policy signature) — its
  * parsed expression rewrites `val` to the tagged column before
  * analysis, so one policy governs every column carrying the tag.
  */
private[graft] final case class MaskSpec(key: String, sql: String,
    fromTag: Boolean = false)

private[graft] object GovernedRows {

  /** Table-property prefix assigning governance tags to a column
    * (`tag.<col>` = 'pii,contact').
    */
  val TagPrefix = "tag."

  /** Table-property prefix attaching ONE masking policy to every column
    * carrying the tag (`maskForTag.<tag>` = expression over `val`).
    */
  val TagMaskPrefix = "maskForTag."

  /** The effective masks of a table: explicit `mask.<col>[...]` entries
    * plus tag-derived whole-column masks. Precedence is the Snowflake
    * rule — a mask attached DIRECTLY to the column (whole-column or any
    * of its field masks) wins over its tags' policies; a column whose
    * tags resolve to MORE THAN ONE policy refuses loudly (attach one, or
    * set an explicit `mask.<col>` to arbitrate).
    */
  def effectiveMasks(props: Map[String, String], table: String)
      : Seq[MaskSpec] = {
    val explicit = props.toSeq.collect {
      case (k, v) if k.startsWith(graft.plans.RowPolicyRule.MaskPrefix) =>
        MaskSpec(k.stripPrefix(graft.plans.RowPolicyRule.MaskPrefix), v)
    }
    val tagMasks: Map[String, String] = props.collect {
      case (k, v) if k.startsWith(TagMaskPrefix) =>
        k.stripPrefix(TagMaskPrefix) -> v
    }
    val explicitCols = explicit.map(_.key.takeWhile(_ != '.')).toSet
    val derived = props.toSeq.collect {
      case (k, v) if k.startsWith(TagPrefix) =>
        k.stripPrefix(TagPrefix) ->
          v.split(",").map(_.trim).filter(_.nonEmpty).distinct.toSeq
    }.sortBy(_._1).flatMap { case (col, tags) =>
      // tags attach to COLUMNS (the Snowflake column-tag shape) — a
      // dotted tag key would lose the `val` binding in the nested-mask
      // branch; field-grain masking is mask.<col>.<field>'s job
      require(!col.contains('.'),
        s"tag key 'tag.$col' on '$table' addresses a struct field — " +
          s"tags attach to whole columns; mask one field with an " +
          s"explicit mask.$col instead")
      if (explicitCols.contains(col)) Nil // column-attached mask wins
      else {
        val hits = tags.filter(tagMasks.contains)
        require(hits.size <= 1,
          s"column '$col' on '$table' carries ${hits.size} tag masks " +
            s"(${hits.mkString(", ")}) — attach at most one maskForTag " +
            s"per column, or set an explicit mask.$col to arbitrate")
        hits.headOption.map(t => MaskSpec(col, tagMasks(t), fromTag = true))
      }
    }
    (explicit ++ derived).sortBy(_.key)
  }

  /** Does this property set govern reads (policy, mask, or a tag that
    * resolves to a masking policy)?
    */
  def governs(props: Map[String, String], table: String): Boolean =
    props.contains(graft.plans.RowPolicyRule.PolicyKey) ||
      effectiveMasks(props, table).nonEmpty

  /** Parse a tag policy and rewrite its placeholder `val` to the
    * governed column — through the session PARSER (a `functions.expr`
    * Column is an opaque node until analysis, so a transform over it
    * would never see the unresolved attribute), pre-analysis, so the
    * substituted expression resolves like a hand-written per-column
    * mask.
    */
  private def bindTagValue(sql: String, what: String,
      target: Expression): org.apache.spark.sql.Column = {
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    val parsed =
      try SparkSession.active.sessionState.sqlParser.parseExpression(sql)
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"$what does not parse: $sql", e)
      }
    bridge.column(parsed.transform {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          if u.nameParts.length == 1 &&
            u.nameParts.head.equalsIgnoreCase("val") => target
    })
  }

  /** Parse + analyze `sql` as a predicate over `schema`, fold
    * current-like calls, and return the resolved condition. Its
    * `AttributeReference`s carry the schema's names/types — remap by
    * NAME before evaluating ([[filtering]], [[onFrame]]).
    */
  def compile(spark: SparkSession, schema: StructType, sql: String,
      what: String): Expression = {
    graft.functions.SessionAttr.register(spark)
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    val parsed =
      try expr(sql) catch {
        case e: Exception => throw new IllegalArgumentException(
          s"$what does not parse: $sql", e)
      }
    val relation = LocalRelation(
      org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema))
    val analyzed = bridge.foldCurrentLike(spark,
      bridge.ofRows(spark, relation).filter(parsed)
        .queryExecution.analyzed)
    val cond = analyzed.collectFirst { case Filter(c, _) => c }
      .getOrElse(throw new IllegalStateException(
        s"$what did not analyze to a filter: $sql"))
    require(!SubqueryExpression.hasSubquery(cond),
      s"$what carries a subquery ($sql) — row-level statements and " +
        "streams cannot evaluate plans per row; rewrite the policy " +
        "without a subquery, or use the owner verbs")
    require(cond.deterministic,
      s"$what is nondeterministic ($sql) — the visible/hidden split " +
        "must be stable between a statement's scan and its commit")
    cond
  }

  /** `cond` re-targeted at a DataFrame's own attributes (matched by
    * name) — how the row-level commit applies the SAME compiled policy
    * to the hidden-complement read.
    */
  def onFrame(cond: Expression, df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.Column = {
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    bridge.column(cond.transform {
      case a: AttributeReference => bridge.expression(df(a.name))
    })
  }

  /** `cond` as an UNRESOLVED Column — attributes become by-name
    * references the next analysis resolves against whatever plan the
    * Column lands on. How the session-enforced owner verbs thread one
    * compiled policy through [[ManifestTable.deleteWhere]] /
    * [[ManifestTable.updateWhere]], which filter several frames (the
    * pruned discovery read, the touched-generation feed read)
    * internally.
    */
  def asColumn(cond: Expression): org.apache.spark.sql.Column = {
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    bridge.column(cond.transform {
      case a: AttributeReference =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq(a.name))
    })
  }

  /** The table's row policy compiled for a SESSION-ENFORCED owner verb:
    * resolved from the manifest HEAD (the same current-policy contract
    * as reads), current-like calls and session attrs folded, returned
    * as a by-name Column to conjoin with the verb's own condition —
    * rows the policy hides (FALSE or NULL) fall out of the mutation's
    * match set, so the verb runs exactly as if the caller could not see
    * them. None when the table carries no policy (the verb runs as the
    * owner — nothing to enforce). Masks never bind here: mutation verbs
    * keep cleartext semantics, like SQL DML.
    */
  def sessionPolicy(spark: SparkSession, root: java.io.File,
      table: String): Option[org.apache.spark.sql.Column] =
    ManifestTable.read(root).map(_.table(table))
      .filter(_.schemaJson.nonEmpty).flatMap { ts =>
        ts.props.get(graft.plans.RowPolicyRule.PolicyKey).map { sql =>
          asColumn(compile(spark, ts.schema, sql,
            s"row policy on '$table'"))
        }
      }

  /** The mask projection over `out` — one Column per output attribute:
    * whole-column masks (`mask.<col>`) rewrite the column, NESTED keys
    * (`mask.<col>.<path>`) rewrite one struct field via `withField`
    * (siblings cleartext, dotted paths compose, a whole-column mask on
    * the same column wins). Shared by the plan-time
    * [[graft.plans.RowPolicyRule]] and the compiled
    * ([[compileProjection]]) paths so the two can never diverge.
    */
  def maskColumns(
      out: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
      masks: Seq[MaskSpec], table: String,
      parse: (String, String) => org.apache.spark.sql.Column)
      : Seq[org.apache.spark.sql.Column] = {
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    val colNames = out.map(_.name).toSet
    val (top, nested) = masks.partition(m => colNames.contains(m.key))
    val nestedByCol: Map[String, Seq[(String, String)]] = nested.map { m =>
      val col = m.key.takeWhile(_ != '.')
      require(colNames.contains(col),
        (if (m.fromTag) s"tag key 'tag.${m.key}'" else
          s"mask key 'mask.${m.key}'") + s" on '$table' matches no " +
          s"column (columns: ${out.map(_.name).mkString(", ")})")
      (col, m.key.drop(col.length + 1), m.sql)
    }.groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3))).toMap
    val byCol = top.map(m => m.key -> m).toMap
    def fieldType(dt: org.apache.spark.sql.types.DataType, path: String,
        col: String): org.apache.spark.sql.types.DataType =
      path.split('.').foldLeft(dt) { (t, f) =>
        t match {
          case s: StructType if s.fieldNames.contains(f) => s(f).dataType
          case other => throw new IllegalArgumentException(
            s"mask.$col.$path on '$table': '$f' is not a struct " +
              s"field of $other — nested masks address struct fields")
        }
      }
    out.map { a =>
      byCol.get(a.name) match {
        case Some(m) =>
          val what = s"mask for column '${a.name}'"
          (if (m.fromTag) bindTagValue(m.sql, what, a)
           else parse(what, m.sql))
            .cast(a.dataType).as(a.name)
        case None => nestedByCol.get(a.name) match {
          case Some(fms) =>
            fms.foldLeft(bridge.column(a)) { case (c, (path, sql)) =>
              c.withField(path,
                parse(s"mask for field '${a.name}.$path'", sql)
                  .cast(fieldType(a.dataType, path, a.name)))
            }.as(a.name)
          case None => bridge.column(a)
        }
      }
    }
  }

  /** Compile the mask projection against `schema` OUTSIDE the optimizer:
    * one resolved, current-like-folded expression per schema field (the
    * identity attribute where unmasked). Attributes resolve by NAME —
    * remap/bind before evaluating, exactly like [[compile]]'s condition.
    */
  def compileProjection(spark: SparkSession, schema: StructType,
      masks: Seq[MaskSpec], table: String): Seq[Expression] = {
    graft.functions.SessionAttr.register(spark)
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    def parse(what: String, sql: String) =
      try expr(sql) catch {
        case e: Exception => throw new IllegalArgumentException(
          s"$what on '$table' does not parse: $sql", e)
      }
    val relation = LocalRelation(
      org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(schema))
    val cols = maskColumns(relation.output, masks, table, parse)
    val analyzed = bridge.foldCurrentLike(spark,
      bridge.ofRows(spark, relation).select(cols: _*)
        .queryExecution.analyzed)
    val projList = analyzed match {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        p.projectList.map {
          case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
          case other => other
        }
      case _ => relation.output // pure-attribute select collapsed
    }
    projList.foreach { e =>
      require(!SubqueryExpression.hasSubquery(e),
        s"a mask on '$table' carries a subquery — compiled mask " +
          "projections evaluate per row; rewrite it without a subquery")
    }
    projList
  }

  /** Wrap a reader factory with the FULL governance pipeline: the base
    * reads the MINIMAL column set (the subscriber's `required` plus
    * every column the policy and the relevant masks reference — a
    * governed stream of a wide table pays for governance's columns,
    * not all of them), the decorator drops policy-hidden rows, applies
    * the mask projection, and prunes to `required` — one codegen'd
    * `UnsafeProjection` per partition. `mkBase` builds the underlying
    * reader for the computed read schema. How a governed plain
    * micro-batch stream serves exactly the governed batch view.
    */
  def governing(spark: SparkSession,
      tableSchema: StructType, required: StructType,
      props: Map[String, String], table: String,
      mkBase: StructType => PartitionReaderFactory)
      : PartitionReaderFactory = {
    // masks on columns the subscriber did not select are irrelevant —
    // those columns never leave the reader
    val masks = effectiveMasks(props, table).filter(m =>
      required.fieldNames.contains(m.key.takeWhile(_ != '.')))
    val keepUnbound = props.get(graft.plans.RowPolicyRule.PolicyKey)
      .map(sql => compile(spark, tableSchema, sql,
        s"row policy on '$table'"))
    val maskedUnbound =
      if (masks.isEmpty)
        org.apache.spark.sql.catalyst.types.DataTypeUtils
          .toAttributes(tableSchema).map(a => a: Expression)
      else compileProjection(spark, tableSchema, masks, table)
    val projUnbound = required.fields.toSeq.map { f =>
      maskedUnbound(tableSchema.fieldIndex(f.name))
    }
    val referenced: Set[String] =
      (keepUnbound.toSeq ++ projUnbound).flatMap(_.collect {
        case a: AttributeReference => a.name
      }).toSet
    val readSchema = StructType(tableSchema.fields.filter(f =>
      required.fieldNames.contains(f.name) || referenced.contains(f.name)))
    def bind(e: Expression): Expression = e.transform {
      case a: AttributeReference =>
        val i = readSchema.fieldNames.indexOf(a.name)
        require(i >= 0, s"governance on '$table' references column " +
          s"'${a.name}' missing from the table schema")
        org.apache.spark.sql.catalyst.expressions
          .BoundReference(i, a.dataType, a.nullable)
    }
    GoverningReaderFactory(mkBase(readSchema), keepUnbound.map(bind),
      projUnbound.map(bind))
  }

  /** Wrap a reader factory with a per-row keep-predicate: rows where
    * `cond` does not evaluate to exactly TRUE are dropped (NULL =
    * hidden, the SQL policy contract). `cond`'s attributes bind BY NAME
    * against `schema` — the factory's output row layout — so the
    * executor-side reader evaluates a codegen'd `BasePredicate`.
    */
  def filtering(base: PartitionReaderFactory, cond: Expression,
      schema: StructType, what: String): PartitionReaderFactory = {
    val bound = cond.transform {
      case a: AttributeReference =>
        val i = schema.fieldNames.indexOf(a.name)
        require(i >= 0, s"$what references column '${a.name}' which the " +
          s"read schema [${schema.fieldNames.mkString(", ")}] does not " +
          "carry")
        org.apache.spark.sql.catalyst.expressions
          .BoundReference(i, a.dataType, a.nullable)
    }
    FilteringReaderFactory(base, bound)
  }
}

/** Filter + mask + prune decorator over a full-row reader factory —
  * the executor side of [[GovernedRows.governing]]. Expressions arrive
  * BOUND to the base factory's row layout; the projection is built per
  * partition so codegen happens executor-side.
  */
private[graft] case class GoverningReaderFactory(
    base: PartitionReaderFactory, keep: Option[Expression],
    projected: Seq[Expression]) extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val inner = base.createReader(p)
    val pred = keep.map { k =>
      val b = org.apache.spark.sql.catalyst.expressions.Predicate.create(k)
      b.initialize(0); b
    }
    val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(projected.toIndexedSeq)
    proj.initialize(0)
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean = {
        while (inner.next()) {
          val r = inner.get()
          if (pred.forall(_.eval(r))) { cur = proj(r); return true }
        }
        false
      }
      override def get(): InternalRow = cur
      override def close(): Unit = inner.close()
    }
  }
}

/** Row-filtering decorator over any row-based reader factory. Forces the
  * ROW path (`supportColumnarReads` = false): governance costs the
  * columnar fast path only on the statements/streams that declare it.
  */
private[graft] case class FilteringReaderFactory(
    base: PartitionReaderFactory, bound: Expression)
  extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val inner = base.createReader(p)
    val pred = org.apache.spark.sql.catalyst.expressions.Predicate
      .create(bound)
    pred.initialize(0)
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean = {
        while (inner.next()) {
          val r = inner.get()
          if (pred.eval(r)) { cur = r; return true }
        }
        false
      }
      override def get(): InternalRow = cur
      override def close(): Unit = inner.close()
    }
  }
}
