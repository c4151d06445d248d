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
private[graft] object GovernedRows {

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
