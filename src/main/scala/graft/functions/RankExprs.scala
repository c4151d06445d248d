package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Quantile-stratum rank of a value against a SORTED, DISTINCT cut array:
  * `rank = |{cut : value > cut}|`, i.e. the insertion point of the value
  * in the array — which a binary search answers in O(log cuts) with a
  * constant-size expression tree.
  *
  * This exists because the straightforward formulation — a chain of
  * `when(value > cut, 1)` terms summed per cut — costs O(cuts) PER NODE
  * in the plan tree: at the z-order recluster's 64 strata per dimension
  * that tree is ~130 CaseWhen nodes per rank, and every job touching it
  * (quantile, aggregate, write) pays seconds of driver-side
  * planning/codegen before a single row moves (measured ~1.6 s per job
  * on a 94k-row bucket; the whole z-order recluster ran 8× the grid's
  * wall clock at sf1 from exactly this). The cut array rides the plan as
  * ONE reference object instead.
  *
  * Comparison semantics match the engine's `>`: doubles via
  * `Double.compare` (NaN above every value, exactly Spark's NaN
  * ordering), strings via UTF8String's binary order (what
  * [[graft.sources.ManifestTable.utf8Compare]] ranks and what string
  * pruning compares). Null ranks 0 — same stratum the when-chain's
  * `otherwise(0)` fell into, and rank placement only shapes layout
  * quality, never pruning correctness (cells record real min/max
  * rectangles either way).
  */
object BucketRank {
  def num(value: Column, cuts: Seq[Double]): Column =
    Bridge.column(NumBucketRank(Bridge.expression(value), cuts.toArray))

  def str(value: Column, cuts: Seq[String]): Column =
    Bridge.column(StrBucketRank(Bridge.expression(value),
      cuts.map(UTF8String.fromString).toArray))
}

case class NumBucketRank(child: Expression, cuts: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0
    else {
      val ip = java.util.Arrays.binarySearch(cuts, v.asInstanceOf[Double])
      if (ip >= 0) ip else -ip - 1
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cutsRef = ctx.addReferenceObj("cuts", cuts, "double[]")
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        int ${ev.value} = 0;
        if (!${c.isNull}) {
          int ip = java.util.Arrays.binarySearch($cutsRef, ${c.value});
          ${ev.value} = ip >= 0 ? ip : -ip - 1;
        }""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class StrBucketRank(child: Expression, cuts: Array[UTF8String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0
    else {
      val ip = java.util.Arrays.binarySearch(
        cuts.asInstanceOf[Array[AnyRef]], v.asInstanceOf[UTF8String])
      if (ip >= 0) ip else -ip - 1
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cutsRef = ctx.addReferenceObj("cuts", cuts,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        int ${ev.value} = 0;
        if (!${c.isNull}) {
          int ip = java.util.Arrays.binarySearch(
            (Object[]) $cutsRef, ${c.value});
          ${ev.value} = ip >= 0 ? ip : -ip - 1;
        }""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
