package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.expressions.SortOrder
import org.apache.spark.sql.catalyst.expressions.Ascending
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.LongType

/** Whole-operator as-of join (SURVEY §2.C), implemented at every layer of
  * the Catalyst stack: a logical node, a planner strategy, and a physical
  * sort-merge operator — the (c) path for operators Spark lacks natively.
  *
  * Semantics: for each left row, attach the LATEST right row with the same
  * key and right_time <= left_time (inclusive), or nulls when none exists.
  *
  * Scale: both sides hash-partition on the key and sort (key, time) within
  * partitions — the same one-shuffle cost as a sort-merge equi-join; the
  * per-partition merge is a single forward pass, O(|L| + |R|), holding ONE
  * buffered right row. No range cross-join, no per-key state beyond the
  * running candidate.
  *
  * Registration is `spark.experimental.extraStrategies` (public API), so
  * the operator works on any session without a build-time extension; a
  * `SparkSessionExtensions#injectPlannerStrategy(_ => AsOfJoinStrategy)`
  * registration is equivalent for deployments that own session construction.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join: children are hash-clustered on the key and
  * sorted by (key, time); each partition pair merges in one pass.
  */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  /** zipPartitions is only correct when partition i of BOTH sides holds the
    * same key space. Two ClusteredDistributions don't force that by
    * themselves (e.g. an existing RangePartitioning on one side satisfies
    * clustering but aligns nothing), so require identical-arity
    * HashPartitioning on both children and fail loudly otherwise.
    */
  private def requireCoPartitioned(): Unit = {
    import org.apache.spark.sql.catalyst.plans.physical.{CoalescedHashPartitioning, HashPartitioning}
    (left.outputPartitioning, right.outputPartitioning) match {
      case (l: HashPartitioning, r: HashPartitioning)
        if l.numPartitions == r.numPartitions &&
          l.expressions.length == r.expressions.length => ()
      // AQE-coalesced reads stay aligned only when both sides coalesced to
      // the SAME boundaries over the same pre-coalesce partition count
      case (l: CoalescedHashPartitioning, r: CoalescedHashPartitioning)
        if l.from.numPartitions == r.from.numPartitions &&
          l.partitions == r.partitions => ()
      case (l, r) => throw new IllegalStateException(
        s"AsOfJoinExec needs hash-co-partitioned children, got $l / $r")
    }
  }

  override protected def doExecute(): RDD[InternalRow] = {
    requireCoPartitioned()
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTime, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val rightArity = right.output.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      new Iterator[InternalRow] {
        private val joined = new JoinedRow
        private val nullRight = new GenericInternalRow(rightArity)
        // the current as-of candidate: latest right row with
        // (key, time) <= the left cursor, copied out of the reused buffer
        private var candidate: InternalRow = _
        private var candidateKey = 0L
        private var pendingRight: InternalRow = _
        private var pendingKey = 0L
        private var pendingTime = 0L
        private var rightDone = false

        // null-keyed/null-timed right rows can never be an as-of match
        // (SQL null semantics) — skip them instead of unboxing null to 0L
        // and aliasing them onto real key/time 0
        private def advanceRight(): Unit = {
          while (rIter.hasNext) {
            val row = rIter.next()
            val k = rk.eval(row)
            val t = rt.eval(row)
            if (k != null && t != null) {
              pendingKey = k.asInstanceOf[Long]
              pendingTime = t.asInstanceOf[Long]
              pendingRight = row
              return
            }
          }
          rightDone = true; pendingRight = null
        }
        advanceRight()

        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val lRow = lIter.next()
          val keyAny = lk.eval(lRow)
          val timeAny = lt.eval(lRow)
          // null-keyed/null-timed left rows match nothing; emit null-right
          // without consuming the right cursor (nulls sort first, so no
          // right rows could have been skipped)
          if (keyAny == null || timeAny == null) return joined(lRow, nullRight)
          val key = keyAny.asInstanceOf[Long]
          val time = timeAny.asInstanceOf[Long]
          // consume right rows up to and including (key, time)
          while (!rightDone && (pendingKey < key ||
              (pendingKey == key && pendingTime <= time))) {
            if (pendingKey == key) {
              candidate = pendingRight.copy()
              candidateKey = key
            }
            advanceRight()
          }
          if (candidate != null && candidateKey == key) joined(lRow, candidate)
          else joined(lRow, nullRight)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  /** As-of join `left` with `right`: latest right row per key with
    * rightTime <= leftTime. Key and time expressions must be long-typed
    * (timestamps are long micros internally). Right-side column names must
    * not collide with the left's — rename before joining.
    */
  def apply(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column): DataFrame = {
    val spark = leftDf.sparkSession
    register(spark)
    Bridge.ofRows(spark, AsOfJoinPlan(
      leftDf.queryExecution.analyzed, rightDf.queryExecution.analyzed,
      Bridge.expression(leftKey), Bridge.expression(rightKey),
      Bridge.expression(leftTime), Bridge.expression(rightTime)))
  }

  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
}
