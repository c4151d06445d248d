package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** KLL quantile-sketch aggregate over a DOUBLE column (datasketches
  * KllDoublesSketch — the library Spark itself bundles for its HLL
  * functions). The engine's write pass observes one of these per
  * numeric stats column, exactly like the HLL distinct sketches: the
  * serialized sketch lands in the manifest, MERGES across generations
  * (quantile sketches compose under merge with the same rank-error
  * bound), and answers rank/quantile questions at plan time — the
  * metadata input for `approx_percentile` rewrites the way the HLL
  * sketches answer `approx_count_distinct`.
  *
  * Spark has no built-in mergeable-quantile-sketch aggregate (its
  * `percentile_approx` emits final quantiles, not a sketch), so this is
  * a native `TypedImperativeAggregate` — the same class
  * `percentile_approx` itself uses, so it runs in `Dataset.observe`
  * metrics and grouped aggregates alike.
  */
object KllAgg {
  /** Sketch accuracy parameter: k=200 ⇒ ~1.65% one-sided rank error at
    * 99% confidence, ≤ ~1 KiB serialized at any n.
    */
  val K = 200

  def apply(value: Column): Column =
    Bridge.column(KllAggExpr(Bridge.expression(value))
      .toAggregateExpression())

  def heapify(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  /** Union serialized sketches; None on empty input or an unparseable
    * sketch (never a guess).
    */
  def union(sketchesB64: Seq[String]): Option[KllDoublesSketch] =
    if (sketchesB64.isEmpty) None
    else scala.util.Try {
      val u = KllDoublesSketch.newHeapInstance(K)
      sketchesB64.foreach(s =>
        u.merge(heapify(java.util.Base64.getDecoder.decode(s))))
      u
    }.toOption
}

case class KllAggExpr(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch]
    with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kll"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(KllAgg.K)

  override def update(buf: KllDoublesSketch,
      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllDoublesSketch,
      other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] =
    buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    // heapified sketches can be read-only: rebuild a mutable heap
    // instance by merging into a fresh one
    val s = KllDoublesSketch.newHeapInstance(KllAgg.K)
    s.merge(KllAgg.heapify(bytes))
    s
  }

  override def withNewMutableAggBufferOffset(n: Int): KllAggExpr =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllAggExpr =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): KllAggExpr =
    copy(child = newChild)
}
