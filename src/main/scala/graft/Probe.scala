package graft

/** Dev scratchpad: ad-hoc recall / parity measurements. Not part of the
  * driver contract.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("probe")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    def pairs(name: String) = SparkEntry.queries(name)(spark, sf)
      .select("q_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs("emb_ann_topk")
    val ivf = pairs("emb_ann_ivf")
    println(s"PROBE ivf_recall=${exact.intersect(ivf).size.toDouble / exact.size}")
    val sizes = operators.Similarity.clusterSizes(spark, sf)
      .collect().map(r => r.getLong(1)).sorted.reverse
    val n = sizes.sum.toDouble
    println(s"PROBE clusters=${sizes.length} sizes=${sizes.mkString(",")} " +
      s"top2_frac=${(sizes.take(2).sum / n)}")
    spark.stop()
  }
}
