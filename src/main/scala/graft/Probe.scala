package graft

/** Dev scratchpad: ad-hoc recall / parity / timing measurements. Not part
  * of the driver contract.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("probe")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // per-iteration cost of the two CC formulations (cache + lineage
    // behavior: iteration 1 = build, 2-3 must be cached-read cheap)
    (1 to 3).foreach { i =>
      t(s"cc_bigstar_$i")(SparkEntry.queries("doc_cc_bigstar")(spark, sf).count())
    }
    (1 to 3).foreach { i =>
      t(s"cc_minlabel_$i")(SparkEntry.queries("doc_dedup_clusters")(spark, sf).count())
    }
    spark.stop()
  }
}
