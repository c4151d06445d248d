package graft.tools

/** Diagnostic: dump the canonicalized optimized treeString (pre-
  * normalization) for the named queries — run twice in separate JVMs
  * and diff to find run-specific tokens the bench ledger's
  * canonicalizer must normalize. Usage:
  *   runMain graft.tools.PlanDump <outFile> <query>[,<query>...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val names = args(1).split(",").toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    val spark = graft.Engine.session("plan-dump", 4)
    val txt = names.map { n =>
      val s = graft.SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.optimizedPlan.canonicalized.treeString
      s"==== $n ====\n$s"
    }.mkString("\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      txt.getBytes("UTF-8"))
    spark.stop()
  }
}
