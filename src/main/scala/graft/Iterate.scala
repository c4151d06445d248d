package graft

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative DataFrame algorithms (connected
  * components, k-means, power iteration): every round must checkpoint or
  * the self-referencing plan grows exponentially and re-planning dominates
  * runtime (measured: a 66k-node plan at sf0.01 made cached reads 100×
  * slower).
  *
  * When the session has a reliable checkpoint dir configured
  * (`SparkContext.setCheckpointDir` / `spark.checkpoint.dir`), rounds use
  * reliable `checkpoint()` — on a cluster that also makes each round
  * fault-tolerant (executor loss replays from the checkpoint, not from the
  * whole iteration history). Otherwise `localCheckpoint()` — right for
  * local/test sessions where executor loss means the app is gone anyway.
  */
object Iterate {
  def checkpoint(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      // persist first: Dataset.checkpoint's eager count materializes into
      // the cache, so the checkpoint-write job reads cached blocks instead
      // of re-running the whole round's lineage (RDD.checkpoint's
      // documented double-compute). Superseded round files are reclaimed
      // by the ContextCleaner — Engine sets
      // spark.cleaner.referenceTracking.cleanCheckpoints=true.
      val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val out = p.checkpoint()
      p.unpersist()
      out
    } else df.localCheckpoint()
}
