package graft.streaming

import org.apache.spark.sql.SparkSession

/** Production tuning for the RocksDB state store provider (SURVEY §7's last
  * open item). Plain maps of public Spark SQL confs so a deployment can fold
  * them into spark-defaults; `withTuned` scopes them to a block for tests.
  *
  * Why each knob matters at scale:
  *   - changelog checkpointing uploads only the per-batch delta instead of
  *     snapshotting full SST files every commit — checkpoint cost becomes
  *     O(state changed per batch), not O(total state), which is the
  *     difference between seconds and minutes per micro-batch once stateful
  *     aggs hold 100s of GB across executors.
  *   - bounded memory caps RocksDB block cache + memtables across ALL state
  *     store instances on an executor (one per partition); unbounded, 32
  *     stores × default write buffers OOM an executor long before the JVM
  *     heap is exhausted, because RocksDB memory is off-heap.
  *   - unloadOnCommit=false keeps instances warm between batches (reload
  *     from checkpoint every batch would dominate short triggers).
  */
object StateStoreTuning {

  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  def tunedConfs(maxMemoryMB: Int = 512): Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" -> RocksDbProvider,
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true",
    "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage" -> "true",
    "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB" -> maxMemoryMB.toString,
    // favor batch latency over compaction debt: background compaction, not
    // on every commit
    "spark.sql.streaming.stateStore.rocksdb.compactOnCommit" -> "false",
    // keep store instances loaded between batches — reloading from the
    // checkpoint every commit would dominate short triggers
    "spark.sql.streaming.stateStore.unloadOnCommit" -> "false")

  /** Apply the tuned confs for the duration of `f`, restoring the previous
    * session values after (unset keys are unset again).
    */
  def withTuned[T](spark: SparkSession, maxMemoryMB: Int = 512)(f: => T): T = {
    val confs = tunedConfs(maxMemoryMB)
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
