package graft

import org.apache.spark.sql.SparkSession

/** Registry for the per-session materialized tables (the stored-table
  * analogues: canonical headers/survivors, LSH candidates, fingerprint
  * index, IVF index). Each module registers a releaser at init;
  * `release(spark)` unpersists and forgets every entry belonging to that
  * session — the unpersist hook a long-lived session needs after it is
  * done with a source dir (the caches are otherwise unbounded per
  * (session, dir) by design, mirroring stored tables).
  */
object Caches {
  private val releasers =
    scala.collection.mutable.ArrayBuffer.empty[String => Unit]

  def register(r: String => Unit): Unit = synchronized { releasers += r; () }

  def release(s: SparkSession): Unit = {
    val app = s.sparkContext.applicationId
    val rs = synchronized(releasers.toList)
    rs.foreach(_(app))
  }

  /** A (session, key)-scoped persisted-DataFrame cache with its releaser
    * pre-registered — the one shape every module's stored-table cache
    * shares (persist on build, unpersist-then-forget on release). One
    * implementation so a new cache can't forget the unpersist or the
    * appId keying.
    */
  final class DfCache {
    private val m = scala.collection.concurrent.TrieMap
      .empty[(String, String), org.apache.spark.sql.DataFrame]
    register { app =>
      m.filterInPlace { case ((a, _), df) =>
        if (a == app) df.unpersist() else (); a != app }
    }
    def getOrElseUpdate(s: SparkSession, key: String)
        (build: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      m.getOrElseUpdate((s.sparkContext.applicationId, key),
        build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }

  def dfCache(): DfCache = new DfCache
}
