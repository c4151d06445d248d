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
}
