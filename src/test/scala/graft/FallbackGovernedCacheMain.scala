package graft

import org.apache.spark.sql.SparkSession

/** Forked-JVM probe for the EXTENSION-LESS optimizer flavor's
  * governed-cache bypass (SURVEY §6 item: `spark.sql.extensions` is a
  * STATIC conf, so no in-process spec can produce an extension-less
  * session once the shared test context exists — this main runs in its
  * own JVM, launched by [[FallbackFlavorSpec]]).
  *
  * Scenario: a governed table's Dataset cache materializes under session
  * context A; the context flips to B; every subsequent read must
  * recompute under B — the fallback RowPolicyRule instance (registered
  * through `experimental.extraOptimizations` by the catalog, planting
  * over post-pushdown scan relations) owns the bypass here. Prints
  * FALLBACK-GOVERNED-CACHE-OK and exits 0 on success; stack trace and
  * exit 1 on any leak.
  */
object FallbackGovernedCacheMain {
  def main(args: Array[String]): Unit = {
    val wh = args(0)
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", wh + "/spark-warehouse")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      require(spark.conf.getOption("spark.sql.extensions")
        .forall(!_.contains("GraftExtensions")),
        "the child JVM must be extension-less — the whole point")
      spark.conf.set("spark.sql.catalog.fbk",
        "graft.sources.GraftCatalog")
      spark.conf.set("spark.sql.catalog.fbk.warehouse", wh)
      spark.sql("CREATE NAMESPACE IF NOT EXISTS fbk.ops")
      spark.sql("""CREATE TABLE fbk.ops.g (id BIGINT, client STRING)
        USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2',
          'rowPolicy' = "client = graft_session_attr('client')")""")
      spark.sql("INSERT INTO fbk.ops.g VALUES (1, 'ACME'), (2, 'BETA')")
      spark.sql("""CREATE TABLE fbk.ops.t (id BIGINT, v BIGINT)
        USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')""")
      spark.sql("INSERT INTO fbk.ops.t VALUES (1, 10), (2, 20)")

      // cache a governed read under context A, flip to B: the fresh read
      // must recompute under B (the fallback instance's IMR bypass
      // rebuilds post-pushdown scan relations from the stored plan)
      spark.conf.set("graft.session.client", "ACME")
      val g = spark.table("fbk.ops.g")
      g.cache(); g.count()
      val acme = spark.table("fbk.ops.g").collect().map(_.getLong(0)).toSeq
      require(acme == Seq(1L), s"fallback ACME read wrong: $acme")
      spark.conf.set("graft.session.client", "BETA")
      val beta = spark.table("fbk.ops.g").collect().map(_.getLong(0)).toSeq
      require(beta == Seq(2L),
        s"context B saw context A's cached governed rows: $beta")
      g.unpersist(blocking = true)

      // the cached-JOIN shape (governed leaf under an ungoverned scan)
      // through the fallback flavor
      spark.conf.set("graft.session.client", "ACME")
      val j = spark.table("fbk.ops.t").join(spark.table("fbk.ops.g"), "id")
      j.cache(); j.count()
      spark.conf.set("graft.session.client", "BETA")
      val jids = j.select("id").collect().map(_.getLong(0)).toSeq
      require(jids == Seq(2L),
        s"cached-join leak in the fallback flavor: $jids")
      j.unpersist(blocking = true)

      println("FALLBACK-GOVERNED-CACHE-OK")
      spark.stop()
    } catch {
      case e: Throwable =>
        e.printStackTrace()
        sys.exit(1)
    }
  }
}
