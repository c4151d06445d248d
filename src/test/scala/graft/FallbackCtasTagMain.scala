package graft

import org.apache.spark.sql.SparkSession

/** Forked-JVM probe for EXTENSION-LESS CTAS tag lineage (SURVEY §2.E:
  * the reference propagates tags through CREATE TABLE … AS SELECT
  * regardless of client, so the carry must not require
  * `spark.sql.extensions=graft.GraftExtensions`; the fallback
  * [[graft.plans.CtasTagLineage]] instance — registered through
  * `experimental.extraOptimizations` by the catalog — owns the
  * propagation here, tracing lineage over post-pushdown scan
  * relations). `spark.sql.extensions` is a STATIC conf, so no
  * in-process spec can produce an extension-less session once the
  * shared test context exists — this main runs in its own JVM,
  * launched by [[FallbackFlavorSpec]]. Prints FALLBACK-CTAS-TAG-OK and
  * exits 0 on success; stack trace and exit 1 on any silent degrade.
  */
object FallbackCtasTagMain {
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
      spark.conf.set("spark.sql.catalog.fct", "graft.sources.GraftCatalog")
      spark.conf.set("spark.sql.catalog.fct.warehouse", wh)
      spark.sql("CREATE NAMESPACE IF NOT EXISTS fct.ops")
      spark.sql("""CREATE TABLE fct.ops.src (id BIGINT, ssn STRING)
        USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2',
          'tag.ssn' = 'pii', 'maskForTag.pii' = "concat('#', val)",
          'tag.id' = 'ident')""")
      spark.sql("INSERT INTO fct.ops.src VALUES (1, '111')")
      def propsOf(t: String): Map[String, String] =
        spark.sql(s"SHOW TBLPROPERTIES fct.ops.$t").collect()
          .map(r => r.getString(0) -> r.getString(1)).toMap
      // the tag-attached mask must be live in the fallback flavor
      // BEFORE any CTAS runs — the round-13 harness only probed
      // rowPolicy masks, this pins maskForTag through the same path
      val pre = spark.sql("SELECT ssn FROM fct.ops.src").head.getString(0)
      require(pre == "#111",
        s"fallback tag-mask read wrong before any CTAS: '$pre'")

      // direct lineage carries the tag AND its policy — and the policy
      // is LIVE at the target (masks again on read)
      spark.sql("""CREATE TABLE fct.ops.d
        USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')
        AS SELECT id, ssn FROM fct.ops.src""")
      val dp = propsOf("d")
      require(dp.get("tag.ssn").contains("pii"),
        s"extension-less CTAS dropped the tag: $dp")
      require(dp.get("maskForTag.pii").contains("concat('#', val)"),
        s"extension-less CTAS dropped the tag's policy: $dp")
      val masked = spark.sql("SELECT ssn FROM fct.ops.d").head.getString(0)
      if (masked != "##111") {
        val srcRead = spark.sql("SELECT ssn FROM fct.ops.src")
          .head.getString(0)
        val stored = graft.sources.ManifestTable
          .readTable(spark, wh + "/ops", table = "d")
          .select("ssn").head.getString(0)
        require(false, "carried policy not live at the target: got " +
          s"'$masked' (src governed read: '$srcRead', d stored: '$stored')")
      }

      // a rename keeps lineage; a computed column breaks it; an
      // explicit declaration wins — the same contract as the
      // extensions flavor
      spark.sql("""CREATE TABLE fct.ops.r
        USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')
        AS SELECT id, ssn AS social FROM fct.ops.src""")
      require(propsOf("r").get("tag.social").contains("pii"),
        s"rename lost the tag in the fallback flavor: ${propsOf("r")}")
      spark.sql("""CREATE TABLE fct.ops.c
        USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2')
        AS SELECT id, substr(ssn, 1, 1) AS s1 FROM fct.ops.src""")
      require(!propsOf("c").contains("tag.s1"),
        s"computed column carried a tag: ${propsOf("c")}")
      // `id` DID carry its (policy-less) tag — so the mask collection
      // ran, and the restriction is what kept pii's policy off a table
      // that never received the pii tag
      require(propsOf("c").get("tag.id").contains("ident"),
        s"bare id column lost its tag: ${propsOf("c")}")
      require(!propsOf("c").contains("maskForTag.pii"),
        "a policy carried without its tag: " + propsOf("c"))
      spark.sql("""CREATE TABLE fct.ops.e
        USING graft TBLPROPERTIES ('mergeKeys'='id', 'buckets'='2',
          'tag.ssn' = 'open')
        AS SELECT id, ssn FROM fct.ops.src""")
      require(propsOf("e").get("tag.ssn").contains("open"),
        s"carried tag beat the declared one: ${propsOf("e")}")

      println("FALLBACK-CTAS-TAG-OK")
      spark.stop()
    } catch {
      case e: Throwable =>
        e.printStackTrace()
        sys.exit(1)
    }
  }
}
