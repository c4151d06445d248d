package graft

import java.io.File

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.sources.{GraftCatalog, ManifestFileIndex, ManifestTable}
import graft.sources.ManifestTable.TableBatch
import graft.streaming.IncrementalMart

/** Materialized-view substitution ([[graft.plans.MartRewriteRule]]):
  * subsumed aggregates over a source with a FRESH self-maintaining mart
  * plan onto the mart (proven by relation identity in the optimized
  * plan), answer exactly what the direct aggregate answers, and fall
  * back to the source the moment the mart is stale or the shape is not
  * derivable.
  */
class MartRewriteSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  /** The graft tables the optimized plan actually scans. */
  private def scannedTables(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location match {
          case idx: ManifestFileIndex => idx.tableName
          case _ => "?"
        }
        case _ => "?"
      }
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        r.table.name()
      case s: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        s.scan match {
          case b: graft.sources.GraftBatchScan => b.index.tableName
          case _ => "?"
        }
    }

  /** One root holding the feed-active source `t` and its mart `m`
    * (count + sum(value) + max(value) per grp), drained through the
    * real CDF subscription. Values are multiples of 0.5 so double sums
    * compare bit-for-bit between the incremental fold and the direct
    * aggregate.
    */
  private def build(): (String, IncrementalMart.Config, String) = {
    val root = tmp("graft_mv")
    def mk(rs: Seq[(Long, String, Double)]): DataFrame =
      rs.toDF("event_id", "grp", "value")
    ManifestTable.mergeBatch(new File(root), "q", 0L, Seq(
      TableBatch("t", mk((0L until 80L).map(i => (i, s"g${i % 4}", i * 0.5))),
        Seq("event_id"), 4, changeFeed = true)))
    val cfg = IncrementalMart.Config(root, root,
      groupCols = Seq("grp"), valueCols = Seq("value"),
      sourceTable = "t", martTable = "m", numBuckets = 2,
      maxCols = Seq("value"))
    val ckpt = tmp("graft_mv_ckpt")
    IncrementalMart.sync(spark, cfg, ckpt)
    (root, cfg, ckpt)
  }

  test("a subsumed aggregate plans onto the mart and answers exactly the direct result; filters on group columns ride along") {
    val (root, _, _) = build()
    def src: DataFrame = spark.read.format("graft")
      .option("path", root).option("table", "t").load()
    val q = src.groupBy("grp").agg(
      count(lit(1)).as("n"), sum("value").as("sv"), max("value").as("mx"))
    assert(scannedTables(q) == Seq("m"),
      s"expected the mart scan, got ${scannedTables(q)}")
    val direct = {
      spark.conf.set("spark.graft.martRewrite", "false")
      try src.groupBy("grp").agg(
        count(lit(1)).as("n"), sum("value").as("sv"), max("value").as("mx"))
        .collect().map(_.toString).toSet
      finally spark.conf.unset("spark.graft.martRewrite")
    }
    assert(q.collect().map(_.toString).toSet == direct)

    // a group-column predicate re-applies on the mart rows
    val filtered = src.filter(col("grp") =!= "g2").groupBy("grp")
      .agg(sum("value").as("sv"))
    assert(scannedTables(filtered) == Seq("m"))
    assert(filtered.collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      == Set("g0", "g1", "g3").map(g =>
        g -> (0L until 80L).filter(i => s"g${i % 4}" == g).map(_ * 0.5).sum))

    // global aggregate: the roll-up needs no grouping output
    val global = src.agg(count(lit(1)).as("n"), sum("value").as("sv"))
    assert(scannedTables(global) == Seq("m"))
    assert(global.head == org.apache.spark.sql.Row(80L, (0L until 80L).map(_ * 0.5).sum))
  }

  test("staleness gates the rewrite: an unfolded source commit falls back to the source, the next drain re-enables") {
    val (root, cfg, ckpt) = build()
    def q: DataFrame = spark.read.format("graft")
      .option("path", root).option("table", "t").load()
      .groupBy("grp").agg(count(lit(1)).as("n"), sum("value").as("sv"))
    assert(scannedTables(q) == Seq("m"))

    ManifestTable.mergeBatch(new File(root), "q", 1L, Seq(
      TableBatch("t",
        Seq((100L, "g9", 3.5), (101L, "g0", 4.0))
          .toDF("event_id", "grp", "value"),
        Seq("event_id"), 4, changeFeed = true)))
    assert(scannedTables(q) == Seq("t"),
      "a stale mart must never answer")
    val fresh = q.collect().map(_.toString).toSet
    assert(fresh.exists(_.contains("g9")))

    IncrementalMart.sync(spark, cfg, ckpt)
    assert(scannedTables(q) == Seq("m"))
    assert(q.collect().map(_.toString).toSet == fresh)
  }

  test("underivable shapes and unsubsumed filters stay on the source") {
    val (root, _, _) = build()
    def src: DataFrame = spark.read.format("graft")
      .option("path", root).option("table", "t").load()
    // min: not declared in the mart (only maxCols)
    assert(scannedTables(
      src.groupBy("grp").agg(min("value").as("m"))) == Seq("t"))
    // distinct aggregates never derive from partials
    assert(scannedTables(
      src.groupBy("grp").agg(countDistinct("value").as("d"))) == Seq("t"))
    // a predicate over a non-group column cannot re-apply on mart rows
    assert(scannedTables(src.filter(col("value") > 10)
      .groupBy("grp").agg(sum("value").as("sv"))) == Seq("t"))
    // grouping finer than the mart's
    assert(scannedTables(src.groupBy("grp", "event_id")
      .agg(sum("value").as("sv"))) == Seq("t"))
    // time travel reads history; the mart only reflects NOW
    val v = ManifestTable.read(new File(root)).get.version
    assert(scannedTables(spark.read.format("graft")
      .option("path", root).option("table", "t").option("version", v).load()
      .groupBy("grp").agg(sum("value").as("sv"))) == Seq("t"))
  }

  test("avg / count(col) / NULLABLE sum derive from the cnt_<col> partials — exactly, including the all-NULL group (SQL sum/avg = NULL, count = 0)") {
    val root = tmp("graft_mv_null")
    val rows = Seq[(java.lang.Long, String, java.lang.Double)](
      (0L, "g0", 1.0), (1L, "g0", 2.0), (2L, "g0", null), // mixed group
      (3L, "g1", null), (4L, "g1", null)) // ALL-NULL group
      .toDF("event_id", "grp", "value")
    assert(rows.schema("value").nullable)
    ManifestTable.mergeBatch(new File(root), "q", 0L, Seq(
      TableBatch("t", rows, Seq("event_id"), 2, changeFeed = true)))
    val cfg = IncrementalMart.Config(root, root,
      groupCols = Seq("grp"), valueCols = Seq("value"),
      sourceTable = "t", martTable = "m", numBuckets = 2)
    val ckpt = tmp("graft_mv_null_ckpt")
    IncrementalMart.sync(spark, cfg, ckpt)
    def src: DataFrame = spark.read.format("graft")
      .option("path", root).option("table", "t").load()
    def direct(df: => DataFrame): Set[String] = {
      spark.conf.set("spark.graft.martRewrite", "false")
      try df.collect().map(_.toString).toSet
      finally spark.conf.unset("spark.graft.martRewrite")
    }
    def q = src.groupBy("grp").agg(
      count(lit(1)).as("n"), sum("value").as("sv"),
      count(col("value")).as("cv"), avg("value").as("av"))
    assert(scannedTables(q) == Seq("m"),
      s"expected the mart scan, got ${scannedTables(q)}")
    assert(q.collect().map(_.toString).toSet == direct(q))
    // the all-NULL group answers SQL semantics from the mart: the fold
    // stores sum 0, the rewrite guards on cnt
    val g1 = q.filter(col("grp") === "g1").head
    assert(g1.isNullAt(2) && g1.getLong(3) == 0L && g1.isNullAt(4),
      s"all-NULL group lost SQL semantics through the mart: $g1")
    // count of a GROUPING column derives via n_rows over non-null groups
    def qg = src.groupBy("grp").agg(count(col("grp")).as("c"))
    assert(scannedTables(qg) == Seq("m"))
    assert(qg.collect().map(_.toString).toSet == direct(qg))

    // churn that flips a group between all-NULL and not: a null value
    // turns real, a real one turns null — cnt partials net signed
    ManifestTable.mergeBatch(new File(root), "q", 1L, Seq(
      TableBatch("t", Seq[(java.lang.Long, String, java.lang.Double)](
        (3L, "g1", 5.0), (0L, "g0", null), (1L, "g0", null), (2L, "g0", null))
        .toDF("event_id", "grp", "value"),
        Seq("event_id"), 2, changeFeed = true)))
    IncrementalMart.sync(spark, cfg, ckpt)
    assert(scannedTables(q) == Seq("m"))
    assert(q.collect().map(_.toString).toSet == direct(q))
    val g0 = q.filter(col("grp") === "g0").head
    assert(g0.isNullAt(2) && g0.getLong(3) == 0L && g0.isNullAt(4),
      s"group churned to all-NULL lost SQL semantics: $g0")

    // the GLOBAL aggregate derives the same way
    def qAll = src.agg(sum("value").as("sv"), count(col("value")).as("cv"),
      avg("value").as("av"))
    assert(scannedTables(qAll) == Seq("m"))
    assert(qAll.collect().map(_.toString).toSet == direct(qAll))

    // avg over DECIMAL — the reference's money shape, NUMBER(18,2) —
    // derives BIT-EXACTLY: the rewrite rebuilds Average's own evaluation
    // (sum at Decimal(p+10,s) / count at Decimal(20,0) → Decimal(p+4,s+4)).
    // Group sizes of 3 and 7 force repeating-decimal division so any
    // intermediate-precision mismatch would show in the last digits.
    val dec = (Seq[(Long, String, String)](
        (0L, "g0", "1.25"), (1L, "g0", "2.77"), (2L, "g0", "4.01"),
        (10L, "g1", "0.01"), (11L, "g1", "99999999999999.99"),
        (12L, "g1", "7.33"), (13L, "g1", "1.10"), (14L, "g1", "2.23"),
        (15L, "g1", "3.37"), (16L, "g1", "5.55"))
      .map { case (i, g, v) => (i, g, BigDecimal(v)) } ++
      Seq[(Long, String, BigDecimal)]((20L, "g2", null))) // all-NULL group
      .toDF("event_id", "grp", "dv")
      .select(col("event_id"), col("grp"),
        col("dv").cast("decimal(18,2)").as("dv"))
    ManifestTable.mergeBatch(new File(root), "q", 2L, Seq(
      TableBatch("td", dec, Seq("event_id"), 2, changeFeed = true)))
    val cfgD = IncrementalMart.Config(root, root,
      groupCols = Seq("grp"), valueCols = Seq("dv"),
      sourceTable = "td", martTable = "md", numBuckets = 2)
    val ckptD = tmp("graft_mv_dec_ckpt")
    IncrementalMart.sync(spark, cfgD, ckptD)
    def srcD: DataFrame = spark.read.format("graft")
      .option("path", root).option("table", "td").load()
    def qd = srcD.groupBy("grp").agg(
      sum("dv").as("s"), count(col("dv")).as("c"), avg("dv").as("a"))
    assert(scannedTables(qd) == Seq("md"),
      s"decimal avg did not land on the mart: ${scannedTables(qd)}")
    val directSchema = {
      spark.conf.set("spark.graft.martRewrite", "false")
      try qd.schema finally spark.conf.unset("spark.graft.martRewrite")
    }
    assert(qd.schema == directSchema,
      s"rewritten decimal schema drifted from Average's result type: " +
        s"${qd.schema} vs $directSchema")
    assert(qd.collect().map(_.toString).toSet == direct(qd))
    val g2 = qd.filter(col("grp") === "g2").head
    assert(g2.isNullAt(1) && g2.getLong(2) == 0L && g2.isNullAt(3),
      s"all-NULL decimal group lost SQL semantics through the mart: $g2")
    // global decimal avg derives too
    def qdAll = srcD.agg(avg("dv").as("a"), sum("dv").as("s"))
    assert(scannedTables(qdAll) == Seq("md"))
    assert(qdAll.collect().map(_.toString).toSet == direct(qdAll))

    // decimal churn folds through a SECOND sync: the stored sum partial
    // stays pinned at Sum's Decimal(p+10, s) (the fold casts the Add
    // back), so repeated maintenance never drifts the mart schema
    ManifestTable.mergeBatch(new File(root), "q", 3L, Seq(
      TableBatch("td", Seq((0L, "g0", BigDecimal("9.99")),
        (21L, "g2", BigDecimal("0.07")), (17L, "g1", BigDecimal("6.66")))
        .toDF("event_id", "grp", "dv")
        .select(col("event_id"), col("grp"),
          col("dv").cast("decimal(18,2)").as("dv")),
        Seq("event_id"), 2, changeFeed = true)))
    IncrementalMart.sync(spark, cfgD, ckptD)
    val martSum = spark.read.format("graft").option("path", root)
      .option("table", "md").load().schema("sum_dv").dataType
    assert(martSum == org.apache.spark.sql.types.DecimalType(28, 2),
      s"mart sum partial type drifted: $martSum")
    assert(scannedTables(qd) == Seq("md"))
    assert(qd.collect().map(_.toString).toSet == direct(qd))
  }

  test("decimal avg derives bit-exactly through the JOIN shape (mart ⋈ dim), multiplicity included") {
    val root = tmp("graft_mv_decjoin")
    val dec = Seq((0L, "g0", "1.25"), (1L, "g0", "2.77"), (2L, "g0", "4.01"),
      (3L, "g1", "7.33"), (4L, "g1", "0.01"), (5L, "g2", "3.14"),
      (6L, "g2", "2.72"))
      .toDF("event_id", "grp", "dv")
      .select(col("event_id"), col("grp"),
        col("dv").cast("decimal(18,2)").as("dv"))
    ManifestTable.mergeBatch(new File(root), "q", 0L, Seq(
      TableBatch("t", dec, Seq("event_id"), 2, changeFeed = true)))
    val cfg = IncrementalMart.Config(root, root,
      groupCols = Seq("grp"), valueCols = Seq("dv"),
      sourceTable = "t", martTable = "m", numBuckets = 2)
    IncrementalMart.sync(spark, cfg, tmp("graft_mv_decjoin_ckpt"))
    val src = spark.read.format("graft")
      .option("path", root).option("table", "t").load()
    // g1 → two regions: join multiplicity scales sum and cnt partials
    // together, so the quotient stays the direct Average
    val dim = Seq(("g0", "r0"), ("g1", "r1"), ("g1", "r1b"), ("g2", "r2"))
      .toDF("grp", "region")
    def q = src.join(dim, src("grp") === dim("grp"))
      .groupBy(dim("region"))
      .agg(avg("dv").as("a"), sum("dv").as("s"), count(col("dv")).as("c"))
    assert(scannedTables(q) == Seq("m"),
      s"decimal join-shape rewrite did not fire: ${scannedTables(q)}")
    val direct = {
      spark.conf.set("spark.graft.martRewrite", "false")
      try q.collect().map(_.toString).toSet
      finally spark.conf.unset("spark.graft.martRewrite")
    }
    assert(q.collect().map(_.toString).toSet == direct)
  }

  test("decimal avg derivation FUZZ: random decimal corpora (nulls, negatives, magnitude spread, churn) never diverge from the direct Average") {
    val rng = new scala.util.Random(41)
    (1 to 3).foreach { trial =>
      val root = tmp(s"graft_mv_fuzz$trial")
      def rows(n: Int, idBase: Long) = (0 until n).map { i =>
        val v: java.math.BigDecimal =
          if (rng.nextInt(8) == 0) null
          else java.math.BigDecimal.valueOf(
            (rng.nextLong() % 10000000000000000L) / 100.0)
            .setScale(2, java.math.RoundingMode.HALF_UP)
        (idBase + i, s"g${rng.nextInt(7)}", v)
      }
      def df(rs: Seq[(Long, String, java.math.BigDecimal)]) =
        spark.createDataFrame(
          spark.sparkContext.parallelize(rs.map(t =>
            org.apache.spark.sql.Row(t._1, t._2, t._3))),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("event_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("grp",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("dv",
              org.apache.spark.sql.types.DecimalType(18, 2)))))
      ManifestTable.mergeBatch(new File(root), "q", 0L, Seq(
        TableBatch("t", df(rows(200, 0L)), Seq("event_id"), 2,
          changeFeed = true)))
      val cfg = IncrementalMart.Config(root, root,
        groupCols = Seq("grp"), valueCols = Seq("dv"),
        sourceTable = "t", martTable = "m", numBuckets = 2)
      val ck = tmp(s"graft_mv_fuzz_ck$trial")
      IncrementalMart.sync(spark, cfg, ck)
      def src: DataFrame = spark.read.format("graft")
        .option("path", root).option("table", "t").load()
      def q = src.groupBy("grp").agg(avg("dv").as("a"),
        sum("dv").as("s"), count(col("dv")).as("c"))
      def direct: Set[String] = {
        spark.conf.set("spark.graft.martRewrite", "false")
        try q.collect().map(_.toString).toSet
        finally spark.conf.unset("spark.graft.martRewrite")
      }
      assert(scannedTables(q) == Seq("m"), s"trial $trial: no rewrite")
      assert(q.collect().map(_.toString).toSet == direct,
        s"trial $trial diverged after base build")
      // signed churn: updates (some to/from null) + deletes, re-sync
      ManifestTable.mergeBatch(new File(root), "q", 1L, Seq(
        TableBatch("t", df(rows(60, 0L) ++ rows(40, 300L)),
          Seq("event_id"), 2, changeFeed = true,
          deleteKeys = Some(
            (100L until 120L).toDF("event_id")))))
      IncrementalMart.sync(spark, cfg, ck)
      assert(scannedTables(q) == Seq("m"))
      assert(q.collect().map(_.toString).toSet == direct,
        s"trial $trial diverged after signed churn")
    }
  }

  test("governance composes with the mart rewrite: a group-column row policy rides onto the mart like any filter, and a masked source never substitutes (the mask Project blocks unwrap)") {
    val wh = tmp("graft_mv_gov")
    spark.conf.set("spark.sql.catalog.gvm",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gvm.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gvm.ops")
    val root = new File(wh, "ops").toString
    ManifestTable.mergeBatch(new File(root), "q", 0L, Seq(
      TableBatch("t",
        (0L until 60L).map(i => (i, s"g${i % 3}", i * 0.5))
          .toDF("event_id", "grp", "value"),
        Seq("event_id"), 2, changeFeed = true)))
    val cfg = IncrementalMart.Config(root, root,
      groupCols = Seq("grp"), valueCols = Seq("value"),
      sourceTable = "t", martTable = "m", numBuckets = 2)
    IncrementalMart.sync(spark, cfg, tmp("graft_mv_gov_ckpt"))

    // a GROUP-column policy: the planted Filter is group-subsumed, so
    // the rewrite still fires and re-applies the policy on the mart
    spark.sql("""ALTER TABLE gvm.ops.t SET TBLPROPERTIES
      ('rowPolicy' = "grp <> 'g0'")""")
    def q = spark.table("gvm.ops.t").groupBy("grp")
      .agg(sum("value").as("sv"))
    assert(scannedTables(q) == Seq("m"),
      s"group-column policy blocked the rewrite: ${scannedTables(q)}")
    val direct = {
      spark.conf.set("spark.graft.martRewrite", "false")
      try q.collect().map(_.toString).toSet
      finally spark.conf.unset("spark.graft.martRewrite")
    }
    assert(!direct.exists(_.contains("g0")), "policy did not filter")
    assert(q.collect().map(_.toString).toSet == direct,
      "policy+mart composition diverged from the direct governed scan")

    // a VALUE-column policy is NOT group-subsumed: never a wrong answer,
    // the rewrite stands down and the governed scan answers
    spark.sql("""ALTER TABLE gvm.ops.t SET TBLPROPERTIES
      ('rowPolicy' = "value < 20.0")""")
    assert(scannedTables(q) == Seq("t"),
      s"non-group policy must block the rewrite: ${scannedTables(q)}")

    // a MASKED column blocks substitution structurally (the mask
    // Project is not attribute-only): masked values aggregate, the
    // cleartext mart partials never serve
    spark.sql("ALTER TABLE gvm.ops.t UNSET TBLPROPERTIES ('rowPolicy')")
    spark.sql("""ALTER TABLE gvm.ops.t SET TBLPROPERTIES
      ('mask.value' = 'cast(0.0 as double)')""")
    assert(scannedTables(q) == Seq("t"),
      s"a masked source substituted the cleartext mart: " +
        s"${scannedTables(q)}")
    assert(q.collect().map(r => r.getDouble(1)).forall(_ == 0.0),
      "the aggregate saw cleartext past the mask")
  }

  test("marts cascade: a feed-publishing mart feeds a second-level mart exactly, and the rewrite chains level by level") {
    val root = tmp("graft_mv_chain")
    def mkSrc(rs: Seq[(Long, String, String, Double)]): DataFrame =
      rs.toDF("event_id", "grp", "sub", "value")
    def feed(b: Long, rs: Seq[(Long, String, String, Double)]): Unit =
      ManifestTable.mergeBatch(new File(root), "q", b, Seq(
        TableBatch("t", mkSrc(rs), Seq("event_id"), 4, changeFeed = true)))
    feed(0L, (0L until 48L).map(i => (i, s"g${i % 3}", s"s${i % 6}", i * 0.5)))

    // level 1: per (grp, sub), PUBLISHING its own feed; level 2 folds
    // level 1's feed per grp
    val cfg1 = IncrementalMart.Config(root, root,
      groupCols = Seq("grp", "sub"), valueCols = Seq("value"),
      sourceTable = "t", martTable = "m1", numBuckets = 2,
      changeFeed = true)
    val cfg2 = IncrementalMart.Config(root, root,
      groupCols = Seq("grp"), valueCols = Seq("sum_value"),
      sourceTable = "m1", martTable = "m2", numBuckets = 2)
    val (ck1, ck2) = (tmp("graft_ck1"), tmp("graft_ck2"))
    def drain1(): Unit = IncrementalMart.sync(spark, cfg1, ck1)
    def drain2(): Unit = IncrementalMart.sync(spark, cfg2, ck2)
    drain1(); drain2()

    // level-2 invariant: m2 IS the rollup of m1
    def m(t: String): DataFrame = spark.read.format("graft")
      .option("path", root).option("table", t).load()
    def expect2: Set[String] = m("m1").groupBy("grp")
      .agg(count(lit(1)).as(IncrementalMart.RowsCol),
        sum("sum_value").as("sum_sum_value"),
        count(col("sum_value")).as("cnt_sum_value"))
      .collect().map(_.toString).toSet
    assert(m("m2").collect().map(_.toString).toSet == expect2)

    // the rewrite CHAINS: an aggregate over m1 plans onto m2 (def:
    // QueryExecution memoizes, each check needs a fresh plan)
    def q = m("m1").groupBy("grp").agg(sum("sum_value").as("sv"))
    assert(scannedTables(q) == Seq("m2"))
    assert(q.collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      == (0 until 3).map(g => (s"g$g",
        (0L until 48L).filter(_ % 3 == g).map(_ * 0.5).sum)).toSet)

    // churn: update + migrate groups at the SOURCE; drain level 1 only →
    // level 2 is stale and the chain falls back to m1; drain level 2 →
    // exact again
    feed(1L, Seq((0L, "g9", "s0", 100.0), (1L, "g1", "s1", 200.0)))
    drain1()
    assert(scannedTables(q) == Seq("m1"))
    drain2()
    assert(scannedTables(q) == Seq("m2"))
    assert(m("m2").collect().map(_.toString).toSet == expect2)
    assert(m("m2").filter(col("grp") === "g9").count() == 1)
  }

  test("CALL graft.system.refresh_mart: one-shot create + refresh from SQL, idempotent, re-arms the rewrite") {
    val root = tmp("graft_mv_call")
    val ns = new File(root).getName
    spark.conf.set("spark.sql.catalog.mvc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mvc.warehouse", new File(root).getParent)
    ManifestTable.mergeBatch(new File(root), "q", 0L, Seq(
      TableBatch("t",
        (0L until 40L).map(i => (i, s"g${i % 4}", i * 0.5))
          .toDF("event_id", "grp", "value"),
        Seq("event_id"), 4, changeFeed = true)))

    // first refresh declares and builds the mart
    val v1 = spark.sql(
      s"CALL mvc.system.refresh_mart('$ns', 't', 'm', 'grp', 'value', '', '')")
      .head.getLong(0)
    def q = spark.sql(
      s"SELECT grp, sum(value) AS sv FROM mvc.$ns.t GROUP BY grp")
    assert(scannedTables(q) == Seq("m"))
    val expected = (0 until 4).map(g => (s"g$g",
      (0L until 40L).filter(i => i % 4 == g).map(_ * 0.5).sum)).toSet
    assert(q.collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      == expected)

    // idempotent: a repeated call folds an empty range, commits nothing
    val martV = ManifestTable.read(new File(root)).get.version
    spark.sql(s"CALL mvc.system.refresh_mart('$ns', 't', 'm', '', '', '', '')")
      .collect()
    assert(ManifestTable.read(new File(root)).get.version == martV)

    // a source commit stales the mart; the next call (recorded
    // declaration, no column args) re-arms the rewrite
    ManifestTable.mergeBatch(new File(root), "q", 1L, Seq(
      TableBatch("t", Seq((100L, "g0", 10.0)).toDF("event_id", "grp", "value"),
        Seq("event_id"), 4, changeFeed = true)))
    assert(scannedTables(q) == Seq("t"))
    val v2 = spark.sql(
      s"CALL mvc.system.refresh_mart('$ns', 't', 'm', '', '', '', '')")
      .head.getLong(0)
    assert(v2 > v1)
    assert(scannedTables(q) == Seq("m"))
    assert(q.filter(col("grp") === "g0").head.getDouble(1)
      == expected.find(_._1 == "g0").get._2 + 10.0)
  }

  test("the SQL catalog surface rewrites too, and SET spark.graft.martRewrite=false disables it") {
    val (root, _, _) = build()
    // mount the root's PARENT as a warehouse: the namespace IS the root
    val ns = new File(root).getName
    spark.conf.set("spark.sql.catalog.mv", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mv.warehouse",
      new File(root).getParent)
    val q = spark.sql(
      s"SELECT grp, count(*) AS n, sum(value) AS sv FROM mv.$ns.t GROUP BY grp")
    assert(scannedTables(q) == Seq("m"))
    val viaMart = q.collect().map(_.toString).toSet
    spark.sql("SET spark.graft.martRewrite=false")
    try {
      val direct = spark.sql(
        s"SELECT grp, count(*) AS n, sum(value) AS sv FROM mv.$ns.t GROUP BY grp")
      assert(scannedTables(direct) == Seq("t"))
      assert(direct.collect().map(_.toString).toSet == viaMart)
    } finally spark.sql("SET spark.graft.martRewrite=true")
  }

  test("cost-based mart selection: the smallest fresh subsuming mart wins, non-subsuming smaller candidates fall through") {
    val root = tmp("graft_mv_cost")
    def feed(b: Long, rs: Seq[(Long, String, String, Double)]): Unit =
      ManifestTable.mergeBatch(new File(root), "q", b, Seq(
        TableBatch("t", rs.toDF("event_id", "grp", "sub", "value"),
          Seq("event_id"), 4, changeFeed = true)))
    feed(0L, (0L until 64L).map(i => (i, s"g${i % 4}", s"s${i % 2}", i * 0.5)))

    // three marts of the SAME source at different grains:
    //   mf (grp, sub) → 8 groups, mc (grp) → 4, ms (sub) → 2
    def cfg(mart: String, gs: Seq[String]) = IncrementalMart.Config(
      root, root, groupCols = gs, valueCols = Seq("value"),
      sourceTable = "t", martTable = mart, numBuckets = 2)
    val (cf, cc, cs) =
      (cfg("mf", Seq("grp", "sub")), cfg("mc", Seq("grp")), cfg("ms", Seq("sub")))
    val (kf, kc, ks) = (tmp("ck_mf"), tmp("ck_mc"), tmp("ck_ms"))
    IncrementalMart.sync(spark, cf, kf)
    IncrementalMart.sync(spark, cc, kc)
    IncrementalMart.sync(spark, cs, ks)

    def src: DataFrame = spark.read.format("graft")
      .option("path", root).option("table", "t").load()
    def direct(df: => DataFrame): Set[String] = {
      spark.conf.set("spark.graft.martRewrite", "false")
      try df.collect().map(_.toString).toSet
      finally spark.conf.unset("spark.graft.martRewrite")
    }

    // grp query: ms (2 rows) is cheapest but doesn't subsume → falls
    // through to mc (4 rows), NOT the 2×-wider mf
    def qGrp = src.groupBy("grp").agg(sum("value").as("sv"))
    assert(scannedTables(qGrp) == Seq("mc"), s"got ${scannedTables(qGrp)}")
    assert(qGrp.collect().map(_.toString).toSet == direct(qGrp))

    // (grp, sub) query: only mf subsumes
    def qFine = src.groupBy("grp", "sub")
      .agg(count(lit(1)).as("n"), sum("value").as("sv"))
    assert(scannedTables(qFine) == Seq("mf"))
    assert(qFine.collect().map(_.toString).toSet == direct(qFine))

    // sub query and the global aggregate: ms subsumes and is smallest
    def qSub = src.groupBy("sub").agg(sum("value").as("sv"))
    assert(scannedTables(qSub) == Seq("ms"))
    assert(qSub.collect().map(_.toString).toSet == direct(qSub))
    def qAll = src.agg(count(lit(1)).as("n"), sum("value").as("sv"))
    assert(scannedTables(qAll) == Seq("ms"))
    assert(qAll.collect().map(_.toString).toSet == direct(qAll))

    // freshness × cost: after new source churn, only the drained mart
    // is a candidate — the grp query answers from mf while mc lags,
    // then returns to mc once it drains
    feed(1L, Seq((100L, "g0", "s1", 10.0), (101L, "g5", "s0", 20.0)))
    IncrementalMart.sync(spark, cf, kf)
    assert(scannedTables(qGrp) == Seq("mf"))
    assert(qGrp.collect().map(_.toString).toSet == direct(qGrp))
    IncrementalMart.sync(spark, cc, kc)
    assert(scannedTables(qGrp) == Seq("mc"))
    assert(qGrp.collect().map(_.toString).toSet == direct(qGrp))
  }

  test("the rewrite fires THROUGH a join: aggregate over source ⋈ dim lands on mart ⋈ dim, exact under multiplicity, outer joins, and filters") {
    val (root, _, _) = build() // source t (grp, value) + fresh mart m
    val src = spark.read.format("graft")
      .option("path", root).option("table", "t").load()
    // dim with a 1:2 key (g1 → two regions): join multiplicity must
    // distribute over the partials, not double-count
    val dim = Seq(("g0", "r0"), ("g1", "r1"), ("g1", "r1b"),
      ("g2", "r2"), ("g3", "r3")).toDF("grp", "region")
    def direct(df: => DataFrame): Set[String] = {
      spark.conf.set("spark.graft.martRewrite", "false")
      try df.collect().map(_.toString).toSet
      finally spark.conf.unset("spark.graft.martRewrite")
    }

    def qRegion = src.join(dim, src("grp") === dim("grp"))
      .groupBy(dim("region"))
      .agg(count(lit(1)).as("n"), sum("value").as("sv"),
        max("value").as("mx"), avg("value").as("av"),
        count(src("value")).as("cv"))
    assert(scannedTables(qRegion) == Seq("m"),
      s"join-shape rewrite did not fire: ${scannedTables(qRegion)}")
    assert(qRegion.collect().map(_.toString).toSet == direct(qRegion))

    // mixed source + dim groupings, filters on BOTH sides
    def qMixed = src.filter(src("grp") =!= "g0")
      .join(dim, src("grp") === dim("grp"))
      .filter(dim("region") =!= "r2")
      .groupBy(src("grp"), dim("region"))
      .agg(sum("value").as("sv"))
    assert(scannedTables(qMixed) == Seq("m"))
    assert(qMixed.collect().map(_.toString).toSet == direct(qMixed))

    // global aggregate over the join
    def qAll = src.join(dim, src("grp") === dim("grp"))
      .agg(count(lit(1)).as("n"), sum("value").as("sv"))
    assert(scannedTables(qAll) == Seq("m"))
    assert(qAll.collect().map(_.toString).toSet == direct(qAll))

    // LEFT OUTER with the source preserved: a source group with no dim
    // row still aggregates (null region group)
    val dimPart = dim.filter(col("grp") =!= "g2")
    def qOuter = src.join(dimPart, src("grp") === dimPart("grp"),
        "left_outer")
      .groupBy(dimPart("region"))
      .agg(count(lit(1)).as("n"), sum("value").as("sv"))
    assert(scannedTables(qOuter) == Seq("m"))
    assert(qOuter.collect().map(_.toString).toSet == direct(qOuter))

    // bail shapes stay on the source: an aggregate over a DIM column, a
    // non-equi condition, and a join key below the mart's grain
    assert(scannedTables(src.join(dim, src("grp") === dim("grp"))
      .groupBy(dim("region")).agg(max(dim("grp")).as("m"))) == Seq("t"))
    assert(scannedTables(src.join(dim, src("grp") > dim("grp"))
      .groupBy(dim("region")).agg(sum("value").as("sv"))) == Seq("t"))
    val dimId = Seq((0L, "x")).toDF("event_id", "tag")
    assert(scannedTables(src.join(dimId, src("event_id") === dimId("event_id"))
      .groupBy(dimId("tag")).agg(sum("value").as("sv"))) == Seq("t"))
  }
}
