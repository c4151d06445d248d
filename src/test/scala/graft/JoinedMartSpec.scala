package graft

import java.io.File

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.sources.{GraftCatalog, ManifestFileIndex, ManifestTable}
import graft.sources.ManifestTable.TableBatch
import graft.streaming.JoinedMart

/** Join-aware marts ([[graft.streaming.JoinedMart]]): a (fact ⋈ dim)
  * rollup maintained incrementally from BOTH change feeds — fact churn,
  * dim attribute migration, dim key multiplicity — always equal to the
  * direct join-aggregate, and substituted into matching queries with
  * the join ELIMINATED ([[graft.plans.MartRewriteRule]]'s joined-mart
  * shape), falling back the moment either side is stale.
  */
class JoinedMartSpec extends SparkSpec {

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

  // fact: orders(o_id PK, o_custkey FK, o_status, o_price cents)
  private def orders(rs: Seq[(Long, Long, String, Long)]): DataFrame =
    rs.toDF("o_id", "o_custkey", "o_status", "o_price")
  // dim: customer(c_id PK, c_custkey join key — NOT unique, so key
  // multiplicity is a first-class case — c_mktsegment attribute)
  private def customers(rs: Seq[(Long, Long, String)]): DataFrame =
    rs.toDF("c_id", "c_custkey", "c_mktsegment")

  /** Root with feed-active orders + customer and the joined mart built. */
  private def build(): String = {
    val root = tmp("graft_jm")
    ManifestTable.mergeBatch(new File(root), "q", 0L, Seq(
      TableBatch("orders",
        orders((0L until 60L).map(i =>
          (i, i % 10, if (i % 3 == 0) "OPEN" else "FILLED", i * 100L))),
        Seq("o_id"), 4, changeFeed = true),
      TableBatch("customer",
        customers((0L until 8L).map(c =>
          (c, c, if (c % 2 == 0) "RETAIL" else "CORP"))),
        Seq("c_id"), 2, changeFeed = true)))
    JoinedMart.refresh(spark, new File(root), "orders", "customer", "jm",
      srcKeys = Seq("o_custkey"), dimKeys = Seq("c_custkey"),
      srcGroupCols = Seq("o_status"), dimGroupCols = Seq("c_mktsegment"),
      valueCols = Seq("o_price"), numBuckets = 2)
    root
  }

  private def raw(root: String, t: String): DataFrame =
    spark.read.format("graft").option("path", root).option("table", t).load()

  /** Direct join-aggregate over the live tables, rewrite disabled. */
  private def oracle(root: String): Set[(String, String, Long, Long)] = {
    spark.conf.set("spark.graft.martRewrite", "false")
    try raw(root, "orders")
      .join(raw(root, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy("o_status", "c_mktsegment")
      .agg(count(lit(1)).as("n"), sum("o_price").as("sv"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    finally spark.conf.unset("spark.graft.martRewrite")
  }

  private def martState(root: String): Set[(String, String, Long, Long)] =
    raw(root, "jm").collect()
      .map(r => (r.getAs[String]("o_status"), r.getAs[String]("c_mktsegment"),
        r.getAs[Long]("n_rows"), r.getAs[Long]("sum_o_price")))
      .toSet

  test("base build equals the direct join-aggregate; fact churn (insert + group-migrating update + delete) folds exactly from the feeds") {
    val root = build()
    assert(martState(root) == oracle(root), "base build")

    // fact churn: new orders, status flips (group migration on the
    // source side), deletes — one merge commit, feed kept alive
    ManifestTable.mergeBatch(new File(root), "q", 1L, Seq(
      TableBatch("orders",
        orders(Seq(
          (100L, 3L, "OPEN", 5000L), (101L, 4L, "FILLED", 7000L),
          (0L, 0L, "FILLED", 999L), // update: status + price moved
          (9L, 9L, "CANCELLED", 0L))), // update into a brand-new group
        Seq("o_id"), 4, changeFeed = true,
        deleteKeys = Some(Seq(6L, 12L).toDF("o_id")))))
    JoinedMart.refresh(spark, new File(root), "orders", "customer", "jm")
    assert(martState(root) == oracle(root), "after fact churn")
  }

  test("dim churn folds without rescanning the fact table's grain: attribute migration moves every affected key's rollup, deletes drop it, late dim inserts surface previously unmatched facts, duplicate dim keys multiply") {
    val root = build()

    // one dim commit carrying all four cases:
    //  - customer 1 flips CORP → RETAIL (attribute migration)
    //  - customer 2 deleted (its orders leave the inner join)
    //  - customer 8 appears (no orders yet — harmless)
    //  - a SECOND row for custkey 3 (multiplicity: its orders count twice)
    ManifestTable.mergeBatch(new File(root), "q", 1L, Seq(
      TableBatch("customer",
        customers(Seq((1L, 1L, "RETAIL"), (8L, 8L, "GOV"),
          (100L, 3L, "GOV"))),
        Seq("c_id"), 2, changeFeed = true,
        deleteKeys = Some(Seq(2L).toDF("c_id")))))
    JoinedMart.refresh(spark, new File(root), "orders", "customer", "jm")
    assert(martState(root) == oracle(root), "after dim churn")

    // both sides churn in ONE unfolded range: the two IVM terms
    // (ΔP ⋈ D_old, P_new ⋈ ΔD) must not double-count the key both touch
    ManifestTable.mergeBatch(new File(root), "q", 2L, Seq(
      TableBatch("orders",
        orders(Seq((200L, 5L, "OPEN", 1111L), (3L, 5L, "OPEN", 333L))),
        Seq("o_id"), 4, changeFeed = true)))
    ManifestTable.mergeBatch(new File(root), "q", 3L, Seq(
      TableBatch("customer", customers(Seq((5L, 5L, "GOV"))),
        Seq("c_id"), 2, changeFeed = true)))
    JoinedMart.refresh(spark, new File(root), "orders", "customer", "jm")
    assert(martState(root) == oracle(root), "after mixed churn")

    // idempotent: nothing new → no commit
    val v = ManifestTable.read(new File(root)).get.version
    JoinedMart.refresh(spark, new File(root), "orders", "customer", "jm")
    assert(ManifestTable.read(new File(root)).get.version == v)
  }

  test("aged-feed D_old reconstruction: a dim key inserted THEN updated inside the unfolded range reconstructs to ABSENT at the old watermark (multiset inversion order)") {
    val root = build()
    val from = ManifestTable.read(new File(root)).get.version

    // dim key 20 is born at from+1 and updated at from+2 — BOTH inside
    // the range the next refresh must unfold. D_old (the dim AS OF
    // `from`) must reconstruct to {} for key 20; a subtract-first
    // inversion (dNow − added + removed) floors at zero and resurrects
    // the insert-image ("GOV"), crediting ΔP deltas to a dim group that
    // did not exist at the watermark.
    ManifestTable.mergeBatch(new File(root), "q", 10L, Seq(
      TableBatch("customer", customers(Seq((20L, 20L, "GOV"))),
        Seq("c_id"), 2, changeFeed = true)))
    ManifestTable.mergeBatch(new File(root), "q", 11L, Seq(
      TableBatch("customer", customers(Seq((20L, 20L, "GOV2"))),
        Seq("c_id"), 2, changeFeed = true)))
    // fact churn for the churned key, so the ΔP ⋈ D_old term has rows
    // that WOULD land on the resurrected group
    ManifestTable.mergeBatch(new File(root), "q", 12L, Seq(
      TableBatch("orders",
        orders(Seq((500L, 20L, "OPEN", 4000L), (501L, 20L, "FILLED", 6000L))),
        Seq("o_id"), 4, changeFeed = true)))

    // the three commits above + the refresh's own partial commit age
    // `from` out of SNAPSHOT retention while the change feed (wider
    // window) still serves the range — forcing the reconstruction path
    JoinedMart.refresh(spark, new File(root), "orders", "customer", "jm")
    intercept[java.io.FileNotFoundException] {
      ManifestTable.readTable(spark, root, Some(from), table = "customer")
    }
    val state = martState(root)
    assert(!state.exists(_._2 == "GOV"),
      s"resurrected dim group credited with partial deltas: $state")
    assert(state == oracle(root), "after insert-then-update dim churn")
  }

  test("matching aggregate-over-join queries plan onto the joined mart with the join ELIMINATED; either side's unfolded commit disables it until the next refresh") {
    val root = build()
    def q: DataFrame = raw(root, "orders")
      .join(raw(root, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "o_status")
      .agg(count(lit(1)).as("n"), sum("o_price").as("sv"))
    assert(scannedTables(q) == Seq("jm"),
      s"expected the joined-mart scan, got ${scannedTables(q)}")
    val direct = {
      spark.conf.set("spark.graft.martRewrite", "false")
      try q.collect().map(_.toString).toSet
      finally spark.conf.unset("spark.graft.martRewrite")
    }
    assert(q.collect().map(_.toString).toSet == direct)

    // avg / count(col) derive from the joined mart's cnt partials —
    // still join-free
    val qa = raw(root, "orders")
      .join(raw(root, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "o_status")
      .agg(avg("o_price").as("ap"), count(col("o_price")).as("cp"))
    assert(scannedTables(qa) == Seq("jm"),
      s"avg/count(col) did not land on the joined mart: ${scannedTables(qa)}")
    val qaDirect = {
      spark.conf.set("spark.graft.martRewrite", "false")
      try qa.collect().map(_.toString).toSet
      finally spark.conf.unset("spark.graft.martRewrite")
    }
    assert(qa.collect().map(_.toString).toSet == qaDirect)

    // group-column filters on EITHER side ride along on the mart
    val f = raw(root, "orders")
      .join(raw(root, "customer"), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment") === "CORP" && col("o_status") =!= "OPEN")
      .groupBy("o_status").agg(sum("o_price").as("sv"))
    assert(scannedTables(f) == Seq("jm"))
    val fDirect = {
      spark.conf.set("spark.graft.martRewrite", "false")
      try f.collect().map(_.toString).toSet
      finally spark.conf.unset("spark.graft.martRewrite")
    }
    assert(f.collect().map(_.toString).toSet == fDirect)

    // non-derivable shapes fall through to the (partial ⋈ dim) join
    // rewrite or the source join — never a wrong answer: grouping by a
    // NON-declared dim attribute (c_id is not a mart dim group col)
    val ng = raw(root, "orders")
      .join(raw(root, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_id").agg(count(lit(1)).as("n"))
    assert(!scannedTables(ng).contains("jm"))

    // a dim commit stales the joined mart (old attribute values would
    // leak); the fact side still has a fresh PARTIAL, so the join-shape
    // rewrite keeps answering from (jm_partial ⋈ customer)
    ManifestTable.mergeBatch(new File(root), "q", 7L, Seq(
      TableBatch("customer", customers(Seq((1L, 1L, "GOV"))),
        Seq("c_id"), 2, changeFeed = true)))
    assert(scannedTables(q).toSet == Set("jm_partial", "customer"),
      s"expected partial ⋈ dim fallback, got ${scannedTables(q)}")
    JoinedMart.refresh(spark, new File(root), "orders", "customer", "jm")
    assert(scannedTables(q) == Seq("jm"))

    // a fact commit stales BOTH the joined mart and the partial
    ManifestTable.mergeBatch(new File(root), "q", 8L, Seq(
      TableBatch("orders", orders(Seq((300L, 1L, "OPEN", 42L))),
        Seq("o_id"), 4, changeFeed = true)))
    assert(scannedTables(q).toSet == Set("orders", "customer"))
    JoinedMart.refresh(spark, new File(root), "orders", "customer", "jm")
    assert(scannedTables(q) == Seq("jm"))
    assert(q.collect().map(_.toString).toSet
      == martState(root).map(t => s"[${t._2},${t._1},${t._3},${t._4}]"))
  }

  test("a feed-publishing JOINED mart cascades: a coarser mart folds its diffs exactly across fact and dim churn, and the rewrite chains onto it") {
    import graft.streaming.IncrementalMart
    val root = tmp("graft_jm_casc")
    ManifestTable.mergeBatch(new File(root), "q", 0L, Seq(
      TableBatch("orders",
        orders((0L until 60L).map(i =>
          (i, i % 10, if (i % 3 == 0) "OPEN" else "FILLED", i * 100L))),
        Seq("o_id"), 4, changeFeed = true),
      TableBatch("customer",
        customers((0L until 8L).map(c =>
          (c, c, if (c % 2 == 0) "RETAIL" else "CORP"))),
        Seq("c_id"), 2, changeFeed = true)))
    JoinedMart.refresh(spark, new File(root), "orders", "customer", "jm",
      srcKeys = Seq("o_custkey"), dimKeys = Seq("c_custkey"),
      srcGroupCols = Seq("o_status"), dimGroupCols = Seq("c_mktsegment"),
      valueCols = Seq("o_price"), numBuckets = 2, changeFeed = true)

    // level 2: per-segment rollup folded from the JOINED mart's feed
    val cfg2 = IncrementalMart.Config(root, root,
      groupCols = Seq("c_mktsegment"), valueCols = Seq("sum_o_price"),
      sourceTable = "jm", martTable = "jm2", numBuckets = 2)
    val ck2 = tmp("graft_jm_casc_ck")
    def drain2(): Unit = IncrementalMart.sync(spark, cfg2, ck2)
    def m(t: String): DataFrame = raw(root, t)
    def expect2: Set[String] = {
      spark.conf.set("spark.graft.martRewrite", "false")
      try m("jm").groupBy("c_mktsegment")
        .agg(count(lit(1)).as(IncrementalMart.RowsCol),
          sum("sum_o_price").as("sum_sum_o_price"),
          count(col("sum_o_price")).as("cnt_sum_o_price"))
        .collect().map(_.toString).toSet
      finally spark.conf.unset("spark.graft.martRewrite")
    }
    drain2()
    assert(m("jm2").collect().map(_.toString).toSet == expect2,
      "cascaded rollup diverged at build")

    // churn BOTH sides of the join, refresh the joined mart, drain the
    // cascade: level 2 must land exactly on the rolled-up level 1 —
    // proof the joined mart's published diffs are a correct feed
    ManifestTable.mergeBatch(new File(root), "q", 1L, Seq(
      TableBatch("orders",
        orders(Seq((100L, 3L, "OPEN", 5000L), (0L, 0L, "FILLED", 999L))),
        Seq("o_id"), 4, changeFeed = true,
        deleteKeys = Some(Seq(6L).toDF("o_id")))))
    ManifestTable.mergeBatch(new File(root), "q", 2L, Seq(
      TableBatch("customer", customers(Seq((1L, 1L, "GOV"))),
        Seq("c_id"), 2, changeFeed = true)))
    JoinedMart.refresh(spark, new File(root), "orders", "customer", "jm")
    drain2()
    assert(m("jm2").collect().map(_.toString).toSet == expect2,
      "cascaded rollup diverged after churn")
    assert(martState(root) == oracle(root), "level 1 itself stayed exact")

    // the rewrite CHAINS: a per-segment aggregate over jm answers from
    // jm2 (smaller), still with no join anywhere
    def q = m("jm").groupBy("c_mktsegment")
      .agg(sum("sum_o_price").as("sv"))
    assert(scannedTables(q) == Seq("jm2"), s"got ${scannedTables(q)}")
    val direct = {
      spark.conf.set("spark.graft.martRewrite", "false")
      try q.collect().map(_.toString).toSet
      finally spark.conf.unset("spark.graft.martRewrite")
    }
    assert(q.collect().map(_.toString).toSet == direct)
  }

  test("STAR joined mart: two dims maintained from THREE change feeds — fact churn, churn on both dims, and all-inputs-in-one-range churn stay exactly the 3-way join aggregate") {
    import graft.streaming.JoinedMart.DimSpec
    val root = tmp("graft_jm_star")
    def statusDim(rs: Seq[(String, String)]): DataFrame =
      rs.toDF("s_status", "s_class")
    ManifestTable.mergeBatch(new File(root), "q", 0L, Seq(
      TableBatch("orders",
        orders((0L until 60L).map(i =>
          (i, i % 10, if (i % 3 == 0) "OPEN" else "FILLED", i * 100L))),
        Seq("o_id"), 4, changeFeed = true),
      TableBatch("customer",
        customers((0L until 8L).map(c =>
          (c, c, if (c % 2 == 0) "RETAIL" else "CORP"))),
        Seq("c_id"), 2, changeFeed = true),
      TableBatch("status_dim",
        statusDim(Seq(("OPEN", "ACTIVE"), ("FILLED", "DONE"),
          ("CANCELLED", "DEAD"))),
        Seq("s_status"), 2, changeFeed = true)))
    def refresh(): Unit = {
      JoinedMart.refreshStar(spark, new File(root), "orders",
        Seq(
          DimSpec("customer", Seq("o_custkey"), Seq("c_custkey"),
            Seq("c_mktsegment")),
          DimSpec("status_dim", Seq("o_status"), Seq("s_status"),
            Seq("s_class"))),
        "jms", srcGroupCols = Nil, valueCols = Seq("o_price"),
        maxCols = Seq("o_price"), numBuckets = 2)
      ()
    }
    refresh()
    def oracle3(): Set[String] = {
      spark.conf.set("spark.graft.martRewrite", "false")
      try raw(root, "orders")
        .join(raw(root, "customer"), col("o_custkey") === col("c_custkey"))
        .join(raw(root, "status_dim"), col("o_status") === col("s_status"))
        .groupBy("c_mktsegment", "s_class")
        .agg(count(lit(1)).as("n"), sum("o_price").as("sv"),
          max("o_price").as("mx"))
        .collect().map(_.toString).toSet
      finally spark.conf.unset("spark.graft.martRewrite")
    }
    def mart(): Set[String] = raw(root, "jms")
      .select(col("c_mktsegment"), col("s_class"),
        col("n_rows").as("n"), col("sum_o_price").as("sv"),
        col("max_o_price").as("mx"))
      .collect().map(_.toString).toSet
    assert(mart() == oracle3(), "star base build")

    // fact churn only
    ManifestTable.mergeBatch(new File(root), "q", 1L, Seq(
      TableBatch("orders",
        orders(Seq((100L, 3L, "OPEN", 5000L), (0L, 0L, "CANCELLED", 999L))),
        Seq("o_id"), 4, changeFeed = true,
        deleteKeys = Some(Seq(6L).toDF("o_id")))))
    refresh()
    assert(mart() == oracle3(), "after fact churn")

    // churn on BOTH dims in one range: attribute migrations must move
    // every affected key's rollup from each dim independently
    ManifestTable.mergeBatch(new File(root), "q", 2L, Seq(
      TableBatch("customer", customers(Seq((1L, 1L, "GOV"))),
        Seq("c_id"), 2, changeFeed = true)))
    ManifestTable.mergeBatch(new File(root), "q", 3L, Seq(
      TableBatch("status_dim", statusDim(Seq(("OPEN", "LIVE"))),
        Seq("s_status"), 2, changeFeed = true)))
    refresh()
    assert(mart() == oracle3(), "after two-dim churn")

    // ALL THREE inputs churn inside ONE unfolded range — the sequenced
    // IVM terms must count each input's change exactly once
    ManifestTable.mergeBatch(new File(root), "q", 4L, Seq(
      TableBatch("orders",
        orders(Seq((200L, 5L, "OPEN", 1111L), (3L, 5L, "FILLED", 333L))),
        Seq("o_id"), 4, changeFeed = true)))
    ManifestTable.mergeBatch(new File(root), "q", 5L, Seq(
      TableBatch("customer", customers(Seq((5L, 5L, "MIXED"))),
        Seq("c_id"), 2, changeFeed = true)))
    ManifestTable.mergeBatch(new File(root), "q", 6L, Seq(
      TableBatch("status_dim", statusDim(Seq(("FILLED", "SETTLED"))),
        Seq("s_status"), 2, changeFeed = true)))
    refresh()
    assert(mart() == oracle3(), "after three-input churn")

    // recorded declaration: a later refresh passes empty per-dim fields
    ManifestTable.mergeBatch(new File(root), "q", 7L, Seq(
      TableBatch("orders", orders(Seq((300L, 1L, "OPEN", 42L))),
        Seq("o_id"), 4, changeFeed = true)))
    JoinedMart.refreshStar(spark, new File(root), "orders",
      Seq(DimSpec("customer", Nil, Nil, Nil),
        DimSpec("status_dim", Nil, Nil, Nil)), "jms")
    assert(mart() == oracle3(), "recorded-declaration re-refresh")

    // idempotent: nothing new → no commit
    val v = ManifestTable.read(new File(root)).get.version
    JoinedMart.refreshStar(spark, new File(root), "orders",
      Seq(DimSpec("customer", Nil, Nil, Nil),
        DimSpec("status_dim", Nil, Nil, Nil)), "jms")
    assert(ManifestTable.read(new File(root)).get.version == v)

    // the rewrite fires on the STAR query shape: the whole two-dim join
    // tree is eliminated (works whichever way the joins associate)
    def qStar = raw(root, "orders")
      .join(raw(root, "customer"), col("o_custkey") === col("c_custkey"))
      .join(raw(root, "status_dim"), col("o_status") === col("s_status"))
      .groupBy("c_mktsegment", "s_class")
      .agg(count(lit(1)).as("n"), sum("o_price").as("sv"),
        avg("o_price").as("av"), max("o_price").as("mx"))
    assert(scannedTables(qStar) == Seq("jms"),
      s"star rewrite did not fire: ${scannedTables(qStar)}")
    val direct = {
      spark.conf.set("spark.graft.martRewrite", "false")
      try qStar.collect().map(_.toString).toSet
      finally spark.conf.unset("spark.graft.martRewrite")
    }
    assert(qStar.collect().map(_.toString).toSet == direct)

    // filters on any side's declared group columns ride along
    def qF = raw(root, "status_dim")
      .join(raw(root, "orders"), col("o_status") === col("s_status"))
      .join(raw(root, "customer"), col("o_custkey") === col("c_custkey"))
      .filter(col("s_class") =!= "DEAD" && col("c_mktsegment") === "RETAIL")
      .groupBy("s_class").agg(sum("o_price").as("sv"))
    assert(scannedTables(qF) == Seq("jms"), s"got ${scannedTables(qF)}")
    val fDirect = {
      spark.conf.set("spark.graft.martRewrite", "false")
      try qF.collect().map(_.toString).toSet
      finally spark.conf.unset("spark.graft.martRewrite")
    }
    assert(qF.collect().map(_.toString).toSet == fDirect)

    // a commit on ANY dim stales the star mart until the next refresh
    ManifestTable.mergeBatch(new File(root), "q", 8L, Seq(
      TableBatch("status_dim", statusDim(Seq(("CANCELLED", "VOID"))),
        Seq("s_status"), 2, changeFeed = true)))
    assert(!scannedTables(qStar).contains("jms"),
      "a stale star mart must never answer")
    JoinedMart.refreshStar(spark, new File(root), "orders",
      Seq(DimSpec("customer", Nil, Nil, Nil),
        DimSpec("status_dim", Nil, Nil, Nil)), "jms")
    assert(scannedTables(qStar) == Seq("jms"))
    assert(mart() == oracle3())

    // joining on NON-declared keys falls through (different join)
    assert(!scannedTables(raw(root, "orders")
      .join(raw(root, "customer"), col("o_custkey") === col("c_id"))
      .join(raw(root, "status_dim"), col("o_status") === col("s_status"))
      .groupBy("c_mktsegment", "s_class").agg(sum("o_price").as("sv")))
      .contains("jms"))

    // the SQL verb drives the same refresh (recorded declaration)
    val ns = new File(root).getName
    spark.conf.set("spark.sql.catalog.jmsx", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.jmsx.warehouse",
      new File(root).getParent)
    ManifestTable.mergeBatch(new File(root), "q", 9L, Seq(
      TableBatch("orders", orders(Seq((400L, 2L, "OPEN", 77L))),
        Seq("o_id"), 4, changeFeed = true)))
    spark.sql(s"CALL jmsx.system.refresh_star_mart('$ns', 'orders', " +
      "'jms', 'customer;status_dim', '', '', '', '', '')").collect()
    assert(mart() == oracle3(), "SQL star refresh diverged")
  }

  test("CALL graft.system.refresh_joined_mart: SQL surface declares, builds, and re-refreshes with the recorded declaration") {
    val root = tmp("graft_jm_call")
    val ns = new File(root).getName
    spark.conf.set("spark.sql.catalog.jmc", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.jmc.warehouse", new File(root).getParent)
    ManifestTable.mergeBatch(new File(root), "q", 0L, Seq(
      TableBatch("orders",
        orders((0L until 30L).map(i => (i, i % 5, "OPEN", i * 10L))),
        Seq("o_id"), 4, changeFeed = true),
      TableBatch("customer",
        customers((0L until 5L).map(c => (c, c, s"S$c"))),
        Seq("c_id"), 2, changeFeed = true)))
    spark.sql(s"CALL jmc.system.refresh_joined_mart('$ns', 'orders', " +
      "'customer', 'jm', 'o_custkey', 'c_custkey', 'o_status', " +
      "'c_mktsegment', 'o_price')").collect()
    assert(martState(root) == oracle(root))

    // recorded declaration: later calls pass empty column lists
    ManifestTable.mergeBatch(new File(root), "q", 1L, Seq(
      TableBatch("customer", customers(Seq((0L, 0L, "MOVED"))),
        Seq("c_id"), 2, changeFeed = true)))
    spark.sql(s"CALL jmc.system.refresh_joined_mart('$ns', 'orders', " +
      "'customer', 'jm', '', '', '', '', '')").collect()
    assert(martState(root) == oracle(root))
  }

  test("EXTREMA through the joined mart (the VW_LOAD_AUDIT_SUMMARY MAX(load_ts) shape through a join): monotone inserts ride greatest/least, fact retractions and dim churn recompute ONLY touched groups at partial grain, and max/min rewrite join-free") {
    val root = tmp("graft_jm_ext")
    ManifestTable.mergeBatch(new File(root), "q", 0L, Seq(
      TableBatch("orders",
        orders((0L until 40L).map(i =>
          (i, i % 8, if (i % 3 == 0) "OPEN" else "FILLED", i * 100L))),
        Seq("o_id"), 4, changeFeed = true),
      TableBatch("customer",
        customers((0L until 8L).map(c =>
          (c, c, if (c % 2 == 0) "RETAIL" else "CORP"))),
        Seq("c_id"), 2, changeFeed = true)))
    JoinedMart.refresh(spark, new File(root), "orders", "customer", "jm",
      srcKeys = Seq("o_custkey"), dimKeys = Seq("c_custkey"),
      srcGroupCols = Seq("o_status"), dimGroupCols = Seq("c_mktsegment"),
      valueCols = Seq("o_price"), maxCols = Seq("o_price"),
      minCols = Seq("o_price"), numBuckets = 2)
    def q: DataFrame = raw(root, "orders")
      .join(raw(root, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "o_status")
      .agg(max("o_price").as("mx"), min("o_price").as("mn"),
        sum("o_price").as("sv"))
    def direct: Set[String] = {
      spark.conf.set("spark.graft.martRewrite", "false")
      try q.collect().map(_.toString).toSet
      finally spark.conf.unset("spark.graft.martRewrite")
    }
    // base build + the rewrite: max/min land on the mart JOIN-FREE
    assert(scannedTables(q) == Seq("jm"),
      s"extrema did not rewrite join-free: ${scannedTables(q)}")
    assert(q.collect().map(_.toString).toSet == direct, "base build")

    // monotone fact inserts (the fast path: no retraction anywhere)
    ManifestTable.mergeBatch(new File(root), "q", 1L, Seq(
      TableBatch("orders", orders(Seq(
        (100L, 3L, "OPEN", 99999L), (101L, 4L, "FILLED", 1L))),
        Seq("o_id"), 4, changeFeed = true)))
    JoinedMart.refresh(spark, new File(root), "orders", "customer", "jm")
    assert(scannedTables(q) == Seq("jm"))
    assert(q.collect().map(_.toString).toSet == direct,
      "monotone insert path")

    // fact retraction REMOVING a group max: delete the planted 99999 row
    // and update another group's max downward — only recompute recovers
    ManifestTable.mergeBatch(new File(root), "q", 2L, Seq(
      TableBatch("orders", orders(Seq(
        (39L, 7L, "FILLED", 5L))), // update: was the global max 3900
        Seq("o_id"), 4, changeFeed = true,
        deleteKeys = Some(Seq(100L).toDF("o_id")))))
    JoinedMart.refresh(spark, new File(root), "orders", "customer", "jm")
    assert(q.collect().map(_.toString).toSet == direct,
      "fact retraction removed the stored extremum")

    // dim churn: attribute migration moves every key-7 partial from CORP
    // to GOV — the vacated group's max must recompute, the new group's
    // max appears; a dim delete drops key 6 entirely
    ManifestTable.mergeBatch(new File(root), "q", 3L, Seq(
      TableBatch("customer", customers(Seq((7L, 7L, "GOV"))),
        Seq("c_id"), 2, changeFeed = true,
        deleteKeys = Some(Seq(6L).toDF("c_id")))))
    JoinedMart.refresh(spark, new File(root), "orders", "customer", "jm")
    assert(q.collect().map(_.toString).toSet == direct,
      "dim attribute migration + dim delete")

    // mixed range: fact churn AND dim churn folded in ONE refresh
    ManifestTable.mergeBatch(new File(root), "q", 4L, Seq(
      TableBatch("orders", orders(Seq((102L, 5L, "OPEN", 88888L))),
        Seq("o_id"), 4, changeFeed = true,
        deleteKeys = Some(Seq(35L).toDF("o_id")))))
    ManifestTable.mergeBatch(new File(root), "q", 5L, Seq(
      TableBatch("customer", customers(Seq((1L, 1L, "MOVED"))),
        Seq("c_id"), 2, changeFeed = true)))
    JoinedMart.refresh(spark, new File(root), "orders", "customer", "jm")
    assert(scannedTables(q) == Seq("jm"))
    assert(q.collect().map(_.toString).toSet == direct,
      "mixed fact+dim churn in one range")

    // the mart table itself carries the extrema at joined grain
    assert(raw(root, "jm").columns.toSet
      .intersect(Set("max_o_price", "min_o_price")).size == 2)
  }

  test("MULTI-ROOT star: a dim living in ANOTHER namespace root feeds the mart under its own per-root watermark — remote dim churn stales and then refreshes exactly, mixed local+remote churn folds once per input, and the rewrite never substitutes a remote-dim mart into a same-root query") {
    import graft.streaming.JoinedMart.DimSpec
    val rootA = tmp("graft_jm_mr_a") // facts + local dim + the mart
    val rootB = tmp("graft_jm_mr_b") // the REMOTE dim (shared ref data)
    def statusDim(rs: Seq[(String, String)]): DataFrame =
      rs.toDF("s_status", "s_class")
    ManifestTable.mergeBatch(new File(rootA), "q", 0L, Seq(
      TableBatch("orders",
        orders((0L until 40L).map(i =>
          (i, i % 8, if (i % 3 == 0) "OPEN" else "FILLED", i * 100L))),
        Seq("o_id"), 4, changeFeed = true),
      TableBatch("customer",
        customers((0L until 8L).map(c =>
          (c, c, if (c % 2 == 0) "RETAIL" else "CORP"))),
        Seq("c_id"), 2, changeFeed = true)))
    // pad root B with unrelated commits so its version counter DIVERGES
    // from root A's — per-root watermarks must not conflate the two
    (0 until 5).foreach { i =>
      ManifestTable.mergeBatch(new File(rootB), "pad", i.toLong, Seq(
        TableBatch("noise", Seq((i.toLong, i)).toDF("k", "x"),
          Seq("k"), 1)))
    }
    ManifestTable.mergeBatch(new File(rootB), "q", 0L, Seq(
      TableBatch("status_dim",
        statusDim(Seq(("OPEN", "ACTIVE"), ("FILLED", "DONE"))),
        Seq("s_status"), 2, changeFeed = true)))
    def refresh(): Unit = {
      JoinedMart.refreshStar(spark, new File(rootA), "orders",
        Seq(
          DimSpec("customer", Seq("o_custkey"), Seq("c_custkey"),
            Seq("c_mktsegment")),
          DimSpec("status_dim", Seq("o_status"), Seq("s_status"),
            Seq("s_class"), root = Some(rootB))),
        "jmr", srcGroupCols = Nil, valueCols = Seq("o_price"),
        numBuckets = 2)
      ()
    }
    refresh()
    def oracle3(): Set[String] = {
      spark.conf.set("spark.graft.martRewrite", "false")
      try raw(rootA, "orders")
        .join(raw(rootA, "customer"), col("o_custkey") === col("c_custkey"))
        .join(raw(rootB, "status_dim"), col("o_status") === col("s_status"))
        .groupBy("c_mktsegment", "s_class")
        .agg(count(lit(1)).as("n"), sum("o_price").as("sv"))
        .collect().map(_.toString).toSet
      finally spark.conf.unset("spark.graft.martRewrite")
    }
    def mart(): Set[String] = raw(rootA, "jmr")
      .select(col("c_mktsegment"), col("s_class"),
        col("n_rows").as("n"), col("sum_o_price").as("sv"))
      .collect().map(_.toString).toSet
    assert(mart() == oracle3(), "cross-root base build")

    // REMOTE churn only: attribute migration in root B (OPEN → LIVE)
    ManifestTable.mergeBatch(new File(rootB), "q", 1L, Seq(
      TableBatch("status_dim", statusDim(Seq(("OPEN", "LIVE"))),
        Seq("s_status"), 2, changeFeed = true)))
    refresh()
    assert(mart() == oracle3(), "after remote-only dim churn")

    // LOCAL fact churn + REMOTE dim churn in one unfolded range
    ManifestTable.mergeBatch(new File(rootA), "q", 1L, Seq(
      TableBatch("orders",
        orders(Seq((100L, 3L, "OPEN", 5000L), (0L, 0L, "CANCELLED", 1L))),
        Seq("o_id"), 4, changeFeed = true,
        deleteKeys = Some(Seq(6L).toDF("o_id")))))
    ManifestTable.mergeBatch(new File(rootB), "q", 2L, Seq(
      TableBatch("status_dim",
        statusDim(Seq(("CANCELLED", "DEAD"), ("FILLED", "SETTLED"))),
        Seq("s_status"), 2, changeFeed = true)))
    refresh()
    assert(mart() == oracle3(), "mixed local+remote one-range churn")

    // idempotent across BOTH roots: nothing new anywhere → no commit
    val vA = ManifestTable.read(new File(rootA)).get.version
    refresh()
    assert(ManifestTable.read(new File(rootA)).get.version == vA,
      "an all-fresh refresh must commit nothing")

    // recorded declaration re-refresh (empty per-dim fields) after more
    // remote churn — the recorded DIM ROOT must be honored
    ManifestTable.mergeBatch(new File(rootB), "q", 3L, Seq(
      TableBatch("status_dim", statusDim(Seq(("LIVE2", "X"), ("OPEN", "REOPEN"))),
        Seq("s_status"), 2, changeFeed = true)))
    JoinedMart.refreshStar(spark, new File(rootA), "orders",
      Seq(DimSpec("customer", Nil, Nil, Nil),
        DimSpec("status_dim", Nil, Nil, Nil)), "jmr")
    assert(mart() == oracle3(), "recorded-declaration cross-root refresh")

    // the rewrite must NOT substitute this mart into a same-root query
    // joining a same-NAMED LOCAL table (a different table!)
    ManifestTable.mergeBatch(new File(rootA), "q", 2L, Seq(
      TableBatch("status_dim", statusDim(Seq(("OPEN", "LOCALCLASS"))),
        Seq("s_status"), 2, changeFeed = true)))
    def qLocal = raw(rootA, "orders")
      .join(raw(rootA, "customer"), col("o_custkey") === col("c_custkey"))
      .join(raw(rootA, "status_dim"), col("o_status") === col("s_status"))
      .groupBy("c_mktsegment", "s_class")
      .agg(sum("o_price").as("sv"))
    assert(!scannedTables(qLocal).contains("jmr"),
      s"remote-dim mart leaked into a same-root query: " +
        s"${scannedTables(qLocal)}")

    // …and the TRUE cross-root query substitutes: the rewrite matches
    // leaves by (root, table), so the remote dim resolves to its
    // declared root and the whole two-root star collapses onto the mart
    def qCross = raw(rootA, "orders")
      .join(raw(rootA, "customer"), col("o_custkey") === col("c_custkey"))
      .join(raw(rootB, "status_dim"), col("o_status") === col("s_status"))
      .groupBy("c_mktsegment", "s_class")
      .agg(count(lit(1)).as("n"), sum("o_price").as("sv"))
    assert(scannedTables(qCross) == Seq("jmr"),
      s"cross-root star query did not substitute: ${scannedTables(qCross)}")
    assert(qCross.collect().map(_.toString).toSet == oracle3(),
      "cross-root substitution answered differently from the direct join")
    // a remote commit stales it (per-dim watermark), direct answers
    // stay correct, and the next refresh re-arms
    ManifestTable.mergeBatch(new File(rootB), "q", 9L, Seq(
      TableBatch("status_dim", statusDim(Seq(("OPEN", "FINAL"))),
        Seq("s_status"), 2, changeFeed = true)))
    assert(!scannedTables(qCross).contains("jmr"),
      "a remote dim commit must stale the cross-root substitution")
    assert(qCross.collect().map(_.toString).toSet == oracle3())
    refresh()
    assert(scannedTables(qCross) == Seq("jmr"))
    assert(qCross.collect().map(_.toString).toSet == oracle3())
  }

  test("DECIMAL measures through the joined mart: the fold stays exact across fact+dim churn and avg derives bit-exactly join-free (the reference's NUMBER(18,2) money shape)") {
    val root = tmp("graft_jm_dec")
    def decOrders(rs: Seq[(Long, Long, String, String)]): DataFrame =
      rs.toDF("o_id", "o_custkey", "o_status", "o_price")
        .select(col("o_id"), col("o_custkey"), col("o_status"),
          col("o_price").cast("decimal(18,2)").as("o_price"))
    ManifestTable.mergeBatch(new File(root), "q", 0L, Seq(
      TableBatch("orders", decOrders((0L until 21L).map(i =>
        (i, i % 7, if (i % 3 == 0) "OPEN" else "FILLED",
          s"${i * 7}.${10 + i % 89}"))),
        Seq("o_id"), 4, changeFeed = true),
      TableBatch("customer", customers((0L until 7L).map(c =>
        (c, c, if (c % 2 == 0) "RETAIL" else "CORP"))),
        Seq("c_id"), 2, changeFeed = true)))
    JoinedMart.refresh(spark, new File(root), "orders", "customer", "jm",
      srcKeys = Seq("o_custkey"), dimKeys = Seq("c_custkey"),
      srcGroupCols = Seq("o_status"), dimGroupCols = Seq("c_mktsegment"),
      valueCols = Seq("o_price"), numBuckets = 2)
    def q: DataFrame = raw(root, "orders")
      .join(raw(root, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "o_status")
      .agg(avg("o_price").as("ap"), sum("o_price").as("sp"),
        count(col("o_price")).as("cp"))
    def direct: Set[String] = {
      spark.conf.set("spark.graft.martRewrite", "false")
      try q.collect().map(_.toString).toSet
      finally spark.conf.unset("spark.graft.martRewrite")
    }
    assert(scannedTables(q) == Seq("jm"),
      s"decimal star rewrite did not fire: ${scannedTables(q)}")
    assert(q.collect().map(_.toString).toSet == direct)

    // churn BOTH sides, refresh again: the decimal partials fold signed
    // (delta sums cast back to the Decimal(p+10, s) partial type) and
    // avg keeps deriving bit-exactly
    ManifestTable.mergeBatch(new File(root), "q", 1L, Seq(
      TableBatch("orders", decOrders(Seq(
        (100L, 3L, "OPEN", "123.45"),
        (0L, 0L, "FILLED", "0.01"))), // update: group + price moved
        Seq("o_id"), 4, changeFeed = true,
        deleteKeys = Some(Seq(6L).toDF("o_id"))),
      TableBatch("customer", customers(Seq((1L, 1L, "GOV"))),
        Seq("c_id"), 2, changeFeed = true)))
    JoinedMart.refresh(spark, new File(root), "orders", "customer", "jm")
    assert(scannedTables(q) == Seq("jm"))
    assert(q.collect().map(_.toString).toSet == direct)
    val sumT = raw(root, "jm").schema("sum_o_price").dataType
    assert(sumT == org.apache.spark.sql.types.DecimalType(28, 2),
      s"joined-mart decimal partial type drifted: $sumT")
  }
}
