package graft

import org.apache.spark.sql.functions._

/** Targeted semantics checks for the relational core (SURVEY §2.B). */
class RelationalSpec extends SparkSpec {
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q1_agg groups are (returnflag, linestatus) pairs with exact sums") {
    val rows = run("q1_agg").collect()
    assert(rows.length <= 9 && rows.nonEmpty)
    val li = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
    assert(rows.map(_.getAs[Long]("count_order")).sum == li.count())
  }

  test("q3_topk returns exactly 10 rows in descending revenue order") {
    val rev = run("q3_topk").collect().map(_.getAs[Double]("revenue"))
    assert(rev.length == 10)
    assert(rev.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("q_semijoin + q_antijoin partition is consistent") {
    // semi(urgent) and anti(F-status) overlap is data-dependent, but each
    // must be a subset of customers
    val nCust = Tables.customer(spark, sf).count()
    assert(run("q_semijoin").count() <= nCust)
    assert(run("q_antijoin").count() <= nCust)
  }

  test("q_outerjoin keeps every customer") {
    assert(run("q_outerjoin").count() == Tables.customer(spark, sf).count())
  }

  test("q_window_rank emits at most 3 rows per customer, rn ascending") {
    val bad = run("q_window_rank").groupBy("o_custkey")
      .agg(count(lit(1)).as("n"), max("rn").as("mx"))
      .filter(col("n") > 3 || col("mx") > 3)
    assert(bad.count() == 0)
  }

  test("q_approx_distinct is within 10% of exact") {
    val rows = run("q_approx_distinct").collect()
    assert(rows.nonEmpty)
    val exact = run("q_distinct_agg").collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("n_parts")).toMap
    rows.foreach { r =>
      val k = r.getAs[String]("l_returnflag")
      assert(r.getAs[Boolean]("parts_within_10pct"), s"flag $k parts drifted")
      assert(r.getAs[Boolean]("orders_within_10pct"), s"flag $k orders drifted")
      assert(r.getAs[Long]("exact_parts") == exact(k))
    }
  }

  test("q_approx_percentile is within 2% of the exact quantile") {
    val exact = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(round(expr("percentile(l_extendedprice, 0.5)"), 6).as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val rows = run("q_approx_percentile").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getAs[String]("l_returnflag")
      assert(r.getAs[Boolean]("p50_within_2pct"), s"flag $k p50 drifted")
      assert(r.getAs[Boolean]("p95_within_2pct"), s"flag $k p95 drifted")
      assert(r.getAs[Double]("exact_p50") == exact(k))
    }
  }

  test("q_rollup grand total row equals table count") {
    val all = run("q_rollup")
      .filter(col("returnflag") === "ALL" && col("linestatus") === "ALL")
      .collect()
    assert(all.length == 1)
    assert(all(0).getAs[Long]("cnt") == Tables.lineitem(spark, sf).count())
  }

  test("q_pivot row sums equal event count") {
    val p = run("q_pivot")
    val total = p.select((col("click") + col("error") + col("purchase") +
      col("signup") + col("view")).as("t"))
      .agg(sum("t")).collect()(0).getLong(0)
    assert(total == Tables.events(spark, sf).count())
  }
}
