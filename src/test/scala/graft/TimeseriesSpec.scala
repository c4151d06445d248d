package graft

import org.apache.spark.sql.functions._

/** Semantics checks for the time-series operators (SURVEY §2.C). */
class TimeseriesSpec extends SparkSpec {
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("ev_sessionize: sessions are disjoint and gap-bounded per user") {
    val s = run("ev_sessionize").collect()
    assert(s.nonEmpty)
    // session ends never precede starts; events partition exactly
    assert(s.forall(r => !r.getAs[java.sql.Timestamp]("session_end")
      .before(r.getAs[java.sql.Timestamp]("session_start"))))
    val total = s.map(_.getAs[Long]("n_events")).sum
    assert(total == Tables.events(spark, sf).count())
  }

  test("ev_asof_join: last_click_ts <= purchase_ts and one row per purchase") {
    val a = run("ev_asof_join")
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(a.count() == purchases)
    val bad = a.filter(col("last_click_ts") > col("purchase_ts"))
    assert(bad.count() == 0)
  }

  test("ev_funnel: stages are monotone (click after view, purchase after click)") {
    val f = run("ev_funnel").collect()
    f.foreach { r =>
      val stage = r.getAs[Int]("stage")
      val fv = Option(r.getAs[java.sql.Timestamp]("first_view"))
      val fc = Option(r.getAs[java.sql.Timestamp]("first_click"))
      val fp = Option(r.getAs[java.sql.Timestamp]("first_purchase"))
      if (stage >= 2) assert(fv.get.before(fc.get))
      if (stage == 3) assert(fc.get.before(fp.get))
      if (stage < 2) assert(fc.isEmpty)
    }
  }

  test("ev_hll_users: merged daily sketches equal the direct sketch, near exact") {
    // the query output now carries the exact side + 5% bound as data; the
    // merged≡direct sketch identity is re-derived here from the same ops
    val merged = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("a"))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("a"))
      .toMap
    val direct = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("a"))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("a"))
      .toMap
    // same sketch algorithm + deterministic hashing → merging day sketches
    // must reproduce the single-pass sketch exactly
    assert(merged.nonEmpty && merged == direct)
    val out = run("ev_hll_users").collect()
    assert(out.nonEmpty)
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n"))
      .toMap
    out.foreach { r =>
      assert(r.getAs[Boolean]("est_within_5pct"),
        s"${r.getAs[String]("event_type")}: estimate drifted past 5%")
      assert(r.getAs[Long]("exact_users") == exact(r.getAs[String]("event_type")))
    }
  }

  test("ev_dedup_latest keeps exactly one row per (user, type)") {
    val d = run("ev_dedup_latest")
    assert(d.groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count() == 0)
  }
}
