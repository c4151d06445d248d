package graft

/** Every registered query must run and return rows on sf0.001. */
class QuerySmokeSpec extends SparkSpec {
  SparkEntry.all.keys.toSeq.sorted.foreach { name =>
    test(s"$name returns rows") {
      val df = SparkEntry.queries(name)(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }
}
