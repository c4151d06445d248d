package graft

/** The two skew-profiler formulations agree: `q_skew_profile` (exact
  * percentiles — the oracle contract, one value per group through a
  * single aggregation buffer) and `q_skew_profile_approx` (the
  * production shape — approx_percentile's mergeable QuantileSummaries
  * sketch, constant memory per task at any key cardinality). The
  * sketch's rank error at accuracy 10000 is ~0.01%, so at gate scale
  * the integer group-size quantiles should agree within one count.
  */
class SkewProfileSpec extends SparkSpec {

  test("approx profile ≈ exact profile at gate scale (use the approx one at unbounded cardinality)") {
    val exact = graft.operators.Relational.defs("q_skew_profile")
      .fn(spark, sf).head
    val approx = graft.operators.Relational.defs("q_skew_profile_approx")
      .fn(spark, sf).head

    // exact columns shared verbatim: group count, min, max, avg, ratio
    assert(exact.getLong(0) == approx.getLong(0))
    assert(exact.getLong(1) == approx.getLong(1))
    assert(exact.getLong(2) == approx.getLong(2))
    assert(exact.getDouble(3) == approx.getDouble(3))
    assert(exact.getDouble(6) == approx.getDouble(6))

    // percentiles: the sketch answers within one integer group-size
    // step of the exact interpolated value
    val p50e = exact.getDouble(4)
    val p99e = exact.getDouble(5)
    val p50a = approx.getLong(4).toDouble
    val p99a = approx.getLong(5).toDouble
    assert(math.abs(p50a - p50e) <= 1.0,
      s"p50 drifted: exact $p50e approx $p50a")
    assert(math.abs(p99a - p99e) <= 1.0,
      s"p99 drifted: exact $p99e approx $p99a")
  }
}
