package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query seconds.
  *
  * Hygiene: an untimed warmup, the three one-time materializations (stored
  * canonical tables, LSH candidates, IVF index fit) timed as explicit
  * `build:*` line items, then SPARK_GRAFT_ITERS (default 3) timed runs per
  * query reporting the per-query MEDIAN — a single-iteration number can't
  * distinguish a regression from box noise (round-1 runs varied ±25%).
  * `value` (the headline total) = builds + sum of medians, so the
  * build-once cost stays in the comparison against the re-derive-per-query
  * baseline.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // NOTE (r15): size-based AQE coalescing (parallelismFirst=false +
      // a small advisory byte target) was A/B'd here and REJECTED — it
      // trims task-storm overhead on trivial stages but serializes the
      // compute-heavy small-byte stages (band-collision verification
      // regressed 20%); the default parallelism-first coalescing wins on
      // this workload at every measured core count.
      // columnar-cache compression is a CPU-for-memory trade: the stored
      // staging tables/indexes are read-hot (10+ consumers each), and the
      // A/B measured compression costing 3-6x on both the cache build and
      // every cached read of the wide string grains. Default OFF for this
      // engine (MEMORY_AND_DISK spill still bounds memory); the env knob
      // restores Spark's default for memory-tight deployments.
      .config("spark.sql.inMemoryColumnarStorage.compressed",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_COMPRESS", "false"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // a failing query must surface in the output, not masquerade as a
    // fast run — failures are collected and emitted in the JSON, and a
    // failed iteration contributes NO elapsed time (a fail-fast throw is
    // near-instant, which would deflate the median and the headline)
    val failures = scala.collection.mutable.LinkedHashSet.empty[String]
    def timed(name: String)(f: => Unit): Option[Double] = {
      val t0 = System.nanoTime()
      try { f; Some((System.nanoTime() - t0) / 1e9) }
      catch { case _: Throwable => failures += name; None }
    }

    // untimed warmup: initialize codegen, parquet readers, and the JIT so
    // the first measured query isn't charged the JVM's startup tax. The
    // one-time builds warm on the TINY sf dir — identical generated code
    // (codegen caches by source), different data — so the timed builds
    // below measure steady-state execution, not first-compile of the
    // synthesis/parse expression trees.
    try {
      SparkEntry.queries("q6_filter_agg")(spark, sfDir).count()
      val warmDir = "/root/testdata/sf0.001"
      if (warmDir != sfDir && new java.io.File(warmDir).isDirectory) {
        operators.Ingestion.buildCanonical(spark, warmDir)
        operators.Curation.buildTfIndex(spark, warmDir)
        operators.Dedup.buildCandidates(spark, warmDir)
        operators.Dedup.buildFingerprints(spark, warmDir)
        operators.Similarity.buildIndex(spark, warmDir)
        operators.Curation.buildClusters(spark, warmDir)
        operators.Similarity.buildPca(spark, warmDir)
        operators.Similarity.buildPq(spark, warmDir)
        operators.TextAnalysis.buildBpeMerges(spark, warmDir)
      }
    } catch { case _: Throwable => () }

    // one-time materializations, timed individually; a failed build
    // reports -1, never a misleading near-zero elapsed
    val builds = Seq(
      "build:canonical" -> timed("build:canonical")(
        operators.Ingestion.buildCanonical(spark, sfDir)),
      // round 15: the stored token-frequency index (ADDED line item —
      // existing entries keep their names)
      "build:tf_index" -> timed("build:tf_index")(
        operators.Curation.buildTfIndex(spark, sfDir)),
      "build:lsh_candidates" -> timed("build:lsh_candidates")(
        operators.Dedup.buildCandidates(spark, sfDir)),
      "build:fingerprints" -> timed("build:fingerprints")(
        operators.Dedup.buildFingerprints(spark, sfDir)),
      "build:ivf_index" -> timed("build:ivf_index")(
        operators.Similarity.buildIndex(spark, sfDir)),
      "build:cc_labels" -> timed("build:cc_labels")(
        operators.Curation.buildClusters(spark, sfDir)),
      "build:pca" -> timed("build:pca")(
        operators.Similarity.buildPca(spark, sfDir)),
      "build:pq_index" -> timed("build:pq_index")(
        operators.Similarity.buildPq(spark, sfDir)),
      "build:bpe_merges" -> timed("build:bpe_merges")(
        operators.TextAnalysis.buildBpeMerges(spark, sfDir)))
      .map { case (k, v) => k -> v.getOrElse(-1.0) }

    // dev-only subset filter; unset (driver default) = all queries
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = only.fold(SparkEntry.queries)(f =>
      SparkEntry.queries.filter { case (k, _) => f(k) })

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      s(s.length / 2)
    }
    // a query with ANY failed iteration reports -1: timings are never
    // computed from a mix of completed and aborted runs
    val medians = selected.map { case (name, fn) =>
      val runs = (1 to iters).flatMap(_ => timed(name)(fn(spark, sfDir).count()))
      name -> (if (runs.length < iters) -1.0 else median(runs))
    }

    // PLAN FINGERPRINTS — the drift-attribution ledger: a short hash of
    // each query's canonicalized optimized plan (exprIds normalized;
    // paths are driver-deterministic) rides the same JSON, so when a
    // round's median moves the first question — "did the PLAN change, or
    // just the box?" — answers by diffing two rounds' `plans` maps
    // instead of a judge rerun. Hashing costs analysis+optimization
    // only, no execution.
    def planHash(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : String =
      try {
        // normalize run-specific tokens: build outputs land in per-run
        // temp dirs whose paths (and file listings) ride the relation
        // nodes — without this, a third of the hashes churn between two
        // runs of IDENTICAL code and the ledger can't answer anything
        val s = fn(spark, sfDir).queryExecution.optimizedPlan
          .canonicalized.treeString
          .replaceAll("file:[^\\s,\\]\\)]+", "<path>")
          .replaceAll("/[-_/a-zA-Z0-9.]*(tmp|warehouse|testdata)" +
            "[-_/a-zA-Z0-9.]*", "<path>")
          .replaceAll("#-?\\d+", "#id")
          .replaceAll("\\[plan_id=\\d+\\]", "[plan_id=x]")
          .replaceAll("QueryStage \\d+", "QueryStage x")
          .replaceAll("\\*\\(\\d+\\)", "*(n)")
          // closure renders (MapPartitions etc.) vary per JVM in every
          // part after "Lambda": the synthetic class index, the hidden-
          // class address (with or without 0x), and the identity hash
          // (1-8 hex chars, sometimes absent) — normalize the WHOLE
          // token down to the declaring class, render-agnostically
          .replaceAll("Lambda\\$?\\d*/(0x)?[0-9a-fA-F]+(@[0-9a-fA-F]+)?",
            "Lambda")
          // higher-order-function lambda variables carry a SESSION-global
          // ordinal (x_1, y_7, …) allocated at plan-creation time; with
          // concurrent build threads the allocation order races, so the
          // ordinal — like the exprId after it — is a render artifact,
          // not plan structure
          .replaceAll("lambda [A-Za-z]+_\\d+", "lambda v")
          .replaceAll("@[0-9a-f]{4,}", "@x")
          .replaceAll("FILTER \\(WHERE \\(\\d+ =", "FILTER (WHERE (k =")
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(s.getBytes("UTF-8"))
          .take(6).map("%02x".format(_)).mkString
      } catch { case _: Throwable => "err" }
    val plans = selected.toSeq.map { case (name, fn) =>
      name -> planHash(name, fn) }

    val entries = builds ++ medians.toSeq
    def fmt(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = entries.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val ps = plans.map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    // headline total sums only successful entries; failures are visible
    // in `errors` and as -1 per-query values
    val total = entries.collect { case (_, v) if v >= 0 => v }.sum
    val errs = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":$iters,"queries":$qs,"plans":$ps,"errors":$errs,"sf":"$sfDir"}"""
    // the driver keeps only the LAST 2000 CHARS of stdout and parses a JSON
    // line out of that tail — the full per-query dump is ~9 KB, so printing
    // it last truncated the head and every round's BENCH artifact came back
    // `parsed: null`. The full dump (all medians + the plan-fingerprint
    // ledger) is persisted to bench_result.json as the authoritative copy;
    // stdout gets a COMPACT summary line (headline total + builds + one
    // representative query per §2 family, ~1 KB) printed as the very last
    // line after spark.stop() so no executor shutdown logs follow it and
    // the whole line fits the driver's tail window
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_result.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes("UTF-8"))
    val headline = Seq(
      "q1_agg", "q3_topk", "q5_join5", "q6_filter_agg", "q_window_rank",
      "q_salted_join", "canon_header", "canon_lines", "merge_upsert",
      "ev_sessionize", "ev_asof_join", "ev_funnel", "ev_scd2",
      "doc_dedup_exact", "doc_minhash_lsh", "doc_token_count",
      "doc_quality_score", "doc_bpe_tokens", "doc_tfidf_topk",
      "doc_ccnet_bucket", "emb_cosine_pairs", "emb_ann_topk",
      "mm_media_stats")
    val entryMap = entries.toMap
    val hs = (builds.map(_._1) ++ headline.filter(entryMap.contains))
      .map(k => s"\"" + k + "\":" + fmt(entryMap(k))).mkString("{", ",", "}")
    val compact = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":$iters,"queries":$hs,"queries_measured":${medians.size},"detail":"$outFile","errors":$errs,"sf":"$sfDir"}"""
    spark.stop()
    println(compact)
  }
}
