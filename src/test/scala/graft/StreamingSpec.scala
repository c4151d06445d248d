package graft

import graft.streaming.EventPipeline
import graft.streaming.EventPipeline.Ev
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured Streaming coverage (SURVEY §2.E): the streaming paths that the
  * batch oracle can't exercise — MemoryStream in, memory/parquet sink out.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def eventsData: Seq[Ev] =
    Tables.events(spark, sf).select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect().sortBy(e => (e.ts.getTime, e.event_id)).toSeq

  test("streaming windowCounts equals the batch run") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventPipeline.windowCounts(in.toDF())
      .writeStream.format("memory").queryName("wc").outputMode("complete").start()
    try {
      in.addData(eventsData)
      q.processAllAvailable()
      val streamed = spark.table("wc")
        .select("window_start", "event_type", "n_events").collect().toSet
      val batch = EventPipeline.windowCounts(Tables.events(spark, sf))
        .collect().toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming session windows equal the batch run") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventPipeline.sessionWindowCounts(in.toDF())
      .writeStream.format("memory").queryName("sw").outputMode("complete").start()
    try {
      in.addData(eventsData)
      q.processAllAvailable()
      val streamed = spark.table("sw").collect().map(_.toString).toSet
      val batch = EventPipeline.sessionWindowCounts(Tables.events(spark, sf))
        .collect().map(_.toString).toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming dedup drops replayed event_ids") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventPipeline.dedup(in.toDF())
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    try {
      val sample = eventsData.take(200)
      in.addData(sample)
      q.processAllAvailable()
      in.addData(sample.take(50)) // replay within the watermark
      q.processAllAvailable()
      assert(spark.table("dd").count() == 200)
      assert(spark.table("dd").select("event_id").distinct().count() == 200)
    } finally q.stop()
  }

  test("stateful sessionize matches batch sessionization for closed sessions") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventPipeline.sessionize(in.toDS())
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      in.addData(eventsData)
      q.processAllAvailable()
      val streamed = spark.table("sess")
        .select("user_id", "session_start", "session_end", "n_events")
        .collect().map(_.toString).toSet
      // batch oracle minus each user's final (still-open) session
      val batch = SparkEntry.queries("ev_sessionize")(spark, sf)
      val lastPerUser = batch.groupBy("user_id")
        .agg(max("session_num").as("session_num"))
      val closedBatch = batch.join(lastPerUser, Seq("user_id", "session_num"),
          "left_anti")
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"))
        .collect().map(_.toString).toSet
      assert(streamed == closedBatch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("event-time-timeout sessionization emits COMPLETE sessions once the watermark passes") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventPipeline.sessionizeTimeout(in.toDS())
      .writeStream.format("memory").queryName("sessto").outputMode("append").start()
    try {
      in.addData(eventsData)
      q.processAllAvailable()
      // a far-future sentinel (different user) advances the watermark past
      // every session's last+gap: idle sessions must now TIME OUT and emit
      // — the tail sessions plain sessionize never releases
      val maxTs = eventsData.map(_.ts.getTime).max
      val flush = new java.sql.Timestamp(maxTs + 7L * 24 * 3600 * 1000)
      in.addData(Seq(Ev(999999903L, flush, -1L, "sentinel", 0.0)))
      q.processAllAvailable()
      in.addData(Seq(Ev(999999904L, flush, -2L, "sentinel", 0.0)))
      q.processAllAvailable()
      val streamed = spark.table("sessto")
        .filter(col("user_id") >= 0)
        .select("user_id", "session_start", "session_end", "n_events")
        .collect().map(_.toString).toSet
      // equivalence against ALL batch sessions — including each user's
      // final one (the closed-only comparison sessionize is limited to)
      val batch = SparkEntry.queries("ev_sessionize")(spark, sf)
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"))
        .collect().map(_.toString).toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("transformWithState sessionization matches the batch sessions end-to-end") {
    // Spark 4's arbitrary-state API (typed handles + event-time timers);
    // requires the RocksDB provider — run under the tuned configuration
    implicit val sc = spark.sqlContext
    graft.streaming.StateStoreTuning.withTuned(spark) {
      val in = MemoryStream[Ev]
      val q = EventPipeline.sessionizeTws(in.toDS())
        .writeStream.format("memory").queryName("sesstws").outputMode("append").start()
      try {
        in.addData(eventsData)
        q.processAllAvailable()
        val maxTs = eventsData.map(_.ts.getTime).max
        val flush = new java.sql.Timestamp(maxTs + 7L * 24 * 3600 * 1000)
        in.addData(Seq(Ev(999999905L, flush, -1L, "sentinel", 0.0)))
        q.processAllAvailable()
        in.addData(Seq(Ev(999999906L, flush, -2L, "sentinel", 0.0)))
        q.processAllAvailable()
        val streamed = spark.table("sesstws")
          .filter(col("user_id") >= 0)
          .select("user_id", "session_start", "session_end", "n_events")
          .collect().map(_.toString).toSet
        val batch = SparkEntry.queries("ev_sessionize")(spark, sf)
          .select(col("user_id"), col("session_start"), col("session_end"),
            col("n_events"))
          .collect().map(_.toString).toSet
        assert(streamed == batch && streamed.nonEmpty)
      } finally q.stop()
    }
  }

  test("stream-stream interval join matches the batch join") {
    implicit val sc = spark.sqlContext
    val pIn = MemoryStream[Ev]
    val cIn = MemoryStream[Ev]
    val purchases = pIn.toDF().withWatermark("ts", "2 hours")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
    val clicks = cIn.toDF().withWatermark("ts", "2 hours")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val q = EventPipeline.clickAttribution(purchases, clicks)
      .writeStream.format("memory").queryName("ssj").outputMode("append").start()
    try {
      val all = eventsData
      pIn.addData(all.filter(_.event_type == "purchase"))
      cIn.addData(all.filter(_.event_type == "click"))
      q.processAllAvailable()
      val streamed = spark.table("ssj").count()
      val batch = SparkEntry.queries("stream_click_attrib")(spark, sf)
        .agg(sum("n_clicks")).collect()(0).getLong(0)
      assert(streamed == batch && streamed > 0)
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join releases unmatched purchases after watermark") {
    implicit val sc = spark.sqlContext
    val pIn = MemoryStream[Ev]
    val cIn = MemoryStream[Ev]
    val purchases = pIn.toDF().withWatermark("ts", "2 hours")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
    val clicks = cIn.toDF().withWatermark("ts", "2 hours")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val q = EventPipeline.clickAttributionOuter(purchases, clicks)
      .writeStream.format("memory").queryName("ssoj").outputMode("append").start()
    try {
      val all = eventsData
      pIn.addData(all.filter(_.event_type == "purchase"))
      cIn.addData(all.filter(_.event_type == "click"))
      q.processAllAvailable()
      // outer results for unmatched rows are held until the watermark
      // proves no match can arrive — advance it with a far-future sentinel
      val maxTs = all.map(_.ts.getTime).max
      val flushTs = new java.sql.Timestamp(maxTs + 7L * 24 * 3600 * 1000)
      pIn.addData(Seq(Ev(999999901L, flushTs, -1L, "sentinel", 0.0)))
      cIn.addData(Seq(Ev(999999902L, flushTs, -1L, "sentinel", 0.0)))
      q.processAllAvailable()
      val streamed = spark.table("ssoj").filter(col("user_id") =!= -1L)
        .collect().map(_.toString).toSet
      val ev = Tables.events(spark, sf)
      val batch = EventPipeline.clickAttributionOuter(
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("ts").as("purchase_ts")),
        ev.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts").as("c_ts")))
        .collect().map(_.toString).toSet
      assert(streamed == batch && streamed.nonEmpty)
      // and the outer semantics actually exercised: null-click rows exist
      assert(spark.table("ssoj").filter(col("c_ts").isNull &&
        col("user_id") =!= -1L).count() > 0)
    } finally q.stop()
  }

  test("stream-static enrichment matches the batch join") {
    implicit val sc = spark.sqlContext
    val dim = Tables.customer(spark, sf).select("c_custkey", "c_mktsegment")
    val in = MemoryStream[Ev]
    val q = EventPipeline.enrich(in.toDF(), dim)
      .writeStream.format("memory").queryName("enr").outputMode("append").start()
    try {
      in.addData(eventsData.take(500))
      q.processAllAvailable()
      val streamed = spark.table("enr").collect().map(_.toString).toSet
      val batch = EventPipeline.enrich(
        spark.createDataset(eventsData.take(500)).toDF(), dim)
        .collect().map(_.toString).toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("bucketed sink rewrites only the buckets a micro-batch touches") {
    implicit val sc = spark.sqlContext
    val target = java.nio.file.Files
      .createTempDirectory("graft_sink_b").resolve("t").toString

    def snapshot(): Map[String, String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory)
          f.listFiles.filterNot(_.getName.startsWith(".")).flatMap(walk).toSeq
        else Seq(f)
      val root = new java.io.File(target)
      if (!root.exists) Map.empty
      else walk(root).map { f =>
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        val md5 = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        f.getPath.stripPrefix(target) -> md5.map("%02x".format(_)).mkString
      }.toMap
    }

    val in = MemoryStream[Ev]
    val q = in.toDF().writeStream
      .foreachBatch(EventPipeline.mergeUpsertSink(target) _)
      .outputMode("append").start()
    try {
      val sample = eventsData.take(100)
      in.addData(sample)
      q.processAllAvailable()
      val before = snapshot()

      val one = sample.head
      val touchedBucket = spark.range(1)
        .select(pmod(xxhash64(lit(one.event_id)), lit(EventPipeline.SinkBuckets)))
        .head.getLong(0)
      in.addData(Seq(one)) // single-key micro-batch
      q.processAllAvailable()
      val after = snapshot()

      // untouched buckets: byte-identical generation dirs, same names (the
      // MANIFEST itself changes every commit — that's the design: one
      // mutable pointer, immutable data)
      def untouched(s: Map[String, String]) = s.filterNot { case (p, _) =>
        p.contains(s"/b$touchedBucket-") || p.contains("/MANIFEST")
      }
      assert(untouched(before) == untouched(after) && untouched(before).nonEmpty)
      // and the merge stayed idempotent
      val out = graft.sources.ManifestTable.readTable(spark, target)
      assert(out.count() == 100)
      assert(out.select("event_id").distinct().count() == 100)
    } finally q.stop()
  }

  test("stateful streaming runs on the RocksDB state store provider") {
    // the production state backend for large state (spillable, incremental
    // checkpoints) — the same watermarked agg must produce identical
    // results under it
    implicit val sc = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Ev]
      val q = EventPipeline.windowCounts(in.toDF())
        .writeStream.format("memory").queryName("rocks")
        .outputMode("complete").start()
      try {
        in.addData(eventsData)
        q.processAllAvailable()
        val streamed = spark.table("rocks").collect().toSet
        val batch = EventPipeline.windowCounts(Tables.events(spark, sf))
          .collect().toSet
        assert(streamed == batch && streamed.nonEmpty)
      } finally q.stop()
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("tuned RocksDB provider (changelog checkpointing, bounded memory) gives identical results") {
    // the production configuration for large state: per-batch changelog
    // uploads instead of full SST snapshots, and an off-heap memory cap
    // across all store instances — results must be bit-identical to the
    // default provider, and the stateful query must restart cleanly from
    // a changelog checkpoint (dedup state surviving the restart proves the
    // checkpoint actually restored)
    implicit val sc = spark.sqlContext
    graft.streaming.StateStoreTuning.withTuned(spark, maxMemoryMB = 256) {
      val base = java.nio.file.Files.createTempDirectory("graft_rocks_tuned")
      val ckpt = base.resolve("ckpt").toString
      val outDir = base.resolve("out").toString
      val in = MemoryStream[Ev]
      val sample = eventsData.take(200)
      // file sink, not memory: the memory sink refuses checkpoint recovery,
      // and the restart-from-changelog path is exactly what's under test
      def start() = EventPipeline.dedup(in.toDF())
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      val q1 = start()
      try {
        in.addData(sample)
        q1.processAllAvailable()
      } finally q1.stop()
      // restart from the changelog checkpoint; replay keys from the
      // NEWEST events — the oldest ones sit below the recovered watermark
      // and would be dropped as late whether or not state was restored,
      // proving nothing about the checkpoint
      val q2 = start()
      try {
        in.addData(sample.takeRight(80))
        q2.processAllAvailable()
        val out = spark.read.parquet(outDir)
        assert(out.count() == 200)
        assert(out.select("event_id").distinct().count() == 200)
      } finally q2.stop()
    }
  }

  test("Trigger.AvailableNow drains a file-source backlog and terminates") {
    // the batch-backfill mode: process everything currently landed, then
    // stop — no long-running query for a catch-up job
    val dir = java.nio.file.Files
      .createTempDirectory("graft_avnow").resolve("ev").toString
    spark.createDataset(eventsData).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = EventPipeline.windowCounts(stream)
      .writeStream.format("memory").queryName("avnow")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      assert(q.awaitTermination(120000), "AvailableNow query did not stop")
      val streamed = spark.table("avnow").collect().toSet
      val batch = EventPipeline.windowCounts(
        spark.createDataset(eventsData).toDF()).collect().toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("foreachBatch merge-upsert sink is idempotent under replay") {
    implicit val sc = spark.sqlContext
    val target = java.nio.file.Files
      .createTempDirectory("graft_sink").resolve("t").toString
    val in = MemoryStream[Ev]
    val q = in.toDF().writeStream
      .foreachBatch(EventPipeline.mergeUpsertSink(target) _)
      .outputMode("append").start()
    try {
      val sample = eventsData.take(100)
      in.addData(sample)
      q.processAllAvailable()
      in.addData(sample) // full replay
      q.processAllAvailable()
      val out = graft.sources.ManifestTable.readTable(spark, target)
      assert(out.count() == 100)
      assert(out.select("event_id").distinct().count() == 100)
    } finally q.stop()
  }

  test("manifest commit: a crash between data write and commit is invisible to readers") {
    import graft.sources.ManifestTable
    implicit val sc = spark.sqlContext
    val target = java.nio.file.Files
      .createTempDirectory("graft_sink_m").resolve("t").toString
    val root = new java.io.File(target)
    val sample = eventsData.take(100)

    // batch 0 commits normally through the sink
    EventPipeline.mergeUpsertSink(target)(
      spark.createDataset(sample).toDF(), 0L)
    val committed = ManifestTable.readTable(spark, target)
      .collect().map(_.toString).toSet
    assert(committed.size == 100)
    val manifestBytes = java.nio.file.Files.readAllBytes(
      new java.io.File(root, "MANIFEST").toPath).toSeq

    // simulate batch 1 crashing AFTER its data write but BEFORE the
    // manifest rename: exactly what a killed writer leaves behind —
    // orphan generation dirs under data/, untouched MANIFEST
    val extra = eventsData.slice(100, 150)
    spark.createDataset(extra).toDF()
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite")
      .parquet(new java.io.File(root, "data/t/b3-1").toString)

    // readers resolve through the manifest only: the crashed write does
    // not exist as far as the table is concerned
    assert(ManifestTable.readTable(spark, target)
      .collect().map(_.toString).toSet == committed)
    assert(java.nio.file.Files.readAllBytes(
      new java.io.File(root, "MANIFEST").toPath).toSeq == manifestBytes)

    // the streaming engine re-delivers batch 1 after restart; the re-run
    // commits atomically and GC removes the orphan from the crashed attempt
    EventPipeline.mergeUpsertSink(target)(
      spark.createDataset(sample ++ extra).toDF(), 1L)
    val after = ManifestTable.readTable(spark, target)
    assert(after.count() == 150)
    assert(after.select("event_id").distinct().count() == 150)
    // every data dir on disk is referenced by a RETAINED snapshot (the
    // crashed attempt's orphan was overwritten by the re-run; superseded
    // generations stay within the retention window for time travel)
    val m = ManifestTable.read(root).get
    val retained = (math.max(m.version - ManifestTable.RetainVersions + 1, 0)
      to m.version)
      .flatMap(v => ManifestTable.readVersionBuckets(root, v)).toSet
    val onDisk = new java.io.File(root, "data/t").listFiles.map(_.getName).toSet
    assert(onDisk == retained.map(_.stripPrefix("data/t/")))
    assert(m.allPaths.toSet.subsetOf(retained))

    // and a replayed, already-committed batch id is an exact no-op
    val v = m.version
    EventPipeline.mergeUpsertSink(target)(
      spark.createDataset(extra).toDF(), 1L)
    assert(ManifestTable.read(root).get.version == v)

    // an EMPTY micro-batch (Spark delivers them) must not commit a new
    // version — a zero-bucket manifest would break every reader
    EventPipeline.mergeUpsertSink(target)(
      spark.createDataset(Seq.empty[Ev]).toDF(), 2L)
    assert(ManifestTable.read(root).get.version == v)
    assert(ManifestTable.readTable(spark, target).count() == 150)
  }

  test("manifest point lookup prunes to covering buckets and matches a full scan") {
    import graft.sources.ManifestTable
    implicit val sc = spark.sqlContext
    val target = java.nio.file.Files
      .createTempDirectory("graft_sink_pl").resolve("t").toString
    val sample = eventsData.take(200)
    EventPipeline.mergeUpsertSink(target)(
      spark.createDataset(sample).toDF(), 0L)

    val keys = sample.take(5).map(_.event_id)
    // the lookup resolves strictly fewer buckets than the table holds —
    // the manifest-level file skipping a point read is for
    val covering = ManifestTable.bucketsForKeys(spark, keys,
      EventPipeline.SinkBuckets)
    assert(covering.size < EventPipeline.SinkBuckets && covering.nonEmpty)

    val viaLookup = ManifestTable.readTableForKeys(spark, target,
      "event_id", keys, EventPipeline.SinkBuckets)
      .collect().map(_.toString).toSet
    val viaScan = ManifestTable.readTable(spark, target)
      .filter(col("event_id").isin(keys: _*))
      .collect().map(_.toString).toSet
    assert(viaLookup == viaScan && viaLookup.size == keys.length)
  }

  test("manifest time travel: retained snapshots read back exactly, evicted ones error") {
    import graft.sources.ManifestTable
    implicit val sc = spark.sqlContext
    val target = java.nio.file.Files
      .createTempDirectory("graft_sink_tt").resolve("t").toString
    val root = new java.io.File(target)

    // five batches of 40 rows each → versions 1..5
    val snapshots = (0 until 5).map { b =>
      val slice = eventsData.slice(b * 40, b * 40 + 40)
      EventPipeline.mergeUpsertSink(target)(
        spark.createDataset(slice).toDF(), b.toLong)
      ManifestTable.readTable(spark, target).count()
    }
    assert(snapshots == Seq(40L, 80L, 120L, 160L, 200L))
    val cur = ManifestTable.read(root).get.version
    assert(cur == 5L)

    // within the retention window: each retained version reads back the
    // exact row count its commit published
    val oldest = cur - ManifestTable.RetainVersions + 1
    (oldest to cur).foreach { v =>
      assert(ManifestTable.readTable(spark, target, Some(v)).count()
        == snapshots(v.toInt - 1), s"version $v")
    }

    // past the window: clean error, and the evicted versions' superseded
    // generation dirs are vacuumed (no unreferenced data dirs on disk)
    intercept[java.io.FileNotFoundException] {
      ManifestTable.readTable(spark, target, Some(oldest - 1))
    }
    val live = (oldest to cur)
      .flatMap(ManifestTable.readVersionBuckets(root, _))
      .map(_.stripPrefix("data/t/")).toSet
    val onDisk = new java.io.File(root, "data/t").listFiles.map(_.getName).toSet
    assert(onDisk == live)
  }

  test("replay detection keys on (queryId, batchId): a fresh checkpoint's reset ids are not skipped") {
    import graft.sources.ManifestTable
    implicit val sc = spark.sqlContext
    val target = java.nio.file.Files
      .createTempDirectory("graft_sink_qid").resolve("t").toString
    val root = new java.io.File(target)
    val sample = eventsData.take(120)
    val key = "sql.streaming.queryId"

    // query A commits batches 0 and 1
    spark.sparkContext.setLocalProperty(key, "query-A")
    try {
      EventPipeline.mergeUpsertSink(target)(
        spark.createDataset(sample.take(60)).toDF(), 0L)
      EventPipeline.mergeUpsertSink(target)(
        spark.createDataset(sample.slice(60, 100)).toDF(), 1L)
      assert(ManifestTable.readTable(spark, target).count() == 100)

      // a replayed batch id of the SAME query is an exact no-op
      val v = ManifestTable.read(root).get.version
      EventPipeline.mergeUpsertSink(target)(
        spark.createDataset(sample.take(60)).toDF(), 1L)
      assert(ManifestTable.read(root).get.version == v)

      // query B (fresh checkpoint: ids reset to 0) must NOT be skipped —
      // its batch 0 carries NEW rows that batchId<=lastBatch alone would
      // silently drop
      spark.sparkContext.setLocalProperty(key, "query-B")
      EventPipeline.mergeUpsertSink(target)(
        spark.createDataset(sample.slice(100, 120)).toDF(), 0L)
      val out = ManifestTable.readTable(spark, target)
      assert(out.count() == 120)
      assert(out.select("event_id").distinct().count() == 120)
      // and the manifest adopted the new identity, so query B's OWN
      // replays now no-op
      val m = ManifestTable.read(root).get
      assert(m.queryId == "query-B" && m.lastBatch == 0L)
      EventPipeline.mergeUpsertSink(target)(
        spark.createDataset(sample.slice(100, 120)).toDF(), 0L)
      assert(ManifestTable.read(root).get.version == m.version)
    } finally spark.sparkContext.setLocalProperty(key, null)
  }

  test("writeStream.format(\"graft\") sink: per-batch atomic upsert commits, replay-idempotent across a checkpointed restart") {
    implicit val sc = spark.sqlContext
    import graft.sources.ManifestTable
    import java.io.File
    val base = java.nio.file.Files.createTempDirectory("graft_ssink")
    val target = base.resolve("t").toString
    val ckpt = base.resolve("ckpt").toString

    def startQuery(in: MemoryStream[(Long, String)]) =
      in.toDF().toDF("id", "name")
        .writeStream.format("graft")
        .option("path", target).option("mergeKeys", "id")
        .option("buckets", "4").option("checkpointLocation", ckpt)
        .start()

    val in = MemoryStream[(Long, String)]
    val q = startQuery(in)
    try {
      in.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      assert(ManifestTable.readTable(spark, target).count() == 2L)
      // second micro-batch upserts: id=2 updates, id=3 inserts
      in.addData((2L, "B"), (3L, "c"))
      q.processAllAvailable()
      val afterTwo = spark.read.format("graft").option("path", target).load()
        .sort("id").as[(Long, String)].collect().toSeq
      assert(afterTwo == Seq((1L, "a"), (2L, "B"), (3L, "c")))
    } finally q.stop()

    val committedVersion = ManifestTable.read(new File(target)).get.version

    // the sink's commit identity is checkpoint-stable, so a replayed batch
    // id is an exact no-op: re-delivering batch 1 by hand (what a crash
    // between sink commit and engine commit-log write causes on restart)
    // must change NOTHING — no new version, no re-merged rows
    ManifestTable.mergeBatch(new File(target), s"graft-sink:$ckpt", 1L,
      Seq(ManifestTable.TableBatch(ManifestTable.DefaultTable,
        Seq((2L, "REPLAYED"), (3L, "REPLAYED")).toDF("id", "name"),
        Seq("id"), 4)))
    assert(ManifestTable.read(new File(target)).get.version == committedVersion)

    // a restart from the same checkpoint resumes the same identity and
    // keeps merging new batches into the same table
    val q2 = startQuery(in)
    try {
      in.addData((3L, "C"), (4L, "d"))
      q2.processAllAvailable()
      val finalRows = spark.read.format("graft").option("path", target).load()
        .sort("id").as[(Long, String)].collect().toSeq
      assert(finalRows == Seq((1L, "a"), (2L, "B"), (3L, "C"), (4L, "d")))
      assert(ManifestTable.read(new File(target)).get.version > committedVersion)
    } finally q2.stop()
  }

  test("writeStream.format(\"graft\") in Complete mode overwrites the table with each batch's full aggregate") {
    implicit val sc = spark.sqlContext
    import graft.sources.ManifestTable
    val base = java.nio.file.Files.createTempDirectory("graft_ssinkc")
    val target = base.resolve("t").toString
    val in = MemoryStream[(String, Long)]
    val q = in.toDF().toDF("k", "v")
      .groupBy(col("k")).agg(sum(col("v")).as("total"))
      .writeStream.format("graft").outputMode("complete")
      .option("path", target).option("mergeKeys", "k")
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .start()
    try {
      in.addData(("x", 1L), ("x", 2L), ("y", 5L))
      q.processAllAvailable()
      assert(ManifestTable.readTable(spark, target).sort("k")
        .as[(String, Long)].collect().toSeq == Seq(("x", 3L), ("y", 5L)))
      in.addData(("y", 1L), ("z", 9L))
      q.processAllAvailable()
      // Complete mode: the table IS the latest full result, nothing stale
      assert(ManifestTable.readTable(spark, target).sort("k")
        .as[(String, Long)].collect().toSeq ==
        Seq(("x", 3L), ("y", 6L), ("z", 9L)))
    } finally q.stop()
  }
}
