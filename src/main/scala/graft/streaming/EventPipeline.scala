package graft.streaming

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY §2.E). Each transform is written
  * against a plain DataFrame/Dataset so the SAME code runs in batch (where
  * `withWatermark` is a no-op — that batch run is the DuckDB-oracled query)
  * and under `readStream` (exercised in StreamingSpec via MemoryStream).
  *
  * Scale notes: watermarks bound all state; dedup keys on the natural event
  * key only; sessionization state is O(1) per active user (aggregates, not
  * buffered events); the foreachBatch sink applies the idempotent
  * merge-upsert so replayed micro-batches cannot double-write.
  */
object EventPipeline {

  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

  case class SessionState(start: Long, last: Long, n: Long)

  case class Session(user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Long)

  val GapMicros: Long = 30L * 60 * 1000000

  /** Timestamp ↔ micros without losing the sub-millisecond part
    * (`getTime` alone is millis; the rest lives in getNanos).
    */
  private def toMicros(ts: java.sql.Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000

  private def fromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Watermarked tumbling-window counts — the flagship streaming agg. */
  def windowCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"))

  /** Native session windows (30-minute gap): the built-in merging-window
    * aggregate — in streaming, state merges adjacent windows and the
    * watermark closes + evicts finished sessions; in batch the same plan is
    * one shuffle on user_id. `window.end` is last event time + gap by
    * session-window semantics (end-exclusive).
    */
  def sessionWindowCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("total_value"))

  /** Streaming dedup on the event key. dropDuplicatesWithinWatermark (not
    * plain dropDuplicates("event_id"), whose key subset excludes the event
    * time and therefore never ages out) lets the 1-hour watermark actually
    * evict seen keys — bounded state at any stream length.
    */
  def dedup(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Gap-based stateful sessionization via flatMapGroupsWithState: state per
    * user is (start, last, count) — constant size. Out-of-order arrivals
    * within a micro-batch are handled by sorting the batch's slice; closed
    * sessions are emitted as soon as a gap-crossing event arrives.
    */
  def sessionize(events: Dataset[Ev]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(e => (toMicros(e.ts), e.event_id))
          var st = state.getOption.orNull
          val closed = Seq.newBuilder[Session]
          sorted.foreach { e =>
            val t = toMicros(e.ts)
            if (st == null) st = SessionState(t, t, 1)
            else if (t - st.last > GapMicros) {
              closed += Session(userId, fromMicros(st.start), fromMicros(st.last), st.n)
              st = SessionState(t, t, 1)
            } else st = SessionState(st.start, math.max(st.last, t), st.n + 1)
          }
          if (st != null) state.update(st)
          closed.result().iterator
      }
  }

  /** Stream-stream interval join: purchases ⋈ clicks by the same user
    * within the preceding attribution window. In streaming, the watermarks
    * + the time-range condition bound both sides' state (Spark evicts rows
    * older than purchase_ts - window); in batch the same plan is a
    * sort-merge equi-join on user_id with a range residual.
    */
  def clickAttribution(purchases: DataFrame, clicks: DataFrame): DataFrame =
    purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") <= col("purchase_ts") &&
        col("c_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"), col("c_ts"))

  /** LEFT OUTER stream-stream interval join: purchases with NO click in
    * the window still emit, with nulls — in streaming, the unmatched side
    * is held until the watermark proves no match can still arrive, then
    * released with nulls (the semantics that make outer stream joins
    * watermark-mandatory). Batch: an ordinary left outer join.
    */
  def clickAttributionOuter(purchases: DataFrame, clicks: DataFrame): DataFrame =
    purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") <= col("purchase_ts") &&
        col("c_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"),
      "leftOuter")
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"), col("c_ts"))

  /** Stream-static enrichment join: every event looks up its user's static
    * profile row. The static side broadcasts into each micro-batch — a
    * stateless per-batch hash join, the canonical dimension-enrichment
    * shape (no streaming state, no watermark needed on the dim side).
    */
  def enrich(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), col("user_id") === col("c_custkey"), "left")
      .select(col("event_id"), col("ts"), col("event_type"),
        coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"))

  val SinkBuckets = 8

  /** Idempotent BUCKETED merge-upsert sink: the target is hash-bucketed on
    * the merge key into `bucket=N` partition directories, and each
    * micro-batch rewrites ONLY the buckets its keys touch — per-batch cost
    * scales with batch-key spread, never with total target size (the
    * whole-target rewrite was the scale-killer in the naive formulation).
    * Replays merge to the same rows → no-ops.
    *
    * Bucket swaps are crash-safe on a POSIX FS: write hidden tmp → rename
    * live aside → rename tmp live → drop old (rename results checked;
    * dot-prefixed dirs are invisible to parquet readers, so a reader never
    * sees a half-written bucket). This java.io.File orchestration is the
    * local-FS test-grade analogue of a Delta/Iceberg MERGE commit — on a
    * cluster the same bucket layout commits through the table format's
    * atomic metadata swap instead of directory renames.
    */
  def mergeUpsertSink(target: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val incoming = batch
      .select("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("_bucket", pmod(xxhash64(col("event_id")), lit(SinkBuckets)))
      .persist()
    try {
      val touched = incoming.select("_bucket").distinct()
        .collect().map(_.getLong(0))
      touched.foreach { b =>
        val dir = new java.io.File(target, s"bucket=$b")
        // recover an interrupted swap BEFORE deciding whether the bucket
        // is fresh: a crash between set-aside and promote leaves live
        // missing with .old holding the only copy — treating that as a
        // fresh bucket would merge against nothing and the next swapIn
        // would delete the .old backup, silently losing the prior rows
        recoverSwap(dir)
        val inc = incoming.filter(col("_bucket") === b).drop("_bucket")
        val merged =
          if (dir.exists) {
            graft.ingest.MergeUpsert
              .upsert(spark.read.parquet(dir.toString), inc, Seq("event_id"))
              .select("event_id", "ts", "user_id", "event_type", "value")
          } else inc
        val tmp = new java.io.File(target, s".tmp_bucket_$b")
        merged.write.mode("overwrite").parquet(tmp.toString)
        swapIn(dir, tmp)
      }
    } finally { incoming.unpersist(); () }
  }

  /** tmp → live with the previous live renamed aside first; every rename
    * checked so a failure surfaces instead of silently losing the table.
    */
  /** Undo a swap that crashed between set-aside and promote: live missing
    * but .old present → restore .old (and drop any half-written .tmp).
    * A crash after promote (live AND .old present) just leaves a stale
    * backup; swapIn clears it on the next write.
    */
  private def recoverSwap(live: java.io.File): Unit = {
    val old = new java.io.File(live.getParentFile, "." + live.getName + ".old")
    if (!live.exists && old.exists) {
      val tmp = new java.io.File(live.getParentFile, ".tmp_" + live.getName.replace('=', '_'))
      if (tmp.exists) delete(tmp)
      if (!old.renameTo(live))
        throw new java.io.IOException(s"cannot restore $old to $live")
    }
  }

  private def swapIn(live: java.io.File, tmp: java.io.File): Unit = {
    val old = new java.io.File(live.getParentFile, "." + live.getName + ".old")
    if (old.exists) delete(old)
    if (live.exists && !live.renameTo(old))
      throw new java.io.IOException(s"cannot set aside $live")
    if (!tmp.renameTo(live))
      throw new java.io.IOException(s"cannot promote $tmp to $live")
    delete(old)
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles.foreach(delete)
    f.delete(): Unit
  }

  val defs: Map[String, Q] = Map(
    // Batch-equivalent of the watermarked streaming agg (withWatermark is a
    // no-op in batch): the driver oracles it; StreamingSpec runs the same
    // transform under MemoryStream and checks equivalence.
    // Batch-equivalent of the stream-stream interval join, aggregated to
    // one row per purchase (attributed click count + latest click).
    "stream_click_attrib" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("ts").as("purchase_ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
        clickAttribution(purchases, clicks)
          .groupBy("purchase_id", "user_id", "purchase_ts")
          .agg(count(lit(1)).as("n_clicks"), max(col("c_ts")).as("last_click_ts"))
          .orderBy("purchase_id")
      },
      """SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
        |  count(*) AS n_clicks, max(c.ts) AS last_click_ts
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id AND c.ts <= p.ts
        |  AND c.ts >= p.ts - INTERVAL 1 HOUR
        |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
        |GROUP BY 1, 2, 3 ORDER BY purchase_id""".stripMargin),

    // Batch-equivalent of the LEFT OUTER stream-stream interval join:
    // every purchase emits — unattributed ones with zero clicks. The
    // streaming path (null emission on watermark advance) runs in
    // StreamingSpec.
    "stream_attrib_outer" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("ts").as("purchase_ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
        clickAttributionOuter(purchases, clicks)
          .groupBy("purchase_id", "user_id", "purchase_ts")
          .agg(count(col("c_ts")).as("n_clicks"),
            max(col("c_ts")).as("last_click_ts"))
          .orderBy("purchase_id")
      },
      """SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
        |  count(c.ts) AS n_clicks, max(c.ts) AS last_click_ts
        |FROM events p LEFT JOIN events c
        |  ON p.user_id = c.user_id AND c.event_type = 'click'
        |  AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
        |WHERE p.event_type = 'purchase'
        |GROUP BY 1, 2, 3 ORDER BY purchase_id""".stripMargin),

    // Batch-equivalent of the stream-static enrichment, aggregated to
    // per-segment event-type counts (the streaming path — MemoryStream +
    // broadcast dim per micro-batch — runs in StreamingSpec).
    "stream_enrich" -> Q(
      (s, d) => {
        val dim = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
        enrich(Tables.events(s, d), dim)
          .groupBy("segment", "event_type")
          .agg(count(lit(1)).as("n_events"))
          .orderBy("segment", "event_type")
      },
      """SELECT coalesce(c.c_mktsegment, 'UNKNOWN') AS segment,
        |  e.event_type, count(*) AS n_events
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // Batch-equivalent of the native session-window aggregate. The oracle
    // reconstructs session-window semantics relationally: new session when
    // the gap is >= 30 min (session windows are end-exclusive), session_end
    // = last event + gap. StreamingSpec runs the same transform under
    // MemoryStream and checks equivalence.
    "stream_session_window" -> Q(
      (s, d) => sessionWindowCounts(Tables.events(s, d))
        .orderBy("user_id", "session_start"),
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, cast(value as decimal(18,2)) AS v,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
        |         OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sn
        |  FROM flagged)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  count(*) AS n_events, cast(sum(v) as double) AS total_value
        |FROM sess GROUP BY user_id, sn
        |ORDER BY user_id, session_start""".stripMargin),

    "stream_window_counts" -> Q(
      (s, d) => windowCounts(Tables.events(s, d))
        .orderBy("window_start", "event_type"),
      """SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start,
        |  event_type, count(*) AS n_events
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  )
}
