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

  /** The gap-session fold ALL three sessionization variants share
    * (flatMapGroupsWithState with and without timeout, and the
    * transformWithState processor): sort the batch slice, close a session
    * on every gap crossing, extend otherwise. One copy — a future change
    * to the gap rule cannot diverge the variants, whose specs each assert
    * equivalence with the batch formulation.
    */
  private def foldSessions(userId: Long, evs: Seq[Ev],
      initial: SessionState): (Seq[Session], SessionState) = {
    val sorted = evs.sortBy(e => (toMicros(e.ts), e.event_id))
    var st = initial
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      val t = toMicros(e.ts)
      if (st == null) st = SessionState(t, t, 1)
      else if (t - st.last > GapMicros) {
        closed += Session(userId, fromMicros(st.start), fromMicros(st.last), st.n)
        st = SessionState(t, t, 1)
      } else st = SessionState(st.start, math.max(st.last, t), st.n + 1)
    }
    (closed.result(), st)
  }

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
          val (closed, st) = foldSessions(userId, evs.toSeq, state.getOption.orNull)
          if (st != null) state.update(st)
          closed.iterator
      }
  }

  /** Gap-sessionization with EVENT-TIME TIMEOUT — closes the gap
    * [[sessionize]] leaves: a user's LAST session only emits there when a
    * later event from the same user arrives, so idle/tail sessions hang in
    * state forever. Here every state update arms a timeout at
    * last-event-time + gap; when the watermark passes it, Spark invokes
    * the function with hasTimedOut=true, the session emits, and the state
    * is removed — bounded state AND complete output, the production
    * sessionization contract. Input must carry a watermark (the timeout
    * clock IS the watermark).
    */
  def sessionizeTimeout(events: Dataset[Ev]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator(Session(userId, fromMicros(st.start), fromMicros(st.last), st.n))
          } else {
            val (closed, st) = foldSessions(userId, evs.toSeq, state.getOption.orNull)
            if (st != null) {
              state.update(st)
              // arm the gap timeout; must stay strictly above the current
              // watermark (late batches can arrive with last+gap already
              // passed — fire on the very next trigger, not never). The
              // +1 rounds the micros→ms truncation UP so the timer can't
              // fire before the gap has fully elapsed — an exactly-at-gap
              // event extends the session (closing needs t-last > gap), so
              // firing a sub-ms early could close what that event extends,
              // and must match SessionizeProcessor's rounding (the two
              // variants' specs assert equivalence on the same oracle).
              val fireAt = (st.last + GapMicros) / 1000 + 1
              state.setTimeoutTimestamp(
                math.max(fireAt, state.getCurrentWatermarkMs + 1))
            }
            closed.iterator
          }
      }
  }

  /** The same timeout sessionization on `transformWithState` — Spark 4's
    * arbitrary-state API (typed state handles + first-class event-time
    * timers on the RocksDB provider, the successor to
    * flatMapGroupsWithState). The previously-registered expiry is kept in
    * its own ValueState so each state update DELETES the superseded timer
    * before arming the new one — without that, a continuously-active key
    * accretes one pending timer per micro-batch in the timer column
    * family until the watermark catches up. A staleness check on expiry
    * stays as the backstop.
    */
  class SessionizeProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Ev, Session] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var state: ValueState[SessionState] = _
    @transient private var armed: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      state = getHandle.getValueState[SessionState]("session",
        org.apache.spark.sql.Encoders.product[SessionState], TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        tv: TimerValues): Iterator[Session] = {
      val prev = if (state.exists()) state.get() else null
      val (closed, st) = foldSessions(key, rows.toSeq, prev)
      if (st != null) {
        state.update(st)
        val fireAt = math.max((st.last + GapMicros) / 1000 + 1,
          tv.getCurrentWatermarkInMs + 1)
        if (armed.exists() && armed.get() != fireAt)
          getHandle.deleteTimer(armed.get())
        getHandle.registerTimer(fireAt)
        armed.update(fireAt)
      }
      closed.iterator
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[Session] = {
      if (state.exists()) {
        val st = state.get()
        // staleness backstop: only close when the session is REALLY idle
        // past the gap under the current watermark
        if (tv.getCurrentWatermarkInMs >= (st.last + GapMicros) / 1000) {
          state.clear()
          armed.clear()
          Iterator(Session(key, fromMicros(st.start), fromMicros(st.last), st.n))
        } else {
          // declined to close: the fired timer is gone and `armed` points
          // at it — RE-ARM at the session's real expiry, else the session
          // only ever closes if new input arrives for this key (unbounded
          // state + a missing emission, the exact failure timeouts exist
          // to prevent)
          val fireAt = math.max((st.last + GapMicros) / 1000 + 1,
            tv.getCurrentWatermarkInMs + 1)
          getHandle.registerTimer(fireAt)
          armed.update(fireAt)
          Iterator.empty
        }
      } else Iterator.empty
    }
  }

  def sessionizeTws(events: Dataset[Ev]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .transformWithState(new SessionizeProcessor,
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append(),
        org.apache.spark.sql.Encoders.product[Session])
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

  /** The streaming query identity replay detection keys on, read from the
    * Spark-set thread-local the stream execution thread carries (the id
    * persisted in the checkpoint — stable across restarts of the SAME
    * checkpoint, fresh when the checkpoint is fresh). Batch callers (no
    * streaming thread) share the constant "batch" identity.
    */
  def currentQueryId(spark: SparkSession): String =
    Option(spark.sparkContext.getLocalProperty("sql.streaming.queryId"))
      .getOrElse("batch")

  /** Idempotent BUCKETED merge-upsert sink over a [[graft.sources.ManifestTable]]:
    * the target is hash-bucketed on the merge key, and each micro-batch
    * rewrites ONLY the buckets its keys touch — per-batch cost scales with
    * batch-key spread, never with total target size (the whole-target
    * rewrite was the scale-killer in the naive formulation).
    *
    * Commit protocol (two-phase, the Delta/Iceberg shape with zero deps):
    * merged bucket data is written to NEW immutable generation dirs that no
    * reader can resolve, then one manifest file is atomically replaced to
    * publish them all at once. A crash anywhere before the manifest rename
    * leaves the previously-committed table fully intact — readers go
    * through [[graft.sources.ManifestTable.readTable]] and can never
    * observe a partial batch. Replays are detected on (queryId, batchId) —
    * batch ids alone are only stable per checkpoint — and skipped as exact
    * no-ops; even a same-data replay under a NEW query id merges to
    * identical rows because the upsert keys on event_id. Bucket stats on
    * ts/event_id are recorded for manifest-level range skipping.
    */
  def mergeUpsertSink(target: String)(batch: DataFrame, batchId: Long): Unit = {
    import graft.sources.ManifestTable
    ManifestTable.mergeBatch(new java.io.File(target),
      currentQueryId(batch.sparkSession), batchId,
      Seq(ManifestTable.TableBatch(ManifestTable.DefaultTable,
        batch.select("event_id", "ts", "user_id", "event_type", "value"),
        Seq("event_id"), SinkBuckets, statsCols = Seq("ts", "event_id"))))
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
