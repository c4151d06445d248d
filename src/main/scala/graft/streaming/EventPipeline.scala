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

  /** Streaming dedup on the event key; the watermark lets Spark evict seen
    * keys once they can no longer recur.
    */
  def dedup(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour").dropDuplicates("event_id")

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

  /** Idempotent merge-upsert sink: each micro-batch merges into the parquet
    * target keyed on event_id, latest-wins — replays are no-ops.
    */
  def mergeUpsertSink(target: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val incoming = batch.select("event_id", "ts", "user_id", "event_type", "value")
    val merged =
      if (new java.io.File(target).exists) {
        val existing = spark.read.parquet(target)
        graft.ingest.MergeUpsert.upsert(existing, incoming, Seq("event_id"))
          .select("event_id", "ts", "user_id", "event_type", "value")
      } else incoming
    val tmp = target + "_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    val t = new java.io.File(target)
    delete(t)
    new java.io.File(tmp).renameTo(t)
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

    "stream_window_counts" -> Q(
      (s, d) => windowCounts(Tables.events(s, d))
        .orderBy("window_start", "event_type"),
      """SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start,
        |  event_type, count(*) AS n_events
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  )
}
