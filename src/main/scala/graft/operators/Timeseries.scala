package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Events / time-series operators (SURVEY §2.C).
  *
  * Scale notes (100 TB):
  *   - Every operator here shuffles AT MOST ONCE, on `user_id` (high
  *     cardinality in production) or on the group key; windows sort within
  *     partitions only — no global sort.
  *   - The as-of join uses the union-sort-window formulation: one shuffle of
  *     both streams on the key, then `last(..., ignoreNulls)` over the
  *     event-time order. No O(n·m) range cross-join, no broadcast of a fact.
  *   - Measures aggregate in exact decimal (order-independent under any
  *     partitioning) and are emitted as double for a uniform cross-engine
  *     sort dtype.
  */
object Timeseries {

  private def ev(s: SparkSession, d: String): DataFrame = Tables.events(s, d)

  private val valDec: Column = col("value").cast("decimal(18,2)")

  val defs: Map[String, Q] = Map(
    // Tumbling 1-hour event-time windows (streaming-equivalent batch form:
    // the same groupBy(window(...)) runs under readStream + watermark).
    "ev_window_agg" -> Q(
      (s, d) => ev(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(valDec).cast("double").as("total_value"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n_events"), col("total_value"))
        .orderBy("window_start", "event_type"),
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS n_events,
        |  cast(sum(cast(value as decimal(18,2))) as double) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // Gap-based sessionization: lag + cumulative session flag — one shuffle
    // on user_id, both windows share the same partitioning and sort.
    "ev_sessionize" -> Q(
      (s, d) => {
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val gapUs = 30L * 60 * 1000000
        val flagged = ev(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), valDec.as("v"))
          .withColumn("new_sess",
            when(unix_micros(col("ts")) -
              lag(unix_micros(col("ts")), 1).over(byUser) > gapUs, 1)
              .when(lag(col("ts"), 1).over(byUser).isNull, 1).otherwise(0))
          .withColumn("session_num",
            sum(col("new_sess")).over(byUser.rowsBetween(Window.unboundedPreceding, 0))
              .cast("long"))
        flagged.groupBy("user_id", "session_num")
          .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
            count(lit(1)).as("n_events"),
            sum(col("v")).cast("double").as("total_value"))
          .orderBy("user_id", "session_num")
      },
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, cast(value as decimal(18,2)) AS v,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT *, cast(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) as bigint) AS session_num
        |  FROM flagged)
        |SELECT user_id, session_num, min(ts) AS session_start,
        |  max(ts) AS session_end, count(*) AS n_events,
        |  cast(sum(v) as double) AS total_value
        |FROM sess GROUP BY user_id, session_num
        |ORDER BY user_id, session_num""".stripMargin),

    // Latest-event-per-key survivorship — the streaming-dedup batch form.
    "ev_dedup_latest" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id", "event_type")
          .orderBy(col("ts").desc, col("event_id").desc)
        ev(s, d)
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
            valDec.cast("double").as("value"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
          .orderBy("user_id", "event_type")
      },
      """SELECT user_id, event_type, ts, event_id,
        |  cast(cast(value as decimal(18,2)) as double) AS value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin),

    // Event-type transition matrix (first-order Markov over each user's
    // event sequence): one lag window per user (single hash shuffle on the
    // high-cardinality user key), then a count aggregate over the tiny
    // (from,to) type grid and a per-from normalization — the
    // next-event-prediction / funnel-discovery primitive. At 100 TB the
    // per-user window dominates and partitions by user; the matrix itself
    // is type²-sized regardless of corpus.
    "ev_transition_matrix" -> Q(
      (s, d) => {
        val seq = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
        val tot = Window.partitionBy("from_type")
        ev(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
          .withColumn("to_type", lead("event_type", 1).over(seq))
          .filter(col("to_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("prob",
            round(col("n").cast("double") / sum("n").over(tot), 6))
          .orderBy("from_type", "to_type")
      },
      """WITH seq AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |m AS (
        |  SELECT from_type, to_type, count(*) AS n FROM seq
        |  WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  round(cast(n as double) /
        |    sum(n) OVER (PARTITION BY from_type), 6) AS prob
        |FROM m ORDER BY from_type, to_type""".stripMargin),

    // As-of join: for each purchase, the most recent click at ts' <= ts by
    // the same user. Union-sort-window: clicks and purchases interleave in
    // one event-time order per user; a running last(click_ts) answers the
    // as-of lookup. Clicks sort before purchases on ts ties (inclusive <=).
    "ev_asof_join" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("is_p"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, 0)
        ev(s, d)
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("user_id"), col("ts"), col("event_id"),
            (col("event_type") === "purchase").cast("int").as("is_p"))
          .withColumn("last_click_ts",
            last(when(col("is_p") === 0, col("ts")), ignoreNulls = true).over(w))
          .filter(col("is_p") === 1)
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("ts").as("purchase_ts"), col("last_click_ts"))
          .orderBy("purchase_id")
      },
      """WITH u AS (
        |  SELECT user_id, ts, event_id,
        |    cast(event_type = 'purchase' as int) AS is_p
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |r AS (
        |  SELECT *, last_value(CASE WHEN is_p = 0 THEN ts END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, is_p, event_id
        |          ROWS UNBOUNDED PRECEDING) AS last_click_ts
        |  FROM u)
        |SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
        |  last_click_ts
        |FROM r WHERE is_p = 1 ORDER BY purchase_id""".stripMargin),

    // The SAME as-of semantics through the custom whole-operator path
    // (graft.plans.AsOfJoinPlan: logical node + strategy + sort-merge
    // physical exec), hash-checked against the identical DuckDB oracle as
    // the window formulation above.
    "ev_asof_custom" -> Q(
      (s, d) => {
        val purchases = ev(s, d).filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("ts").as("purchase_ts"))
        val clicks = ev(s, d).filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts").as("last_click_ts"))
        graft.plans.AsOfJoin(purchases, clicks,
          purchases("user_id"), clicks("c_user"),
          purchases("purchase_ts"), clicks("last_click_ts"))
          .select("purchase_id", "user_id", "purchase_ts", "last_click_ts")
          .orderBy("purchase_id")
      },
      """WITH u AS (
        |  SELECT user_id, ts, event_id,
        |    cast(event_type = 'purchase' as int) AS is_p
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |r AS (
        |  SELECT *, last_value(CASE WHEN is_p = 0 THEN ts END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, is_p, event_id
        |          ROWS UNBOUNDED PRECEDING) AS last_click_ts
        |  FROM u)
        |SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
        |  last_click_ts
        |FROM r WHERE is_p = 1 ORDER BY purchase_id""".stripMargin),

    // Nearest-in-time as-of variant: each purchase matches the click
    // minimizing |Δt| within ±1 hour (ties → the earlier click). Same
    // union-sort-window shape as the backward as-of join — one shuffle on
    // user_id — with a second, forward-looking window over the SAME sort;
    // the nearest pick is a row-local comparison of the two candidates.
    "ev_asof_nearest" -> Q(
      (s, d) => {
        val order = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("is_p"), col("event_id"))
        val back = order.rowsBetween(Window.unboundedPreceding, 0)
        val fwd = order.rowsBetween(0, Window.unboundedFollowing)
        val hourUs = 3600000000L
        val u = ev(s, d)
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("user_id"), col("ts"), col("event_id"),
            (col("event_type") === "purchase").cast("int").as("is_p"))
          .withColumn("t", unix_micros(col("ts")))
          .withColumn("prev_click",
            last(when(col("is_p") === 0, col("t")), ignoreNulls = true)
              .over(back))
          .withColumn("next_click",
            first(when(col("is_p") === 0, col("t")), ignoreNulls = true)
              .over(fwd))
        u.filter(col("is_p") === 1)
          .withColumn("d_prev", col("t") - col("prev_click"))
          .withColumn("d_next", col("next_click") - col("t"))
          .withColumn("nearest_t",
            when(col("d_prev").isNotNull &&
              (col("d_next").isNull || col("d_prev") <= col("d_next")),
              col("prev_click")).otherwise(col("next_click")))
          .withColumn("nearest_t",
            when(abs(col("nearest_t") - col("t")) <= hourUs,
              col("nearest_t")))
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("ts").as("purchase_ts"),
            timestamp_micros(col("nearest_t")).as("nearest_click_ts"),
            (col("nearest_t") - col("t")).as("delta_us"))
          .orderBy("purchase_id")
      },
      """WITH u AS (
        |  SELECT user_id, ts, event_id, epoch_us(ts) AS t,
        |    cast(event_type = 'purchase' as int) AS is_p
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |r AS (
        |  SELECT *,
        |    last_value(CASE WHEN is_p = 0 THEN t END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, is_p, event_id
        |            ROWS UNBOUNDED PRECEDING) AS prev_click,
        |    first_value(CASE WHEN is_p = 0 THEN t END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, is_p, event_id
        |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |      AS next_click
        |  FROM u),
        |p AS (
        |  SELECT *, t - prev_click AS d_prev, next_click - t AS d_next,
        |    CASE WHEN prev_click IS NOT NULL
        |           AND (next_click IS NULL OR t - prev_click <= next_click - t)
        |         THEN prev_click ELSE next_click END AS nearest_raw
        |  FROM r WHERE is_p = 1)
        |SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
        |  make_timestamp(CASE WHEN abs(nearest_raw - t) <= 3600000000
        |                      THEN nearest_raw END) AS nearest_click_ts,
        |  CASE WHEN abs(nearest_raw - t) <= 3600000000
        |       THEN nearest_raw - t END AS delta_us
        |FROM p ORDER BY purchase_id""".stripMargin),

    // Semi-structured props parsing over the events stream's real JSON
    // column: one from_json per row (no repeated per-field re-parsing),
    // try-cast semantics, aggregated per event type.
    "ev_props_parse" -> Q(
      (s, d) => ev(s, d)
        .withColumn("k",
          from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL(
            "k string")).getField("k"))
        .withColumn("k_num", expr("try_cast(k as bigint)"))
        .groupBy("event_type")
        .agg(count(col("k_num")).as("n_parsed"),
          sum(col("k_num")).as("k_sum"),
          min(col("k_num")).as("k_min"),
          max(col("k_num")).as("k_max"))
        .orderBy("event_type"),
      """SELECT event_type,
        |  count(try_cast(json_extract_string(props, '$.k') as bigint)) AS n_parsed,
        |  cast(sum(try_cast(json_extract_string(props, '$.k') as bigint)) as bigint) AS k_sum,
        |  min(try_cast(json_extract_string(props, '$.k') as bigint)) AS k_min,
        |  max(try_cast(json_extract_string(props, '$.k') as bigint)) AS k_max
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),

    // Weekly cohort retention: cohort = week of first signup, activity =
    // distinct active weeks per user. Two aggregations + one join, all
    // keyed on user_id.
    "ev_retention" -> Q(
      (s, d) => {
        val cohorts = ev(s, d).filter(col("event_type") === "signup")
          .groupBy("user_id")
          .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
        val active = ev(s, d)
          .select(col("user_id"), date_trunc("week", col("ts")).as("activity_week"))
          .distinct()
        cohorts.join(active, "user_id")
          .withColumn("week_offset",
            (datediff(col("activity_week"), col("cohort_week")) / 7).cast("long"))
          .filter(col("week_offset") >= 0)
          .groupBy("cohort_week", "week_offset")
          .agg(countDistinct(col("user_id")).as("n_active"))
          .orderBy("cohort_week", "week_offset")
      },
      """WITH cohorts AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |active AS (
        |  SELECT DISTINCT user_id, date_trunc('week', ts) AS activity_week
        |  FROM events)
        |SELECT cohort_week,
        |  cast(date_diff('day', cohort_week, activity_week) // 7 as bigint)
        |    AS week_offset,
        |  count(DISTINCT c.user_id) AS n_active
        |FROM cohorts c JOIN active a ON c.user_id = a.user_id
        |WHERE activity_week >= cohort_week
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // Ordered funnel view -> click -> purchase: stepwise conditional minima.
    // Three aggregations + joins all keyed on user_id — AQE reuses the
    // exchange; no step touches more than the filtered event subset.
    "ev_funnel" -> Q(
      (s, d) => {
        val e = ev(s, d).select("user_id", "ts", "event_type")
        val base = e.groupBy("user_id").agg(count(lit(1)).as("n_events"))
        val v = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("first_view"))
        val c = e.filter(col("event_type") === "click")
          .join(v, "user_id").filter(col("ts") > col("first_view"))
          .groupBy("user_id").agg(min("ts").as("first_click"))
        val p = e.filter(col("event_type") === "purchase")
          .join(c, "user_id").filter(col("ts") > col("first_click"))
          .groupBy("user_id").agg(min("ts").as("first_purchase"))
        base.join(v, Seq("user_id"), "left")
          .join(c, Seq("user_id"), "left")
          .join(p, Seq("user_id"), "left")
          .select(col("user_id"), col("first_view"), col("first_click"),
            col("first_purchase"),
            when(col("first_purchase").isNotNull, 3)
              .when(col("first_click").isNotNull, 2)
              .when(col("first_view").isNotNull, 1).otherwise(0).as("stage"))
          .orderBy("user_id")
      },
      """WITH v AS (
        |  SELECT user_id, min(ts) AS first_view FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS first_click
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.first_view
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS first_purchase
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.first_click
        |  GROUP BY e.user_id)
        |SELECT b.user_id, v.first_view, c.first_click, p.first_purchase,
        |  CASE WHEN p.first_purchase IS NOT NULL THEN 3
        |       WHEN c.first_click IS NOT NULL THEN 2
        |       WHEN v.first_view IS NOT NULL THEN 1 ELSE 0 END AS stage
        |FROM (SELECT user_id FROM events GROUP BY user_id) b
        |LEFT JOIN v ON b.user_id = v.user_id
        |LEFT JOIN c ON b.user_id = c.user_id
        |LEFT JOIN p ON b.user_id = p.user_id
        |ORDER BY b.user_id""".stripMargin),

    // ----------------------------------------------------------------
    // Gap-filled hourly resample with forward fill: each user's hourly
    // value series is densified over a generated calendar spine (sequence
    // per user — rows scale with span, not with a global calendar cross
    // join), then last-non-null forward fill. Two shuffles (hourly agg,
    // spine join) both keyed on user_id; the fill window reuses the join's
    // partitioning.
    "ev_gap_fill" -> Q(
      (s, d) => {
        val hourly = ev(s, d)
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
          .agg(sum(valDec).as("v"), count(lit(1)).as("n"))
        val spine = hourly.groupBy("user_id")
          .agg(min("h").as("h0"), max("h").as("h1"))
          .select(col("user_id"),
            explode(sequence(col("h0"), col("h1"),
              expr("INTERVAL 1 HOUR"))).as("h"))
        val fill = Window.partitionBy("user_id").orderBy("h")
          .rowsBetween(Window.unboundedPreceding, 0)
        spine.join(hourly, Seq("user_id", "h"), "left")
          .select(col("user_id"), col("h").as("hour"),
            col("n").isNull.as("is_gap"),
            coalesce(col("n"), lit(0L)).as("n_events"),
            last(col("v"), ignoreNulls = true).over(fill)
              .cast("double").as("filled_value"))
          .orderBy("user_id", "hour")
      },
      """WITH hourly AS (
        |  SELECT user_id, date_trunc('hour', ts) AS h,
        |    sum(cast(value as decimal(18,2))) AS v, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |spine AS (
        |  SELECT user_id, unnest(generate_series(min(h), max(h),
        |    INTERVAL 1 HOUR)) AS h
        |  FROM hourly GROUP BY user_id)
        |SELECT s.user_id, s.h AS hour, n IS NULL AS is_gap,
        |  coalesce(n, 0) AS n_events,
        |  cast(last_value(v IGNORE NULLS) OVER (PARTITION BY s.user_id
        |    ORDER BY s.h ROWS UNBOUNDED PRECEDING) as double) AS filled_value
        |FROM spine s LEFT JOIN hourly USING (user_id, h)
        |ORDER BY user_id, hour""".stripMargin),

    // ----------------------------------------------------------------
    // Linear interpolation over the gap-filled spine: missing hours take
    // prev + (next - prev) · elapsed/gap between the surrounding non-null
    // points. Every input to the double math is exact (decimal endpoints,
    // integer hour offsets), so both engines compute identical bits. Same
    // two-shuffle shape as ev_gap_fill; boundary gaps stay null.
    "ev_interp_linear" -> Q(
      (s, d) => {
        val hourly = ev(s, d)
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
          .agg(sum(valDec).as("v"))
        val spine = hourly.groupBy("user_id")
          .agg(min("h").as("h0"), max("h").as("h1"))
          .select(col("user_id"),
            explode(sequence(col("h0"), col("h1"),
              expr("INTERVAL 1 HOUR"))).as("h"))
        val byUser = Window.partitionBy("user_id").orderBy("h")
        val back = byUser.rowsBetween(Window.unboundedPreceding, 0)
        val fwd = byUser.rowsBetween(0, Window.unboundedFollowing)
        spine.join(hourly, Seq("user_id", "h"), "left")
          .withColumn("pv", last(col("v"), ignoreNulls = true).over(back))
          .withColumn("ph", last(when(col("v").isNotNull, col("h")),
            ignoreNulls = true).over(back))
          .withColumn("nv", first(col("v"), ignoreNulls = true).over(fwd))
          .withColumn("nh", first(when(col("v").isNotNull, col("h")),
            ignoreNulls = true).over(fwd))
          .select(col("user_id"), col("h").as("hour"),
            col("v").isNull.as("is_gap"),
            when(col("v").isNotNull, col("v").cast("double"))
              .when(col("pv").isNotNull && col("nv").isNotNull,
                col("pv").cast("double") +
                  (col("nv").cast("double") - col("pv").cast("double")) *
                  ((unix_timestamp(col("h")) - unix_timestamp(col("ph"))).cast("double") /
                    (unix_timestamp(col("nh")) - unix_timestamp(col("ph")))))
              .as("value_interp"))
          .orderBy("user_id", "hour")
      },
      """WITH hourly AS (
        |  SELECT user_id, date_trunc('hour', ts) AS h,
        |    sum(cast(value as decimal(18,2))) AS v
        |  FROM events GROUP BY 1, 2),
        |spine AS (
        |  SELECT user_id, unnest(generate_series(min(h), max(h),
        |    INTERVAL 1 HOUR)) AS h
        |  FROM hourly GROUP BY user_id),
        |j AS (
        |  SELECT s.user_id, s.h, v,
        |    last_value(v IGNORE NULLS) OVER back AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN s.h END IGNORE NULLS)
        |      OVER back AS ph,
        |    first_value(v IGNORE NULLS) OVER fwd AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN s.h END IGNORE NULLS)
        |      OVER fwd AS nh
        |  FROM spine s LEFT JOIN hourly USING (user_id, h)
        |  WINDOW back AS (PARTITION BY s.user_id ORDER BY s.h
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    fwd AS (PARTITION BY s.user_id ORDER BY s.h
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, h AS hour, v IS NULL AS is_gap,
        |  CASE WHEN v IS NOT NULL THEN cast(v as double)
        |       WHEN pv IS NOT NULL AND nv IS NOT NULL
        |       THEN cast(pv as double) + (cast(nv as double) - cast(pv as double))
        |         * (cast(epoch(h) - epoch(ph) as double) / (epoch(nh) - epoch(ph)))
        |       END AS value_interp
        |FROM j ORDER BY user_id, hour""".stripMargin),

    // ----------------------------------------------------------------
    // Rolling z-score anomaly flags on hourly event-type counts. The
    // trailing-24h mean/std derive from EXACT integer rolling sums
    // (sum x, sum x², n — order-independent), so the double arithmetic is
    // the same expression over identical inputs in both engines —
    // bit-identical without rounding. One shuffle on event_type.
    // Seasonal-naive baseline (hour-of-week profile): each hourly count is
    // compared against the mean of the same (weekday, hour) slot across
    // the whole series — the standard pre-forecasting decomposition and
    // the baseline behind "is this Tuesday 3pm unusual?" alerts. Two
    // window-free shuffles: hourly agg, then a slot-grain window mean
    // (slot cardinality is fixed at 168 per event type). Residuals round
    // to 6dp for cross-engine double parity.
    "ev_seasonal_baseline" -> Q(
      (s, d) => {
        val slot = Window.partitionBy("event_type", "dow", "hod")
        ev(s, d)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("x"))
          .withColumn("dow", dayofweek(col("h")).cast("long"))
          .withColumn("hod", hour(col("h")).cast("long"))
          .withColumn("baseline", round(avg(col("x")).over(slot), 6))
          .select(col("event_type"), col("h").as("hour"), col("dow"),
            col("hod"), col("x").as("n_events"), col("baseline"),
            round(col("x") - col("baseline"), 6).as("residual"))
          .orderBy("event_type", "hour")
      },
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |slotted AS (
        |  SELECT event_type, h, x,
        |    cast(dayofweek(h) + 1 as bigint) AS dow,
        |    cast(hour(h) as bigint) AS hod
        |  FROM hourly)
        |SELECT event_type, h AS hour, dow, hod, x AS n_events,
        |  round(avg(x) OVER (PARTITION BY event_type, dow, hod), 6)
        |    AS baseline,
        |  round(x - round(avg(x) OVER (PARTITION BY event_type, dow, hod), 6), 6)
        |    AS residual
        |FROM slotted ORDER BY event_type, hour""".stripMargin),

    // Event-lateness audit — the query that TUNES a streaming watermark:
    // per event, lateness = how far behind the maximum event time already
    // seen (in arrival order = event_id here) it arrived; the histogram's
    // tail tells you what `withWatermark` delay keeps completeness at any
    // chosen percentile. The global running max is computed in TWO passes
    // (per-chunk exclusive running max + an exclusive prefix max over the
    // tiny chunk-grain table, broadcast back) — an unpartitioned window
    // would funnel the whole table through ONE task, the canonical
    // prefix-scan scale-killer. Buckets test the RAW micro lateness, as
    // the oracle does: `late_s == 0` would misfile sub-second-late events
    // as on-time.
    "ev_late_arrivals" -> Q(
      (s, d) => {
        val chunkSize = 65536L
        val base = ev(s, d)
          .select(col("event_id"), unix_micros(col("ts")).as("us"))
          .withColumn("chunk", expr(s"event_id div $chunkSize"))
        val wIn = Window.partitionBy("chunk").orderBy("event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        // chunk grain is |events|/65536 rows — the single-partition prefix
        // window is over THAT, not the events
        val wPrev = Window.orderBy("chunk")
          .rowsBetween(Window.unboundedPreceding, -1)
        val chunkPrev = base.groupBy("chunk").agg(max("us").as("cmax"))
          .withColumn("pmax", max("cmax").over(wPrev))
          .select("chunk", "pmax")
        // chunkPrev grows with the data (|events|/65536 rows — ~15M at
        // 10^12 events), so the join stays KEYED on chunk with no
        // broadcast hint; AQE broadcasts it while it is actually small
        base
          .join(chunkPrev, Seq("chunk"))
          // greatest skips nulls: first row of a chunk has no inner max,
          // chunk 0 has no prefix max, the overall first row has neither
          .withColumn("hwm", greatest(max(col("us")).over(wIn), col("pmax")))
          .withColumn("late_us", col("hwm") - col("us"))
          .withColumn("late_s",
            greatest(expr("late_us div 1000000"), lit(0L)))
          .withColumn("bucket",
            when(col("hwm").isNull || col("late_us") <= 0, "on_time")
              .when(col("late_s") <= 60, "within_1m")
              .when(col("late_s") <= 600, "within_10m")
              .when(col("late_s") <= 3600, "within_1h")
              .otherwise("over_1h"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_events"),
            max(col("late_s")).cast("long").as("max_late_s"))
          .orderBy("bucket")
      },
      """WITH hw AS (
        |  SELECT event_id, ts,
        |    max(epoch_us(ts)) OVER (ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
        |  FROM events),
        |lat AS (
        |  SELECT event_id,
        |    greatest((hwm - epoch_us(ts)) // 1000000, 0) AS late_s,
        |    CASE WHEN hwm IS NULL OR (hwm - epoch_us(ts)) <= 0 THEN 'on_time'
        |      WHEN (hwm - epoch_us(ts)) // 1000000 <= 60 THEN 'within_1m'
        |      WHEN (hwm - epoch_us(ts)) // 1000000 <= 600 THEN 'within_10m'
        |      WHEN (hwm - epoch_us(ts)) // 1000000 <= 3600 THEN 'within_1h'
        |      ELSE 'over_1h' END AS bucket
        |  FROM hw)
        |SELECT bucket, count(*) AS n_events,
        |  cast(max(late_s) as bigint) AS max_late_s
        |FROM lat GROUP BY 1 ORDER BY 1""".stripMargin),

    // Rolling exact quantiles (p50/p95 over a 20-event sliding frame per
    // event type) — the monitoring primitive behind latency dashboards and
    // SLO burn alerts. Both engines index the SAME explicitly sorted frame
    // array, so the quantile convention is identical by construction (no
    // reliance on engine-specific interpolation); values are selected, not
    // computed, so doubles hash-match bit-for-bit. Scale: the frame is
    // constant-size (20), so per-row state is O(frame), one hash shuffle
    // on the partition key — the same shape as the z-score roll.
    "ev_rolling_quantile" -> Q(
      (s, d) => {
        val w = Window.partitionBy("event_type")
          .orderBy(col("ts"), col("event_id")).rowsBetween(-19, 0)
        ev(s, d)
          .select(col("event_id"), col("ts"), col("event_type"), col("value"))
          .withColumn("sorted", array_sort(collect_list(col("value")).over(w)))
          .withColumn("n", size(col("sorted")).cast("long"))
          .select(col("event_id"), col("ts"), col("event_type"), col("value"),
            col("n"),
            element_at(col("sorted"),
              ceil(col("n") * 0.5).cast("int")).as("p50"),
            element_at(col("sorted"),
              ceil(col("n") * 0.95).cast("int")).as("p95"))
          .orderBy("event_type", "ts", "event_id")
      },
      """WITH rolled AS (
        |  SELECT event_id, ts, event_type, value,
        |    list_sort(list(value) OVER w) AS sorted,
        |    count(*) OVER w AS n
        |  FROM events
        |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
        |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
        |SELECT event_id, ts, event_type, value, cast(n as bigint) AS n,
        |  sorted[cast(ceil(n * 0.5) as int)] AS p50,
        |  sorted[cast(ceil(n * 0.95) as int)] AS p95
        |FROM rolled ORDER BY event_type, ts, event_id""".stripMargin),

    "ev_anomaly_zscore" -> Q(
      (s, d) => {
        val w = Window.partitionBy("event_type").orderBy("h")
          .rowsBetween(-23, 0)
        ev(s, d)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("x"))
          .withColumn("n_frame", count(lit(1)).over(w))
          .withColumn("sx", sum(col("x")).over(w))
          .withColumn("sxx", sum(col("x") * col("x")).over(w))
          .withColumn("mean", col("sx").cast("double") / col("n_frame"))
          .withColumn("variance",
            when(col("n_frame") >= 2,
              greatest((col("sxx").cast("double")
                - col("sx").cast("double") * col("sx") / col("n_frame"))
                / (col("n_frame") - 1), lit(0.0))))
          .withColumn("z",
            when(col("n_frame") >= 12 && col("variance") > 0,
              (col("x").cast("double") - col("mean")) / sqrt(col("variance"))))
          .select(col("event_type"), col("h").as("hour"), col("x").as("n_events"),
            col("n_frame"), col("mean"), col("z"),
            (abs(coalesce(col("z"), lit(0.0))) > 3).as("is_anomaly"))
          .orderBy("event_type", "hour")
      },
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |rolled AS (
        |  SELECT event_type, h, x,
        |    count(*) OVER w AS n_frame,
        |    sum(x) OVER w AS sx,
        |    sum(x * x) OVER w AS sxx
        |  FROM hourly
        |  WINDOW w AS (PARTITION BY event_type ORDER BY h
        |    ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)),
        |scored AS (
        |  SELECT event_type, h, x, n_frame,
        |    cast(sx as double) / n_frame AS mean,
        |    CASE WHEN n_frame >= 2
        |      THEN greatest((cast(sxx as double)
        |        - cast(sx as double) * sx / n_frame) / (n_frame - 1), 0.0)
        |      END AS variance
        |  FROM rolled)
        |SELECT event_type, h AS hour, x AS n_events, n_frame, mean,
        |  CASE WHEN n_frame >= 12 AND variance > 0
        |       THEN (cast(x as double) - mean) / sqrt(variance) END AS z,
        |  abs(coalesce(CASE WHEN n_frame >= 12 AND variance > 0
        |       THEN (cast(x as double) - mean) / sqrt(variance) END, 0.0)) > 3
        |    AS is_anomaly
        |FROM scored ORDER BY event_type, hour""".stripMargin),

    // ----------------------------------------------------------------
    // Exponentially weighted moving average over hourly per-user counts:
    // the recursion e_t = α·x_t + (1-α)·e_{t-1} expressed as a declarative
    // fold over the trailing 24-row frame (collect_list + aggregate HOF —
    // codegen-friendly, no UDF). α = 0.5 keeps every weight a dyadic
    // rational, so with integer inputs the double arithmetic is exact and
    // order-independent — bit-identical cross-engine (the DuckDB oracle
    // computes the same weighted sum in closed form). One shuffle on
    // user_id; the fold is per-row map work over a ≤24-element array.
    "ev_ewma" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("h")
          .rowsBetween(-23, 0)
        ev(s, d)
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("x"))
          .withColumn("vals", collect_list(col("x")).over(w))
          .withColumn("ewma",
            expr("aggregate(vals, cast(0 as double), (acc, v) -> acc * 0.5 + v * 0.5)"))
          .select(col("user_id"), col("h").as("hour"), col("x").as("n_events"),
            size(col("vals")).cast("long").as("n_frame"), col("ewma"))
          .orderBy("user_id", "hour")
      },
      """WITH hourly AS (
        |  SELECT user_id, date_trunc('hour', ts) AS h, count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |listed AS (
        |  SELECT user_id, h, x,
        |    list(x) OVER (PARTITION BY user_id ORDER BY h
        |      ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS vals
        |  FROM hourly)
        |SELECT user_id, h AS hour, x AS n_events,
        |  cast(len(vals) as bigint) AS n_frame,
        |  list_sum(list_transform(vals,
        |    (v, i) -> v * power(0.5, len(vals) - i + 1))) AS ewma
        |FROM listed ORDER BY user_id, hour""".stripMargin),

    // ----------------------------------------------------------------
    // OHLC resampling — the classic financial bar aggregation: per
    // (event_type, hour), open/close are the first/last value in event-time
    // order (unique (ts, event_id) tie-break), high/low/volume are plain
    // min/max/count. One shuffle on the bar key; both edge windows reuse
    // the aggregation's partitioning.
    "ev_resample_ohlc" -> Q(
      (s, d) => {
        val asc = Window.partitionBy("event_type", "h")
          .orderBy(col("ts"), col("event_id"))
        val desc = Window.partitionBy("event_type", "h")
          .orderBy(col("ts").desc, col("event_id").desc)
        ev(s, d)
          .select(col("event_type"), date_trunc("hour", col("ts")).as("h"),
            col("ts"), col("event_id"), valDec.as("v"))
          .withColumn("rn_a", row_number().over(asc))
          .withColumn("rn_d", row_number().over(desc))
          .groupBy(col("event_type"), col("h").as("hour"))
          .agg(max(when(col("rn_a") === 1, col("v"))).cast("double").as("open"),
            max(col("v")).cast("double").as("high"),
            min(col("v")).cast("double").as("low"),
            max(when(col("rn_d") === 1, col("v"))).cast("double").as("close"),
            count(lit(1)).as("volume"),
            sum(col("v")).cast("double").as("turnover"))
          .orderBy("event_type", "hour")
      },
      """WITH base AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h, ts, event_id,
        |    cast(value as decimal(18,2)) AS v,
        |    row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
        |      ORDER BY ts, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
        |      ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events)
        |SELECT event_type, h AS hour,
        |  cast(max(CASE WHEN rn_a = 1 THEN v END) as double) AS open,
        |  cast(max(v) as double) AS high,
        |  cast(min(v) as double) AS low,
        |  cast(max(CASE WHEN rn_d = 1 THEN v END) as double) AS close,
        |  count(*) AS volume,
        |  cast(sum(v) as double) AS turnover
        |FROM base GROUP BY event_type, h
        |ORDER BY event_type, hour""".stripMargin),

    // ----------------------------------------------------------------
    // Hopping (sliding) windows: 1-hour windows every 15 minutes — each
    // event lands in exactly 4 overlapping windows. Spark expands the
    // window set map-side then aggregates once; the oracle reconstructs
    // the same window starts with an explicit offset unnest.
    "ev_window_sliding" -> Q(
      (s, d) => ev(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n_events"))
        .orderBy("window_start", "event_type"),
      """WITH hopped AS (
        |  SELECT time_bucket(INTERVAL '15 minutes', ts)
        |           - o * INTERVAL '15 minutes' AS window_start, event_type
        |  FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS o))
        |SELECT window_start, event_type, count(*) AS n_events
        |FROM hopped GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // ----------------------------------------------------------------
    // Largest-triangle downsampling (LTTB-style, fixed anchors): per
    // (event_type, 6h bucket) keep the point spanning the largest triangle
    // against the neighbor buckets' anchor points (bucket midpoint x,
    // bucket mean y) — the standard lossy reduction for plotting huge
    // series. Anchors from fixed midpoints keep the selection one
    // data-parallel pass (true LTTB chains on the previous selection);
    // every input to the double math is exact (epoch micros, decimal
    // means), so the scoring is bit-identical cross-engine. Two shuffles:
    // bucket stats, then the per-bucket argmax window.
    "ev_downsample" -> Q(
      (s, d) => {
        val buckUs = 21600000000L // 6 hours in micros
        val pts = ev(s, d).select(col("event_type"),
          unix_micros(col("ts")).as("t"), col("event_id"), valDec.as("v"))
          .withColumn("bucket", expr(s"t div $buckUs"))
        val bstats = pts.groupBy("event_type", "bucket")
          .agg(count(lit(1)).as("n_points"), sum(col("v")).as("sv"))
          .withColumn("mv", col("sv").cast("double") / col("n_points"))
        val wB = Window.partitionBy("event_type").orderBy("bucket")
        val ctx = bstats
          .withColumn("pb", lag(col("bucket"), 1).over(wB))
          .withColumn("py", lag(col("mv"), 1).over(wB))
          .withColumn("nb", lead(col("bucket"), 1).over(wB))
          .withColumn("ny", lead(col("mv"), 1).over(wB))
          .select(col("event_type"), col("bucket"), col("n_points"),
            ((col("pb") + 0.5) * buckUs).as("px"), col("py"),
            ((col("nb") + 0.5) * buckUs).as("nx"), col("ny"))
        val wSel = Window.partitionBy("event_type", "bucket")
          .orderBy(col("area").desc_nulls_last, col("t"), col("event_id"))
        pts.join(ctx, Seq("event_type", "bucket"))
          .withColumn("area",
            when(col("px").isNotNull && col("nx").isNotNull,
              abs((col("t").cast("double") - col("px")) * (col("ny") - col("py"))
                - (col("nx") - col("px"))
                  * (col("v").cast("double") - col("py")))))
          .withColumn("rn", row_number().over(wSel))
          .filter(col("rn") === 1)
          .select(col("event_type"), col("bucket"), col("event_id"),
            col("t"), col("v").cast("double").as("value"),
            col("n_points"), col("area"))
          .orderBy("event_type", "bucket")
      },
      """WITH pts AS (
        |  SELECT event_type, epoch_us(ts) AS t, event_id,
        |    cast(value as decimal(18,2)) AS v,
        |    epoch_us(ts) // 21600000000 AS bucket
        |  FROM events),
        |bstats AS (
        |  SELECT event_type, bucket, count(*) AS n_points,
        |    cast(sum(v) as double) / count(*) AS mv
        |  FROM pts GROUP BY 1, 2),
        |ctx AS (
        |  SELECT event_type, bucket, n_points,
        |    (lag(bucket) OVER w + 0.5) * 21600000000 AS px,
        |    lag(mv) OVER w AS py,
        |    (lead(bucket) OVER w + 0.5) * 21600000000 AS nx,
        |    lead(mv) OVER w AS ny
        |  FROM bstats
        |  WINDOW w AS (PARTITION BY event_type ORDER BY bucket)),
        |scored AS (
        |  SELECT p.event_type, p.bucket, p.event_id, p.t, p.v, c.n_points,
        |    CASE WHEN c.px IS NOT NULL AND c.nx IS NOT NULL THEN
        |      abs((cast(p.t as double) - c.px) * (c.ny - c.py)
        |        - (c.nx - c.px) * (cast(p.v as double) - c.py))
        |    END AS area
        |  FROM pts p JOIN ctx c USING (event_type, bucket)),
        |sel AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type, bucket
        |    ORDER BY area DESC NULLS LAST, t, event_id) AS rn
        |  FROM scored)
        |SELECT event_type, bucket, event_id, t,
        |  cast(v as double) AS value, n_points, area
        |FROM sel WHERE rn = 1
        |ORDER BY event_type, bucket""".stripMargin),

    // ----------------------------------------------------------------
    // CUSUM changepoint flags on hourly counts: the recursion
    // S⁺_t = max(0, S⁺_{t-1} + d_t) rewrites as P_t − min_{j≤t} P_j over
    // the prefix sums — two windows sharing one event_type shuffle, no
    // sequential state. Deviations are scaled to integers (d = 2n·x − 3S
    // ⇒ drift k = μ/2 without division), so every value is exact and the
    // oracle matches bit-for-bit. Flag when the statistic exceeds 6S
    // (≈ 3 mean-hours of cumulative upward drift).
    "ev_cusum" -> Q(
      (s, d) => {
        val hourly = ev(s, d)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("x"))
        val stats = hourly.groupBy("event_type")
          .agg(sum(col("x")).as("st"), count(lit(1)).as("nt"))
        val w = Window.partitionBy("event_type").orderBy("h")
          .rowsBetween(Window.unboundedPreceding, 0)
        hourly.join(broadcast(stats), "event_type")
          .withColumn("dd",
            lit(2) * col("nt") * col("x") - lit(3) * col("st"))
          .withColumn("p", sum(col("dd")).over(w))
          // the max(0, S+d) recursion has an implicit P_0 = 0: the running
          // min must include it, or a series whose prefix sum is positive
          // from the first row understates the statistic by min(P)
          .withColumn("m", least(min(col("p")).over(w), lit(0L)))
          .select(col("event_type"), col("h").as("hour"),
            col("x").as("n_events"),
            (col("p") - col("m")).as("cusum_scaled"),
            ((col("p") - col("m")) > lit(6) * col("st")).as("is_shift"))
          .orderBy("event_type", "hour")
      },
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |stats AS (
        |  SELECT event_type, sum(x) AS st, count(*) AS nt
        |  FROM hourly GROUP BY 1),
        |j AS (
        |  SELECT h.event_type, h.h, h.x, st,
        |    2 * nt * x - 3 * st AS dd
        |  FROM hourly h JOIN stats USING (event_type)),
        |r1 AS (
        |  SELECT *, cast(sum(dd) OVER (PARTITION BY event_type ORDER BY h
        |    ROWS UNBOUNDED PRECEDING) as bigint) AS p
        |  FROM j),
        |r2 AS (
        |  SELECT *, least(min(p) OVER (PARTITION BY event_type ORDER BY h
        |    ROWS UNBOUNDED PRECEDING), 0) AS m
        |  FROM r1)
        |SELECT event_type, h AS hour, x AS n_events,
        |  p - m AS cusum_scaled,
        |  (p - m) > 6 * st AS is_shift
        |FROM r2 ORDER BY event_type, hour""".stripMargin),

    // ----------------------------------------------------------------
    // SCD Type-2 history build — the warehouse pattern for canonical
    // dimensions: collapse each user's event-type stream into validity
    // intervals (change detection via lag, interval close via lead,
    // version numbering) — [valid_from, valid_to) with an open current
    // row. One shuffle on user_id; all three windows share it.
    "ev_scd2" -> Q(
      (s, d) => {
        // one window spec, applied pre- and post-filter: over `changes` it
        // ranks only the surviving change rows (same partitioning, so the
        // filter and both windows share one user_id shuffle)
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val changes = ev(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
          .filter(col("prev_type").isNull ||
            col("prev_type") =!= col("event_type"))
        changes
          .withColumn("valid_to", lead(col("ts"), 1).over(byUser))
          .withColumn("version", row_number().over(byUser).cast("long"))
          .select(col("user_id"), col("version"), col("event_type"),
            col("ts").as("valid_from"), col("valid_to"),
            col("valid_to").isNull.as("is_current"))
          .orderBy("user_id", "version")
      },
      """WITH marked AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_type
        |  FROM events),
        |changes AS (
        |  SELECT * FROM marked
        |  WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id,
        |  cast(row_number() OVER w as bigint) AS version,
        |  event_type, ts AS valid_from,
        |  lead(ts) OVER w AS valid_to,
        |  lead(ts) OVER w IS NULL AS is_current
        |FROM changes
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, version""".stripMargin),

    // ----------------------------------------------------------------
    // Distinct users per event type via MERGED daily HLL sketches — the
    // reaggregatable form of COUNT(DISTINCT): each day sketches once
    // (partial-agg, map-side combined), periods union day sketches without
    // touching base rows. The exact-distinct equivalent reshuffles every
    // base row per period; the sketch union moves only ~KB-sized state —
    // the 100 TB distinct-count shape. DuckDB's HLL is a different sketch,
    // so the estimate itself can't be oracled — instead the output carries
    // the EXACT side (hash-matched) plus the 5%-error assertion as data:
    // the oracle emits literal `true`, so an estimate drifting past 5%
    // turns the driver gate red. TimeseriesSpec still asserts the merged
    // sketch equals the direct single-pass sketch bit-for-bit.
    "ev_hll_users" -> Q(
      (s, d) => {
        val daily = ev(s, d)
          .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
          .agg(hll_sketch_agg(col("user_id")).as("sk"))
        val merged = daily.groupBy("event_type")
          .agg(count(lit(1)).as("n_days"),
            hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"))
        val exact = ev(s, d).groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("exact_users"))
        merged.join(exact, "event_type")
          .select(col("event_type"), col("n_days"), col("exact_users"),
            (abs(col("approx_users") - col("exact_users")).cast("double")
              / col("exact_users") <= 0.05).as("est_within_5pct"))
          .orderBy("event_type")
      },
      """SELECT event_type,
        |  count(DISTINCT date_trunc('day', ts)) AS n_days,
        |  count(DISTINCT user_id) AS exact_users,
        |  true AS est_within_5pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),

    // RFM segmentation (recency / frequency / monetary quartile scores) —
    // the classic user-value grid. Deliberately NOT ntile windows: a
    // global ntile is a single-partition sort over every user, which at
    // 100 TB is the one operator that cannot scale. Instead ONE exact
    // percentile aggregate computes the three quartile thresholds (a
    // 1-row frame), and scoring is a broadcast join + pure Column
    // comparisons — map-only over the per-user aggregates. Monetary sums
    // land as integer CENTS before thresholding so both engines quantize
    // identically (double sum noise ~1e-9 absolute is crushed by the
    // round-to-cents, and percentile interpolation over integers at
    // dyadic fractions is exact in both engines).
    "ev_rfm" -> Q(
      (s, d) => {
        val e = ev(s, d)
        val per = e.groupBy("user_id").agg(
          max(col("ts")).as("last_ts"),
          count(lit(1)).as("frequency"),
          expr("cast(round(sum(CASE WHEN event_type = 'purchase' " +
            "THEN value ELSE 0.0 END) * 100) as bigint)").as("monetary_cents"))
        val anchor = e.agg(max(col("ts")).as("anchor_ts"))
        val withRec = per.crossJoin(broadcast(anchor))
          .withColumn("recency_days",
            datediff(col("anchor_ts"), col("last_ts")).cast("bigint"))
        val th = withRec.agg(
          expr("percentile(recency_days, array(0.25, 0.5, 0.75))").as("rq"),
          expr("percentile(frequency, array(0.25, 0.5, 0.75))").as("fq"),
          expr("percentile(monetary_cents, array(0.25, 0.5, 0.75))").as("mq"))
        def up(v: Column, q: Column) = // higher value → higher score
          lit(1) + when(v > q.getItem(0), 1).otherwise(0) +
            when(v > q.getItem(1), 1).otherwise(0) +
            when(v > q.getItem(2), 1).otherwise(0)
        def down(v: Column, q: Column) = // lower value → higher score
          lit(4) - (when(v > q.getItem(0), 1).otherwise(0) +
            when(v > q.getItem(1), 1).otherwise(0) +
            when(v > q.getItem(2), 1).otherwise(0))
        withRec.crossJoin(broadcast(th))
          .withColumn("r_score", down(col("recency_days"), col("rq")))
          .withColumn("f_score", up(col("frequency"), col("fq")))
          .withColumn("m_score", up(col("monetary_cents"), col("mq")))
          .withColumn("segment", concat(col("r_score").cast("string"),
            col("f_score").cast("string"), col("m_score").cast("string")))
          .select("user_id", "recency_days", "frequency", "monetary_cents",
            "r_score", "f_score", "m_score", "segment")
          .orderBy("user_id")
      },
      """WITH per AS (
        |  SELECT user_id, max(ts) AS last_ts, count(*) AS frequency,
        |    cast(round(sum(CASE WHEN event_type = 'purchase'
        |      THEN value ELSE 0.0 END) * 100) AS bigint) AS monetary_cents
        |  FROM events GROUP BY user_id),
        |rec AS (
        |  SELECT user_id, frequency, monetary_cents,
        |    cast(date_diff('day', last_ts, (SELECT max(ts) FROM events))
        |      AS bigint) AS recency_days
        |  FROM per),
        |th AS (
        |  SELECT quantile_cont(recency_days, [0.25, 0.5, 0.75]) AS rq,
        |    quantile_cont(frequency, [0.25, 0.5, 0.75]) AS fq,
        |    quantile_cont(monetary_cents, [0.25, 0.5, 0.75]) AS mq
        |  FROM rec)
        |SELECT user_id, recency_days, frequency, monetary_cents,
        |  4 - ((recency_days > rq[1])::int + (recency_days > rq[2])::int +
        |    (recency_days > rq[3])::int) AS r_score,
        |  1 + (frequency > fq[1])::int + (frequency > fq[2])::int +
        |    (frequency > fq[3])::int AS f_score,
        |  1 + (monetary_cents > mq[1])::int + (monetary_cents > mq[2])::int +
        |    (monetary_cents > mq[3])::int AS m_score,
        |  (4 - ((recency_days > rq[1])::int + (recency_days > rq[2])::int +
        |    (recency_days > rq[3])::int))::varchar ||
        |  (1 + (frequency > fq[1])::int + (frequency > fq[2])::int +
        |    (frequency > fq[3])::int)::varchar ||
        |  (1 + (monetary_cents > mq[1])::int + (monetary_cents > mq[2])::int +
        |    (monetary_cents > mq[3])::int)::varchar AS segment
        |FROM rec, th ORDER BY user_id""".stripMargin),

    // ----------------------------------------------------------------
    // Robust (MAD-based) outlier detection over hourly per-type volumes
    // (round 15): the z-score detector above is itself skewed by the
    // outliers it hunts — the median/MAD variant is the standard robust
    // alternative (rz = (x − median) / (1.4826·MAD), |rz| > 3.5). Both
    // passes are KEYED aggregates on event_type (exact percentile needs
    // the group's values, but never a global sort), and the two
    // dimension joins stay unhinted — at 100 TB the per-type stats
    // frame is |event_type| rows, AQE broadcasts it. Cross-engine
    // exactness: counts are integers and medians of integer (and
    // half-integer deviation) frames interpolate exactly in doubles in
    // both engines; rz is rounded to 6 decimals on both sides.
    "ev_mad_outlier" -> Q(
      (s, d) => {
        val hourly = ev(s, d)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("x"))
        val med = hourly.groupBy("event_type")
          .agg(expr("percentile(x, 0.5)").as("med"))
        val mad = hourly.join(med, "event_type")
          .groupBy("event_type")
          .agg(expr("percentile(abs(x - med), 0.5)").as("mad"))
        hourly.join(med, "event_type").join(mad, "event_type")
          .withColumn("rzraw",
            when(col("mad") > 0,
              (col("x").cast("double") - col("med"))
                / (lit(1.4826) * col("mad"))))
          .select(col("event_type"), col("h").as("hour"),
            col("x").as("n_events"), col("med"), col("mad"),
            round(col("rzraw"), 6).as("rz"),
            coalesce(abs(col("rzraw")) > 3.5, lit(false)).as("is_outlier"))
          .orderBy("event_type", "hour")
      },
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |med AS (
        |  SELECT event_type, median(x) AS med FROM hourly GROUP BY 1),
        |mad AS (
        |  SELECT h.event_type, median(abs(h.x - m.med)) AS mad
        |  FROM hourly h JOIN med m USING (event_type) GROUP BY 1),
        |scored AS (
        |  SELECT h.event_type, h.h, h.x, m.med, d.mad,
        |    CASE WHEN d.mad > 0
        |      THEN (h.x - m.med) / (1.4826 * d.mad) END AS rzraw
        |  FROM hourly h JOIN med m USING (event_type)
        |    JOIN mad d USING (event_type))
        |SELECT event_type, h AS hour, x AS n_events, med, mad,
        |  round(rzraw, 6) AS rz,
        |  coalesce(abs(rzraw) > 3.5, false) AS is_outlier
        |FROM scored ORDER BY event_type, hour""".stripMargin)
  )
}
