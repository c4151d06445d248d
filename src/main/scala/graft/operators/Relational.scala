package graft.operators

import graft.{Q, Tables}
import graft.functions.Cols._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational / analytic operator core (SURVEY §2.B).
  *
  * Every query is a declarative DataFrame plan: filters and projections
  * reach the parquet scan via Catalyst pushdown, dimension joins are
  * broadcast, aggregates partial-aggregate map-side. Money sums follow the
  * decimal policy in [[graft.functions.Cols]].
  */
object Relational {

  // Shorthands used across the oracle SQL: decimal-exact sum / stable avg.
  private def sqlSum(e: String) = s"sum(cast(($e) as decimal(38,9)))"
  // final outputs surface as double: the exact decimal sum converts to the
  // same double in both engines, and a uniform dtype keeps the driver's
  // sorted-hash compare stable (pandas Decimal vs duckdb float64 would not)
  private def sqlSumD(e: String) = s"cast(${sqlSum(e)} as double)"
  private def sqlAvg(e: String) =
    s"round(cast(${sqlSum(e)} as double) / count(*), 6)"

  val defs: Map[String, Q] = Map(
    // ----------------------------------------------------------------
    "q1_agg" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).cast("double").as("sum_qty"),
            dsum(col("l_extendedprice")).cast("double").as("sum_base_price"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .cast("double").as("sum_disc_price"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
              (lit(1.0) + col("l_tax"))).cast("double").as("sum_charge"),
            davg(col("l_quantity")).as("avg_qty"),
            davg(col("l_extendedprice")).as("avg_price"),
            davg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlSumD("l_quantity")} AS sum_qty,
         |  ${sqlSumD("l_extendedprice")} AS sum_base_price,
         |  ${sqlSumD("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  ${sqlSumD("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
         |  ${sqlAvg("l_quantity")} AS avg_qty,
         |  ${sqlAvg("l_extendedprice")} AS avg_price,
         |  ${sqlAvg("l_discount")} AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // ----------------------------------------------------------------
    "q3_topk" -> Q(
      (s, d) => {
        val cust = Tables.customer(s, d)
          .filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey")
        val ord = Tables.orders(s, d)
          .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
        val li = Tables.lineitem(s, d)
          .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
          .select("l_orderkey", "l_extendedprice", "l_discount")
        li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      s"""SELECT o_orderkey, o_orderdate, o_orderpriority,
         |  ${sqlSumD("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM customer
         |JOIN orders   ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |  AND l_shipdate  > TIMESTAMP '1998-01-01'
         |GROUP BY o_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin),

    // ----------------------------------------------------------------
    "q5_join5" -> Q(
      (s, d) => {
        val region = Tables.region(s, d).filter(col("r_name") === "ASIA")
        val nation = Tables.nation(s, d)
        val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
        val ord = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .select("o_orderkey", "o_custkey")
        val li = Tables.lineitem(s, d)
          .select("l_orderkey", "l_extendedprice", "l_discount")
        // dims broadcast; the one fact-fact join (orders ⋈ lineitem)
        // shuffles on the order key once.
        val dim = cust
          .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
          .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
          .select(col("c_custkey"), col("n_name"))
        li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .join(broadcast(dim), ord("o_custkey") === dim("c_custkey"))
          .groupBy(col("n_name"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      s"""SELECT n_name, ${sqlSumD("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM region
         |JOIN nation   ON n_regionkey = r_regionkey
         |JOIN customer ON c_nationkey = n_nationkey
         |JOIN orders   ON o_custkey = c_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate <  TIMESTAMP '1998-01-01'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin),

    // ----------------------------------------------------------------
    "q6_filter_agg" -> Q(
      (s, d) =>
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
            col("l_quantity") < 24)
          .agg(
            dsum(col("l_extendedprice") * col("l_discount")).cast("double").as("revenue"),
            count(lit(1)).as("cnt")),
      s"""SELECT ${sqlSumD("l_extendedprice * l_discount")} AS revenue, count(*) AS cnt
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate <  TIMESTAMP '1997-01-01'
         |  AND l_discount >= 0.05 AND l_discount <= 0.07
         |  AND l_quantity < 24""".stripMargin),

    // ----------------------------------------------------------------
    "q_semijoin" -> Q(
      (s, d) => {
        val urgent = Tables.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey"))
        Tables.customer(s, d)
          .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin),

    // ----------------------------------------------------------------
    "q_antijoin" -> Q(
      (s, d) => {
        val f = Tables.orders(s, d)
          .filter(col("o_orderstatus") === "F")
          .select(col("o_custkey"))
        Tables.customer(s, d)
          .join(f, col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name", "c_mktsegment")
          .orderBy("c_custkey")
      },
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin),

    // ----------------------------------------------------------------
    "q_outerjoin" -> Q(
      (s, d) => {
        val ord = Tables.orders(s, d).select("o_custkey", "o_orderkey", "o_totalprice")
        Tables.customer(s, d)
          .join(ord, col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(
            count(col("o_orderkey")).as("n_orders"),
            dsum(coalesce(col("o_totalprice"), lit(0.0))).cast("double").as("total_spent"))
          .orderBy("c_custkey")
      },
      s"""SELECT c_custkey, count(o_orderkey) AS n_orders,
         |  ${sqlSumD("coalesce(o_totalprice, 0.0)")} AS total_spent
         |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin),

    // ----------------------------------------------------------------
    "q_window_rank" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("rnk", rank().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .orderBy(col("o_custkey"), col("rn"))
      },
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
        |    rank()       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin),

    // ----------------------------------------------------------------
    // Distribution windows: ntile/percent_rank/cume_dist per priority
    // class. percent_rank and cume_dist are exact small-int ratios, so the
    // doubles are bit-identical across engines without rounding. One
    // shuffle on the partition key; the unique o_orderkey tiebreak makes
    // every rank deterministic.
    "q_window_ntile" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
          .withColumn("quartile", ntile(4).over(w).cast("long"))
          .withColumn("pct_rank", percent_rank().over(w))
          .withColumn("cdist", cume_dist().over(w))
          .drop("o_totalprice")
          .orderBy("o_orderkey")
      },
      """SELECT o_orderkey, o_orderpriority,
        |  ntile(4)       OVER w AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist()    OVER w AS cdist
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin),

    // ----------------------------------------------------------------
    "q_window_running" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            col("o_totalprice"))
          .withColumn("running_spend", sum(dec(col("o_totalprice"))).over(w).cast("double"))
          .drop("o_totalprice")
          .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      },
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  cast(sum(cast(o_totalprice as decimal(38,9))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as double) AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin),

    // ----------------------------------------------------------------
    // RANGE frame (value-based, not row-based): trailing-30-day spend per
    // customer. The frame is expressed over epoch-day numbers so both
    // engines bound it identically; ties (same customer+date) are frame
    // peers in both. Same one-shuffle window cost as the ROWS variant.
    "q_window_range" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("day"))
          .rangeBetween(-30, 0)
        Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            col("o_totalprice"),
            datediff(col("o_orderdate"), to_date(lit("1970-01-01"))).as("day"))
          .withColumn("spend_30d", sum(dec(col("o_totalprice"))).over(w).cast("double"))
          .withColumn("n_orders_30d", count(lit(1)).over(w))
          .select("o_custkey", "o_orderkey", "o_orderdate", "spend_30d",
            "n_orders_30d")
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  cast(sum(cast(o_totalprice as decimal(38,9))) OVER w as double) AS spend_30d,
        |  count(*) OVER w AS n_orders_30d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY cast(o_orderdate as date)
        |  RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin),

    // ----------------------------------------------------------------
    // Array/HOF battery: per-order quantity vectors through sort/distinct/
    // aggregate/filter lambdas — the collection-function surface. One
    // partial-agg shuffle builds the arrays; everything after is map-only
    // codegen'd HOF work. Sizes cast long (size() is int32, DuckDB len is
    // bigint).
    "q_array_funcs" -> Q(
      (s, d) => {
        val arrs = Tables.lineitem(s, d)
          .groupBy(col("l_orderkey"))
          .agg(array_sort(collect_list(col("l_quantity").cast("int"))).as("q"))
        arrs.select(
          col("l_orderkey"),
          size(col("q")).cast("long").as("n"),
          size(array_distinct(col("q"))).cast("long").as("distinct_n"),
          aggregate(col("q"), lit(0L), (acc, x) => acc + x).as("total"),
          array_min(col("q")).as("mn"),
          array_max(col("q")).as("mx"),
          size(filter(col("q"), x => x % 2 === 0)).cast("long").as("evens"))
          .orderBy("l_orderkey")
      },
      """WITH a AS (
        |  SELECT l_orderkey, list_sort(list(cast(l_quantity as int))) AS q
        |  FROM lineitem GROUP BY 1)
        |SELECT l_orderkey,
        |  len(q) AS n,
        |  len(list_distinct(q)) AS distinct_n,
        |  cast(list_sum(q) as bigint) AS total,
        |  list_min(q) AS mn,
        |  list_max(q) AS mx,
        |  len(list_filter(q, x -> x % 2 = 0)) AS evens
        |FROM a ORDER BY l_orderkey""".stripMargin),

    // ----------------------------------------------------------------
    // JSON path extraction battery: documents built byte-identically in
    // both engines (explicit concat, no engine JSON serializer), then
    // pulled apart with each engine's native path functions — nested
    // object paths, array indexing, array length, null on missing path.
    // Map-only.
    "q_json_funcs" -> Q(
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          concat(lit("{\"k\":"), col("o_orderkey").cast("string"),
            lit(",\"nested\":{\"c\":"), col("o_custkey").cast("string"),
            lit(",\"p\":\""), col("o_orderpriority"),
            lit("\"},\"arr\":["), (col("o_orderkey") % 7).cast("string"),
            lit(","), (col("o_custkey") % 5).cast("string"),
            lit("]}")).as("j"))
        .select(col("o_orderkey"),
          get_json_object(col("j"), "$.k").cast("long").as("k"),
          get_json_object(col("j"), "$.nested.p").as("p"),
          get_json_object(col("j"), "$.nested.c").cast("long").as("c"),
          get_json_object(col("j"), "$.arr[1]").cast("long").as("arr_1"),
          json_array_length(get_json_object(col("j"), "$.arr"))
            .cast("long").as("arr_len"),
          get_json_object(col("j"), "$.missing").isNull.as("missing_is_null"))
        .orderBy("o_orderkey"),
      """WITH built AS (
        |  SELECT o_orderkey,
        |    '{"k":' || cast(o_orderkey as varchar) ||
        |    ',"nested":{"c":' || cast(o_custkey as varchar) ||
        |    ',"p":"' || o_orderpriority ||
        |    '"},"arr":[' || cast(o_orderkey % 7 as varchar) ||
        |    ',' || cast(o_custkey % 5 as varchar) || ']}' AS j
        |  FROM orders)
        |SELECT o_orderkey,
        |  cast(json_extract_string(j, '$.k') as bigint) AS k,
        |  json_extract_string(j, '$.nested.p') AS p,
        |  cast(json_extract_string(j, '$.nested.c') as bigint) AS c,
        |  cast(json_extract_string(j, '$.arr[1]') as bigint) AS arr_1,
        |  cast(json_array_length(j, '$.arr') as bigint) AS arr_len,
        |  json_extract_string(j, '$.missing') IS NULL AS missing_is_null
        |FROM built ORDER BY o_orderkey""".stripMargin),

    // ----------------------------------------------------------------
    // Map-type battery: construction, extraction, concat, key listing,
    // and the map HOFs (transform_values / map_filter). Values are
    // deterministic functions of base columns, so the oracle checks the
    // results as ground-truth scalars — engine-neutral, no reliance on
    // DuckDB's map dialect. Map-only.
    "q_map_funcs" -> Q(
      (s, d) => Tables.orders(s, d)
        .withColumn("m", map(lit("qty"), col("o_orderkey") % 7,
          lit("cust"), col("o_custkey") % 5))
        .withColumn("m2", map_concat(col("m"), map(lit("flag"), lit(1L))))
        .select(col("o_orderkey"),
          element_at(col("m"), "qty").as("qty_val"),
          element_at(col("m"), "cust").as("cust_val"),
          size(col("m2")).cast("long").as("n_keys"),
          array_join(array_sort(map_keys(col("m2"))), ",").as("keys"),
          expr("map_contains_key(m, 'qty')").as("has_qty"),
          element_at(expr("transform_values(m, (k, v) -> v * 2)"), "qty")
            .as("qty_doubled"),
          size(expr("map_filter(m, (k, v) -> v > 2)")).cast("long")
            .as("n_gt2"))
        .orderBy("o_orderkey"),
      """SELECT o_orderkey,
        |  o_orderkey % 7 AS qty_val,
        |  o_custkey % 5 AS cust_val,
        |  cast(3 as bigint) AS n_keys,
        |  'cust,flag,qty' AS keys,
        |  true AS has_qty,
        |  (o_orderkey % 7) * 2 AS qty_doubled,
        |  cast(CASE WHEN o_orderkey % 7 > 2 THEN 1 ELSE 0 END
        |     + CASE WHEN o_custkey % 5 > 2 THEN 1 ELSE 0 END as bigint)
        |    AS n_gt2
        |FROM orders ORDER BY o_orderkey""".stripMargin),

    // ----------------------------------------------------------------
    // Error-safe arithmetic under ANSI mode: try_divide / try_cast return
    // null where strict evaluation would abort the job — the dirty-data
    // battery. Map-only; the oracle mirrors null-on-zero/null-on-garbage
    // with CASE guards (DuckDB doubles divide to inf, not error).
    "q_try_arith" -> Q(
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          (col("o_custkey") % 10).cast("double").as("div0"),
          when(col("o_orderkey") % 5 === 0, lit("N/A"))
            .otherwise(col("o_totalprice").cast("string")).as("amt_raw"))
        .select(col("o_orderkey"),
          try_divide(lit(100.0), col("div0")).as("safe_div"),
          try_element_at(array(lit(10L), lit(20L)),
            (col("o_orderkey") % 4 + 1).cast("int")).as("safe_elem"),
          col("amt_raw").try_cast("double").as("parsed_amt"),
          col("amt_raw").try_cast("double").isNull.as("is_dirty"))
        .orderBy("o_orderkey"),
      """SELECT o_orderkey,
        |  CASE WHEN cast(o_custkey % 10 as double) = 0 THEN NULL
        |       ELSE 100.0 / cast(o_custkey % 10 as double) END AS safe_div,
        |  ([cast(10 as bigint), cast(20 as bigint)])[cast(o_orderkey % 4 + 1 as int)] AS safe_elem,
        |  try_cast(CASE WHEN o_orderkey % 5 = 0 THEN 'N/A'
        |    ELSE cast(o_totalprice as varchar) END as double) AS parsed_amt,
        |  try_cast(CASE WHEN o_orderkey % 5 = 0 THEN 'N/A'
        |    ELSE cast(o_totalprice as varchar) END as double) IS NULL AS is_dirty
        |FROM orders ORDER BY o_orderkey""".stripMargin),

    // ----------------------------------------------------------------
    "q_window_lag" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
          .withColumn("prev_value", lag(col("value"), 1).over(w))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .orderBy(col("user_id"), col("event_id"))
      },
      """SELECT event_id, user_id, event_type, value,
        |  lag(value)       OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS next_type
        |FROM events ORDER BY user_id, event_id""".stripMargin),

    // ----------------------------------------------------------------
    "q_rollup" -> Q(
      (s, d) =>
        Tables.lineitem(s, d)
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(
            count(lit(1)).as("cnt"),
            dsum(col("l_quantity")).cast("double").as("sum_qty"),
            grouping(col("l_returnflag")).as("g_flag"),
            grouping(col("l_linestatus")).as("g_status"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
            col("cnt"), col("sum_qty"), col("g_flag"), col("g_status"))
          .orderBy("returnflag", "linestatus"),
      s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
         |  coalesce(l_linestatus, 'ALL') AS linestatus,
         |  count(*) AS cnt, ${sqlSumD("l_quantity")} AS sum_qty,
         |  cast(grouping(l_returnflag) as tinyint) AS g_flag,
         |  cast(grouping(l_linestatus) as tinyint) AS g_status
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY returnflag, linestatus""".stripMargin),

    // ----------------------------------------------------------------
    "q_cube" -> Q(
      (s, d) =>
        Tables.orders(s, d)
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).cast("double").as("total"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("cnt"), col("total"))
          .orderBy("status", "priority"),
      s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
         |  coalesce(o_orderpriority, 'ALL') AS priority,
         |  count(*) AS cnt, ${sqlSumD("o_totalprice")} AS total
         |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         |ORDER BY status, priority""".stripMargin),

    // ----------------------------------------------------------------
    "q_distinct_agg" -> Q(
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_supps"),
            countDistinct(col("l_orderkey")).as("n_orders"),
            count(lit(1)).as("n_rows"))
          .orderBy("l_returnflag"),
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(DISTINCT l_orderkey) AS n_orders,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // ----------------------------------------------------------------
    // HLL sketch counts. The estimates are engine-specific, so the output
    // surfaces the EXACT counts (hash-matched) plus the 10% error bound as
    // a boolean the oracle emits as literal `true` — sketch drift past the
    // bound turns the driver gate red instead of passing a rows-only check.
    "q_approx_distinct" -> Q(
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            approx_count_distinct(col("l_partkey")).as("ap"),
            approx_count_distinct(col("l_orderkey")).as("ao"),
            countDistinct(col("l_partkey")).as("exact_parts"),
            countDistinct(col("l_orderkey")).as("exact_orders"))
          .select(col("l_returnflag"), col("exact_parts"), col("exact_orders"),
            (abs(col("ap") - col("exact_parts")).cast("double")
              / col("exact_parts") <= 0.10).as("parts_within_10pct"),
            (abs(col("ao") - col("exact_orders")).cast("double")
              / col("exact_orders") <= 0.10).as("orders_within_10pct"))
          .orderBy("l_returnflag"),
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS exact_parts,
        |  count(DISTINCT l_orderkey) AS exact_orders,
        |  true AS parts_within_10pct,
        |  true AS orders_within_10pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // ----------------------------------------------------------------
    "q_percentiles" -> Q(
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            round(expr("percentile(l_quantity, 0.25)"), 6).as("p25"),
            round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
            round(expr("percentile(l_quantity, 0.75)"), 6).as("p75"))
          .orderBy("l_returnflag"),
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.25), 6) AS p25,
        |  round(quantile_cont(l_quantity, 0.5),  6) AS p50,
        |  round(quantile_cont(l_quantity, 0.75), 6) AS p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // ----------------------------------------------------------------
    // Quantile sketch (Greenwald-Khanna). Same oracle pattern as
    // q_approx_distinct: exact interpolated percentiles hash-match, the
    // sketch's 2%-relative-error bound rides along as a boolean the oracle
    // pins to literal `true` (accuracy=1000 → ~0.1% rank error, far inside
    // 2% value error on this price distribution).
    "q_approx_percentile" -> Q(
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("ap50"),
            expr("approx_percentile(l_extendedprice, 0.95, 1000)").as("ap95"),
            round(expr("percentile(l_extendedprice, 0.5)"), 6).as("exact_p50"),
            round(expr("percentile(l_extendedprice, 0.95)"), 6).as("exact_p95"))
          .select(col("l_returnflag"), col("exact_p50"), col("exact_p95"),
            (abs(col("ap50") - col("exact_p50")).cast("double")
              / col("exact_p50") <= 0.02).as("p50_within_2pct"),
            (abs(col("ap95") - col("exact_p95")).cast("double")
              / col("exact_p95") <= 0.02).as("p95_within_2pct"))
          .orderBy("l_returnflag"),
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5),  6) AS exact_p50,
        |  round(quantile_cont(l_extendedprice, 0.95), 6) AS exact_p95,
        |  true AS p50_within_2pct,
        |  true AS p95_within_2pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // ----------------------------------------------------------------
    "q_pivot" -> Q(
      (s, d) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val p = Tables.events(s, d)
          .groupBy(date_trunc("day", col("ts")).as("event_date"))
          .pivot("event_type", types)
          .count()
        p.select(col("event_date") +: types.map(t =>
            coalesce(col(t), lit(0L)).as(t)): _*)
          .orderBy("event_date")
      },
      """SELECT date_trunc('day', ts) AS event_date,
        |  count(*) FILTER (WHERE event_type = 'click')    AS click,
        |  count(*) FILTER (WHERE event_type = 'error')    AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup')   AS signup,
        |  count(*) FILTER (WHERE event_type = 'view')     AS view
        |FROM events GROUP BY 1 ORDER BY event_date""".stripMargin),

    // ----------------------------------------------------------------
    "q_scalar_subquery" -> Q(
      (s, d) => {
        val ord = Tables.orders(s, d)
        // exact decimal mean → one double divide: engine-stable threshold
        val thr = ord.agg((dsum(col("o_totalprice")).cast("double") /
          count(lit(1))).as("thr"))
        ord.join(broadcast(thr))
          .filter(col("o_totalprice") > col("thr"))
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy("o_orderkey")
      },
      s"""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         |WHERE o_totalprice > (
         |  SELECT cast(${sqlSum("o_totalprice")} as double) / count(*) FROM orders)
         |ORDER BY o_orderkey""".stripMargin),

    // ----------------------------------------------------------------
    "q_in_subquery" -> Q(
      (s, d) => {
        val hi = Tables.lineitem(s, d)
          .filter(col("l_quantity") >= 49)
          .select(col("l_partkey")).distinct()
        Tables.part(s, d)
          .join(hi, col("p_partkey") === col("l_partkey"), "left_semi")
          .select("p_partkey", "p_name", "p_brand")
          .orderBy("p_partkey")
      },
      """SELECT p_partkey, p_name, p_brand FROM part
        |WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
        |ORDER BY p_partkey""".stripMargin),

    // ----------------------------------------------------------------
    // Recursive CTE (Spark 4's WITH RECURSIVE → UnionLoop plan): unroll a
    // 12-installment payment schedule per selected order — the iterative
    // SQL shape (hierarchies, schedules, transitive closure) warehouses
    // serve with recursion and pre-4.x Spark could not express. Runs as a
    // REAL recursive query on the Spark side (spark.sql, not a DataFrame
    // re-formulation), so the oracle also locks the engine's recursion
    // semantics against DuckDB's.
    "q_recursive_cte" -> Q(
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_qrec")
        s.sql(
          """WITH RECURSIVE inst AS (
            |  SELECT o_orderkey, cast(o_orderdate as date) AS due, 1 AS n,
            |         cast(o_totalprice as double) / 12 AS amt
            |  FROM orders_qrec WHERE o_orderkey % 97 = 0
            |  UNION ALL
            |  SELECT o_orderkey, date_add(due, 30), n + 1, amt
            |  FROM inst WHERE n < 12
            |)
            |SELECT o_orderkey, n, due, amt
            |FROM inst ORDER BY o_orderkey, n""".stripMargin)
      },
      """WITH RECURSIVE inst AS (
        |  SELECT o_orderkey, cast(o_orderdate as date) AS due, 1 AS n,
        |         cast(o_totalprice as double) / 12 AS amt
        |  FROM orders WHERE o_orderkey % 97 = 0
        |  UNION ALL
        |  SELECT o_orderkey, due + 30, n + 1, amt
        |  FROM inst WHERE n < 12
        |)
        |SELECT o_orderkey, n, due, amt
        |FROM inst ORDER BY o_orderkey, n""".stripMargin),

    "q_cte_chain" -> Q(
      (s, d) => {
        val monthly = Tables.orders(s, d)
          .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
          .agg(dsum(col("o_totalprice")).as("revenue"))
        val w = Window.orderBy(col("month"))
        monthly
          .withColumn("prev_revenue", lag(col("revenue"), 1).over(w))
          .withColumn("growth",
            round((col("revenue") - col("prev_revenue")).cast("double") /
              col("prev_revenue").cast("double"), 6))
          .filter(col("prev_revenue").isNotNull)
          .select(col("month"), col("revenue").cast("double").as("revenue"),
            col("prev_revenue").cast("double").as("prev_revenue"), col("growth"))
          .orderBy("month")
      },
      s"""WITH monthly AS (
         |  SELECT date_trunc('month', o_orderdate) AS month,
         |         ${sqlSum("o_totalprice")} AS revenue
         |  FROM orders GROUP BY 1),
         |chained AS (
         |  SELECT month, revenue,
         |         lag(revenue) OVER (ORDER BY month) AS prev_revenue
         |  FROM monthly)
         |SELECT month, cast(revenue as double) AS revenue,
         |  cast(prev_revenue as double) AS prev_revenue,
         |  round(cast(revenue - prev_revenue as double) /
         |        cast(prev_revenue as double), 6) AS growth
         |FROM chained WHERE prev_revenue IS NOT NULL ORDER BY month""".stripMargin),

    // ----------------------------------------------------------------
    "q_setops" -> Q(
      (s, d) => {
        val custN = Tables.customer(s, d)
          .select(col("c_nationkey").cast("int").as("nationkey")).distinct()
        val suppN = Tables.supplier(s, d)
          .select(col("s_nationkey").cast("int").as("nationkey")).distinct()
        val both = custN.intersect(suppN).withColumn("tag", lit("both"))
        val custOnly = custN.except(suppN).withColumn("tag", lit("cust_only"))
        val suppOnly = suppN.except(custN).withColumn("tag", lit("supp_only"))
        both.union(custOnly).union(suppOnly).orderBy("tag", "nationkey")
      },
      """WITH c AS (SELECT DISTINCT cast(c_nationkey as int) AS nationkey FROM customer),
        |     s AS (SELECT DISTINCT cast(s_nationkey as int) AS nationkey FROM supplier)
        |SELECT nationkey, 'both' AS tag FROM (SELECT * FROM c INTERSECT SELECT * FROM s)
        |UNION ALL
        |SELECT nationkey, 'cust_only' FROM (SELECT * FROM c EXCEPT SELECT * FROM s)
        |UNION ALL
        |SELECT nationkey, 'supp_only' FROM (SELECT * FROM s EXCEPT SELECT * FROM c)
        |ORDER BY tag, nationkey""".stripMargin),

    // ----------------------------------------------------------------
    "q_string_funcs" -> Q(
      (s, d) =>
        Tables.part(s, d)
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("name_upper"),
            lower(col("p_type")).as("type_lower"),
            substring(col("p_name"), 1, 5).as("name_prefix"),
            length(col("p_name")).as("name_len"),
            split_part(col("p_name"), lit(" "), lit(1)).as("first_word"),
            regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
            concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
            replace(col("p_name"), lit(" "), lit("_")).as("name_snake"))
          .orderBy("p_partkey"),
      """SELECT p_partkey,
        |  upper(p_name) AS name_upper,
        |  lower(p_type) AS type_lower,
        |  substring(p_name, 1, 5) AS name_prefix,
        |  cast(length(p_name) as int) AS name_len,
        |  split_part(p_name, ' ', 1) AS first_word,
        |  regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
        |  concat(p_brand, '/', p_type) AS brand_type,
        |  replace(p_name, ' ', '_') AS name_snake
        |FROM part ORDER BY p_partkey""".stripMargin),

    // ----------------------------------------------------------------
    "q_date_funcs" -> Q(
      (s, d) =>
        Tables.orders(s, d)
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("yr"),
            month(col("o_orderdate")).as("mon"),
            quarter(col("o_orderdate")).as("qtr"),
            dayofyear(col("o_orderdate")).as("doy"),
            date_trunc("month", col("o_orderdate")).as("month_start"),
            (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("plus30"),
            datediff(lit("2002-01-01").cast("date"),
              col("o_orderdate").cast("date")).as("days_to_2002"))
          .orderBy("o_orderkey"),
      """SELECT o_orderkey,
        |  cast(year(o_orderdate) as int) AS yr,
        |  cast(month(o_orderdate) as int) AS mon,
        |  cast(quarter(o_orderdate) as int) AS qtr,
        |  cast(dayofyear(o_orderdate) as int) AS doy,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  o_orderdate + INTERVAL 30 DAY AS plus30,
        |  cast(date_diff('day', cast(o_orderdate as date), DATE '2002-01-01') as int) AS days_to_2002
        |FROM orders ORDER BY o_orderkey""".stripMargin),

    // ----------------------------------------------------------------
    "q_having" -> Q(
      (s, d) =>
        Tables.orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).cast("double").as("total"))
          .filter(col("n_orders") >= 12)
          .orderBy("o_custkey"),
      s"""SELECT o_custkey, count(*) AS n_orders, ${sqlSumD("o_totalprice")} AS total
         |FROM orders GROUP BY o_custkey HAVING count(*) >= 12
         |ORDER BY o_custkey""".stripMargin),

    // ----------------------------------------------------------------
    "q_case_agg" -> Q(
      (s, d) =>
        Tables.orders(s, d)
          .groupBy(col("o_orderpriority"))
          .agg(
            sum(when(col("o_orderstatus") === "F", dec(col("o_totalprice")))
              .otherwise(decZero)).cast("double").as("finished_total"),
            sum(when(col("o_orderstatus") === "O", lit(1L)).otherwise(lit(0L)))
              .as("open_cnt"),
            count(lit(1)).as("cnt"))
          .orderBy("o_orderpriority"),
      """SELECT o_orderpriority,
        |  cast(sum(CASE WHEN o_orderstatus = 'F'
        |           THEN cast(o_totalprice as decimal(38,9))
        |           ELSE cast(0 as decimal(38,9)) END) as double) AS finished_total,
        |  cast(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) as bigint) AS open_cnt,
        |  count(*) AS cnt
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    // ----------------------------------------------------------------
    "q_grouping_sets" -> Q(
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_gs")
        s.sql(s"""
          SELECT coalesce(o_orderstatus, 'ALL') AS status,
                 coalesce(o_orderpriority, 'ALL') AS priority,
                 count(*) AS cnt,
                 cast(sum(cast(o_totalprice as decimal(38,9))) as double) AS total
          FROM orders_gs
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          ORDER BY status, priority""")
      },
      s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
         |  coalesce(o_orderpriority, 'ALL') AS priority,
         |  count(*) AS cnt, ${sqlSumD("o_totalprice")} AS total
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         |ORDER BY status, priority""".stripMargin),

    // ----------------------------------------------------------------
    // Wide→long reshape via the native unpivot operator (the inverse of
    // q_pivot): measures melt into (measure, value) rows. Map-only after
    // the aggregate — the melt itself never shuffles.
    "q_unpivot" -> Q(
      (s, d) => {
        val base = Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(dsum(col("l_quantity")).cast("double").as("sum_qty"),
            dsum(col("l_extendedprice")).cast("double").as("sum_base_price"),
            count(lit(1)).cast("double").as("n_items"))
        base.unpivot(
          Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_base_price"), col("n_items")),
          "measure", "value")
          .orderBy("l_returnflag", "measure")
      },
      s"""WITH base AS (
         |  SELECT l_returnflag,
         |    ${sqlSumD("l_quantity")} AS sum_qty,
         |    ${sqlSumD("l_extendedprice")} AS sum_base_price,
         |    cast(count(*) as double) AS n_items
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, measure, cast(value as double) AS value
         |FROM base UNPIVOT (value FOR measure IN (sum_qty, sum_base_price, n_items))
         |ORDER BY l_returnflag, measure""".stripMargin),

    // ----------------------------------------------------------------
    // Correlated EXISTS / NOT EXISTS through the SQL surface: Catalyst
    // decorrelates both predicates into a left-semi and a left-anti join
    // on o_custkey — same one-shuffle shape as q_semijoin/q_antijoin, but
    // exercising the subquery-rewrite path rather than hand-built joins.
    "q_exists_correlated" -> Q(
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("customer_ex")
        Tables.orders(s, d).createOrReplaceTempView("orders_ex")
        s.sql("""
          SELECT c_custkey, c_name FROM customer_ex c
          WHERE EXISTS (SELECT 1 FROM orders_ex o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_totalprice > 150000)
            AND NOT EXISTS (SELECT 1 FROM orders_ex o
                            WHERE o.o_custkey = c.c_custkey
                              AND o.o_orderpriority = '1-URGENT')
          ORDER BY c_custkey""")
      },
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 150000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin),

    // ----------------------------------------------------------------
    // Correlated LATERAL join: top-2 orders per customer through the
    // LATERAL SQL surface — Catalyst decorrelates the per-row subquery
    // (ORDER BY + LIMIT inside) into a ranked window join, the same
    // one-shuffle shape as q_window_rank but arrived at by the optimizer.
    "q_lateral" -> Q(
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("customer_lat")
        Tables.orders(s, d).createOrReplaceTempView("orders_lat")
        s.sql("""
          SELECT c.c_custkey, l.o_orderkey,
                 cast(l.o_totalprice as double) AS price
          FROM customer_lat c,
          LATERAL (SELECT o_orderkey, o_totalprice FROM orders_lat o
                   WHERE o.o_custkey = c.c_custkey
                   ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
          ORDER BY c.c_custkey, price DESC, l.o_orderkey""")
      },
      """SELECT c.c_custkey, l.o_orderkey,
        |  cast(l.o_totalprice as double) AS price
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
        |         WHERE o.o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) l
        |ORDER BY c.c_custkey, price DESC, l.o_orderkey""".stripMargin),

    // ----------------------------------------------------------------
    // Salted two-stage distinct-count: the skew-mitigation pattern for
    // COUNT(DISTINCT x) on a hot group key. Stage 1 groups on
    // (key, hash(x) % 16) so one hot key's distinct set spreads across 16
    // reducers; stage 2 sums the disjoint partial counts (hash-partitioned
    // salts make buckets disjoint, so the sum is exact). Plain partial
    // aggregation can't collapse DISTINCT map-side — salting is the
    // standard 100 TB fix, verified here against the direct formulation.
    "q_salted_agg" -> Q(
      (s, d) => {
        val salted = Tables.lineitem(s, d)
          .select("l_suppkey", "l_partkey")
          .groupBy(col("l_suppkey"),
            pmod(hash(col("l_partkey")), lit(16)).as("salt"))
          .agg(countDistinct(col("l_partkey")).as("pc"),
            count(lit(1)).as("rc"))
        salted.groupBy("l_suppkey")
          .agg(sum(col("pc")).cast("long").as("n_parts"),
            sum(col("rc")).cast("long").as("n_rows"))
          .orderBy("l_suppkey")
      },
      """SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin),

    // ----------------------------------------------------------------
    // Salted JOIN — the companion skew pattern to q_salted_agg, for when
    // one hot key of a fact-fact join concentrates a reducer and the other
    // side is too big to broadcast: the skewed side salts its key with a
    // row-local deterministic hash, the other side explodes once per salt
    // value, and the join runs on (key, salt) so the hot key spreads over
    // SaltBuckets reducers. Replication cost = |other side| × SaltBuckets
    // — the explicit trade AQE's skew split makes adaptively (PlanSpec
    // locks that rewrite); this is the manual form for the plans AQE can't
    // touch. Verified ≡ the plain unsalted join via the oracle.
    "q_salted_join" -> Q(
      (s, d) => {
        val SaltBuckets = 8
        val fact = Tables.lineitem(s, d)
          .select(col("l_orderkey"),
            (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"),
            pmod(hash(col("l_partkey"), col("l_suppkey"), col("l_linenumber")),
              lit(SaltBuckets)).as("salt"))
        val dim = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderstatus"))
          .withColumn("salt",
            explode(array((0 until SaltBuckets).map(lit(_)): _*)))
        fact.join(dim,
            fact("l_orderkey") === dim("o_orderkey") &&
              fact("salt") === dim("salt"))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_lines"),
            dsum(col("rev")).cast("double").as("revenue"))
          .orderBy("o_orderstatus")
      },
      s"""SELECT o_orderstatus, count(*) AS n_lines,
         |  ${sqlSumD("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1 ORDER BY 1""".stripMargin),

    // ----------------------------------------------------------------
    // Partial-aggregate re-merge — the incremental-rollup pattern: daily
    // partials (sum/count/min/max are all mergeable) roll up to monthly
    // WITHOUT touching base rows again. At 100 TB this is how rollup
    // tables stay incremental: each day aggregates once, months re-merge
    // day partials. Verified against the direct monthly aggregation.
    "q_reaggregate" -> Q(
      (s, d) => {
        val daily = Tables.orders(s, d)
          .groupBy(date_trunc("day", col("o_orderdate")).as("day"),
            col("o_orderstatus"))
          .agg(dsum(col("o_totalprice")).as("p_sum"),
            count(lit(1)).as("p_n"),
            min(col("o_totalprice")).as("p_min"),
            max(col("o_totalprice")).as("p_max"))
        daily
          .groupBy(date_trunc("month", col("day")).as("month"),
            col("o_orderstatus"))
          .agg(sum(col("p_sum")).cast("double").as("total"),
            sum(col("p_n")).cast("long").as("n_orders"),
            min(col("p_min")).cast("double").as("min_price"),
            max(col("p_max")).cast("double").as("max_price"))
          .orderBy("month", "o_orderstatus")
      },
      s"""SELECT date_trunc('month', o_orderdate) AS month, o_orderstatus,
         |  ${sqlSumD("o_totalprice")} AS total,
         |  count(*) AS n_orders,
         |  cast(min(o_totalprice) as double) AS min_price,
         |  cast(max(o_totalprice) as double) AS max_price
         |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // ----------------------------------------------------------------
    "q_values_lookup" -> Q(
      (s, d) => {
        import s.implicits._
        val tiers = Seq(
          ("1-URGENT", "hot"), ("2-HIGH", "hot"), ("3-MEDIUM", "warm"),
          ("4-NOT SPECIFIED", "cold"), ("5-LOW", "cold"))
          .toDF("priority", "tier")
        Tables.orders(s, d)
          .join(broadcast(tiers), col("o_orderpriority") === col("priority"))
          .groupBy(col("tier"))
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).cast("double").as("total"))
          .orderBy("tier")
      },
      s"""SELECT tier, count(*) AS n_orders, ${sqlSumD("o_totalprice")} AS total
         |FROM orders
         |JOIN (VALUES ('1-URGENT','hot'), ('2-HIGH','hot'), ('3-MEDIUM','warm'),
         |             ('4-NOT SPECIFIED','cold'), ('5-LOW','cold')) AS t(priority, tier)
         |  ON o_orderpriority = priority
         |GROUP BY tier ORDER BY tier""".stripMargin),

    // Key-skew profiler: the distribution of group sizes under a join /
    // aggregation key — min/avg/p50/p99/max and the max/avg skew ratio,
    // the numbers that decide whether a key needs salting or AQE skew
    // handling BEFORE the expensive job runs. Two hash aggregations
    // (sizes, then a 1-row profile); the percentiles interpolate over
    // exact integer counts so both engines agree bit-for-bit.
    "q_skew_profile" -> Q(
      (s, d) => Tables.orders(s, d)
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
        .agg(
          count(lit(1)).as("n_groups"),
          min(col("n")).as("min_n"),
          max(col("n")).as("max_n"),
          round(avg(col("n")), 6).as("avg_n"),
          round(expr("percentile(n, 0.5)"), 6).as("p50_n"),
          round(expr("percentile(n, 0.99)"), 6).as("p99_n"),
          round(max(col("n")) / avg(col("n")), 6).as("skew_ratio")),
      """WITH sizes AS (
        |  SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey)
        |SELECT count(*) AS n_groups, min(n) AS min_n, max(n) AS max_n,
        |  round(avg(n), 6) AS avg_n,
        |  round(quantile_cont(n, 0.5), 6) AS p50_n,
        |  round(quantile_cont(n, 0.99), 6) AS p99_n,
        |  round(max(n) / avg(n), 6) AS skew_ratio
        |FROM sizes""".stripMargin),

    // The PRODUCTION formulation of the profiler for unbounded key
    // cardinality: the exact variant above funnels one long per group
    // into a single percentile buffer — fine at gate scale and as the
    // oracle contract, but at billions of distinct keys that is
    // billions of values on one reducer. approx_percentile's
    // QuantileSummaries sketch partial-aggregates map-side (constant
    // memory per task, mergeable), so the profile costs one extra
    // hash-agg pass regardless of key count. Accuracy 10000 ≈ 0.01%
    // rank error — ample for a salting decision. Rows-only (DuckDB has
    // no matching sketch); SkewProfileSpec pins approx≈exact at gate
    // scale.
    "q_skew_profile_approx" -> Q(
      (s, d) => Tables.orders(s, d)
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
        .agg(
          count(lit(1)).as("n_groups"),
          min(col("n")).as("min_n"),
          max(col("n")).as("max_n"),
          round(avg(col("n")), 6).as("avg_n"),
          expr("approx_percentile(n, 0.5, 10000)").as("p50_n"),
          expr("approx_percentile(n, 0.99, 10000)").as("p99_n"),
          round(max(col("n")) / avg(col("n")), 6).as("skew_ratio")),
      None),

    // ----------------------------------------------------------------
    // Bucketed RANGE JOIN (point-in-interval). Naively a non-equi join
    // plans as BroadcastNestedLoop — O(|probe|·|intervals|) comparisons,
    // dead at 100 TB. The scale formulation makes it an EQUI-join:
    // intervals explode into the fixed-width time buckets they overlap
    // (bucket width = window length ⇒ ≤ 2 buckets per interval), points
    // carry their single bucket, the join keys on bucket, and the exact
    // range predicate applies as a residual filter. Each (interval,
    // point) pair meets in exactly ONE bucket — the point's — so no
    // dedup pass. Shuffle cost is O(n) on bucket keys; dense buckets
    // shard like any skewed key (AQE skew-join handles the hot week).
    "q_range_join" -> Q(
      (s, d) => {
        val win = 7 // days — [o_orderdate, o_orderdate + 7)
        val epoch = lit(java.sql.Date.valueOf("1970-01-01"))
        val intervals = Tables.orders(s, d)
          .filter(col("o_totalprice") > 495000)
          .select(col("o_orderkey"),
            datediff(to_date(col("o_orderdate")), epoch).as("start_day"))
          .withColumn("bucket", explode(sequence(
            floor(col("start_day") / win).cast("long"),
            floor((col("start_day") + win - 1) / win).cast("long"))))
        val points = Tables.lineitem(s, d)
          .select(col("l_orderkey"),
            datediff(to_date(col("l_shipdate")), epoch).as("ship_day"))
          .withColumn("bucket",
            floor(col("ship_day") / win).cast("long"))
        intervals.join(points, Seq("bucket"))
          .filter(col("ship_day") >= col("start_day") &&
            col("ship_day") < col("start_day") + win)
          .groupBy("o_orderkey")
          .agg(count(lit(1)).as("n_items"),
            countDistinct(col("l_orderkey")).as("n_orders"))
          .orderBy("o_orderkey")
      },
      s"""SELECT o_orderkey, count(*) AS n_items,
         |  count(DISTINCT l_orderkey) AS n_orders
         |FROM orders JOIN lineitem
         |  ON l_shipdate >= o_orderdate
         |  AND l_shipdate < o_orderdate + INTERVAL 7 DAY
         |WHERE o_totalprice > 495000
         |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin),

    // ----------------------------------------------------------------
    // Snowflake QUALIFY (reference dialect; round 15): the literal
    // clause runs through graft's lexical rewrite — the SAME text a
    // Snowflake user writes, and the SAME text the DuckDB oracle runs
    // natively (DuckDB implements QUALIFY), so the oracle checks both
    // the rewrite's correctness and the window semantics. Top-2 orders
    // per customer by price; the window shuffles on o_custkey (keyed,
    // never a single partition) and the filter applies post-window —
    // exactly the plan a hand-written window+filter produces.
    "q_qualify" -> Q(
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("graft_qualify_orders")
        graft.plans.QualifyRewrite.sql(s,
          """SELECT o_custkey, o_orderkey,
            |  cast(o_totalprice AS double) AS price
            |FROM graft_qualify_orders
            |QUALIFY row_number() OVER (PARTITION BY o_custkey
            |  ORDER BY o_totalprice DESC, o_orderkey) <= 2
            |ORDER BY o_custkey, o_orderkey""".stripMargin)
      },
      """SELECT o_custkey, o_orderkey,
        |  cast(o_totalprice AS double) AS price
        |FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey) <= 2
        |ORDER BY o_custkey, o_orderkey""".stripMargin),

    // ----------------------------------------------------------------
    // Benford first-digit analysis per return-flag (round 15): the
    // classic financial-forensics screen the reference's anomaly layer
    // (sql/06_anomaly_detection.sql) motivates — fabricated amounts
    // drift from the log10(1 + 1/d) first-digit law. The digit comes
    // from integer CENTS rendered as a string (exact and identical in
    // both engines; double→string formatting and log10-at-power-of-ten
    // boundaries are not). One keyed aggregate + a ≤9-row-per-group
    // stats join; the chi-square statistic sums over the 9 digits with
    // a partition window. Map-side partial aggregation carries the
    // whole thing at 100 TB — the digit grain is |groups|×9.
    "q_benford" -> Q(
      (s, d) => {
        val cents = expr("cast(round(l_extendedprice * 100) as bigint)")
        val digits = Tables.lineitem(s, d)
          .select(col("l_returnflag").as("grp"),
            substring(cents.cast("string"), 1, 1).cast("int").as("digit"))
        val counts = digits.groupBy("grp", "digit")
          .agg(count(lit(1)).as("n"))
        val totals = counts.groupBy("grp").agg(sum("n").as("total"))
        val w = Window.partitionBy("grp")
        counts.join(totals, "grp")
          .withColumn("p_exp",
            log10(lit(1.0) + lit(1.0) / col("digit").cast("double")))
          .withColumn("p_obs", col("n").cast("double") / col("total"))
          .withColumn("chi2", round(sum(
            pow(col("n").cast("double") - col("total") * col("p_exp"), 2)
              / (col("total") * col("p_exp"))).over(w), 6))
          .select(col("grp"), col("digit"), col("n"),
            round(col("p_obs"), 6).as("p_obs"),
            round(col("p_exp"), 6).as("p_exp"),
            round(abs(col("p_obs") - col("p_exp")), 6).as("dev"),
            col("chi2"))
          .orderBy("grp", "digit")
      },
      """WITH digits AS (
        |  SELECT l_returnflag AS grp,
        |    CAST(substring(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM lineitem),
        |counts AS (
        |  SELECT grp, digit, count(*) AS n FROM digits GROUP BY 1, 2),
        |tot AS (SELECT grp, sum(n) AS total FROM counts GROUP BY 1),
        |j AS (
        |  SELECT c.grp, c.digit, c.n, t.total,
        |    log10(1.0 + 1.0 / CAST(c.digit AS DOUBLE)) AS p_exp,
        |    CAST(c.n AS DOUBLE) / t.total AS p_obs
        |  FROM counts c JOIN tot t USING (grp))
        |SELECT grp, digit, n,
        |  round(p_obs, 6) AS p_obs,
        |  round(p_exp, 6) AS p_exp,
        |  round(abs(p_obs - p_exp), 6) AS dev,
        |  round(sum(pow(CAST(n AS DOUBLE) - total * p_exp, 2)
        |    / (total * p_exp)) OVER (PARTITION BY grp), 6) AS chi2
        |FROM j ORDER BY grp, digit""".stripMargin)
  )
}
