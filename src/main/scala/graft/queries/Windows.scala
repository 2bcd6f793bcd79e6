package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** Window-function surface (SURVEY.md §2.3 "Window functions" row):
  * ranking, frame aggregation, analytic lag/lead, and top-k.
  *
  * Determinism: every window ORDER BY carries a unique tiebreak key, and
  * `events.ts` is compared as epoch-ms on both engines (Spark truncates
  * the parquet ns timestamps to µs; ms is the common grid — FIXTURES.md). */
object Windows {

  val queries: Map[String, Fn] = Map(
    // Round 17 (this and the other per-key window rows below): ONE
    // range exchange on the window key serves BOTH the window's
    // clustering requirement (RangePartitioning on k satisfies
    // ClusteredDistribution(k) — equal keys are co-located) and the
    // final ORDER BY's key prefix, so the output sort runs within
    // partitions and the plan drops a whole output-sized exchange
    // (3 exchanges → 1 in the window family; same global order,
    // oracle-verified).
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .repartitionByRange(col("o_custkey"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .sortWithinPartitions(col("o_custkey"), col("rn"))
    }),

    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .repartitionByRange(col("o_custkey"))
        .withColumn("running", round(sum(col("o_totalprice")).over(w), 2))
        .select(col("o_custkey"), col("o_orderkey"), col("running"))
        .sortWithinPartitions(col("o_custkey"), col("o_orderkey"))
    }),

    "q_window_lag" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_millis(col("ts")), col("event_id"))
      t(s, dir, "events")
        .repartitionByRange(col("user_id"))
        .withColumn("prev_value", round(lag(col("value"), 1).over(w), 4))
        .withColumn("next_value", round(lead(col("value"), 1).over(w), 4))
        .select(col("user_id"), col("event_id"), col("prev_value"), col("next_value"))
        .sortWithinPartitions(col("user_id"), col("event_id"))
    }),

    // Distribution ranking functions (round 3): NTILE buckets +
    // PERCENT_RANK / CUME_DIST. Both are exact small-integer ratios
    // ((rank-1)/(n-1), peers/n) — ROUND(…,4) only guards the division
    // ulp. Unique (price, orderkey) ordering keeps ranks deterministic.
    "q_window_ntile" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .repartitionByRange(col("o_custkey"))
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .withColumn("pct_rank", round(percent_rank().over(w), 4))
        .withColumn("cume", round(cume_dist().over(w), 4))
        .select(col("o_custkey"), col("o_orderkey"), col("quartile"),
          col("pct_rank"), col("cume"))
        .sortWithinPartitions(col("o_custkey"), col("o_orderkey"))
    }),

    // Value-navigation functions over a whole-partition frame (round 3):
    // first/last/nth order value per customer by order date. The frame
    // must be explicitly unbounded-both-ways — last_value over the
    // default frame is the running current row, a classic trap.
    "q_window_firstlast" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .repartitionByRange(col("o_custkey"))
        .withColumn("first_price", first_value(col("o_totalprice")).over(w))
        .withColumn("last_price", last_value(col("o_totalprice")).over(w))
        .withColumn("second_price", nth_value(col("o_totalprice"), 2).over(w))
        .select(col("o_custkey"), col("o_orderkey"),
          col("first_price"), col("last_price"), col("second_price"))
        .sortWithinPartitions(col("o_custkey"), col("o_orderkey"))
    }),

    // Sort + limit: Spark plans TakeOrderedAndProject (no full sort of
    // the losing rows on a cluster).
    "q_topk" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .limit(20)),

    // 7-day moving average over daily totals (round 2): RANGE window
    // frame over the time axis. The window input is the already-
    // aggregated DAILY table (time-bounded rows), so the global-order
    // window is over ~30 rows, not raw events — the correct layering at
    // any scale. Exact decimal daily sums + one final division keep the
    // result engine-portable.
    "q_moving_avg" -> ((s, dir) => {
      val day = 86400000L
      val daily = t(s, dir, "events")
        .groupBy(graft.wheel.RollupBuilder
          .slotMs(col("ts"), graft.wheel.Tier.Day).as("day_ms"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("day_sum"))
      val w = Window.orderBy(col("day_ms")).rangeBetween(-6L * day, 0L)
      daily.select(
        col("day_ms"),
        round(col("day_sum").cast("double"), 2).as("day_total"),
        round(sum(col("day_sum")).over(w).cast("double") /
          count(lit(1)).over(w), 2).as("ma7"))
        .orderBy(col("day_ms"))
    }),

    // Batch sessionization (round 2) — the batch analogue of the
    // streaming session window: per user, a new session starts after a
    // >6h event-time gap; gap-flag via LAG, session number via running
    // sum, then per-session aggregates. One shuffle on user_id serves
    // both window passes and the final group-by. Tie-safety: rows tied
    // on ts get gap 0 against each other whichever way the engine
    // orders them, and the default RANGE cumsum frame includes peers,
    // so session assignment is engine-deterministic.
    // Engine-native session windows (round 10): GROUP BY
    // session_window(ts, gap) — Spark's dynamic-size window that closes
    // after 6h of event-time inactivity, the built-in spelling of
    // q_sessionize's hand-rolled gaps-and-islands. Session end is the
    // last event's ts + gap and EXCLUSIVE: an event arriving exactly
    // `gap` after the previous one opens a NEW session (windows
    // [t, t+gap) and [t+gap, …) do not overlap), which the oracle
    // mirrors with a `diff >= gap` island break. One shuffle on
    // user_id; Spark merges overlapping per-event windows in the
    // MergingSessions aggregation path — no self-join, no driver-side
    // work, scale-safe at any row count. Decimal-domain sum keeps the
    // per-session aggregate addition-order-exact across engines.
    "q_session_window_sql" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "6 hours"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2)
            .as("sum_value"))
        .select(col("user_id"),
          unix_millis(col("session_window.start")).as("start_ms"),
          unix_millis(col("session_window.end")).as("end_ms"),
          col("n_events"), col("sum_value"))
        .orderBy(col("user_id"), col("start_ms"))
    }),

    "q_sessionize" -> ((s, dir) => {
      val gapMs = 6L * 3600000L
      val tms = unix_millis(col("ts"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("tms"))
      // round 17: one range exchange on user_id serves the window, the
      // per-(user, session) aggregate (clustering by a superset key is
      // satisfied by the user_id partitioning) and the final order — the
      // output-sized sort exchange drops out of the plan
      t(s, dir, "events")
        .select(col("user_id"), tms.as("tms"), col("value"))
        .repartitionByRange(col("user_id"))
        .withColumn("new_s",
          when(lag(col("tms"), 1).over(w).isNull ||
            col("tms") - lag(col("tms"), 1).over(w) > gapMs, 1).otherwise(0))
        .withColumn("session_no", sum(col("new_s")).over(w)) // RANGE frame: peers included
        .groupBy(col("user_id"), col("session_no"))
        .agg(count(lit(1)).as("n_events"),
          min(col("tms")).as("start_ms"),
          max(col("tms")).as("end_ms"),
          round(sum(col("value")), 2).as("sum_value"))
        .sortWithinPartitions(col("user_id"), col("session_no"))
    }),

    // Per-event trailing-window features (round 5): for every event,
    // the count/sum of the SAME USER's activity in the preceding hour —
    // the event-time RANGE frame (not ROWS) that powers feature
    // engineering for ML at scale. The frame is value-based
    // ([tms-3600000, tms-1]), so rows tied on tms exclude each other
    // identically in both engines regardless of their physical order;
    // one shuffle on user_id serves the whole pass. Decimal-domain sum
    // keeps the frame aggregate addition-order-exact.
    "q_trailing_features" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("tms"))
        .rangeBetween(-3600000L, -1L)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("tms"), col("value"))
        .select(col("event_id"), col("user_id"),
          count(col("value")).over(w).as("n_prev_hour"),
          coalesce(sum(col("value").cast("decimal(18,2)")).over(w)
            .cast("double"), lit(0.0)).as("sum_prev_hour"))
        .orderBy(col("event_id"))
    }))

  val oracle: Map[String, String] = Map(
    "q_window_rank" ->
      ("SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (" +
        "SELECT o_custkey, o_orderkey, o_totalprice, " +
        "ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn " +
        "FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn"),
    "q_window_running" ->
      ("SELECT o_custkey, o_orderkey, ROUND(SUM(o_totalprice) OVER (" +
        "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running " +
        "FROM orders ORDER BY o_custkey, o_orderkey"),
    "q_window_lag" ->
      ("SELECT user_id, event_id, " +
        "ROUND(LAG(value, 1) OVER w, 4) AS prev_value, " +
        "ROUND(LEAD(value, 1) OVER w, 4) AS next_value " +
        "FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) " +
        "ORDER BY user_id, event_id"),
    "q_window_ntile" ->
      ("SELECT o_custkey, o_orderkey, " +
        "CAST(NTILE(4) OVER w AS BIGINT) AS quartile, " +
        "ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank, " +
        "ROUND(CUME_DIST() OVER w, 4) AS cume " +
        "FROM orders " +
        "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) " +
        "ORDER BY o_custkey, o_orderkey"),
    "q_window_firstlast" ->
      ("SELECT o_custkey, o_orderkey, " +
        "FIRST_VALUE(o_totalprice) OVER w AS first_price, " +
        "LAST_VALUE(o_totalprice) OVER w AS last_price, " +
        "NTH_VALUE(o_totalprice, 2) OVER w AS second_price " +
        "FROM orders " +
        "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
        "ORDER BY o_custkey, o_orderkey"),
    "q_topk" ->
      ("SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem " +
        "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20"),
    "q_moving_avg" ->
      ("WITH daily AS (SELECT (epoch_ms(ts) // 86400000) * 86400000 AS day_ms, " +
        "SUM(CAST(value AS DECIMAL(18,2))) AS day_sum FROM events GROUP BY 1) " +
        "SELECT day_ms, ROUND(CAST(day_sum AS DOUBLE), 2) AS day_total, " +
        "ROUND(CAST(SUM(day_sum) OVER w AS DOUBLE) / COUNT(1) OVER w, 2) AS ma7 " +
        "FROM daily WINDOW w AS (ORDER BY day_ms " +
        "RANGE BETWEEN 518400000 PRECEDING AND CURRENT ROW) ORDER BY day_ms"),
    "q_session_window_sql" ->
      ("WITH g AS (SELECT user_id, epoch_ms(ts) AS tms, value, " +
        "CASE WHEN LAG(epoch_ms(ts)) OVER w IS NULL " +
        "OR epoch_ms(ts) - LAG(epoch_ms(ts)) OVER w >= 21600000 " +
        "THEN 1 ELSE 0 END AS new_s FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts))), " +
        "s AS (SELECT user_id, tms, value, " +
        "SUM(new_s) OVER (PARTITION BY user_id ORDER BY tms) AS sid FROM g) " +
        "SELECT user_id, MIN(tms) AS start_ms, MAX(tms) + 21600000 AS end_ms, " +
        "COUNT(1) AS n_events, " +
        "ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value " +
        "FROM s GROUP BY user_id, sid ORDER BY user_id, start_ms"),
    "q_sessionize" ->
      ("WITH g AS (SELECT user_id, epoch_ms(ts) AS tms, value, " +
        "CASE WHEN LAG(epoch_ms(ts)) OVER w IS NULL " +
        "OR epoch_ms(ts) - LAG(epoch_ms(ts)) OVER w > 21600000 " +
        "THEN 1 ELSE 0 END AS new_s FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts))), " +
        "s AS (SELECT user_id, tms, value, " +
        "CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY tms) AS BIGINT) AS session_no " +
        "FROM g) " +
        "SELECT user_id, session_no, COUNT(1) AS n_events, MIN(tms) AS start_ms, " +
        "MAX(tms) AS end_ms, ROUND(SUM(value), 2) AS sum_value " +
        "FROM s GROUP BY user_id, session_no ORDER BY user_id, session_no"),
    "q_trailing_features" ->
      ("SELECT event_id, user_id, COUNT(value) OVER w AS n_prev_hour, " +
        "COALESCE(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE), 0.0) AS sum_prev_hour " +
        "FROM (SELECT event_id, user_id, epoch_ms(ts) AS tms, value FROM events) " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY tms " +
        "RANGE BETWEEN 3600000 PRECEDING AND 1 PRECEDING) " +
        "ORDER BY event_id"))
}
