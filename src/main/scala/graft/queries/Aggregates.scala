package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column
import Q._

/** Grouped / distinct / multi-dimensional aggregation surface
  * (SURVEY.md §2.3 "Aggregations" row; DataFusion reaches these via
  * `ctx.sql`, /root/reference/src/main.rs:266 — here they are Spark
  * built-ins exercised through oracle-checked queries).
  *
  * Float determinism (SURVEY.md §5.3 / §7.8 risk #1): large money sums are
  * computed as `SUM(CAST(x AS DECIMAL(18,2)))` then cast to DOUBLE —
  * decimal summation is exact integer arithmetic in both Spark and DuckDB,
  * so the result is bit-identical regardless of summation order. Plain
  * `ROUND(SUM(double),2)` is only used where the sum is small enough that
  * double accumulation error cannot reach the rounding boundary.
  */
object Aggregates {

  /** Order-insensitive exact money sum: identical bits in Spark & DuckDB. */
  private def moneySum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")
  private def moneySumSql(e: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(18,2))) AS DOUBLE)"

  val queries: Map[String, Fn] = Map(
    // TPC-H Q1 shape — hash agg with partial/final split.
    "q_agg_group" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).cast("double").as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_base"),
          // exact decimal-domain multiply: money data is 2-decimal, so the
          // product is an exact 4-decimal value — per-row double rounding
          // would tie at .xx5 where Spark (HALF_UP) and DuckDB (HALF_EVEN)
          // disagree.
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1.0).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)")))
            .cast("double").as("sum_disc"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    "q_agg_distinct" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n"))
        .orderBy(col("event_type"))),

    "q_agg_rollup" -> ((s, dir) =>
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)),

    "q_agg_cube" -> ((s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)),

    "q_grouping_sets" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_gs")
      s.sql(
        s"""SELECT o_orderstatus, o_orderpriority, COUNT(1) AS n,
           |       ${moneySumSql("o_totalprice")} AS total
           |FROM orders_gs
           |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
           |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
           |""".stripMargin)
    }),

    // HLL sketch distinct — approximate, no oracle (bounds checked in
    // ScalaTest); maps µWheel-style sketch aggregation to Spark's
    // built-in HyperLogLog++.
    "q_approx_distinct" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("approx_users"))
        .orderBy(col("event_type"))),

    // Mergeable quantile sketch (round 2) — the other standard sketch
    // aggregate a 100 TB pipeline leans on; Spark's percentile_approx
    // (GK-style) runs as partial+final like any hash agg. Approximate →
    // no oracle; error bounds vs exact percentiles in ScalaTest.
    "q_approx_quantile" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(percentile_approx(col("value"),
          array(lit(0.5), lit(0.95), lit(0.99)), lit(10000)).as("q"))
        .select(col("event_type"),
          col("q").getItem(0).as("p50"),
          col("q").getItem(1).as("p95"),
          col("q").getItem(2).as("p99"))
        .orderBy(col("event_type"))),

    // Pivot (round 2): day × event_type count matrix with an explicit
    // column list — the explicit list keeps the plan a single pass (no
    // values-discovery job) and the output schema stable at any scale.
    "q_pivot" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(graft.wheel.RollupBuilder
          .slotMs(col("ts"), graft.wheel.Tier.Day).as("day_ms"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("day_ms"))),

    // Statistical aggregates (round 2): per-type dispersion + linear
    // association. ROUND(…,4) absorbs the cross-engine ulp differences
    // of the streaming variance formulations.
    "q_stats_agg" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          round(stddev_samp(col("value")), 4).as("sd"),
          round(var_samp(col("value")), 4).as("variance"),
          // skewness deliberately omitted from the surface: Spark uses the
          // population formula, DuckDB the bias-corrected sample one —
          // systematically different values, not a rounding matter
          round(corr(col("value"), unix_millis(col("ts")).cast("double")), 4).as("corr_vt"))
        .orderBy(col("event_type"))),

    // Boolean aggregates (round 3): bool_and/bool_or — universal and
    // existential predicates folded per group in one hash-agg pass.
    "q_bool_agg" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          bool_and(col("value") > 0.0).as("all_positive"),
          bool_or(col("value") > 300.0).as("any_huge"),
          bool_and(get_json_object(col("props"), "$.k").isNotNull).as("all_have_k"))
        .orderBy(col("event_type"))),

    // Argmin/argmax (round 5): "the row that achieved the extreme" in
    // one hash-agg pass — no self-join, no window. Ties on the raw
    // price are broken by folding the (unique) order key into an exact
    // integer rank: cents × 10^10 + key preserves price order and makes
    // the comparand total, so Spark's max_by and DuckDB's arg_max pick
    // the identical row on any engine and any combine order. Headroom:
    // TPC-H prices cap near 5.6e7 cents and orderkeys stay below 10^10
    // through SF ~1600, so the packed rank (< 5.6e17) fits a BIGINT
    // with price order intact at any scale this engine targets.
    "q_argminmax" -> ((s, dir) => {
      val rank = round(col("o_totalprice") * 100).cast("long") *
        lit(10000000000L) + col("o_orderkey")
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          max_by(col("o_orderkey"), rank).as("max_order"),
          min_by(col("o_orderkey"), rank).as("min_order"),
          max(col("o_totalprice")).as("max_price"),
          min(col("o_totalprice")).as("min_price"))
        .orderBy(col("o_orderpriority"))
    }),

    // Conditional aggregation (round 3): FILTER/CASE-guarded aggregates
    // in one hash-agg pass — the "segmented metrics without N scans"
    // primitive. Exact-decimal conditional money sum keeps it
    // engine-portable at any row count.
    "q_cond_agg" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          count(when(col("value") > 100.0, 1)).as("n_big"),
          sum(when(col("value") > 100.0, col("value")).otherwise(0.0)
            .cast("decimal(18,4)")).cast("double").as("sum_big"),
          count(when(get_json_object(col("props"), "$.k").cast("int") > 50, 1))
            .as("n_k_high"))
        .orderBy(col("event_type"))),

    // Ordered string aggregation (round 3): per-region sorted
    // comma-joined nation list. Spark has no ordered string_agg — the
    // deterministic spelling is collect_list → array_sort → array_join.
    // collect_list (bag), NOT collect_set: DuckDB's string_agg keeps
    // duplicates, and a set here would silently diverge the moment two
    // rows in a group share a name.
    "q_string_agg" -> ((s, dir) =>
      t(s, dir, "nation")
        .groupBy(col("n_regionkey"))
        .agg(
          array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
          count(lit(1)).as("n"))
        .orderBy(col("n_regionkey"))),

    // Fixed-width histogram (round 3): floor-binning is plain arithmetic
    // (no width_bucket dialect dependence), one codegen hash agg; bin
    // cardinality is bounded by the value domain, not row count.
    "q_histogram" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy((floor(col("value") / 25.0) * 25).cast("long").as("bin_lo"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bin_lo"))),

    // Exact interpolated percentiles (round 3): the non-sketch
    // counterpart of q_approx_quantile — Spark's `percentile` and
    // DuckDB's `quantile_cont` both take the linear-interpolation
    // definition, so the median/IQR are oracle-comparable under ROUND.
    // Scale note: exact percentile buffers the per-group value multiset
    // (state grows with distinct values), so this is the declared
    // exactness BASELINE; q_approx_quantile's mergeable sketch is the
    // bounded-state path a 100 TB pipeline runs.
    "q_median" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 4).as("median"),
          round(expr("percentile(value, 0.75) - percentile(value, 0.25)"), 4).as("iqr"))
        .orderBy(col("event_type"))),

    // Hour-of-day seasonality profile (round 3): 24-row diurnal rollup —
    // the temporal-feature pass of an events pipeline. hour() on a UTC
    // session matches DuckDB's hour(); exact-decimal sums as everywhere.
    "q_time_features" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(hour(col("ts")).cast("long").as("h"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .orderBy(col("h"))),

    // Mergeable HLL sketches (round 3): Spark's Datasketches HLL surface
    // — per-type sketches built in one pass, then UNIONED into a global
    // estimate without touching raw data again. Sketch mergeability is
    // THE 100 TB cardinality pattern (partial sketches per partition /
    // day, cheap re-aggregation to any rollup). Approximate → no oracle;
    // ScalaTest bounds the estimates against exact counts.
    "q_hll_sketch" -> ((s, dir) => {
      val perType = t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
      val overall = perType
        .agg(hll_union_agg(col("sk"), lit(false)).as("sk"))
        .select(lit("_all").as("event_type"), col("sk"))
      perType.select(col("event_type"), col("sk"))
        .union(overall)
        .select(col("event_type"), hll_sketch_estimate(col("sk")).as("est_users"))
        .orderBy(col("event_type"))
    }),

    // Heavy hitters via Spark's approx_top_k sketch (round 3): the
    // streaming-mergeable frequent-items counterpart of q_vocab_topk's
    // exact TakeOrdered — at 100 TB the sketch's bounded state
    // (maxItemsTracked) replaces a full vocab shuffle. The sketch
    // returns 5× headroom and the final 10 are re-ranked by the
    // deterministic (count desc, token) key, so ties at the rank-10
    // boundary can't flip membership run-to-run (approx_top_k's own
    // order among equal counts follows partial-merge order).
    // ORACLE-CHECKED since round 7 (VERDICT r6 #8, exact regime): the
    // corpus vocabulary is 31 tokens at every shipped SF — far under
    // the 10 000 tracked budget (counts exact) AND under the k=50
    // candidate ask (the sketch returns the COMPLETE histogram, so the
    // rank-50 candidate boundary cannot clip a tie group). The
    // approximate regime's guarantees stay covered in ScalaTest.
    "q_heavy_hitters" -> ((s, dir) =>
      docs(s, dir)
        .select(explode(split(col("text"), " ")).as("tok"))
        .agg(expr("approx_top_k(tok, 50, 10000)").as("top"))
        .select(explode(col("top")).as("e"))
        .select(col("e.item").as("tok"), col("e.count").cast("long").as("n"))
        .orderBy(col("n").desc, col("tok"))
        .limit(10)),

    // µWheel's composite `All` aggregator as a typed Aggregator UDAF
    // (SURVEY.md §2.2 / §7.5): one buffer carries sum/count/min/max
    // through partial+final ObjectHashAggregate; avg derived at finish
    // (lower). Oracle = the equivalent multi-aggregate SQL.
    "q_agg_all_udaf" -> ((s, dir) => {
      graft.functions.Aggregators.register(s)
      t(s, dir, "events")
        .filter(unix_millis(col("ts")) >= lit(Q.R1Start) &&
          unix_millis(col("ts")) < lit(Q.R1End))
        .agg(expr("graft_all(value)").as("r"))
        .select(
          round(col("r.sum_v"), 2).as("sum_value"),
          col("r.cnt").as("n"),
          round(col("r.min_v"), 4).as("min_value"),
          round(col("r.max_v"), 4).as("max_value"),
          round(col("r.avg_v"), 4).as("avg_value"),
          round(col("r.sd_pop"), 4).as("sd_pop"))
    }),

    // µWheel's `TopN` aggregator (SURVEY.md §2.2 / §7.5): bounded-heap
    // buffer, so the per-group shuffle payload is O(n), never O(rows).
    // Oracle = ROW_NUMBER window ≤ n (value-identical under price ties).
    "q_topn_udaf" -> ((s, dir) => {
      graft.functions.Aggregators.register(s)
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(expr("graft_topn(o_totalprice)").as("tops"))
        .select(col("o_custkey"), posexplode(col("tops")))
        .select(col("o_custkey"), (col("pos") + 1).cast("long").as("rk"),
          col("col").as("price"))
        .orderBy(col("o_custkey"), col("rk"))
    }))

  val oracle: Map[String, String] = Map(
    "q_agg_group" ->
      ("SELECT l_returnflag, l_linestatus, CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty, " +
        s"${moneySumSql("l_extendedprice")} AS sum_base, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(CAST(1.0 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc, " +
        "ROUND(AVG(l_quantity), 4) AS avg_qty, COUNT(1) AS n " +
        "FROM lineitem GROUP BY l_returnflag, l_linestatus " +
        "ORDER BY l_returnflag, l_linestatus"),
    "q_agg_distinct" ->
      ("SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(1) AS n " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "q_agg_rollup" ->
      ("SELECT o_orderstatus, o_orderpriority, COUNT(1) AS n, " +
        s"${moneySumSql("o_totalprice")} AS total " +
        "FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority) " +
        "ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"),
    "q_agg_cube" ->
      ("SELECT o_orderstatus, o_orderpriority, COUNT(1) AS n, " +
        s"${moneySumSql("o_totalprice")} AS total " +
        "FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority) " +
        "ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"),
    "q_grouping_sets" ->
      ("SELECT o_orderstatus, o_orderpriority, COUNT(1) AS n, " +
        s"${moneySumSql("o_totalprice")} AS total " +
        "FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ()) " +
        "ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"),
    "q_median" ->
      ("SELECT event_type, ROUND(quantile_cont(value, 0.5), 4) AS median, " +
        "ROUND(quantile_cont(value, 0.75) - quantile_cont(value, 0.25), 4) AS iqr " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "q_time_features" ->
      ("SELECT CAST(hour(ts) AS BIGINT) AS h, COUNT(1) AS n, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value " +
        "FROM events GROUP BY 1 ORDER BY 1"),
    "q_bool_agg" ->
      ("SELECT event_type, bool_and(value > 0.0) AS all_positive, " +
        "bool_or(value > 300.0) AS any_huge, " +
        "bool_and(json_extract_string(props, '$.k') IS NOT NULL) AS all_have_k " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "q_argminmax" ->
      ("SELECT o_orderpriority, " +
        "arg_max(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 10000000000 + o_orderkey) AS max_order, " +
        "arg_min(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 10000000000 + o_orderkey) AS min_order, " +
        "MAX(o_totalprice) AS max_price, MIN(o_totalprice) AS min_price " +
        "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "q_cond_agg" ->
      ("SELECT event_type, COUNT(1) AS n, " +
        "COUNT(CASE WHEN value > 100.0 THEN 1 END) AS n_big, " +
        "CAST(SUM(CAST(CASE WHEN value > 100.0 THEN value ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE) AS sum_big, " +
        "COUNT(CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) > 50 THEN 1 END) AS n_k_high " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "q_string_agg" ->
      ("SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations, " +
        "COUNT(1) AS n FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"),
    "q_histogram" ->
      ("SELECT CAST(FLOOR(value / 25.0) * 25 AS BIGINT) AS bin_lo, COUNT(1) AS n " +
        "FROM events GROUP BY 1 ORDER BY 1"),
    "q_agg_all_udaf" ->
      (s"SELECT ROUND(SUM(value), 2) AS sum_value, COUNT(*) AS n, " +
        "ROUND(MIN(value), 4) AS min_value, ROUND(MAX(value), 4) AS max_value, " +
        "ROUND(AVG(value), 4) AS avg_value, " +
        "ROUND(STDDEV_POP(value), 4) AS sd_pop " +
        s"FROM events WHERE epoch_ms(ts) >= ${Q.R1Start} AND epoch_ms(ts) < ${Q.R1End}"),
    "q_topn_udaf" ->
      ("SELECT o_custkey, CAST(rn AS BIGINT) AS rk, o_totalprice AS price FROM (" +
        "SELECT o_custkey, o_totalprice, ROW_NUMBER() OVER (" +
        "PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rn FROM orders) " +
        "WHERE rn <= 3 ORDER BY o_custkey, rk"),
    "q_pivot" ->
      ("SELECT (epoch_ms(ts) // 86400000) * 86400000 AS day_ms, " +
        "COUNT(1) FILTER (WHERE event_type = 'click') AS click, " +
        "COUNT(1) FILTER (WHERE event_type = 'error') AS error, " +
        "COUNT(1) FILTER (WHERE event_type = 'purchase') AS purchase, " +
        "COUNT(1) FILTER (WHERE event_type = 'signup') AS signup, " +
        "COUNT(1) FILTER (WHERE event_type = 'view') AS \"view\" " +
        "FROM events GROUP BY 1 ORDER BY 1"),
    "q_stats_agg" ->
      ("SELECT event_type, ROUND(stddev_samp(value), 4) AS sd, " +
        "ROUND(var_samp(value), 4) AS variance, " +
        "ROUND(corr(value, CAST(epoch_ms(ts) AS DOUBLE)), 4) AS corr_vt " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "q_heavy_hitters" ->
      ("SELECT tok, CAST(n AS BIGINT) AS n FROM (" +
        "SELECT tok, COUNT(1) AS n FROM (" +
        "SELECT unnest(string_split(text, ' ')) AS tok FROM documents) " +
        "GROUP BY tok) ORDER BY n DESC, tok LIMIT 10"))
}
