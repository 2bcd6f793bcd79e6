package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.wheel.Tier
import Q._

/** Time-series analytics ON TOP of the folded wheel series (round 12).
  *
  * Every key here states a plain-SQL analytic whose only heavy input is
  * a slot-grouped aggregate over a registered table: the wheel rewrite
  * answers that inner Aggregate scan-free (O(slots) rows from the
  * index), and the analytic itself — window functions, HAVING, Sort+
  * Limit, a second Aggregate — runs over those ≤O(slots) rows. At
  * 100 TB the statement's cost is the analytic over ~30–900 slot rows,
  * not the scan: the composition the wheel exists to enable (the
  * reference's index answers the range aggregate, main.rs:205–288;
  * everything above is ordinary relational algebra).
  *
  * All keys are oracle-checked: the analytics operate on the ROUNDED
  * folded series (both engines see bit-identical inputs), and every
  * comparison/threshold is on rounded values or exact integer counts so
  * cross-engine float association can never flip a row.
  */
object Analytics {

  /** Full events span [2024-01-01, 2024-01-31) — 30 day slots. */
  private val FStart: Long = Jan1
  private val FEnd: Long = Jan1 + 30 * Day

  /** The folded daily series both engines agree on bit-for-bit:
    * 30 rows of (slot_ms, ROUND(SUM(value),2)). */
  private def dailySpark: String =
    s"""SELECT (unix_millis(ts) div ${Tier.Day.ms}) * ${Tier.Day.ms} AS slot_ms,
       |       ROUND(SUM(value), 2) AS sum_value
       |FROM events_wheel
       |WHERE unix_millis(ts) >= $FStart AND unix_millis(ts) < $FEnd
       |GROUP BY 1""".stripMargin

  private def dailyDuck: String =
    s"SELECT (epoch_ms(ts) // ${Tier.Day.ms}) * ${Tier.Day.ms} AS slot_ms, " +
      "ROUND(SUM(value), 2) AS sum_value FROM events " +
      s"WHERE epoch_ms(ts) >= $FStart AND epoch_ms(ts) < $FEnd GROUP BY 1"

  private def registered(s: SparkSession, dir: String): Unit = {
    graft.plans.WheelAcceleration.register(
      s, s"$dir/events.parquet", t(s, dir, "events"))
    t(s, dir, "events").createOrReplaceTempView("events_wheel")
  }

  val queries: Map[String, Fn] = Map(

    // Z-SCORE ANOMALY SCAN over the folded daily series: which days
    // deviate from the month? The fold supplies the 30 daily sums; the
    // z-score is two whole-partition window aggregates over them. The
    // classic "alert on an unusual day" query — at 100 TB the alert
    // costs 30 rows of window math, not a scan.
    "q_wheel_anomaly_sql" -> ((s, dir) => {
      registered(s, dir)
      s.sql(
        s"""WITH d AS ($dailySpark)
           |SELECT slot_ms, sum_value,
           |       ROUND((sum_value - AVG(sum_value) OVER ())
           |             / STDDEV_SAMP(sum_value) OVER (), 2) AS zscore
           |FROM d ORDER BY slot_ms""".stripMargin)
    }),

    // DAY-OVER-DAY PERCENT CHANGE: LAG over the folded series. The
    // growth-rate spelling of q_wheel_wow_sql's self-join — one fold,
    // one window pass, no second range.
    "q_wheel_pct_change_sql" -> ((s, dir) => {
      registered(s, dir)
      s.sql(
        s"""WITH d AS ($dailySpark),
           |l AS (SELECT slot_ms, sum_value,
           |             LAG(sum_value) OVER (ORDER BY slot_ms) AS prev
           |      FROM d)
           |SELECT slot_ms, sum_value,
           |       ROUND(100.0 * (sum_value - prev) / prev, 2) AS pct_change
           |FROM l WHERE prev IS NOT NULL ORDER BY slot_ms""".stripMargin)
    }),

    // EWMA SMOOTHING (adjusted form, α=0.2): s_t = Σ w_i·x_i / Σ w_i
    // with w_i = 0.8^(t−i) — both cumulative sums expressible as plain
    // window SUMs via w_i ∝ 1.25^i (the 0.8^t factor cancels in the
    // ratio; 1.25^30 ≈ 808, no overflow). The trend line a monitoring
    // dashboard draws over the folded series.
    "q_wheel_ewma_sql" -> ((s, dir) => {
      registered(s, dir)
      s.sql(
        s"""WITH d AS ($dailySpark),
           |r AS (SELECT slot_ms, sum_value,
           |             ROW_NUMBER() OVER (ORDER BY slot_ms) AS rn
           |      FROM d)
           |SELECT slot_ms, sum_value,
           |       ROUND(SUM(sum_value * POW(1.25, rn)) OVER (ORDER BY rn)
           |             / SUM(POW(1.25, rn)) OVER (ORDER BY rn), 2) AS ewma
           |FROM r ORDER BY slot_ms""".stripMargin)
    }),

    // TOP-N DAYS: Sort + Limit composed ABOVE the fold — "which 5 days
    // had the most revenue" costs a 30-row sort. Ordered by the rounded
    // measure (bit-identical cross-engine) with slot_ms as total-order
    // tiebreak.
    "q_wheel_topdays_sql" -> ((s, dir) => {
      registered(s, dir)
      s.sql(
        s"""WITH d AS ($dailySpark)
           |SELECT slot_ms, sum_value FROM d
           |ORDER BY sum_value DESC, slot_ms LIMIT 5""".stripMargin)
    }),

    // HAVING over the fold: the filter lands on the folded aggregate
    // row, not the scan. The threshold is an exact integer COUNT — no
    // float boundary at any scale factor.
    "q_wheel_having_sql" -> ((s, dir) => {
      registered(s, dir)
      s.sql(
        s"""SELECT (unix_millis(ts) div ${Tier.Day.ms}) * ${Tier.Day.ms} AS slot_ms,
           |       ROUND(SUM(value), 2) AS sum_value, COUNT(*) AS n
           |FROM events_wheel
           |WHERE unix_millis(ts) >= $FStart AND unix_millis(ts) < $FEnd
           |GROUP BY 1 HAVING COUNT(*) > 330 ORDER BY 1""".stripMargin)
    }),

    // HOUR-OF-DAY PROFILE: a second Aggregate over the folded hourly
    // series — 720 folded rows regrouped into 24 diurnal buckets.
    // "What does a typical day look like" without touching a raw row.
    "q_wheel_hourofday_sql" -> ((s, dir) => {
      registered(s, dir)
      s.sql(
        s"""WITH h AS (
           |  SELECT (unix_millis(ts) div ${Tier.Hour.ms}) * ${Tier.Hour.ms} AS slot_ms,
           |         SUM(value) AS sv, COUNT(*) AS cn
           |  FROM events_wheel
           |  WHERE unix_millis(ts) >= $FStart AND unix_millis(ts) < $FEnd
           |  GROUP BY 1)
           |SELECT CAST((slot_ms div ${Tier.Hour.ms}) % 24 AS INT) AS hod,
           |       ROUND(SUM(sv), 2) AS sum_value,
           |       CAST(SUM(cn) AS BIGINT) AS n,
           |       ROUND(AVG(sv), 2) AS avg_hour_sum
           |FROM h GROUP BY 1 ORDER BY 1""".stripMargin)
    }),

    // TWO REGISTRATIONS, ONE STATEMENT: the events wheel and the
    // lineitem wheel each fold their own Aggregate inside one UNION ALL
    // query (the rewrite fires per-Aggregate via transformUp). A
    // dashboard joining two indexed tables never scans either.
    "q_wheel_two_table_sql" -> ((s, dir) => {
      graft.plans.WheelAcceleration.register(
        s, s"$dir/events.parquet", t(s, dir, "events"))
      graft.plans.WheelAcceleration.registerMulti(
        s, s"$dir/lineitem.parquet", t(s, dir, "lineitem"),
        "l_shipdate", Seq("l_quantity", "l_discount", "l_tax"))
      t(s, dir, "events").createOrReplaceTempView("events_wheel")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem_wheel")
      s.sql(
        s"""WITH e AS (
           |  SELECT 'events' AS src,
           |         (unix_millis(ts) div ${Tier.Day.ms}) * ${Tier.Day.ms} AS slot_ms,
           |         ROUND(SUM(value), 2) AS measure
           |  FROM events_wheel
           |  WHERE unix_millis(ts) >= $R1Start AND unix_millis(ts) < $R1End
           |  GROUP BY 2),
           |l AS (
           |  SELECT 'lineitem' AS src,
           |         unix_millis(CAST(date_trunc('month', l_shipdate) AS TIMESTAMP)) AS slot_ms,
           |         ROUND(SUM(l_quantity), 2) AS measure
           |  FROM lineitem_wheel
           |  WHERE l_shipdate >= TIMESTAMP_NTZ '1995-06-01 00:00:00'
           |  AND l_shipdate < TIMESTAMP_NTZ '1995-12-01 00:00:00'
           |  GROUP BY date_trunc('month', l_shipdate))
           |SELECT src, slot_ms, measure FROM (
           |  SELECT * FROM e UNION ALL SELECT * FROM l)
           |ORDER BY src, slot_ms""".stripMargin)
    }),

    // BETWEEN spelling (round 12): inclusive bounds over the ms domain
    // fold EXACTLY — unix_millis floors to ms, so `<= E` is `< E+1 ms`
    // at any sub-ms precision. The natural way analysts write ranges.
    "q_wheel_between_sql" -> ((s, dir) => {
      registered(s, dir)
      s.sql(
        s"""SELECT ROUND(SUM(value), 2) AS sum_value, COUNT(*) AS n,
           |MIN(value) AS min_value, MAX(value) AS max_value
           |FROM events_wheel
           |WHERE unix_millis(ts) BETWEEN $R1Start AND ${R1End - 1}""".stripMargin)
    }),

    // CAST(ts AS DATE) rollup (round 12): the ubiquitous daily-rollup
    // spelling folds to the day grid; the date key is rendered as a
    // string so both engines emit the identical 'yyyy-MM-dd' value.
    "q_wheel_date_rollup_sql" -> ((s, dir) => {
      registered(s, dir)
      s.sql(
        s"""SELECT CAST(CAST(ts AS DATE) AS STRING) AS day,
           |ROUND(SUM(value), 2) AS sum_value, COUNT(*) AS n
           |FROM events_wheel
           |WHERE unix_millis(ts) >= $FStart AND unix_millis(ts) < $FEnd
           |GROUP BY CAST(ts AS DATE) ORDER BY 1""".stripMargin)
    }),

    // SHARE-OF-TOTAL over the KEYED fold: per-type share of each day's
    // total — the keyed day-grid Aggregate folds from the per-key
    // wheel, the share is one window SUM over ≤|keys| rows per slot.
    // The "composition of traffic" panel every dashboard draws, with
    // zero file reads.
    "q_wheel_share_sql" -> ((s, dir) => {
      graft.plans.WheelAcceleration.registerKeyed(
        s, s"$dir/events.parquet", t(s, dir, "events"), "event_type")
      t(s, dir, "events").createOrReplaceTempView("events_wheel")
      s.sql(
        s"""WITH k AS (
           |  SELECT event_type,
           |         (unix_millis(ts) div ${Tier.Day.ms}) * ${Tier.Day.ms} AS slot_ms,
           |         ROUND(SUM(value), 2) AS sum_value
           |  FROM events_wheel
           |  WHERE unix_millis(ts) >= $R1Start AND unix_millis(ts) < $R1End
           |  GROUP BY 1, 2)
           |SELECT event_type, slot_ms, sum_value,
           |       ROUND(sum_value / SUM(sum_value) OVER (PARTITION BY slot_ms), 4) AS share
           |FROM k ORDER BY event_type, slot_ms""".stripMargin)
    }),

    // THE WHEEL AS A TABLE (round 12): `spark.read.format("wheel")`
    // serves the registered in-memory index as a DataFrame of minute
    // partials — the seam for consumers the rewrite can't reach (BI
    // tools, joins against slot series, exports). slot_ms range
    // predicates push into the source and prune chunks at plan time;
    // the day regroup runs over O(slots) rows, never the source.
    "q_wheel_table_sql" -> ((s, dir) => {
      graft.plans.WheelAcceleration.register(
        s, s"$dir/events.parquet", t(s, dir, "events"))
      s.read.format("wheel").option("source", s"$dir/events.parquet").load()
        .filter(col("slot_ms") >= R1Start && col("slot_ms") < R1End)
        .groupBy(expr(s"(slot_ms div ${Tier.Day.ms}) * ${Tier.Day.ms}").as("day_ms"))
        .agg(round(sum("sum_value"), 2).as("sum_value"),
          sum("cnt_value").as("n"),
          min("min_value").as("min_value"),
          max("max_value").as("max_value"))
        .orderBy("day_ms")
    }),

    // COMPLETE aggregate pushdown into the wheel table (round 12):
    // SUM/MIN/MAX/COUNT over a slot range are answered by the SOURCE
    // itself (SupportsPushDownAggregates) — the plan carries no
    // Aggregate and no Exchange; ONE answer row ships from the
    // driver-resident index, the executors do zero work. The BI-tool
    // "metric card" shape at its cheapest.
    "q_wheel_table_agg_sql" -> ((s, dir) => {
      graft.plans.WheelAcceleration.register(
        s, s"$dir/events.parquet", t(s, dir, "events"))
      s.read.format("wheel").option("source", s"$dir/events.parquet").load()
        .filter(col("slot_ms") >= R1Start && col("slot_ms") < R1End)
        .agg(round(sum("sum_value"), 2).as("sum_value"),
          sum("cnt_value").as("n"),
          min("min_value").as("min_value"),
          max("max_value").as("max_value"))
    }),

    // KEYED mode of the wheel table (round 12): one row per populated
    // (key, minute slot) — the per-dimension slot series BI tools and
    // downstream joins want. Key equality and slot range push into the
    // source; the day regroup runs over |keys| × O(slots) rows.
    "q_wheel_table_keyed_sql" -> ((s, dir) => {
      graft.plans.WheelAcceleration.registerKeyed(
        s, s"$dir/events.parquet", t(s, dir, "events"), "event_type")
      s.read.format("wheel").option("source", s"$dir/events.parquet")
        .option("keyed", "true").load()
        .filter(col("slot_ms") >= R1Start && col("slot_ms") < R1End)
        .groupBy(col("event_type"),
          expr(s"(slot_ms div ${Tier.Day.ms}) * ${Tier.Day.ms}").as("day_ms"))
        .agg(round(sum("sum_value"), 2).as("sum_value"),
          sum("cnt_value").as("n"))
        .orderBy("event_type", "day_ms")
    }),

    // KEYED aggregate pushdown (round 12): GROUP BY the dimension key
    // is answered by the SOURCE itself — |keys| result rows ship from
    // the driver-resident per-key family; the plan carries no Aggregate
    // and no Exchange below the final |keys|-row sort. "Total per
    // event_type over the range" at its cheapest.
    "q_wheel_table_keyed_agg_sql" -> ((s, dir) => {
      graft.plans.WheelAcceleration.registerKeyed(
        s, s"$dir/events.parquet", t(s, dir, "events"), "event_type")
      s.read.format("wheel").option("source", s"$dir/events.parquet")
        .option("keyed", "true").load()
        .filter(col("slot_ms") >= R1Start && col("slot_ms") < R1End)
        .groupBy(col("event_type"))
        .agg(round(sum("sum_value"), 2).as("sum_value"),
          sum("cnt_value").as("n"),
          min("min_value").as("min_value"),
          max("max_value").as("max_value"))
        .orderBy("event_type")
    }),

    // TOP-N pushdown into the wheel table (round 12): ORDER BY + LIMIT
    // are consumed by the source (SupportsPushDownTopN) — the busiest-
    // minutes leaderboard ships exactly k pre-sorted rows; Sort, its
    // Exchange and the Limit all vanish from the plan. Ordered by the
    // exact integer row count with slot_ms as total-order tiebreak, so
    // the selection is deterministic cross-engine.
    "q_wheel_table_topn_sql" -> ((s, dir) => {
      graft.plans.WheelAcceleration.register(
        s, s"$dir/events.parquet", t(s, dir, "events"))
      s.read.format("wheel").option("source", s"$dir/events.parquet").load()
        .filter(col("slot_ms") >= R1Start && col("slot_ms") < R1End)
        .orderBy(col("rows").desc, col("slot_ms"))
        .limit(5)
        .select(col("slot_ms"), col("rows").as("n"),
          round(col("sum_value"), 2).as("sum_value"))
    }),

    // Persisted-dir mode of the wheel table: load the saved O(slots)
    // artifact straight from disk (no source scan, no registration
    // needed on the reading side) and aggregate it. The 1000-executor
    // deployment shape: one session builds and persists, any session
    // serves.
    "q_wheel_table_persisted_sql" -> ((s, dir) => {
      val idxDir = s"${sys.props("java.io.tmpdir")}/graft_pwheel_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      // same dir contract as q_wheel_persisted: build+save if absent or
      // stale, pure load otherwise
      graft.plans.WheelAcceleration.registerPersisted(
        s, s"$dir/events.parquet", idxDir, t(s, dir, "events"))
      s.read.format("wheel").option("dir", idxDir).load()
        .filter(col("slot_ms") >= R2Start && col("slot_ms") < R2End)
        .groupBy(expr(s"(slot_ms div ${Tier.Hour.ms}) * ${Tier.Hour.ms}").as("hour_ms"))
        .agg(round(sum("sum_value"), 2).as("sum_value"),
          sum("cnt_value").as("n"))
        .orderBy("hour_ms")
    }),

    // CATALOG-qualified wheel read (round 15, VERDICT r14 #4): the
    // deployment spelling of the dir mode — a TableCatalog plugin
    // pointed at a warehouse root resolves `<catalog>.events_minutes`
    // to the persisted index with no per-query option("dir") plumbing;
    // same kind-dispatched read, same slot pushdown. The catalog name
    // embeds the sf dir because Spark caches catalog instances by name
    // after first resolution.
    "q_wheel_catalog_sql" -> ((s, dir) => {
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      val root = s"${sys.props("java.io.tmpdir")}/graft_whcat_$tag"
      graft.plans.WheelAcceleration.registerPersisted(
        s, s"$dir/events.parquet", s"$root/events_minutes", t(s, dir, "events"))
      val cat = s"wheel_$tag"
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.WheelTableCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      s.sql(s"SELECT (slot_ms div ${Tier.Hour.ms}) * ${Tier.Hour.ms} AS hour_ms, " +
        "ROUND(SUM(sum_value), 2) AS sum_value, SUM(cnt_value) AS n " +
        s"FROM $cat.events_minutes " +
        s"WHERE slot_ms >= $R1Start AND slot_ms < $R1End " +
        "GROUP BY 1 ORDER BY 1")
    }),

    // SKETCH dir as a table (round 13, VERDICT r12 #3): the persisted
    // theta dir — "distinct users per minute" — served as a plain table
    // by kind-dispatched dir resolution. Theta is EXACT while per-slot
    // distincts stay under the nominal 4096 entries (every shipped SF),
    // which is what licenses the COUNT(DISTINCT) oracle. The slot-range
    // predicate is consumed by the source; the one-day walk ships
    // ≤ 1 440 pre-sliced rows from the driver-resident artifact.
    "q_wheel_table_sketch_sql" -> ((s, dir) => {
      val base = s"${sys.props("java.io.tmpdir")}/graft_psketch_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      // build-or-load lifecycle shared with q_wheel_persisted_sketch_sql
      graft.plans.WheelAcceleration.registerPersistedSketches(
        s, s"$dir/events.parquet", base, t(s, dir, "events"),
        distinctCols = Seq("user_id"))
      s.read.format("wheel").option("dir", s"$base/theta_user_id").load()
        .filter(col("slot_ms") >= R1Start && col("slot_ms") < R1Start + Day)
        .select(col("slot_ms"), col("distinct_user_id"))
        .orderBy("slot_ms")
    }),

    // KEYED SKETCH dir as a table (round 13): "distinct users per
    // minute PER event_type" served as a plain table from a persisted
    // keyedtheta dir — theta exact under the nominal licenses the
    // per-(key, minute) COUNT(DISTINCT) oracle. Key and slot pushdown
    // consumed; |keys| × minutes rows, volume-independent.
    "q_wheel_table_keyed_sketch_sql" -> ((s, dir) => {
      val idxDir = s"${sys.props("java.io.tmpdir")}/graft_pksketch_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      val path = s"$dir/events.parquet"
      val fp = graft.wheel.SourceFingerprint.of(
        path, s.sessionState.newHadoopConf())
      // build-or-reuse against the recorded source fingerprint
      val fresh = graft.wheel.PersistentWheel.peek(s, idxDir).exists(m =>
        m.kind == graft.wheel.PersistentWheel.KeyedThetaKind &&
          m.sourceFingerprint == fp)
      if (!fresh)
        graft.wheel.PersistentWheel.saveKeyedCohort(
          s, idxDir, t(s, dir, "events"), "event_type", "ts", "user_id",
          fp, path)
      s.read.format("wheel").option("dir", idxDir).load()
        .filter(col("slot_ms") >= R1Start && col("slot_ms") < R1Start + Day)
        .select(col("event_type"), col("slot_ms"), col("distinct_user_id"))
        .orderBy("event_type", "slot_ms")
    }),

    // KEYEDMULTI dir as a table (round 13, VERDICT r12 #3): the
    // N-measure keyed dir — the live keyed ingest's checkpoint format —
    // now resolves to a table serving EVERY measure's per-(key, slot)
    // partials; previously only single-measure keyed dirs had a table
    // spelling. The keyed COMPLETE aggregate pushdown applies unchanged:
    // GROUP BY key over both measures ships |keys| final rows.
    // WRITE path of the wheel table (round 13, VERDICT r12 #6): any
    // DERIVED DataFrame — here a filtered view, not a source path —
    // persists an index dir via df.write.format("wheel") (one codegen'd
    // rollup job + the atomic sidecar swap), and the dir is served by
    // the ordinary kind-dispatched read. Build once, serve everywhere —
    // now for arbitrary query results, completing the DSv2 story.
    "q_wheel_table_write_sql" -> ((s, dir) => {
      val idxDir = s"${sys.props("java.io.tmpdir")}/graft_wwrite_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      t(s, dir, "events").filter(col("event_type") =!= "purchase")
        .select(col("ts"), col("value"))
        .write.format("wheel").option("dir", idxDir).option("ts", "ts")
        .mode("overwrite").save()
      s.read.format("wheel").option("dir", idxDir).load()
        .filter(col("slot_ms") >= R1Start && col("slot_ms") < R1End)
        .groupBy(expr(s"(slot_ms div ${Tier.Day.ms}) * ${Tier.Day.ms}").as("day_ms"))
        .agg(round(sum("sum_value"), 2).as("sum_value"),
          sum("cnt_value").as("n"))
        .orderBy("day_ms")
    }),

    "q_wheel_table_keyedmulti_sql" -> ((s, dir) => {
      val idxDir = s"${sys.props("java.io.tmpdir")}/graft_pkeyedmulti_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      val ev = t(s, dir, "events").withColumn("v2", col("value") * 2)
      graft.plans.WheelAcceleration.registerPersistedKeyedMulti(
        s, s"$dir/events.parquet", idxDir, ev, "event_type", "ts",
        Seq("value", "v2"))
      s.read.format("wheel").option("dir", idxDir).load()
        .filter(col("slot_ms") >= R1Start && col("slot_ms") < R1End)
        .groupBy(col("event_type"))
        .agg(round(sum("sum_value"), 2).as("sum_value"),
          round(sum("sum_v2"), 2).as("sum_v2"),
          sum("cnt_value").as("n"))
        .orderBy("event_type")
    }))

  val oracle: Map[String, String] = Map(
    "q_wheel_anomaly_sql" ->
      (s"WITH d AS ($dailyDuck) " +
        "SELECT slot_ms, sum_value, " +
        "ROUND((sum_value - AVG(sum_value) OVER ()) " +
        "/ STDDEV_SAMP(sum_value) OVER (), 2) AS zscore " +
        "FROM d ORDER BY slot_ms"),
    "q_wheel_pct_change_sql" ->
      (s"WITH d AS ($dailyDuck), " +
        "l AS (SELECT slot_ms, sum_value, " +
        "LAG(sum_value) OVER (ORDER BY slot_ms) AS prev FROM d) " +
        "SELECT slot_ms, sum_value, " +
        "ROUND(100.0 * (sum_value - prev) / prev, 2) AS pct_change " +
        "FROM l WHERE prev IS NOT NULL ORDER BY slot_ms"),
    "q_wheel_ewma_sql" ->
      (s"WITH d AS ($dailyDuck), " +
        "r AS (SELECT slot_ms, sum_value, " +
        "ROW_NUMBER() OVER (ORDER BY slot_ms) AS rn FROM d) " +
        "SELECT slot_ms, sum_value, " +
        "ROUND(SUM(sum_value * POW(1.25, rn)) OVER (ORDER BY rn) " +
        "/ SUM(POW(1.25, rn)) OVER (ORDER BY rn), 2) AS ewma " +
        "FROM r ORDER BY slot_ms"),
    "q_wheel_topdays_sql" ->
      (s"WITH d AS ($dailyDuck) " +
        "SELECT slot_ms, sum_value FROM d " +
        "ORDER BY sum_value DESC, slot_ms LIMIT 5"),
    "q_wheel_having_sql" ->
      (s"SELECT (epoch_ms(ts) // ${Tier.Day.ms}) * ${Tier.Day.ms} AS slot_ms, " +
        "ROUND(SUM(value), 2) AS sum_value, COUNT(*) AS n FROM events " +
        s"WHERE epoch_ms(ts) >= $FStart AND epoch_ms(ts) < $FEnd " +
        "GROUP BY 1 HAVING COUNT(*) > 330 ORDER BY 1"),
    "q_wheel_hourofday_sql" ->
      (s"WITH h AS (SELECT (epoch_ms(ts) // ${Tier.Hour.ms}) * ${Tier.Hour.ms} AS slot_ms, " +
        "SUM(value) AS sv, COUNT(*) AS cn FROM events " +
        s"WHERE epoch_ms(ts) >= $FStart AND epoch_ms(ts) < $FEnd GROUP BY 1) " +
        s"SELECT CAST((slot_ms // ${Tier.Hour.ms}) % 24 AS INT) AS hod, " +
        "ROUND(SUM(sv), 2) AS sum_value, CAST(SUM(cn) AS BIGINT) AS n, " +
        "ROUND(AVG(sv), 2) AS avg_hour_sum FROM h GROUP BY 1 ORDER BY 1"),
    "q_wheel_two_table_sql" ->
      (s"WITH e AS (SELECT 'events' AS src, " +
        s"(epoch_ms(ts) // ${Tier.Day.ms}) * ${Tier.Day.ms} AS slot_ms, " +
        "ROUND(SUM(value), 2) AS measure FROM events " +
        s"WHERE epoch_ms(ts) >= $R1Start AND epoch_ms(ts) < $R1End GROUP BY 2), " +
        "l AS (SELECT 'lineitem' AS src, " +
        "epoch_ms(date_trunc('month', l_shipdate)) AS slot_ms, " +
        "ROUND(SUM(l_quantity), 2) AS measure FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1995-06-01 00:00:00' " +
        "AND l_shipdate < TIMESTAMP '1995-12-01 00:00:00' " +
        "GROUP BY date_trunc('month', l_shipdate)) " +
        "SELECT src, slot_ms, measure FROM " +
        "(SELECT * FROM e UNION ALL SELECT * FROM l) " +
        "ORDER BY src, slot_ms"),
    "q_wheel_between_sql" ->
      ("SELECT ROUND(SUM(value), 2) AS sum_value, COUNT(*) AS n, " +
        "MIN(value) AS min_value, MAX(value) AS max_value FROM events " +
        s"WHERE epoch_ms(ts) BETWEEN $R1Start AND ${R1End - 1}"),
    "q_wheel_date_rollup_sql" ->
      ("SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, " +
        "ROUND(SUM(value), 2) AS sum_value, COUNT(*) AS n FROM events " +
        s"WHERE epoch_ms(ts) >= $FStart AND epoch_ms(ts) < $FEnd " +
        "GROUP BY CAST(ts AS DATE) ORDER BY 1"),
    "q_wheel_share_sql" ->
      (s"WITH k AS (SELECT event_type, " +
        s"(epoch_ms(ts) // ${Tier.Day.ms}) * ${Tier.Day.ms} AS slot_ms, " +
        "ROUND(SUM(value), 2) AS sum_value FROM events " +
        s"WHERE epoch_ms(ts) >= $R1Start AND epoch_ms(ts) < $R1End " +
        "GROUP BY 1, 2) " +
        "SELECT event_type, slot_ms, sum_value, " +
        "ROUND(sum_value / SUM(sum_value) OVER (PARTITION BY slot_ms), 4) AS share " +
        "FROM k ORDER BY event_type, slot_ms"),
    "q_wheel_table_sql" ->
      (s"SELECT (epoch_ms(ts) // ${Tier.Day.ms}) * ${Tier.Day.ms} AS day_ms, " +
        "ROUND(SUM(value), 2) AS sum_value, COUNT(value) AS n, " +
        "MIN(value) AS min_value, MAX(value) AS max_value FROM events " +
        s"WHERE epoch_ms(ts) >= $R1Start AND epoch_ms(ts) < $R1End " +
        "GROUP BY 1 ORDER BY 1"),
    "q_wheel_table_agg_sql" ->
      ("SELECT ROUND(SUM(value), 2) AS sum_value, COUNT(value) AS n, " +
        "MIN(value) AS min_value, MAX(value) AS max_value FROM events " +
        s"WHERE epoch_ms(ts) >= $R1Start AND epoch_ms(ts) < $R1End"),
    "q_wheel_table_keyed_sql" ->
      (s"SELECT event_type, (epoch_ms(ts) // ${Tier.Day.ms}) * ${Tier.Day.ms} AS day_ms, " +
        "ROUND(SUM(value), 2) AS sum_value, COUNT(value) AS n FROM events " +
        s"WHERE epoch_ms(ts) >= $R1Start AND epoch_ms(ts) < $R1End " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
    "q_wheel_table_keyed_agg_sql" ->
      ("SELECT event_type, ROUND(SUM(value), 2) AS sum_value, " +
        "COUNT(value) AS n, MIN(value) AS min_value, MAX(value) AS max_value " +
        s"FROM events WHERE epoch_ms(ts) >= $R1Start AND epoch_ms(ts) < $R1End " +
        "GROUP BY 1 ORDER BY 1"),
    "q_wheel_table_topn_sql" ->
      (s"SELECT slot_ms, n, sum_value FROM (" +
        s"SELECT (epoch_ms(ts) // ${Tier.Minute.ms}) * ${Tier.Minute.ms} AS slot_ms, " +
        "COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value FROM events " +
        s"WHERE epoch_ms(ts) >= $R1Start AND epoch_ms(ts) < $R1End GROUP BY 1) " +
        "ORDER BY n DESC, slot_ms LIMIT 5"),
    "q_wheel_table_persisted_sql" ->
      (s"SELECT (epoch_ms(ts) // ${Tier.Hour.ms}) * ${Tier.Hour.ms} AS hour_ms, " +
        "ROUND(SUM(value), 2) AS sum_value, COUNT(value) AS n FROM events " +
        s"WHERE epoch_ms(ts) >= $R2Start AND epoch_ms(ts) < $R2End " +
        "GROUP BY 1 ORDER BY 1"),
    "q_wheel_catalog_sql" ->
      (s"SELECT (epoch_ms(ts) // ${Tier.Hour.ms}) * ${Tier.Hour.ms} AS hour_ms, " +
        "ROUND(SUM(value), 2) AS sum_value, COUNT(value) AS n FROM events " +
        s"WHERE epoch_ms(ts) >= $R1Start AND epoch_ms(ts) < $R1End " +
        "GROUP BY 1 ORDER BY 1"),
    // theta per-slot distinct is EXACT under the nominal entry count, so
    // the DOUBLE estimate equals the integer COUNT(DISTINCT) cast
    "q_wheel_table_sketch_sql" ->
      (s"SELECT (epoch_ms(ts) // ${Tier.Minute.ms}) * ${Tier.Minute.ms} AS slot_ms, " +
        "CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS distinct_user_id FROM events " +
        s"WHERE epoch_ms(ts) >= $R1Start AND epoch_ms(ts) < ${R1Start + Day} " +
        "GROUP BY 1 ORDER BY 1"),
    "q_wheel_table_write_sql" ->
      (s"SELECT (epoch_ms(ts) // ${Tier.Day.ms}) * ${Tier.Day.ms} AS day_ms, " +
        "ROUND(SUM(value), 2) AS sum_value, COUNT(value) AS n FROM events " +
        "WHERE event_type <> 'purchase' " +
        s"AND epoch_ms(ts) >= $R1Start AND epoch_ms(ts) < $R1End " +
        "GROUP BY 1 ORDER BY 1"),
    "q_wheel_table_keyed_sketch_sql" ->
      (s"SELECT event_type, (epoch_ms(ts) // ${Tier.Minute.ms}) * ${Tier.Minute.ms} AS slot_ms, " +
        "CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS distinct_user_id FROM events " +
        s"WHERE epoch_ms(ts) >= $R1Start AND epoch_ms(ts) < ${R1Start + Day} " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
    "q_wheel_table_keyedmulti_sql" ->
      ("SELECT event_type, ROUND(SUM(value), 2) AS sum_value, " +
        "ROUND(SUM(value * 2), 2) AS sum_v2, COUNT(value) AS n FROM events " +
        s"WHERE epoch_ms(ts) >= $R1Start AND epoch_ms(ts) < $R1End " +
        "GROUP BY 1 ORDER BY 1"))
}
