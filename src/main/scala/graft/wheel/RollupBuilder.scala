package graft.wheel

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Builds the per-tier pre-aggregated rollup tables — the Spark-native
  * equivalent of the reference's wheel build (`insert` loop + single
  * `advance`, /root/reference/src/main.rs:105–144).
  *
  * Each tier is a DataFrame `(slot_ms: Long, sum_v, cnt, min_v, max_v,
  * sumsq_v)` — the "All" aggregate partial (sum/count/min/max/sum-of-
  * squares; avg and variance derived at lower).
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
        sum(col("v") * col("v")).as("sumsq_v"))

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
        sum(col(c) * col(c)).as(s"sumsq_$c"))
    } :+ count(lit(1)).as("rows")
    events
      .select(slotMs(col(tsCol), Tier.Minute).as("slot_ms") +: valueCols.map(col): _*)
      .groupBy("slot_ms")
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Derive a coarser tier from a finer one by combining partials. */
  def coarsen(finer: DataFrame, tier: Tier): DataFrame =
    finer
      .groupBy(((col("slot_ms").divide(lit(tier.ms))).cast("long") * lit(tier.ms)).as("slot_ms"))
      .agg(
        sum(col("sum_v")).as("sum_v"),
        sum(col("cnt")).as("cnt"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"),
        sum(col("rows")).as("rows"),
        sum(col("sumsq_v")).as("sumsq_v"))

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
    a.unionByName(b)
      .groupBy("slot_ms")
      .agg(
        sum(col("sum_v")).as("sum_v"),
        sum(col("cnt")).as("cnt"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"),
        sum(col("rows")).as("rows"),
        sum(col("sumsq_v")).as("sumsq_v"))

  /** N-measure variant of [[merge]] (late round 10): combine
    * same-shape [[minuteRollupMulti]] partials by slot — the
    * incremental-refresh primitive behind the persisted index's
    * tail-only refresh (saved partials ∪ tail-file partials → one
    * merged partial set, no history rescan). */
  def mergeMulti(parts: DataFrame, valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "need at least one measure column")
    val aggs = valueCols.flatMap { c =>
      Seq(sum(col(s"sum_$c")).as(s"sum_$c"), sum(col(s"cnt_$c")).as(s"cnt_$c"),
        min(col(s"min_$c")).as(s"min_$c"), max(col(s"max_$c")).as(s"max_$c"),
        sum(col(s"sumsq_$c")).as(s"sumsq_$c"))
    } :+ sum(col("rows")).as("rows")
    parts.groupBy("slot_ms").agg(aggs.head, aggs.tail: _*)
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
        sum(col("v") * col("v")).as("sumsq_v"))

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
        sum(col(c) * col(c)).as(s"sumsq_$c"))
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
    val aggs = valueCols.flatMap { c =>
      Seq(sum(col(s"sum_$c")).as(s"sum_$c"), sum(col(s"cnt_$c")).as(s"cnt_$c"),
        min(col(s"min_$c")).as(s"min_$c"), max(col(s"max_$c")).as(s"max_$c"),
        sum(col(s"sumsq_$c")).as(s"sumsq_$c"))
    } :+ sum(col("rows")).as("rows")
    parts.groupBy(col(keyCol), col("slot_ms")).agg(aggs.head, aggs.tail: _*)
  }

  /** Coarsen a keyed rollup, preserving the key. */
  def coarsenKeyed(finer: DataFrame, keyCol: String, tier: Tier): DataFrame =
    finer
      .groupBy(col(keyCol),
        ((col("slot_ms").divide(lit(tier.ms))).cast("long") * lit(tier.ms)).as("slot_ms"))
      .agg(
        sum(col("sum_v")).as("sum_v"),
        sum(col("cnt")).as("cnt"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"),
        sum(col("rows")).as("rows"),
        sum(col("sumsq_v")).as("sumsq_v"))
}
