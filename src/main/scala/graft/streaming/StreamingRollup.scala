package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.wheel.Tier

/** Structured-Streaming ingest into the wheel's rollup schema — the
  * streaming equivalent of the reference's `insert` + watermark `advance`
  * lifecycle (/root/reference/src/main.rs:128–140; SURVEY.md §2.5):
  *
  *   - event-time watermark ⇔ µWheel's low watermark: rows later than the
  *     delay are dropped, exactly µWheel's below-watermark policy;
  *   - per-minute tumbling windows ⇔ the finest retained tier; finalized
  *     windows roll up to hour/day via [[graft.wheel.RollupBuilder.coarsen]]
  *     on the sink table, mirroring tick roll-up.
  *
  * Batch and streaming builds produce the same schema
  * `(slot_ms, sum_v, cnt, min_v, max_v, rows, m2_v)`, asserted in
  * StreamingRollupSpec. */
object StreamingRollup {

  /** Minute-tier streaming rollup. `events` must be a streaming Dataset
    * with an event-time column. */
  def minuteRollup(events: DataFrame, tsCol: String, valueCol: String,
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), "1 minute").as("w"))
      .agg(
        sum(col(valueCol)).as("sum_v"),
        count(col(valueCol)).as("cnt"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"),
        count(lit(1)).as("rows"),
        (var_pop(col(valueCol)) * count(col(valueCol))).as("m2_v"))
      .select(unix_millis(col("w.start")).as("slot_ms"),
        col("sum_v"), col("cnt"), col("min_v"), col("max_v"), col("rows"),
        col("m2_v"))

  /** Slot width sanity: streaming windows are exactly the finest tier. */
  val SlotMs: Long = Tier.Minute.ms

  /** Keyed minute-tier streaming rollup — the streaming counterpart of
    * [[graft.wheel.RollupBuilder.keyedRollup]] (GROUP BY dim × slot);
    * feeds [[KeyedLiveWheel]]. */
  def keyedMinuteRollup(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(col(keyCol), window(col(tsCol), "1 minute").as("w"))
      .agg(
        sum(col(valueCol)).as("sum_v"),
        count(col(valueCol)).as("cnt"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"),
        count(lit(1)).as("rows"),
        (var_pop(col(valueCol)) * count(col(valueCol))).as("m2_v"))
      .select(col(keyCol).as("key"), unix_millis(col("w.start")).as("slot_ms"),
        col("sum_v"), col("cnt"), col("min_v"), col("max_v"), col("rows"),
        col("m2_v"))

  /** Minute-tier streaming HLL sketch rollup — the distinct-count
    * analogue of [[minuteRollup]] (same slotting/watermark contract);
    * feeds [[graft.streaming.LiveDistinctWheel]]. */
  def distinctMinuteRollup(events: DataFrame, tsCol: String, keyCol: String,
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), "1 minute").as("w"))
      .agg(hll_sketch_agg(col(keyCol), lit(graft.wheel.DistinctWheel.LgK)).as("sk"))
      .select(unix_millis(col("w.start")).as("slot_ms"), col("sk"))

  /** Sliding-window aggregate (µWheel's window API supports sliding
    * windows — SURVEY.md §2.5): overlapping `size`/`slide` windows,
    * same partial schema keyed by window start. */
  def slidingRollup(events: DataFrame, tsCol: String, valueCol: String,
      size: String, slide: String, watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), size, slide).as("w"))
      .agg(sum(col(valueCol)).as("sum_v"), count(col(valueCol)).as("cnt"))
      .select(unix_millis(col("w.start")).as("slot_ms"), col("sum_v"), col("cnt"))

  /** Session-window aggregate (SURVEY.md §2.5): per-key sessions closed
    * after `gap` of event-time inactivity. */
  def sessionRollup(events: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, gap: String, watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(col(keyCol), session_window(col(tsCol), gap).as("w"))
      .agg(sum(col(valueCol)).as("sum_v"), count(col(valueCol)).as("cnt"))
      .select(col(keyCol),
        unix_millis(col("w.start")).as("session_start_ms"),
        unix_millis(col("w.end")).as("session_end_ms"),
        col("sum_v"), col("cnt"))
}
