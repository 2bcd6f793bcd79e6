package graft.wheel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.DataType

/** Driver-local PER-KEY wheel: minute partials keyed by a dimension
  * column — the single-measure [[WheelIndex]] generalized to
  * `GROUP BY dim` queries (SURVEY.md §7.8 #6). Backing state is the
  * keyed minute rollup, whose cardinality is |keys| × time slots —
  * bounded by dimension cardinality and TIME, never by row count; build
  * refuses dimensions too wide to be driver-resident (that regime
  * belongs to the distributed rollup DataFrames, not a local index).
  *
  * Mirrors the reference's build-once/query-many lifecycle
  * (/root/reference/src/main.rs:48–68) with the key as an extra axis. */
final class KeyedWheelIndex private (
    val keyCol: String,
    val keyType: DataType,
    val baseMs: Long,
    val horizonMs: Long,
    // key -> minute slot -> partial (driver-only; never serialized)
    slots: java.util.HashMap[Any, java.util.HashMap[Long, AllAggregate]]) {

  /** Keys in deterministic (string) order — drives rewrite output order. */
  def keys: Seq[Any] = {
    import scala.jdk.CollectionConverters._
    slots.keySet().asScala.toSeq.sortBy(_.toString)
  }

  /** Combine for one key over a minute-aligned half-open range. */
  def query(key: Any, startMs: Long, endMs: Long): AllAggregate = {
    require(startMs % Tier.Minute.ms == 0 && endMs % Tier.Minute.ms == 0,
      s"keyed index answers minute-aligned ranges, got [$startMs, $endMs)")
    val m = slots.get(key)
    var acc = AllAggregate.identity
    if (m == null) return acc
    var slot = startMs
    while (slot < endMs) {
      val s = m.get(slot)
      if (s != null) acc = acc.combine(s)
      slot += Tier.Minute.ms
    }
    acc
  }

  def sizeSlots: Int = {
    import scala.jdk.CollectionConverters._
    slots.values().asScala.map(_.size).sum
  }

  /** Approximate retained footprint, the keyed analogue of the sum
    * wheel's `size_bytes()` (/root/reference/src/main.rs:144): per
    * (key, slot) entry one boxed Long slot key + one 4-field
    * AllAggregate + HashMap node (~72 B together), plus ~48 B of
    * per-key outer-map overhead. An estimate (JVM object layout), but
    * a faithful one: it scales with |keys| × slots, the quantity the
    * build ceiling bounds. */
  def sizeBytes: Long = {
    val keyCount = slots.size.toLong
    sizeSlots.toLong * 72L + keyCount * 48L
  }

  /** Introspection parity with the rest of the index family (VERDICT
    * r6 #3): the keyed wheel is minute-tier-only (no coarser roll-up —
    * per-key aggregates re-roll cheaply at query time), so its combine
    * plan is a per-key minute walk, not a tier decomposition. */
  def explain(startMs: Long, endMs: Long): String = {
    require(startMs % Tier.Minute.ms == 0 && endMs % Tier.Minute.ms == 0,
      s"keyed index answers minute-aligned ranges, got [$startMs, $endMs)")
    def fmt(ms: Long) = java.time.Instant.ofEpochMilli(ms).toString
    val probes = (endMs - startMs) / Tier.Minute.ms
    s"KeyedWheelIndex(key=$keyCol)[${fmt(baseMs)}, ${fmt(horizonMs)}) " +
      s"sizeBytes=$sizeBytes\n" +
      s"  tier minute: ${slots.size} keys, $sizeSlots (key, slot) entries\n" +
      s"  combine [${fmt(startMs)}, ${fmt(endMs)}) -> " +
      s"$probes minute probes per key"
  }
}

object KeyedWheelIndex {

  /** Hard ceiling on driver-resident keyed state (|keys| × slots). */
  val MaxRows = 2000000

  def build(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): KeyedWheelIndex = {
    val df = RollupBuilder.keyedRollup(events, keyCol, tsCol, valueCol, Tier.Minute)
      .select(keyCol, "slot_ms", "sum_v", "cnt", "min_v", "max_v", "rows")
    val rows = df.collect()
    require(rows.nonEmpty, "cannot index an empty source")
    require(rows.length <= MaxRows,
      s"keyed rollup has ${rows.length} (key, slot) rows — too wide for a " +
        s"driver-local index (max $MaxRows); use the distributed rollup DataFrames")
    rows.find(r => r.getLong(3) != r.getLong(6)).foreach { r =>
      throw new IllegalArgumentException(
        s"measure column '$valueCol' has NULLs (key ${r.get(0)}, slot " +
          s"${r.getLong(1)}); COUNT(*) folding requires a never-null measure")
    }
    val slots = new java.util.HashMap[Any, java.util.HashMap[Long, AllAggregate]]()
    var lo = Long.MaxValue
    var hi = Long.MinValue
    rows.foreach { r =>
      val key = r.get(0)
      val slot = r.getLong(1)
      if (slot < lo) lo = slot
      if (slot > hi) hi = slot
      slots.computeIfAbsent(key, _ => new java.util.HashMap[Long, AllAggregate]())
        .put(slot, AllAggregate(r.getDouble(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
    }
    val keyType = events.schema(keyCol).dataType
    new KeyedWheelIndex(keyCol, keyType,
      lo / Tier.Day.ms * Tier.Day.ms, (hi / Tier.Day.ms + 1) * Tier.Day.ms, slots)
  }
}
