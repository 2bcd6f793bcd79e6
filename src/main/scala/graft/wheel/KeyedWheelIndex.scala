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
    * (key, tier, slot) entry one boxed Long slot key + one 4-field
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
    val df = partials(events, keyCol, tsCol, valueCol)
    fromPartialRows(df.collect(), keyCol, df.schema(keyCol).dataType, valueCol)
  }

  /** The distributed half of [[build]]: the keyed minute rollup in the
    * canonical column order — also the persisted-slot payload
    * ([[PersistentWheel.saveKeyed]]). */
  private[graft] def partials(events: DataFrame, keyCol: String,
      tsCol: String, valueCol: String): DataFrame =
    RollupBuilder.keyedRollup(events, keyCol, tsCol, valueCol, Tier.Minute)
      .select(keyCol, "slot_ms", "sum_v", "cnt", "min_v", "max_v", "rows")

  /** Driver-side fill from collected [[partials]] rows — shared by
    * [[build]] and [[PersistentWheel.loadKeyed]]. */
  private[graft] def fromPartialRows(rows: Array[org.apache.spark.sql.Row],
      keyCol: String, keyType: DataType, valueCol: String): KeyedWheelIndex = {
    require(rows.nonEmpty, "cannot index an empty source")
    require(rows.length <= MaxRows,
      s"keyed rollup has ${rows.length} (key, slot) rows — too wide for a " +
        s"driver-local index (max $MaxRows); use the distributed rollup DataFrames")
    rows.find(r => r.getLong(3) != r.getLong(6)).foreach { r =>
      throw new IllegalArgumentException(
        s"measure column '$valueCol' has NULLs (key ${r.get(0)}, slot " +
          s"${r.getLong(1)}); COUNT(*) folding requires a never-null measure")
    }
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
      val partial = AllAggregate(r.getDouble(2), r.getLong(3), r.getDouble(4), r.getDouble(5))
      Tier.all.foreach { t =>
        val coarse = slot / t.ms * t.ms
        tiers(t).merge(coarse, partial, (a, b) => a.combine(b))
      }
    }
    new KeyedWheelIndex(keyCol, keyType,
      lo / Tier.Day.ms * Tier.Day.ms, (hi / Tier.Day.ms + 1) * Tier.Day.ms, slots)
  }
}
