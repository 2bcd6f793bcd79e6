package graft.wheel

import org.apache.datasketches.frequencies.{ErrorType, LongsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** A hierarchical FREQUENT-ITEMS index: the wheel generalized to a
  * Misra-Gries frequency sketch (DataSketches `LongsSketch`) per slot —
  * "top-k keys by count in [a, b)" and "approx count of key x in
  * [a, b)" answered by merging pre-built per-slot sketches along the
  * same [[Decompose]] runs as the sum wheel, in µs on the driver, no
  * scan, no Spark job.
  *
  * Fourth instantiation of µWheel's lift/combine/lower aggregator
  * framework (SURVEY.md §2.2): Sum/All → HLL ([[DistinctWheel]]) →
  * KLL ([[QuantileWheel]]) → frequent-items. Misra-Gries merge is
  * associative with additive error bounds, so the identical tier
  * roll-up applies ([[SketchBlocks]]).
  *
  * Why it earns its place next to the EXACT [[KeyedWheelIndex]]: the
  * keyed wheel's state is |keys| × slots — unbounded when the key is
  * high-cardinality (user ids at 100 TB). This sketch caps per-slot
  * state at [[FrequencyWheel.MaxMapSize]] counters REGARDLESS of key
  * cardinality, trading exactness for `NO_FALSE_NEGATIVES` bounds
  * (every true heavy hitter is returned; estimates carry lb/ub). While
  * the live key count fits the map, counts are EXACT and the bounds
  * collapse (maximumError = 0) — the sf0.01 oracle regime.
  *
  * Build is the same two scale-correct stages as the KLL wheel: one
  * local sketch per (partition, minute-slot) via `mapPartitions`, then
  * ONE shuffle of sketches merged per slot. */
final class FrequencyWheel private (
    val baseMs: Long,
    val horizonMs: Long,
    tiers: Map[Tier, Array[Array[Byte]]],
    retention: Map[Tier, Retention]) extends Serializable {

  /** Same bounded-retention contract as the sum/HLL/KLL wheels
    * (reference RetentionPolicy, /root/reference/src/main.rs:90–97). */
  def retainedStartMs(tier: Tier): Long =
    Retention.startMs(retention, tier, baseMs, horizonMs)

  private def usable(tier: Tier, slotStart: Long): Boolean =
    slotStart >= retainedStartMs(tier)

  /** Merged sketch over a minute-aligned half-open range. */
  private def merged(startMs: Long, endMs: Long): LongsSketch = {
    require(startMs <= endMs, s"bad range [$startMs, $endMs)")
    require(startMs % Tier.finest.ms == 0 && endMs % Tier.finest.ms == 0,
      s"range [$startMs, $endMs) must be ${Tier.finest.name}-aligned")
    val acc = new LongsSketch(FrequencyWheel.MaxMapSize)
    Decompose(startMs, endMs, usable = usable).foreach { run =>
      val block = tiers(run.tier)
      var slot = run.startMs
      while (slot < run.endMs) {
        val i = ((slot - baseMs) / run.tier.ms).toInt
        if (i >= 0 && i < block.length && block(i) != null)
          acc.merge(LongsSketch.getInstance(Memory.wrap(block(i))))
        slot += run.tier.ms
      }
    }
    acc
  }

  /** Estimated count (with NO_FALSE_NEGATIVES lower/upper bounds) of
    * one key over a minute-aligned half-open range. */
  def estimate(key: Long, startMs: Long, endMs: Long): (Long, Long, Long) = {
    val s = merged(startMs, endMs)
    (s.getEstimate(key), s.getLowerBound(key), s.getUpperBound(key))
  }

  /** Top-k keys by estimated count over a range; deterministic order
    * (estimate desc, key asc). Each row: (key, estimate, lb, ub).
    * NO_FALSE_NEGATIVES: every key whose true count exceeds the error
    * threshold is present in the candidate set. */
  def topK(startMs: Long, endMs: Long, k: Int): Seq[(Long, Long, Long, Long)] =
    merged(startMs, endMs)
      .getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .toSeq
      .map(r => (r.getItem, r.getEstimate, r.getLowerBound, r.getUpperBound))
      .sortBy { case (key, est, _, _) => (-est, key) }
      .take(k)

  /** Residual error bound of the merged range sketch: 0 ⇒ every
    * estimate in this range is exact. */
  def maximumError(startMs: Long, endMs: Long): Long =
    merged(startMs, endMs).getMaximumError

  /** [[merged]] across SEVERAL disjoint minute-aligned spans (round 13
    * — the OR-ranges fold): LongsSketch merge is associative, so the
    * union-range sketch equals one built over the concatenated data. */
  private def mergedSpans(spans: Seq[(Long, Long)]): LongsSketch = {
    val acc = new LongsSketch(FrequencyWheel.MaxMapSize)
    spans.foreach { case (a, b) => acc.merge(merged(a, b)) }
    acc
  }

  /** [[topK]] over a union of disjoint spans. */
  private[graft] def topKSpans(spans: Seq[(Long, Long)], k: Int): Seq[(Long, Long, Long, Long)] =
    mergedSpans(spans)
      .getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .toSeq
      .map(r => (r.getItem, r.getEstimate, r.getLowerBound, r.getUpperBound))
      .sortBy { case (key, est, _, _) => (-est, key) }
      .take(k)

  /** [[maximumError]] over a union of disjoint spans. */
  private[graft] def maximumErrorSpans(spans: Seq[(Long, Long)]): Long =
    mergedSpans(spans).getMaximumError

  /** True iff no minute slot was evicted — the tail-refresh
    * precondition (an evicted slot reads as empty; merging over it
    * would drop history). */
  private[graft] def minuteTierComplete: Boolean =
    retainedStartMs(Tier.Minute) <= baseMs

  /** A NEW wheel: retained minute sketches merged with tail-built
    * `(slot_ms, sk)` rows (Misra-Gries merge is associative) — the
    * append-only tail-refresh primitive; covered data never re-read. */
  /** Retained non-empty minute slots — the wheel's share of a keyed
    * registration's driver-resident entry budget. */
  private[graft] def minuteEntryCount: Int =
    SketchBlocks.minuteEntries(tiers, baseMs).size

  /** Retained populated minute-slot starts (ms), ascending — the DSv2
    * sketch table's walk ([[graft.sources.SketchWheelTable]]). */
  private[graft] def minuteSlotsMs: Seq[Long] =
    SketchBlocks.minuteEntries(tiers, baseMs).map(_._1).toSeq

  private[graft] def withTailMinutes(tail: Array[org.apache.spark.sql.Row]): FrequencyWheel =
    FrequencyWheel.fromMinuteSketches(
      SketchBlocks.mergeMinuteRows(
        SketchBlocks.minuteEntries(tiers, baseMs), tail, FrequencyWheel.mergeBytes),
      retention)


  /** The retained minute-slot sketch bytes at `slotMs` (null when
    * empty/outside the span) — O(1); callers must hold
    * [[minuteTierComplete]] (round 16: the distributed keyed sketch
    * emission's per-slot feed). */
  private[graft] def minuteBytesAt(slotMs: Long): Array[Byte] =
    SketchBlocks.minuteAt(tiers, baseMs, slotMs)

  /** Tier-generic [[minuteBytesAt]] (round 16) — hour/day blocks feed
    * the distributed grouped sketch emission under retained covers. */
  private[graft] def bytesAt(tier: Tier, slotMs: Long): Array[Byte] =
    SketchBlocks.at(tiers, baseMs, tier, slotMs)
  def sizeBytes: Long =
    tiers.valuesIterator.flatMap(_.iterator)
      .map(b => if (b == null) 0L else b.length.toLong).sum

  def slotCounts: Map[Tier, Int] = tiers.map { case (t, b) => t -> b.length }

  /** Tier occupancy + combine plan — the family-wide introspection
    * surface (VERDICT r6 #3), same shape as `WheelIndex.explain`. */
  def explain(startMs: Long, endMs: Long): String =
    WheelExplain.render("FrequencyWheel(MisraGries)", baseMs, horizonMs,
      sizeBytes, WheelExplain.tierLines(tiers, retainedStartMs),
      startMs, endMs, usable)
}

object FrequencyWheel {

  /** Counter budget per sketch (power of 2). Error ≤ 3.5·n/MaxMapSize
    * per the Misra-Gries bound; EXACT while distinct keys per sketch
    * stay ≤ 0.75·MaxMapSize. ~16 B/counter ⇒ ≤64 KB per full slot —
    * per-slot state bounded by the BUDGET, never by key cardinality. */
  val MaxMapSize = 4096

  /** Merges serialized LongsSketches — BYTES in/out so the shuffle
    * buffer is plain BinaryType (same convention as the KLL wheel). */
  private object FreqMergeAgg
      extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = new LongsSketch(MaxMapSize).toByteArray
    def reduce(buf: Array[Byte], in: Array[Byte]): Array[Byte] = merge(buf, in)
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      val s = LongsSketch.getInstance(Memory.wrap(a))
      s.merge(LongsSketch.getInstance(Memory.wrap(b)))
      s.toByteArray
    }
    def finish(buf: Array[Byte]): Array[Byte] = buf
    def bufferEncoder = Encoders.BINARY
    def outputEncoder = Encoders.BINARY
  }

  /** Merge two serialized sketches (associative; shared by the batch
    * shuffle aggregator and the live wheel's cross-batch accumulation). */
  def mergeBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    FreqMergeAgg.merge(a, b)

  /** Per-minute-slot partial sketches — both build stages with no
    * collect, shared verbatim by the streaming per-micro-batch path.
    * Schema: (slot_ms long, sk binary). NULL ts/key rows are excluded
    * (SQL aggregate convention, like the HLL/KLL wheels). */
  def slotSketches(events: DataFrame, tsCol: String, keyCol: String): DataFrame =
    SketchBlocks.longKeySlotSketches[LongsSketch](events, tsCol, keyCol,
      "FrequencyWheel",
      () => new LongsSketch(MaxMapSize),
      (s, k) => s.update(k),
      _.toByteArray,
      FreqMergeAgg)

  /** Per-tier [[Retention]] evicts old fine-tier slots at build time,
    * after coarser tiers roll up — identical contract to the other
    * sketch wheels. */
  def build(events: DataFrame, tsCol: String, keyCol: String,
      retention: Map[Tier, Retention] = Map.empty): FrequencyWheel =
    fromMinuteSketches(slotSketches(events, tsCol, keyCol).collect(), retention)

  /** Driver-side tier roll-up from collected `(slot_ms, sk)` rows —
    * shared by [[build]] and [[PersistentWheel.loadFrequency]]. */
  private[graft] def fromMinuteSketches(rows: Array[org.apache.spark.sql.Row],
      retention: Map[Tier, Retention]): FrequencyWheel = {
    def mergeAll(group: Seq[Array[Byte]]): Array[Byte] = {
      val acc = new LongsSketch(MaxMapSize)
      group.foreach(b => acc.merge(LongsSketch.getInstance(Memory.wrap(b))))
      acc.toByteArray
    }
    val (base, horizon, blocks) = SketchBlocks.buildTiers(rows)(mergeAll)
    val wheel = new FrequencyWheel(base, horizon, blocks, retention)
    SketchBlocks.evict(blocks, base, wheel.retainedStartMs)
    wheel
  }
}
