package graft.wheel

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** A hierarchical QUANTILE index: the wheel generalized to a mergeable
  * KLL sketch per slot — time-indexed percentiles ("p99 of value in
  * [a, b)") answered by merging pre-built per-slot sketches along the
  * same [[Decompose]] runs the sum wheel uses, in µs on the driver, no
  * scan, no Spark job.
  *
  * Third instantiation of µWheel's lift/combine/lower aggregator
  * framework here (SURVEY.md §2.2): Sum/All partials → HLL sketches
  * ([[DistinctWheel]]) → KLL quantile sketches. KLL merge is
  * associative and rank-error-bounded (~1.65% at k=200), so the
  * identical tier roll-up applies.
  *
  * Build is TWO distributed stages, both scale-correct:
  *   1. `mapPartitions`: one local KLL per (partition, minute-slot) —
  *      the map-side combine; rows never leave their partition.
  *   2. `groupBy(slot).agg(kllMerge)`: merges the per-partition
  *      sketches (one shuffle of ~|partitions| × |slots-touched|
  *      SKETCHES, not rows).
  * Driver state after collect is slots × ~1.5 KB, bounded by TIME.
  *
  * No DuckDB oracle (approximate); rank-error parity vs exact
  * percentiles is asserted in QuantileWheelSpec. */
final class QuantileWheel private (
    val baseMs: Long,
    val horizonMs: Long,
    tiers: Map[Tier, Array[Array[Byte]]],
    retention: Map[Tier, Retention]) extends Serializable {

  /** First retained slot start per tier — same bounded-retention
    * contract as the sum wheel (reference RetentionPolicy,
    * /root/reference/src/main.rs:90–97). */
  def retainedStartMs(tier: Tier): Long =
    Retention.startMs(retention, tier, baseMs, horizonMs)

  private def usable(tier: Tier, slotStart: Long): Boolean =
    slotStart >= retainedStartMs(tier)

  private def mergeRun(acc: KllDoublesSketch, run: Run): Unit = {
    val block = tiers(run.tier)
    var slot = run.startMs
    while (slot < run.endMs) {
      val i = ((slot - baseMs) / run.tier.ms).toInt
      if (i >= 0 && i < block.length && block(i) != null)
        acc.merge(KllDoublesSketch.heapify(Memory.wrap(block(i))))
      slot += run.tier.ms
    }
  }

  /** Merged sketch over a minute-aligned half-open range — the
    * primitive `queryQuantiles` builds on, exposed so callers (the SQL
    * fold's accuracy gate) can inspect `isEstimationMode`: while the
    * merged sketch retains every item, quantiles are EXACT
    * inclusive-rank answers; beyond, the k=200 normalized rank error
    * applies. */
  def rangeSketch(startMs: Long, endMs: Long): KllDoublesSketch = {
    require(startMs <= endMs, s"bad range [$startMs, $endMs)")
    require(startMs % Tier.finest.ms == 0 && endMs % Tier.finest.ms == 0,
      s"range [$startMs, $endMs) must be ${Tier.finest.name}-aligned")
    val acc = KllDoublesSketch.newHeapInstance(QuantileWheel.K)
    Decompose(startMs, endMs, usable = usable).foreach(run => mergeRun(acc, run))
    acc
  }

  /** Estimated quantiles (inclusive rank semantics) over a
    * minute-aligned half-open range; one merge pass serves all ranks.
    * NaN per rank when the range holds no data. */
  def queryQuantiles(startMs: Long, endMs: Long, qs: Seq[Double]): Seq[Double] = {
    val acc = rangeSketch(startMs, endMs)
    if (acc.isEmpty) qs.map(_ => Double.NaN)
    else qs.map(q => acc.getQuantile(q))
  }

  def queryQuantile(startMs: Long, endMs: Long, q: Double): Double =
    queryQuantiles(startMs, endMs, Seq(q)).head

  /** True iff no minute slot was evicted — the tail-refresh
    * precondition (an evicted slot reads as empty; merging over it
    * would drop history). */
  private[graft] def minuteTierComplete: Boolean =
    retainedStartMs(Tier.Minute) <= baseMs

  /** A NEW wheel: retained minute sketches merged with tail-built
    * `(slot_ms, sk)` rows (KLL merge is associative) — the append-only
    * tail-refresh primitive; covered data never re-read. */
  /** Retained non-empty minute slots — the wheel's share of a keyed
    * registration's driver-resident entry budget. */
  private[graft] def minuteEntryCount: Int =
    SketchBlocks.minuteEntries(tiers, baseMs).size

  /** Retained populated minute-slot starts (ms), ascending — the DSv2
    * sketch table's walk ([[graft.sources.SketchWheelTable]]). */
  private[graft] def minuteSlotsMs: Seq[Long] =
    SketchBlocks.minuteEntries(tiers, baseMs).map(_._1).toSeq

  private[graft] def withTailMinutes(tail: Array[org.apache.spark.sql.Row]): QuantileWheel =
    QuantileWheel.fromMinuteSketches(
      SketchBlocks.mergeMinuteRows(
        SketchBlocks.minuteEntries(tiers, baseMs), tail, QuantileWheel.mergeBytes),
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
    WheelExplain.render("QuantileWheel(KLL)", baseMs, horizonMs, sizeBytes,
      WheelExplain.tierLines(tiers, retainedStartMs), startMs, endMs, usable)
}

object QuantileWheel {

  /** KLL k=200 — the library default: ~1.65% one-sided rank error at
    * 99% confidence, ~1.5 KB per serialized sketch. */
  val K = 200

  /** Merges serialized KLL sketches — operates on BYTES so the buffer
    * encoder is plain BinaryType (no object serialization surprises);
    * inputs are already per-partition partials, so deserialization cost
    * is per-sketch, never per-event row. */
  private object KllMergeAgg
      extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = KllDoublesSketch.newHeapInstance(K).toByteArray
    def reduce(buf: Array[Byte], in: Array[Byte]): Array[Byte] = merge(buf, in)
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      val s = KllDoublesSketch.heapify(Memory.wrap(a))
      s.merge(KllDoublesSketch.heapify(Memory.wrap(b)))
      s.toByteArray
    }
    def finish(buf: Array[Byte]): Array[Byte] = buf
    def bufferEncoder = Encoders.BINARY
    def outputEncoder = Encoders.BINARY
  }

  /** Merge two serialized KLL sketches (associative; used by the batch
    * build's shuffle aggregator and the live wheel's cross-batch slot
    * accumulation). */
  def mergeBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    KllMergeAgg.merge(a, b)

  /** Per-minute-slot partial sketches for one DataFrame — both build
    * stages (map-side local sketches, one sketch-merge shuffle) with no
    * collect, so batch build and the streaming per-micro-batch path
    * share the exact same aggregation. Schema: (slot_ms long, sk binary). */
  def slotSketches(events: DataFrame, tsCol: String, valueCol: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    // NULL ts/measure rows are EXCLUDED (SQL aggregate semantics — the
    // same convention hll_sketch_agg applies in DistinctWheel). Unlike
    // the sum wheel, no COUNT(*) folding depends on the measure being
    // never-null, so skipping is correct here; without the filter the
    // tuple decode below would crash mid-job on the first null.
    val slotted = events
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(RollupBuilder.slotMs(col(tsCol), Tier.Minute).as("slot_ms"),
        col(valueCol).cast("double").as("v"))
      .as[(Long, Double)]
    // stage 1: map-side combine — one local sketch per slot per partition
    val partials = slotted.mapPartitions { it =>
      val m = new java.util.HashMap[Long, KllDoublesSketch]()
      it.foreach { case (slot, v) =>
        m.computeIfAbsent(slot, _ => KllDoublesSketch.newHeapInstance(K))
          .update(v)
      }
      import scala.jdk.CollectionConverters._
      m.entrySet().iterator().asScala
        .map(e => (e.getKey.longValue(), e.getValue.toByteArray))
    }
    // stage 2: one shuffle of sketches, merged per slot
    partials.toDF("slot_ms", "sk")
      .groupBy("slot_ms")
      .agg(udaf(KllMergeAgg).apply(col("sk")).as("sk"))
  }

  /** Per-tier [[Retention]] evicts old fine-tier slots at build time
    * (after coarser tiers roll up — aligned historical ranges still
    * answer through retained coarse tiers, like the sum wheel). */
  def build(events: DataFrame, tsCol: String, valueCol: String,
      retention: Map[Tier, Retention] = Map.empty): QuantileWheel =
    fromMinuteSketches(slotSketches(events, tsCol, valueCol).collect(), retention)

  /** Driver-side tier roll-up from collected `(slot_ms, sk)` rows —
    * shared by [[build]] and [[PersistentWheel.loadQuantile]]. */
  private[graft] def fromMinuteSketches(rows: Array[org.apache.spark.sql.Row],
      retention: Map[Tier, Retention]): QuantileWheel = {
    def mergeAll(group: Seq[Array[Byte]]): Array[Byte] = {
      val acc = KllDoublesSketch.newHeapInstance(K)
      group.foreach(b => acc.merge(KllDoublesSketch.heapify(Memory.wrap(b))))
      acc.toByteArray
    }
    val (base, horizon, blocks) = SketchBlocks.buildTiers(rows)(mergeAll)
    val wheel = new QuantileWheel(base, horizon, blocks, retention)
    SketchBlocks.evict(blocks, base, wheel.retainedStartMs)
    wheel
  }
}
