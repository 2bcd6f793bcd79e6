package graft.wheel

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, UpdateSketch}
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** A hierarchical COHORT index: the wheel generalized to a Theta sketch
  * per slot — per-range distinct-key SETS supporting full set algebra
  * across ranges: "how many users active in [a,b) were ALSO active in
  * [c,d)" (retention), "how many churned" (difference), all in µs on
  * the driver, no scan, no Spark job.
  *
  * Fifth instantiation of µWheel's lift/combine/lower aggregator
  * framework (SURVEY.md §2.2), and the set-algebra upgrade of
  * [[DistinctWheel]]: HLL unions merge but cannot intersect; Theta
  * sketches compose under union/intersection/A-not-B with error bounds
  * (exact while retained entries stay under the nominal 4096 — every
  * shipped SF — which is what makes `q_wheel_cohort` oracle-checkable).
  *
  * Build is the family's two scale-correct stages: one local
  * UpdateSketch per (partition, minute-slot) via `mapPartitions`, then
  * ONE shuffle of compact sketches merged per slot by union. */
final class CohortWheel private (
    val baseMs: Long,
    val horizonMs: Long,
    tiers: Map[Tier, Array[Array[Byte]]],
    retention: Map[Tier, Retention]) extends Serializable {

  /** Same bounded-retention contract as the rest of the wheel family. */
  def retainedStartMs(tier: Tier): Long =
    Retention.startMs(retention, tier, baseMs, horizonMs)

  private def usable(tier: Tier, slotStart: Long): Boolean =
    slotStart >= retainedStartMs(tier)

  /** The distinct-key SET of a minute-aligned half-open range, as a
    * compact Theta sketch — the primitive all cohort ops build on. */
  def rangeSketch(startMs: Long, endMs: Long): CompactSketch = {
    require(startMs <= endMs, s"bad range [$startMs, $endMs)")
    require(startMs % Tier.finest.ms == 0 && endMs % Tier.finest.ms == 0,
      s"range [$startMs, $endMs) must be ${Tier.finest.name}-aligned")
    val u = SetOperation.builder().buildUnion()
    Decompose(startMs, endMs, usable = usable).foreach { run =>
      val block = tiers(run.tier)
      var slot = run.startMs
      while (slot < run.endMs) {
        val i = ((slot - baseMs) / run.tier.ms).toInt
        if (i >= 0 && i < block.length && block(i) != null)
          u.union(CompactSketch.heapify(Memory.wrap(block(i))))
        slot += run.tier.ms
      }
    }
    u.getResult
  }

  /** Estimated distinct keys in one range (exact under the nominal). */
  def distinct(startMs: Long, endMs: Long): Double =
    rangeSketch(startMs, endMs).getEstimate

  /** Estimated |A ∩ B| — keys active in BOTH ranges (retention).
    * Callers holding the sketches already (e.g. deriving several
    * numbers from the same two ranges) should use the companion's
    * sketch-level ops instead of re-materializing ranges per call. */
  def intersectCount(a: (Long, Long), b: (Long, Long)): Double =
    CohortWheel.intersectCount(rangeSketch(a._1, a._2), rangeSketch(b._1, b._2))

  /** Estimated |A \ B| — keys active in A but gone in B (churn). */
  def diffCount(a: (Long, Long), b: (Long, Long)): Double =
    CohortWheel.diffCount(rangeSketch(a._1, a._2), rangeSketch(b._1, b._2))

  /** True iff no minute slot was evicted — the precondition for an
    * append-only tail refresh (an evicted slot is indistinguishable
    * from an empty one, so merging over it would drop history). */
  private[graft] def minuteTierComplete: Boolean =
    retainedStartMs(Tier.Minute) <= baseMs

  /** A NEW wheel: this wheel's retained minute sketches merged with
    * tail-built `(slot_ms, sk)` rows (Theta union is associative, so
    * the result equals a full rebuild over old+tail rows) — the
    * append-only tail-refresh primitive; covered data never re-read. */
  /** Retained non-empty minute slots — the wheel's share of a keyed
    * registration's driver-resident entry budget. */
  private[graft] def minuteEntryCount: Int =
    SketchBlocks.minuteEntries(tiers, baseMs).size

  /** Retained populated minute-slot starts (ms), ascending — the DSv2
    * sketch table's walk ([[graft.sources.SketchWheelTable]]). Slots
    * evicted from the minute tier are absent: they answer only through
    * coarser tiers, so they have no per-minute table row. */
  private[graft] def minuteSlotsMs: Seq[Long] =
    SketchBlocks.minuteEntries(tiers, baseMs).map(_._1).toSeq

  private[graft] def withTailMinutes(tail: Array[org.apache.spark.sql.Row]): CohortWheel =
    CohortWheel.fromMinuteSketches(
      SketchBlocks.mergeMinuteRows(
        SketchBlocks.minuteEntries(tiers, baseMs), tail, CohortWheel.mergeBytes),
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
    WheelExplain.render("CohortWheel(Theta)", baseMs, horizonMs, sizeBytes,
      WheelExplain.tierLines(tiers, retainedStartMs), startMs, endMs, usable)
}

object CohortWheel {

  /** |A ∩ B| of two materialized range sketches. */
  def intersectCount(a: CompactSketch, b: CompactSketch): Double = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(a)
    i.intersect(b)
    i.getResult.getEstimate
  }

  /** |A \ B| of two materialized range sketches. */
  def diffCount(a: CompactSketch, b: CompactSketch): Double =
    SetOperation.builder().buildANotB().aNotB(a, b).getEstimate

  /** Merges serialized compact Theta sketches by union — BYTES in/out,
    * the family's shuffle-buffer convention. */
  private object ThetaUnionAgg
      extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    private def empty: Array[Byte] =
      UpdateSketch.builder().build().compact().toByteArray
    def zero: Array[Byte] = empty
    def reduce(buf: Array[Byte], in: Array[Byte]): Array[Byte] = merge(buf, in)
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      val u = SetOperation.builder().buildUnion()
      u.union(CompactSketch.heapify(Memory.wrap(a)))
      u.union(CompactSketch.heapify(Memory.wrap(b)))
      u.getResult.toByteArray
    }
    def finish(buf: Array[Byte]): Array[Byte] = buf
    def bufferEncoder = Encoders.BINARY
    def outputEncoder = Encoders.BINARY
  }

  /** Merge two serialized sketches (associative union). */
  def mergeBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    ThetaUnionAgg.merge(a, b)

  /** Per-minute-slot compact Theta sketches — both build stages, no
    * collect (shared by batch build and any streaming feed). Schema:
    * (slot_ms long, sk binary). Long-key contract enforced by the
    * shared family build. */
  def slotSketches(events: DataFrame, tsCol: String, keyCol: String): DataFrame =
    SketchBlocks.longKeySlotSketches[UpdateSketch](events, tsCol, keyCol,
      "CohortWheel",
      () => UpdateSketch.builder().build(),
      (s, k) => { s.update(k); () },
      _.compact().toByteArray,
      ThetaUnionAgg)

  /** Per-tier [[Retention]] evicts old fine-tier slots at build time —
    * identical contract to the other sketch wheels. */
  def build(events: DataFrame, tsCol: String, keyCol: String,
      retention: Map[Tier, Retention] = Map.empty): CohortWheel =
    fromMinuteSketches(slotSketches(events, tsCol, keyCol).collect(), retention)

  /** Driver-side tier roll-up from collected `(slot_ms, sk)` rows —
    * shared by [[build]] and [[PersistentWheel.loadCohort]]. */
  private[graft] def fromMinuteSketches(rows: Array[org.apache.spark.sql.Row],
      retention: Map[Tier, Retention]): CohortWheel = {
    def mergeAll(group: Seq[Array[Byte]]): Array[Byte] = {
      val u = SetOperation.builder().buildUnion()
      group.foreach(b => u.union(CompactSketch.heapify(Memory.wrap(b))))
      u.getResult.toByteArray
    }
    val (base, horizon, blocks) = SketchBlocks.buildTiers(rows)(mergeAll)
    val wheel = new CohortWheel(base, horizon, blocks, retention)
    SketchBlocks.evict(blocks, base, wheel.retainedStartMs)
    wheel
  }
}
