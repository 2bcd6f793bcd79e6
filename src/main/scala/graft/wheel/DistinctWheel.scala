package graft.wheel

import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A hierarchical DISTINCT-COUNT index: the wheel generalized from the
  * `All` aggregate to a mergeable HLL sketch per slot — time-indexed
  * cardinality ("distinct users in [a, b)") answered by unioning
  * pre-built per-slot sketches along the same [[Decompose]] runs the
  * sum wheel uses, in µs on the driver, no scan, no Spark job.
  *
  * µWheel's aggregator framework is explicitly generic over mergeable
  * aggregates (lift/combine/lower — SURVEY.md §2.2); HLL union is
  * associative+commutative, so the identical tier roll-up applies: the
  * minute tier is built by ONE distributed `hll_sketch_agg` pass
  * (Datasketches, the same library Spark's built-in uses), hour/day
  * tiers are driver-side unions of the time-bounded minute sketches.
  *
  * Scale posture: driver state is (slots × ~2 KB sketch), bounded by
  * TIME like every wheel tier; the one build pass is a map-side-combined
  * hash aggregation over the source — the sketches, not rows, ship. */
final class DistinctWheel private (
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

  private def unionRun(u: Union, run: Run): Unit = {
    val block = tiers(run.tier)
    var slot = run.startMs
    while (slot < run.endMs) {
      val i = ((slot - baseMs) / run.tier.ms).toInt
      if (i >= 0 && i < block.length && block(i) != null)
        u.update(HllSketch.heapify(block(i)))
      slot += run.tier.ms
    }
  }

  /** Estimated distinct count over a minute-aligned half-open range. */
  def queryDistinct(startMs: Long, endMs: Long): Double = {
    require(startMs <= endMs, s"bad range [$startMs, $endMs)")
    require(startMs % Tier.finest.ms == 0 && endMs % Tier.finest.ms == 0,
      s"range [$startMs, $endMs) must be ${Tier.finest.name}-aligned")
    val u = new Union(DistinctWheel.LgK)
    Decompose(startMs, endMs, usable = usable).foreach(run => unionRun(u, run))
    u.getResult(TgtHllType.HLL_8).getEstimate
  }


  /** Retained populated minute-slot starts (ms), ascending — the DSv2
    * sketch table's walk ([[graft.sources.SketchWheelTable]]). */
  private[graft] def minuteSlotsMs: Seq[Long] =
    SketchBlocks.minuteEntries(tiers, baseMs).map(_._1).toSeq

  def sizeBytes: Long =
    tiers.valuesIterator.flatMap(_.iterator).map(b => if (b == null) 0L else b.length.toLong).sum

  def slotCounts: Map[Tier, Int] = tiers.map { case (t, b) => t -> b.length }

  /** Tier occupancy + combine plan — the family-wide introspection
    * surface (VERDICT r6 #3), same shape as `WheelIndex.explain`. */
  def explain(startMs: Long, endMs: Long): String =
    WheelExplain.render("DistinctWheel(HLL)", baseMs, horizonMs, sizeBytes,
      WheelExplain.tierLines(tiers, retainedStartMs), startMs, endMs, usable)
}

object DistinctWheel {

  /** Spark's hll_sketch_agg default lgConfigK — kept identical so our
    * estimates line up with the built-in's on the same data. */
  val LgK = 12

  /** One distributed sketch-per-minute pass, then driver-side tier
    * roll-up by union (time-bounded work). Per-tier [[Retention]]
    * evicts old fine-tier slots at build time (AFTER coarser tiers are
    * rolled up, so aligned historical ranges still answer through the
    * retained coarse tiers — same semantics as the sum wheel). */
  def build(events: DataFrame, tsCol: String, keyCol: String,
      retention: Map[Tier, Retention] = Map.empty): DistinctWheel =
    fromMinuteSketches(minuteSketches(events, tsCol, keyCol).collect(), retention)

  /** The distributed half of [[build]]: per-minute HLL sketches as a
    * `(slot_ms, sk)` DataFrame — also the family's persisted-slot
    * payload ([[PersistentWheel.saveDistinct]]): sketches are the
    * mergeable partials, so a saved minute tier rebuilds every coarser
    * tier on load, exactly like the sum wheel's minute partials. */
  private[wheel] def minuteSketches(events: DataFrame, tsCol: String,
      keyCol: String): DataFrame =
    events
      .select(RollupBuilder.slotMs(col(tsCol), Tier.Minute).as("slot_ms"), col(keyCol).as("k"))
      .groupBy("slot_ms")
      .agg(hll_sketch_agg(col("k"), lit(LgK)).as("sk"))

  /** Driver-side tier roll-up from collected `(slot_ms, sk)` rows —
    * shared by [[build]] (rows fresh off the aggregation) and
    * [[PersistentWheel.loadDistinct]] (rows re-read from disk). */
  private[graft] def fromMinuteSketches(rows: Array[org.apache.spark.sql.Row],
      retention: Map[Tier, Retention]): DistinctWheel = {
    def unionAll(group: Seq[Array[Byte]]): Array[Byte] = {
      val u = new Union(LgK)
      group.foreach(b => u.update(HllSketch.heapify(b)))
      u.getResult(TgtHllType.HLL_8).toCompactByteArray
    }
    val (base, horizon, blocks) = SketchBlocks.buildTiers(rows)(unionAll)
    val wheel = new DistinctWheel(base, horizon, blocks, retention)
    SketchBlocks.evict(blocks, base, wheel.retainedStartMs)
    wheel
  }
}
