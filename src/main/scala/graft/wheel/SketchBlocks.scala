package graft.wheel

import org.apache.spark.sql.Row

/** Shared layout / roll-up / eviction helpers for the byte-serialized
  * sketch wheels ([[DistinctWheel]]'s HLL, [[QuantileWheel]]'s KLL) —
  * the tier mechanics are identical, only the merge operation differs,
  * so it is the one thing callers pass in. */
private[wheel] object SketchBlocks {

  /** Day-aligned [base, horizon) covering the observed minute slots. */
  def span(slots: Array[Long]): (Long, Long) =
    (slots.min / Tier.Day.ms * Tier.Day.ms,
      (slots.max / Tier.Day.ms + 1) * Tier.Day.ms)

  /** Dense minute block from collected (slot_ms, sketch) rows. */
  def minuteBlock(rows: Array[Row], base: Long, horizon: Long): Array[Array[Byte]] = {
    val minute = new Array[Array[Byte]](((horizon - base) / Tier.Minute.ms).toInt)
    rows.foreach { r =>
      minute(((r.getLong(0) - base) / Tier.Minute.ms).toInt) = r.getAs[Array[Byte]](1)
    }
    minute
  }

  /** Roll a finer tier into a coarser one; `mergeAll` combines the
    * non-empty finer sketches of one coarse slot (driver-side,
    * time-bounded work). */
  def coarsen(finer: Array[Array[Byte]], base: Long, horizon: Long,
      finerTier: Tier, tier: Tier)(
      mergeAll: Seq[Array[Byte]] => Array[Byte]): Array[Array[Byte]] = {
    val out = new Array[Array[Byte]](((horizon - base) / tier.ms).toInt)
    val ratio = (tier.ms / finerTier.ms).toInt
    var i = 0
    while (i < out.length) {
      val group = finer.view
        .slice(i * ratio, math.min((i + 1) * ratio, finer.length))
        .filter(_ != null).toSeq
      if (group.nonEmpty) out(i) = mergeAll(group)
      i += 1
    }
    out
  }

  /** Build-time eviction: null out each tier's slots before its
    * retained start (coarser tiers were rolled up first, so aligned
    * historical ranges still answer through them). */
  def evict(blocks: Map[Tier, Array[Array[Byte]]], base: Long,
      retainedStartMs: Tier => Long): Unit =
    blocks.foreach { case (tier, block) =>
      val first = retainedStartMs(tier)
      var i = 0
      while (i < block.length && base + i.toLong * tier.ms < first) {
        block(i) = null; i += 1
      }
    }
}
