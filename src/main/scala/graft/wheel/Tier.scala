package graft.wheel

/** A time-granularity tier of the hierarchical aggregate index.
  *
  * The reference retains minute / hour / day tiers
  * (/root/reference/src/main.rs:90–97, `RetentionPolicy::Keep`); seconds
  * tick but are not retained. We mirror that tier set. Each tier's slot
  * width is expressed in epoch-milliseconds, matching the reference's
  * all-epoch-ms internal clock (/root/reference/src/main.rs:133–135).
  */
sealed abstract class Tier(val name: String, val ms: Long) extends Serializable
object Tier {
  case object Minute extends Tier("minute", 60L * 1000)
  case object Hour   extends Tier("hour", 3600L * 1000)
  case object Day    extends Tier("day", 86400L * 1000)

  /** Coarse-to-fine, the order the range planner prefers tiers. */
  val all: Seq[Tier] = Seq(Day, Hour, Minute)

  /** Finest retained tier; sub-minute residue falls back to a scan. */
  val finest: Tier = Minute
}

/** Per-tier retention — the analogue of the reference's
  * `RetentionPolicy` (/root/reference/src/main.rs:90–97): `Keep` retains
  * every slot since the index base; `KeepN(n)` retains only the last `n`
  * slots before the horizon (a bounded sliding-window store — older
  * slots are evicted and queries over them must come from a coarser
  * retained tier or fail). */
sealed trait Retention extends Serializable
object Retention {
  case object Keep extends Retention
  final case class KeepN(slots: Int) extends Retention {
    require(slots > 0, "retention must keep at least one slot")
  }

  /** First retained slot start for `tier` in a wheel spanning
    * [baseMs, horizonMs) — THE retention boundary, shared by every
    * wheel flavor (sum/All, HLL distinct, KLL quantile). */
  def startMs(retention: Map[Tier, Retention], tier: Tier,
      baseMs: Long, horizonMs: Long): Long =
    retention.getOrElse(tier, Keep) match {
      case Keep => baseMs
      case KeepN(n) => math.max(baseMs, horizonMs - n.toLong * tier.ms)
    }
}

/** One maximal run of consecutive slots in a single tier.
  * `[startMs, endMs)` half-open, aligned to `tier.ms`. */
final case class Run(tier: Tier, startMs: Long, endMs: Long) {
  require(startMs <= endMs, s"run start $startMs > end $endMs")
  def slots: Long = (endMs - startMs) / tier.ms
  override def toString: String = {
    def fmt(ms: Long) = java.time.Instant.ofEpochMilli(ms).toString
    s"${tier.name}[${fmt(startMs)}, ${fmt(endMs)}) x$slots"
  }
}

/** Pure range-decomposition planner: split an arbitrary minute-aligned
  * half-open `[start, end)` range into the minimal cover of retained-tier
  * slot runs — the same combine plan µWheel builds for
  * `combine_range_and_lower` and prints from `explain_combine_range`
  * (/root/reference/src/main.rs:212, 219).
  *
  * Algorithm: walk from `start`, always taking the coarsest tier step that
  * is (a) aligned at the cursor and (b) fits inside the remaining range;
  * merge consecutive same-tier steps into [[Run]]s. For a range crossing
  * day boundaries this yields minutes→hours→days→hours→minutes, exactly
  * the hierarchical cover.
  */
object Decompose {
  /** `usable(tier, slotStart)` gates tier availability per slot — the
    * retention hook: an evicted fine-tier slot is unusable, and a range
    * over it either decomposes through a coarser retained tier (when
    * aligned) or fails with a clear eviction error. Default: all usable. */
  def apply(startMs: Long, endMs: Long, tiers: Seq[Tier] = Tier.all,
      usable: (Tier, Long) => Boolean = (_, _) => true): Seq[Run] = {
    require(startMs % Tier.finest.ms == 0 && endMs % Tier.finest.ms == 0,
      s"range [$startMs,$endMs) must be ${Tier.finest.name}-aligned; " +
        "sub-minute residue is the caller's scan-fallback responsibility")
    val ordered = tiers.sortBy(-_.ms) // coarse first
    val runs = scala.collection.mutable.ArrayBuffer.empty[Run]
    var cur = startMs
    while (cur < endMs) {
      val tier = ordered
        .find(t => cur % t.ms == 0 && cur + t.ms <= endMs && usable(t, cur))
        .getOrElse(throw new IllegalStateException(
          s"no retained tier step fits at $cur in [$startMs,$endMs) — " +
            "the range touches evicted slots (Retention.KeepN) not covered " +
            "by a coarser retained tier"))
      val stepEnd = cur + tier.ms
      runs.lastOption match {
        case Some(prev) if prev.tier == tier && prev.endMs == cur =>
          runs(runs.size - 1) = Run(tier, prev.startMs, stepEnd)
        case _ => runs += Run(tier, cur, stepEnd)
      }
      cur = stepEnd
    }
    runs.toSeq
  }

  /** Human-readable combine plan, analogous to µWheel's
    * `explain_combine_range` (/root/reference/src/main.rs:219). */
  def explain(startMs: Long, endMs: Long): String = {
    val runs = apply(startMs, endMs)
    val total = runs.map(_.slots).sum
    (s"WheelRange[$startMs, $endMs) -> ${runs.size} runs, $total slot combines" +:
      runs.map(r => s"  ${r.toString}")).mkString("\n")
  }
}
