package graft.wheel

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Shared layout / roll-up / eviction / build helpers for the
  * byte-serialized sketch wheels (HLL distinct, KLL quantile,
  * Misra-Gries frequency, Theta cohort) — the tier mechanics and the
  * two-stage long-key build are identical across the family; only the
  * sketch operations differ, so they are the things callers pass in. */
private[wheel] object SketchBlocks {

  /** The family's two-stage LONG-KEY slot-sketch build (map-side local
    * sketches via mapPartitions, ONE shuffle of serialized sketches
    * merged per slot) — shared by [[FrequencyWheel]] and [[CohortWheel]].
    * Enforces the integral-key contract: a string key would cast to
    * null and crash the tuple decode mid-job, a double key would
    * silently truncate distinct values together. */
  def longKeySlotSketches[S](events: DataFrame, tsCol: String, keyCol: String,
      wheelName: String,
      newSketch: () => S,
      update: (S, Long) => Unit,
      serialize: S => Array[Byte],
      merge: Aggregator[Array[Byte], Array[Byte], Array[Byte]]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val keyType = events.schema(keyCol).dataType
    require(Seq("byte", "short", "integer", "long")
        .contains(keyType.typeName),
      s"$wheelName key column '$keyCol' must be an integral type, " +
        s"got ${keyType.typeName}")
    val slotted = events
      .filter(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .select(RollupBuilder.slotMs(col(tsCol), Tier.Minute).as("slot_ms"),
        col(keyCol).cast("long").as("k"))
      .as[(Long, Long)]
    val partials = slotted.mapPartitions { it =>
      val m = new java.util.HashMap[Long, S]()
      it.foreach { case (slot, k) =>
        var s = m.get(slot)
        if (s == null) { s = newSketch(); m.put(slot, s) }
        update(s, k)
      }
      import scala.jdk.CollectionConverters._
      m.entrySet().iterator().asScala
        .map(e => (e.getKey.longValue(), serialize(e.getValue)))
    }
    partials.toDF("slot_ms", "sk")
      .groupBy("slot_ms")
      .agg(udaf(merge).apply(col("sk")).as("sk"))
  }

  /** The family's span/minute-block/coarsen sequence: collected
    * (slot_ms, sketch) rows → per-tier dense blocks. Callers wrap the
    * result in their wheel and run [[evict]]. */
  def buildTiers(rows: Array[Row])(mergeAll: Seq[Array[Byte]] => Array[Byte])
      : (Long, Long, Map[Tier, Array[Array[Byte]]]) = {
    require(rows.nonEmpty, "cannot index an empty source")
    val (base, horizon) = span(rows.map(_.getLong(0)))
    val minute = minuteBlock(rows, base, horizon)
    val hour = coarsen(minute, base, horizon, Tier.Minute, Tier.Hour)(mergeAll)
    val day = coarsen(hour, base, horizon, Tier.Hour, Tier.Day)(mergeAll)
    (base, horizon, Map[Tier, Array[Array[Byte]]](
      Tier.Minute -> minute, Tier.Hour -> hour, Tier.Day -> day))
  }

  /** The retained minute-slot sketch bytes at `slotMs` — null when
    * empty or outside the span; O(1) array read (round 16: the
    * distributed keyed sketch emission's per-slot feed). Callers must
    * hold `minuteTierComplete` — an evicted minute is indistinguishable
    * from an empty one here. */
  def minuteAt(tiers: Map[Tier, Array[Array[Byte]]], baseMs: Long,
      slotMs: Long): Array[Byte] = at(tiers, baseMs, Tier.Minute, slotMs)

  /** The tier-generic [[minuteAt]] (round 16): the distributed grouped
    * sketch emission reads hour/day blocks when the sum-side feed is a
    * retained-tier cover. Same contract — null when empty or outside
    * the span, callers must hold the completeness precondition. */
  def at(tiers: Map[Tier, Array[Array[Byte]]], baseMs: Long,
      tier: Tier, slotMs: Long): Array[Byte] = {
    val block = tiers(tier)
    val i = ((slotMs - baseMs) / tier.ms).toInt
    if (slotMs < baseMs || i >= block.length) null else block(i)
  }

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

  /** Non-null minute slots of a built wheel as (slot_ms, bytes) pairs —
    * the retained state an append-only TAIL REFRESH merges with the
    * tail files' freshly-built minute sketches (every family's merge is
    * associative, so old-then-tail equals one full build). */
  def minuteEntries(tiers: Map[Tier, Array[Array[Byte]]], base: Long)
      : Iterator[(Long, Array[Byte])] = {
    val block = tiers(Tier.Minute)
    Iterator.range(0, block.length).collect {
      case i if block(i) != null =>
        (base + i.toLong * Tier.Minute.ms, block(i))
    }
  }

  /** Merge a wheel's retained minute entries with tail-built
    * `(slot_ms, sk)` rows (in-slot appends union per slot; new minutes
    * just add slots), yielding the row shape [[buildTiers]] consumes. */
  def mergeMinuteRows(old: Iterator[(Long, Array[Byte])], tail: Array[Row],
      mergeBytes: (Array[Byte], Array[Byte]) => Array[Byte]): Array[Row] = {
    val merged = scala.collection.mutable.LinkedHashMap.empty[Long, Array[Byte]]
    old.foreach { case (s, b) => merged(s) = b }
    tail.foreach { r =>
      val s = r.getLong(0)
      val b = r.getAs[Array[Byte]](1)
      merged(s) = merged.get(s).map(mergeBytes(_, b)).getOrElse(b)
    }
    merged.toArray.sortBy(_._1).map { case (s, b) => Row(s, b) }
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
