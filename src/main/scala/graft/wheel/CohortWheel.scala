package graft.wheel

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, UpdateSketch}
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

  /** Estimated |A ∩ B| — keys active in BOTH ranges (retention). */
  def intersectCount(a: (Long, Long), b: (Long, Long)): Double = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(rangeSketch(a._1, a._2))
    i.intersect(rangeSketch(b._1, b._2))
    i.getResult.getEstimate
  }

  /** Estimated |A \ B| — keys active in A but gone in B (churn). */
  def diffCount(a: (Long, Long), b: (Long, Long)): Double =
    SetOperation.builder().buildANotB()
      .aNotB(rangeSketch(a._1, a._2), rangeSketch(b._1, b._2))
      .getEstimate

  def sizeBytes: Long =
    tiers.valuesIterator.flatMap(_.iterator)
      .map(b => if (b == null) 0L else b.length.toLong).sum

  def slotCounts: Map[Tier, Int] = tiers.map { case (t, b) => t -> b.length }
}

object CohortWheel {

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
    * (slot_ms long, sk binary). Long-key contract enforced like
    * [[FrequencyWheel]]'s. */
  def slotSketches(events: DataFrame, tsCol: String, keyCol: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val keyType = events.schema(keyCol).dataType
    require(Seq("byte", "short", "integer", "long")
        .contains(keyType.typeName),
      s"CohortWheel key column '$keyCol' must be an integral type, " +
        s"got ${keyType.typeName}")
    val slotted = events
      .filter(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .select(RollupBuilder.slotMs(col(tsCol), Tier.Minute).as("slot_ms"),
        col(keyCol).cast("long").as("k"))
      .as[(Long, Long)]
    val partials = slotted.mapPartitions { it =>
      val m = new java.util.HashMap[Long, UpdateSketch]()
      it.foreach { case (slot, k) =>
        m.computeIfAbsent(slot, _ => UpdateSketch.builder().build()).update(k)
      }
      import scala.jdk.CollectionConverters._
      m.entrySet().iterator().asScala
        .map(e => (e.getKey.longValue(), e.getValue.compact().toByteArray))
    }
    partials.toDF("slot_ms", "sk")
      .groupBy("slot_ms")
      .agg(udaf(ThetaUnionAgg).apply(col("sk")).as("sk"))
  }

  /** Per-tier [[Retention]] evicts old fine-tier slots at build time —
    * identical contract to the other sketch wheels. */
  def build(events: DataFrame, tsCol: String, keyCol: String,
      retention: Map[Tier, Retention] = Map.empty): CohortWheel = {
    val rows = slotSketches(events, tsCol, keyCol).collect()
    require(rows.nonEmpty, "cannot index an empty source")
    val (base, horizon) = SketchBlocks.span(rows.map(_.getLong(0)))
    val minute = SketchBlocks.minuteBlock(rows, base, horizon)
    def mergeAll(group: Seq[Array[Byte]]): Array[Byte] = {
      val u = SetOperation.builder().buildUnion()
      group.foreach(b => u.union(CompactSketch.heapify(Memory.wrap(b))))
      u.getResult.toByteArray
    }
    val hour = SketchBlocks.coarsen(minute, base, horizon, Tier.Minute, Tier.Hour)(mergeAll)
    val day = SketchBlocks.coarsen(hour, base, horizon, Tier.Hour, Tier.Day)(mergeAll)
    val blocks = Map[Tier, Array[Array[Byte]]](
      Tier.Minute -> minute, Tier.Hour -> hour, Tier.Day -> day)
    val wheel = new CohortWheel(base, horizon, blocks, retention)
    SketchBlocks.evict(blocks, base, wheel.retainedStartMs)
    wheel
  }
}
