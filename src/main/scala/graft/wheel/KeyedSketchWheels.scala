package graft.wheel

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import org.apache.datasketches.frequencies.LongsSketch
import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.theta.UpdateSketch

/** PER-DIMENSION-KEY sketch wheels (late round 11): the sketch-wheel
  * family (Theta distinct / KLL quantile / Misra-Gries frequency)
  * generalized to `GROUP BY dim × time-slot` queries — the keyed
  * analogue of [[KeyedWheelIndex]] serving the APPROXIMATE SQL
  * spellings per dimension value (reference anchor: the aggregator
  * framework generality, /root/reference/src/main.rs:15; SURVEY §2.2).
  *
  * Build is the family's two-stage scale-correct shape with the
  * dimension riding the map key: one local sketch per (dim, minute)
  * per partition via `mapPartitions`, ONE shuffle of serialized
  * sketches merged per (dim, slot), then a bounded driver collect
  * groups rows per dim and reuses each family's `fromMinuteSketches`
  * tier roll-up — so a keyed sketch wheel IS a map of ordinary wheels,
  * and every query / merge / accuracy-gate path downstream is the
  * proven unkeyed one. The pre-collect `(dim, slot_ms, sk)` DataFrames
  * are exposed per family as the [[PersistentWheel]] slot payload
  * (mergeable partials, same layout discipline as the unkeyed family). */
object KeyedSketchWheels {

  /** Hard ceiling on collected (dim, minute-slot) sketch rows — keyed
    * sketch state is driver-resident like [[KeyedWheelIndex]]
    * (|dims| × slots × sketch bytes); wider dimensions belong to the
    * distributed aggregation, not a local index. */
  val MaxEntries = 200000

  def buildCohort(events: DataFrame, dimCol: String, tsCol: String,
      keyCol: String): Map[Any, CohortWheel] =
    cohortFromSlotRows(boundedCollect(
      cohortSlotSketches(events, dimCol, tsCol, keyCol)))

  def buildQuantile(events: DataFrame, dimCol: String, tsCol: String,
      valueCol: String): Map[Any, QuantileWheel] =
    quantileFromSlotRows(boundedCollect(
      quantileSlotSketches(events, dimCol, tsCol, valueCol)))

  def buildFrequency(events: DataFrame, dimCol: String, tsCol: String,
      keyCol: String): Map[Any, FrequencyWheel] =
    frequencyFromSlotRows(boundedCollect(
      frequencySlotSketches(events, dimCol, tsCol, keyCol)))

  /** Per-(dim, minute) compact Theta sketches — the build's distributed
    * half and the persisted slot payload. Schema: (dimCol, slot_ms, sk). */
  private[graft] def cohortSlotSketches(events: DataFrame, dimCol: String,
      tsCol: String, keyCol: String): DataFrame = {
    requireIntegral(events, keyCol, "KeyedSketchWheels cohort")
    perDimSlots(events, dimCol, tsCol, keyCol, LongType,
      () => UpdateSketch.builder().build(),
      (s: UpdateSketch, v: Any) => s.update(v.asInstanceOf[java.lang.Long].longValue()),
      (s: UpdateSketch) => s.compact().toByteArray,
      CohortWheel.mergeBytes)
  }

  private[graft] def quantileSlotSketches(events: DataFrame, dimCol: String,
      tsCol: String, valueCol: String): DataFrame =
    perDimSlots(events, dimCol, tsCol, valueCol, DoubleType,
      () => KllDoublesSketch.newHeapInstance(QuantileWheel.K),
      (s: KllDoublesSketch, v: Any) =>
        s.update(v.asInstanceOf[java.lang.Double].doubleValue()),
      (s: KllDoublesSketch) => s.toByteArray,
      QuantileWheel.mergeBytes)

  private[graft] def frequencySlotSketches(events: DataFrame, dimCol: String,
      tsCol: String, keyCol: String): DataFrame = {
    requireIntegral(events, keyCol, "KeyedSketchWheels frequency")
    perDimSlots(events, dimCol, tsCol, keyCol, LongType,
      () => new LongsSketch(FrequencyWheel.MaxMapSize),
      (s: LongsSketch, v: Any) => s.update(v.asInstanceOf[java.lang.Long].longValue()),
      (s: LongsSketch) => s.toByteArray,
      FrequencyWheel.mergeBytes)
  }

  /** Driver-side fill from collected `(dim, slot_ms, sk)` rows — shared
    * by the builds and [[PersistentWheel]]'s keyed sketch loads. */
  private[graft] def cohortFromSlotRows(rows: Array[Row]): Map[Any, CohortWheel] =
    grouped(rows).map { case (dim, rs) =>
      dim -> CohortWheel.fromMinuteSketches(rs, Map.empty)
    }

  private[graft] def quantileFromSlotRows(rows: Array[Row]): Map[Any, QuantileWheel] =
    grouped(rows).map { case (dim, rs) =>
      dim -> QuantileWheel.fromMinuteSketches(rs, Map.empty)
    }

  private[graft] def frequencyFromSlotRows(rows: Array[Row]): Map[Any, FrequencyWheel] =
    grouped(rows).map { case (dim, rs) =>
      dim -> FrequencyWheel.fromMinuteSketches(rs, Map.empty)
    }

  /** The integral-key contract of [[SketchBlocks.longKeySlotSketches]],
    * repeated here because the keyed build casts inside `mapPartitions`
    * (a string key would cast to null and crash mid-job; a double key
    * would silently truncate distinct values together). */
  private def requireIntegral(events: DataFrame, keyCol: String,
      wheelName: String): Unit = {
    val keyType = events.schema(keyCol).dataType
    require(Seq("byte", "short", "integer", "long").contains(keyType.typeName),
      s"$wheelName key column '$keyCol' must be an integral type, " +
        s"got ${keyType.typeName}")
  }

  /** Wraps a family's associative bytes-merge as the stage-2 shuffle
    * aggregator; a null buffer is the identity, so no family needs an
    * empty-sketch zero here. Serializable because `f` is a static
    * method reference on each wheel's companion. */
  private final case class BytesMergeAgg(
      f: (Array[Byte], Array[Byte]) => Array[Byte])
      extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = null
    def reduce(buf: Array[Byte], in: Array[Byte]): Array[Byte] =
      if (buf == null) in else f(buf, in)
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      if (a == null) b else if (b == null) a else f(a, b)
    def finish(buf: Array[Byte]): Array[Byte] = buf
    def bufferEncoder = Encoders.BINARY
    def outputEncoder = Encoders.BINARY
  }

  /** The shared keyed two-stage build: one local sketch per (dim, slot)
    * per partition, ONE shuffle of serialized sketches merged per
    * (dim, slot). NULL dim/ts/measure rows are excluded (SQL aggregate
    * semantics — same convention as the unkeyed slot sketches). */
  private def perDimSlots[S](events: DataFrame, dimCol: String, tsCol: String,
      valCol: String, castTo: DataType,
      newSketch: () => S, update: (S, Any) => Unit,
      serialize: S => Array[Byte],
      mergeBytes: (Array[Byte], Array[Byte]) => Array[Byte]): DataFrame = {
    val slotted = RollupBuilder.normalizeTs(events, tsCol)
      .filter(col(tsCol).isNotNull && col(valCol).isNotNull && col(dimCol).isNotNull)
      .select(col(dimCol),
        RollupBuilder.slotMs(col(tsCol), Tier.Minute).as("slot_ms"),
        col(valCol).cast(castTo).as("v"))
    val outSchema = StructType(Seq(
      StructField(dimCol, slotted.schema(dimCol).dataType),
      StructField("slot_ms", LongType),
      StructField("sk", BinaryType)))
    val partials = slotted.mapPartitions { it =>
      val m = new java.util.HashMap[(Any, Long), S]()
      it.foreach { r =>
        val k = (r.get(0), r.getLong(1))
        var s = m.get(k)
        if (s == null) { s = newSketch(); m.put(k, s) }
        update(s, r.get(2))
      }
      import scala.jdk.CollectionConverters._
      m.entrySet().iterator().asScala
        .map(e => Row(e.getKey._1, e.getKey._2, serialize(e.getValue)))
    }(Encoders.row(outSchema))
    partials.groupBy(col(dimCol), col("slot_ms"))
      .agg(udaf(BytesMergeAgg(mergeBytes)).apply(col("sk")).as("sk"))
  }

  /** Driver materialization of the (dim, slot, sketch) rows, capped
    * BEFORE the transfer: `limit(MaxEntries + 1)` bounds what a
    * runaway-cardinality dimension can ship to the driver, and
    * [[grouped]]'s `require` then still fails loudly on the sentinel
    * extra row — the ceiling is enforced by the plan, not by an OOM. */
  private def boundedCollect(slots: DataFrame): Array[Row] =
    slots.limit(MaxEntries + 1).collect()

  /** Group `(dim, slot_ms, sk)` rows into each family's per-dim
    * `(slot_ms, sk)` input, enforcing the driver-resident ceiling —
    * builds AND persisted loads both pass through here. */
  private def grouped(rows: Array[Row]): Map[Any, Array[Row]] = {
    require(rows.nonEmpty, "cannot index an empty source")
    require(rows.length <= MaxEntries,
      s"keyed sketch rollup has ${rows.length} (dim, slot) rows — too " +
        s"wide for a driver-local index (max $MaxEntries); use the " +
        "distributed aggregation instead")
    rows.groupBy(_.get(0)).map { case (dim, rs) =>
      dim -> rs.map(r => Row(r.getLong(1), r.getAs[Array[Byte]](2)))
    }
  }
}
