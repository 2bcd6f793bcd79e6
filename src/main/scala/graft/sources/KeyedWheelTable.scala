package graft.sources

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.wheel.{AllAggregate, KeyedWheelIndex, Tier}

/** The KEYED wheel family served as a real Spark table (round 12):
  * `spark.read.format("wheel").option("keyed", "true")` with either
  * `option("source", path)` (the in-memory `registerKeyed` family,
  * multi-measure capable) or `option("dir", indexDir)` (a persisted
  * keyed sum dir — O(|keys| × slots) load, no source scan).
  *
  * One row per POPULATED (key, minute slot): `<keyCol> <keyType>,
  * slot_ms LONG, rows LONG`, then the same per-measure partial columns
  * as [[WheelTable]]. The per-dimension slot series is the shape BI
  * tools and downstream joins want ("traffic by type over time") —
  * bounded by |keys| × time, never by source volume, so the whole
  * table is a driver-resident artifact shipped pre-sliced.
  *
  * Pushdown: `slot_ms` range predicates prune the slot walk; `=` / `IN`
  * / `IS NOT NULL` on the key column prune whole keys. Both are
  * consumed exactly (no post-scan re-evaluation). */
final class KeyedWheelTable(tableName: String, val keyCol: String,
    wheels: Map[String, KeyedWheelIndex],
    private[sources] val liveSource: Option[String] = None)
  extends Table with SupportsRead {
  require(wheels.nonEmpty, "keyed wheel table: empty index map")

  private[sources] val measures: Seq[String] = wheels.keys.toSeq.sorted
  private[sources] val any: KeyedWheelIndex = wheels(measures.head)
  require(wheels.valuesIterator.forall(w =>
    w.baseMs == any.baseMs && w.horizonMs == any.horizonMs),
    "keyed wheel table: measure indexes disagree on the slot grid")

  override def name(): String = tableName
  // source-mode tables additionally stream (key, slot) DELTAS from the
  // live registration (round 14); dir snapshots are batch only
  override def capabilities(): java.util.Set[TableCapability] =
    if (liveSource.isDefined)
      java.util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.MICRO_BATCH_READ)
    else java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def schema(): StructType = StructType(
    Seq(StructField(keyCol, any.keyType, nullable = true),
      StructField("slot_ms", LongType, nullable = false),
      StructField("rows", LongType, nullable = false)) ++
      SlotFields.measureSchema(measures))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KeyedWheelScanBuilder(this)

  private[sources] def wheelFor(measure: String): KeyedWheelIndex = wheels(measure)
}

/** Slot-range + key-membership pushdown, column pruning, and COMPLETE
  * aggregate pushdown (round 12): `SUM/MIN/MAX/COUNT/COUNT(*)` grouped
  * by any of ∅ / `slot_ms` / the key column / both are answered by the
  * source — the plan carries NO Aggregate and NO Exchange, and ships
  * exactly one row per group from the driver-resident per-key family
  * ("total per event_type over the range" = |keys| rows, zero executor
  * work). MIN/MAX/SUM are accepted on numeric columns only (the key
  * column may be a string); COUNT on anything. Same complete-pushdown
  * license as the unkeyed table: the index is one driver artifact, so
  * groups are globally unique and no merge step is planned above. */
final class KeyedWheelScanBuilder(table: KeyedWheelTable)
  extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

  private val minuteMs = Tier.Minute.ms
  // half-open [lo, hi) bounds on slot_ms, tightened by pushed filters.
  // horizonMs is already the ABSOLUTE end timestamp (KeyedWheelIndex
  // computes slot counts as (horizonMs - baseMs)/tier.ms), so it is the
  // correct un-tightened upper bound — NOT baseMs + horizonMs (ADVICE r12).
  private var lo: Long = table.any.baseMs
  private var hi: Long = table.any.horizonMs
  // the PUSHED bounds alone (None = open): a streaming scan must not be
  // capped at the resolve-time span — the live horizon keeps extending
  private var loPushed: Option[Long] = None
  private var hiPushed: Option[Long] = None
  // None = all keys; Some(s) = only these (intersection of pushed sets)
  private var keySet: Option[Set[Any]] = None
  private var dropNullKey: Boolean = false
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = table.schema()

  private def asMs(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case _ => None
  }

  private def intersect(s: Set[Any]): Unit =
    keySet = Some(keySet.fold(s)(_ intersect s))

  private def tightenLo(m: Long): Unit = {
    lo = math.max(lo, m)
    loPushed = Some(loPushed.fold(m)(math.max(_, m)))
  }
  private def tightenHi(m: Long): Unit = {
    hi = math.min(hi, m)
    hiPushed = Some(hiPushed.fold(m)(math.min(_, m)))
  }

  private def accept(f: Filter): Boolean = f match {
    case GreaterThanOrEqual("slot_ms", v) => asMs(v).exists { m => tightenLo(m); true }
    // m == Long.MaxValue: m + 1 overflows — leave the filter unconsumed
    // (Spark re-evaluates it post-scan) instead of wrongly passing rows
    case GreaterThan("slot_ms", v) => asMs(v).exists { m =>
      m != Long.MaxValue && { tightenLo(m + 1); true } }
    case LessThan("slot_ms", v) => asMs(v).exists { m => tightenHi(m); true }
    case LessThanOrEqual("slot_ms", v) => asMs(v).exists { m =>
      m != Long.MaxValue && { tightenHi(m + 1); true } }
    case EqualTo("slot_ms", v) => asMs(v).exists { m => tightenLo(m); tightenHi(m + 1); true }
    case EqualTo(c, v) if c == table.keyCol && v != null => intersect(Set(v)); true
    case In(c, vs) if c == table.keyCol => intersect(vs.filter(_ != null).toSet); true
    case IsNotNull(c) if c == table.keyCol => dropNullKey = true; true
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (acc, rest) = filters.partition(accept)
    pushed = acc
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // ---- aggregate pushdown ----
  private var pushedAgg: Option[KeyedAggSpec] = None

  private def colOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case r: NamedReference if r.fieldNames.length == 1 &&
          table.schema().fieldNames.contains(r.fieldNames.head) =>
        Some(r.fieldNames.head)
      case _ => None
    }

  private def numeric(c: String): Boolean =
    table.schema()(c).dataType match {
      case LongType | DoubleType => true
      case _ => false
    }

  /** Translate one pushed function; None = not answerable, no pushdown. */
  private def funcOf(f: AggregateFunc): Option[AggCol] = f match {
    case _: CountStar => Some(AggCol("count", null))
    case c: Count if !c.isDistinct => colOf(c.column).map(AggCol("count", _))
    case s: Sum if !s.isDistinct => colOf(s.column).filter(numeric).map(AggCol("sum", _))
    case m: Min => colOf(m.column).filter(numeric).map(AggCol("min", _))
    case m: Max => colOf(m.column).filter(numeric).map(AggCol("max", _))
    case _ => None
  }

  private def translate(agg: Aggregation): Option[KeyedAggSpec] = {
    val groups = agg.groupByExpressions().toSeq.map(colOf)
    val gs = groups.flatten
    val ok = groups.forall(_.isDefined) && gs.distinct == gs &&
      gs.forall(g => g == table.keyCol || g == "slot_ms")
    val funcs = agg.aggregateExpressions().map(funcOf)
    if (!ok || funcs.exists(_.isEmpty)) None
    else Some(KeyedAggSpec(gs, funcs.map(_.get).toSeq))
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translate(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean = {
    val t = translate(agg)
    t.foreach(s => pushedAgg = Some(s))
    t.isDefined
  }

  override def build(): Scan = pushedAgg match {
    case Some(spec) =>
      new KeyedWheelAggScan(table, spec, lo, hi, keySet, dropNullKey)
    case None => new KeyedWheelScan(table, required, lo, hi, keySet, dropNullKey,
      loPushed, hiPushed)
  }
}

/** A fully-translated pushed keyed [[Aggregation]]: group columns (any
  * of key / `slot_ms`, pushed order preserved) plus the function list. */
private[sources] final case class KeyedAggSpec(groupCols: Seq[String], funcs: Seq[AggCol])

/** COMPLETE-pushdown scan over the keyed family: emits the final
  * aggregate rows themselves via the shared [[SlotAgg]] accumulator.
  * Ungrouped → exactly ONE row (SQL semantics over an empty range);
  * grouped → one row per populated group in walk order. */
final class KeyedWheelAggScan(table: KeyedWheelTable, spec: KeyedAggSpec,
    lo: Long, hi: Long, keySet: Option[Set[Any]], dropNullKey: Boolean)
  extends Scan with Batch {

  private val colType: Map[String, DataType] =
    table.schema().fields.map(f => f.name -> f.dataType).toMap

  private def resultType(f: AggCol): DataType =
    if (f.kind == "count") LongType else colType(f.col)

  override def readSchema(): StructType = StructType(
    spec.groupCols.map(g =>
      StructField(g, colType(g), nullable = g == table.keyCol)) ++
      spec.funcs.zipWithIndex.map { case (f, i) =>
        StructField(s"agg_$i", resultType(f), nullable = f.kind != "count")
      })

  override def toBatch: Batch = this
  override def description(): String = {
    val fs = spec.funcs
      .map(f => s"${f.kind}(${Option(f.col).getOrElse("*")})").mkString(", ")
    s"${table.name()} PushedAggregates [$fs]" +
      (if (spec.groupCols.nonEmpty)
         s" GroupBy [${spec.groupCols.mkString(", ")}]" else "") +
      s" slots [$lo, $hi)"
  }

  private def keep(key: Any): Boolean =
    (!dropNullKey || key != null) && keySet.forall(_.contains(key))

  override def planInputPartitions(): Array[InputPartition] = {
    val input = table.any.minuteEntries(lo, hi)
      .filter { case (k, _, a) => a.rows > 0L && keep(k) }
      .map { case (key, slotMs, headAgg) =>
        lazy val aggs: Map[String, AllAggregate] = table.measures.map { c =>
          c -> (if (c == table.measures.head) headAgg
                else table.wheelFor(c).minuteAt(key, slotMs))
        }.toMap
        val value = (f: String) => f match {
          case f if f == table.keyCol => SlotFields.toInternal(key)
          case "slot_ms" => slotMs
          case "rows" => headAgg.rows
          case f => SlotFields.measureValue(f, aggs)
        }
        (spec.groupCols.map(value), value)
      }
    Array(WheelInputPartition(SlotAgg.aggregate(
      spec.groupCols.nonEmpty, input, spec.funcs, c => colType(c) == LongType)))
  }

  override def createReaderFactory(): PartitionReaderFactory = WheelReaderFactory
}

final class KeyedWheelScan(table: KeyedWheelTable, required: StructType,
    lo: Long, hi: Long, keySet: Option[Set[Any]], dropNullKey: Boolean,
    loPushed: Option[Long] = None, hiPushed: Option[Long] = None)
  extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Real |keys|-x-minutes-bounded stats (round 15) so joins against
    * the keyed table broadcast; one walk of the driver-resident
    * entries, the same work planInputPartitions pays. Round 17
    * (VERDICT r16 #7): COLUMN stats too — the KEY column's exact NDV
    * is what lets CBO cost a multi-way join on the dimension key. */
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    cachedStats

  private lazy val cachedStats: org.apache.spark.sql.connector.read.Statistics =
    WheelStats.detailed(required, () =>
      table.any.minuteEntries(lo, hi)
        .filter { case (k, _, a) => a.rows > 0L && keep(k) }
        .map { case (key, slotMs, headAgg) =>
          lazy val aggs: Map[String, AllAggregate] = table.measures.map { c =>
            c -> (if (c == table.measures.head) headAgg
                  else table.wheelFor(c).minuteAt(key, slotMs))
          }.toMap
          (f: String) => f match {
            case f if f == table.keyCol => SlotFields.toInternal(key)
            case "slot_ms" => slotMs
            case "rows" => headAgg.rows
            case f => SlotFields.measureValue(f, aggs)
          }
        })

  /** Streaming read (round 14): (key, slot) DELTAS from the live keyed
    * registration — see [[WheelStreamBase]]. Only source-mode tables
    * stream. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    val src = table.liveSource.getOrElse(throw new UnsupportedOperationException(
      s"${table.name()}: only option(\"source\", …) tables stream — a dir " +
        "is an immutable snapshot"))
    new KeyedWheelMicroBatchStream(src, table.keyCol, required.fieldNames,
      loPushed, hiPushed, keySet, dropNullKey)
  }
  override def description(): String =
    s"${table.name()} slots [$lo, $hi)" +
      keySet.map(s => s" keys ${s.toSeq.map(String.valueOf).sorted.mkString("{", ",", "}")}").getOrElse("")

  private def keep(key: Any): Boolean =
    (!dropNullKey || key != null) && keySet.forall(_.contains(key))

  private def toInternal(v: Any): Any = SlotFields.toInternal(v)

  /** Pre-sliced (key, slot) rows: bounded by |keys| × minutes — a
    * driver-resident artifact, chunked for parallel downstream work. */
  override def planInputPartitions(): Array[InputPartition] = {
    val fields = required.fields.map(_.name)
    val entries = table.any.minuteEntries(lo, hi)
      .filter { case (k, _, a) => a.rows > 0L && keep(k) }
    val chunk = 8192
    val parts = Array.newBuilder[InputPartition]
    var partCount = 0
    val buf = Array.newBuilder[Array[Any]]
    var n = 0
    entries.foreach { case (key, slotMs, headAgg) =>
      lazy val aggs: Map[String, AllAggregate] = table.measures.map { c =>
        c -> (if (c == table.measures.head) headAgg
              else table.wheelFor(c).minuteAt(key, slotMs))
      }.toMap
      buf += fields.map[Any] {
        case f if f == table.keyCol => toInternal(key)
        case "slot_ms" => slotMs
        case "rows" => headAgg.rows
        case f => SlotFields.measureValue(f, aggs)
      }
      n += 1
      if (n == chunk) {
        parts += WheelInputPartition(buf.result()); partCount += 1
        buf.clear(); n = 0
      }
    }
    val tail = buf.result()
    if (tail.nonEmpty || partCount == 0) parts += WheelInputPartition(tail)
    parts.result()
  }

  override def createReaderFactory(): PartitionReaderFactory = WheelReaderFactory
}
