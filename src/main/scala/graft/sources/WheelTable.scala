package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.wheel.{AllAggregate, WheelIndex}

/** `spark.read.format("wheel")` — the wheel index served as a real
  * Spark table (round 12).
  *
  * The Catalyst rewrite ([[graft.plans.WheelAcceleration]]) answers
  * aggregate STATEMENTS from the index; this DataSource V2 provider
  * exposes the index ITSELF — one row per populated minute slot with
  * the per-measure partials — so anything the rewrite doesn't cover
  * (joins against slot series, exports, ad-hoc exploration, BI tools
  * that only speak tables) can still read the O(slots) artifact instead
  * of the O(rows) source. The reference's analogue is registering the
  * wheel as a DataFusion table provider (uwheel-datafusion's stated
  * integration direction, /root/reference/README.md); here it is the
  * idiomatic Spark seam: `TableProvider` + slot-range filter pushdown +
  * column pruning.
  *
  * Modes (mutually exclusive options):
  *  - `option("source", eventsPath)` — serve the IN-MEMORY registration
  *    for that source path (must be `register`ed first);
  *  - `option("dir", indexDir)` — load a [[graft.wheel.PersistentWheel]]
  *    sum-family dir (O(slots) load, no source scan).
  *
  * Schema: `slot_ms LONG, rows LONG`, then per measure `c`:
  * `sum_c/min_c/max_c/m2_c DOUBLE, cnt_c LONG` (NULL when the slot has
  * no non-null measure rows — SQL aggregate semantics). Only populated
  * slots (rows > 0) are emitted.
  *
  * Scale posture: the slot arrays are TIME-bounded (44 640 minutes per
  * month regardless of source volume), so shipping pre-sliced array
  * chunks inside [[InputPartition]]s is a few hundred KB per month and
  * never scales with data size. Slot-range predicates
  * (`slot_ms >=/</<=/>/= L`) are pushed down and prune whole chunks at
  * PLAN time; pushed filters are fully consumed (no re-evaluation).
  */
final class WheelTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "wheel"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WheelTableProvider.resolve(options.asCaseSensitiveMap().asScala.toMap).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    WheelTableProvider.resolve(properties.asScala.toMap)
}

object WheelTableProvider {

  /** Resolve options to a concrete table: the registered in-memory
    * index or a persisted dir. Resolution happens at PLAN time on the
    * driver — both forms are already O(slots). */
  private[sources] def resolve(opts: Map[String, String]): WheelTable = {
    val lower = opts.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
    (lower.get("source"), lower.get("dir")) match {
      case (Some(src), None) =>
        val (_, wheels) = graft.plans.WheelAcceleration.registeredWheels(src)
          .getOrElse(throw new IllegalArgumentException(
            s"wheel table: no in-memory registration for source '$src' " +
              "(WheelAcceleration.register it first, or use option(\"dir\", …))"))
        new WheelTable(s"wheel:$src", wheels)
      case (None, Some(dir)) =>
        val spark = SparkSession.active
        val (_, wheels) = graft.wheel.PersistentWheel.load(spark, dir)
        new WheelTable(s"wheel:$dir", wheels)
      case _ => throw new IllegalArgumentException(
        "wheel table requires exactly one of option(\"source\", eventsPath) " +
          "or option(\"dir\", indexDir)")
    }
  }
}

final class WheelTable(tableName: String, wheels: Map[String, WheelIndex])
  extends Table with SupportsRead {
  require(wheels.nonEmpty, "wheel table: empty index map")

  private[sources] val measures: Seq[String] = wheels.keys.toSeq.sorted
  private[sources] val any: WheelIndex = wheels(measures.head)
  require(wheels.valuesIterator.forall(w =>
    w.baseMs == any.baseMs && w.minuteSlotCount == any.minuteSlotCount),
    "wheel table: measure indexes disagree on the slot grid")

  override def name(): String = tableName
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def schema(): StructType = StructType(
    Seq(StructField("slot_ms", LongType, nullable = false),
      StructField("rows", LongType, nullable = false)) ++
      measures.flatMap(c => Seq(
        StructField(s"sum_$c", DoubleType, nullable = true),
        StructField(s"cnt_$c", LongType, nullable = false),
        StructField(s"min_$c", DoubleType, nullable = true),
        StructField(s"max_$c", DoubleType, nullable = true),
        StructField(s"m2_$c", DoubleType, nullable = true))))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WheelScanBuilder(this)

  private[sources] def wheelFor(measure: String): WheelIndex = wheels(measure)
}

/** Slot-range pushdown + column pruning. Accepted `slot_ms` filters are
  * converted to an index range and consumed COMPLETELY (they constrain
  * a monotone generated column, so the range is exact); everything else
  * is left for Spark to evaluate post-scan. */
final class WheelScanBuilder(table: WheelTable)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private val minuteMs = graft.wheel.Tier.Minute.ms
  // half-open [lo, hi) bounds on slot_ms, tightened by pushed filters
  private var lo: Long = table.any.baseMs
  private var hi: Long = table.any.baseMs + table.any.minuteSlotCount.toLong * minuteMs
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = table.schema()

  private def asMs(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case _ => None
  }

  private def accept(f: Filter): Boolean = f match {
    case GreaterThanOrEqual("slot_ms", v) => asMs(v).exists { m => lo = math.max(lo, m); true }
    case GreaterThan("slot_ms", v) => asMs(v).exists { m => lo = math.max(lo, m + 1); true }
    case LessThan("slot_ms", v) => asMs(v).exists { m => hi = math.min(hi, m); true }
    case LessThanOrEqual("slot_ms", v) => asMs(v).exists { m => hi = math.min(hi, m + 1); true }
    case EqualTo("slot_ms", v) => asMs(v).exists { m => lo = math.max(lo, m); hi = math.min(hi, m + 1); true }
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

  override def build(): Scan = {
    // slot index range implied by [lo, hi): slot i covers
    // [base + i·m, base + (i+1)·m) and carries slot_ms = base + i·m
    val base = table.any.baseMs
    val n = table.any.minuteSlotCount
    val i0 = math.max(0L, math.min(n.toLong, ceilDiv(lo - base, minuteMs))).toInt
    val i1 = math.max(i0.toLong, math.min(n.toLong, ceilDiv(hi - base, minuteMs))).toInt
    new WheelScan(table, required, i0, i1)
  }

  private def ceilDiv(a: Long, b: Long): Long =
    if (a <= 0) 0L else (a + b - 1) / b
}

final class WheelScan(table: WheelTable, required: StructType, i0: Int, i1: Int)
  extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"${table.name()} slots [$i0, $i1) of ${table.any.minuteSlotCount}"

  /** Chunked plan: each partition ships its PRE-SLICED slot rows
    * (time-bounded — never scales with source volume); chunks wholly
    * outside the pushed range were already pruned by [i0, i1). */
  override def planInputPartitions(): Array[InputPartition] = {
    val chunk = 8192
    val fields = required.fields.map(_.name)
    (i0 until i1 by chunk).map { s =>
      val e = math.min(i1, s + chunk)
      val rows = Array.newBuilder[Array[Any]]
      var i = s
      while (i < e) {
        val aggs = table.measures.map(c => table.wheelFor(c).minuteSlot(i))
        if (aggs.head.rows > 0L) {
          val byMeasure = table.measures.zip(aggs).toMap
          rows += fields.map(f => fieldValue(f, i, byMeasure))
        }
        i += 1
      }
      WheelInputPartition(rows.result()): InputPartition
    }.toArray
  }

  private def fieldValue(field: String, i: Int,
      aggs: Map[String, AllAggregate]): Any = field match {
    case "slot_ms" => table.any.minuteSlotMs(i)
    case "rows" => aggs(table.measures.head).rows
    case _ =>
      val sep = field.indexOf('_')
      val (kind, c) = (field.substring(0, sep), field.substring(sep + 1))
      val a = aggs(c)
      kind match {
        case "cnt" => a.count
        case _ if a.count == 0L => null // all-null measure slot: SQL agg = NULL
        case "sum" => a.sum
        case "min" => a.min
        case "max" => a.max
        case "m2" => a.m2
      }
  }

  override def createReaderFactory(): PartitionReaderFactory = WheelReaderFactory
}

/** Rows are fully materialized (and projected) at plan time into the
  * partition; the reader just iterates. */
final case class WheelInputPartition(rows: Array[Array[Any]]) extends InputPartition

object WheelReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[WheelInputPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = new GenericInternalRow(rows(i))
      override def close(): Unit = ()
    }
  }
}
