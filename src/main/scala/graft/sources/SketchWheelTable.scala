package graft.sources

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.wheel.Tier

/** The SKETCH wheel families served as real Spark tables (round 13,
  * VERDICT r12 #3): a persisted `theta`/`hll`/`kll`/`mg` dir — the
  * formats [[graft.wheel.PersistentWheel]] save{Cohort,Distinct,
  * Quantile,Frequency} write — resolved by `spark.read.format("wheel")
  * .option("dir", …)` into one row per retained populated minute slot
  * with the family's per-slot ESTIMATE columns:
  *
  *  - `theta` (CohortWheel) / `hll` (DistinctWheel):
  *    `slot_ms LONG, distinct_<col> DOUBLE` — per-slot distinct-key
  *    estimate (theta is EXACT while per-slot distincts stay under the
  *    nominal 4096 entries, which keeps it oracle-checkable against
  *    per-minute `COUNT(DISTINCT col)`);
  *  - `kll` (QuantileWheel): `slot_ms LONG, p50_<col>/p95_<col>/
  *    p99_<col> DOUBLE` (quantile set overridable via
  *    `option("quantiles", "0.5,0.9,0.99")`);
  *  - `mg` (FrequencyWheel): `slot_ms LONG, top_key LONG,
  *    top_est LONG` — the per-slot heaviest key and its estimate.
  *
  * This closes the BI seam the exact-slot table left open: a dashboard
  * can now read "distinct users per minute" as a plain table — no
  * rewrite, no Scala API — from the same O(slots) driver-resident
  * artifact. Slot-range predicates on `slot_ms` are pushed and consumed
  * exactly (the populated-slot walk is pre-filtered at PLAN time);
  * rows ship pre-sliced in bounded chunks, never scaling with source
  * volume. */
final class SketchWheelTable(tableName: String,
    fieldsAfterSlot: Seq[StructField], slotsMs: Seq[Long],
    rowOf: Long => Array[Any]) extends Table with SupportsRead {

  override def name(): String = tableName
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def schema(): StructType = StructType(
    StructField("slot_ms", LongType, nullable = false) +: fieldsAfterSlot)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SketchWheelScanBuilder(this)

  private[sources] def populatedSlots: Seq[Long] = slotsMs
  private[sources] def valuesAt(slotMs: Long): Array[Any] = rowOf(slotMs)
}

/** Slot-range pushdown + column pruning over the sketch slot walk —
  * the same consumed-exactly contract as [[WheelScanBuilder]]. */
final class SketchWheelScanBuilder(table: SketchWheelTable)
  extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  // half-open [lo, hi) bounds on slot_ms, tightened by pushed filters
  private var lo: Long = Long.MinValue
  private var hi: Long = Long.MaxValue
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = table.schema()

  private def asMs(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case _ => None
  }

  private def accept(f: Filter): Boolean = f match {
    case GreaterThanOrEqual("slot_ms", v) => asMs(v).exists { m => lo = math.max(lo, m); true }
    // m == Long.MaxValue: m + 1 overflows — leave the filter unconsumed
    case GreaterThan("slot_ms", v) => asMs(v).exists { m =>
      m != Long.MaxValue && { lo = math.max(lo, m + 1); true } }
    case LessThan("slot_ms", v) => asMs(v).exists { m => hi = math.min(hi, m); true }
    case LessThanOrEqual("slot_ms", v) => asMs(v).exists { m =>
      m != Long.MaxValue && { hi = math.min(hi, m + 1); true } }
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

  override def build(): Scan = new SketchWheelScan(table, required, lo, hi)
}

final class SketchWheelScan(table: SketchWheelTable, required: StructType,
    lo: Long, hi: Long) extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    WheelStats.of(
      table.populatedSlots.count(s => s >= lo && s < hi).toLong, readSchema())

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"${table.name()} slots [$lo, $hi)"

  /** Pre-sliced rows over the range-pruned populated-slot walk —
    * bounded by TIME (minutes retained), never by source volume. */
  override def planInputPartitions(): Array[InputPartition] = {
    val allFields = table.schema().fieldNames
    val keep = required.fieldNames.map(f => allFields.indexOf(f))
    val rows = table.populatedSlots.iterator
      .filter(s => s >= lo && s < hi)
      .map { s =>
        val full = (s: Any) +: table.valuesAt(s)
        keep.map(i => full(i))
      }.toArray
    val chunk = 8192
    if (rows.isEmpty) Array(WheelInputPartition(Array.empty))
    else rows.grouped(chunk).map(g => WheelInputPartition(g): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = WheelReaderFactory
}

/** The KEYED sketch families (`keyedtheta`/`keyedkll`/`keyedmg` dirs —
  * per-dimension sketch wheels) as a table: one row per populated
  * (dimension key, minute slot) with the family's estimate columns.
  * "Distinct users per minute PER event_type" for a BI tool — the keyed
  * mirror of [[SketchWheelTable]]. Key `=`/`IN`/`IS NOT NULL` and
  * `slot_ms` ranges are consumed exactly; bounded by |keys| × time. */
final class KeyedSketchWheelTable(tableName: String, val keyCol: String,
    keyType: DataType, fieldsAfterSlot: Seq[StructField],
    entries: Seq[(Any, Long)], rowOf: (Any, Long) => Array[Any])
  extends Table with SupportsRead {

  override def name(): String = tableName
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def schema(): StructType = StructType(
    StructField(keyCol, keyType, nullable = true) +:
      StructField("slot_ms", LongType, nullable = false) +: fieldsAfterSlot)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KeyedSketchScanBuilder(this)

  private[sources] def allEntries: Seq[(Any, Long)] = entries
  private[sources] def valuesAt(key: Any, slotMs: Long): Array[Any] =
    rowOf(key, slotMs)
}

/** Key-membership + slot-range pushdown and column pruning for the
  * keyed sketch table — the same consumed-exactly contract as
  * [[KeyedWheelScanBuilder]]. */
final class KeyedSketchScanBuilder(table: KeyedSketchWheelTable)
  extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var lo: Long = Long.MinValue
  private var hi: Long = Long.MaxValue
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

  private def accept(f: Filter): Boolean = f match {
    case GreaterThanOrEqual("slot_ms", v) => asMs(v).exists { m => lo = math.max(lo, m); true }
    case GreaterThan("slot_ms", v) => asMs(v).exists { m =>
      m != Long.MaxValue && { lo = math.max(lo, m + 1); true } }
    case LessThan("slot_ms", v) => asMs(v).exists { m => hi = math.min(hi, m); true }
    case LessThanOrEqual("slot_ms", v) => asMs(v).exists { m =>
      m != Long.MaxValue && { hi = math.min(hi, m + 1); true } }
    case EqualTo("slot_ms", v) => asMs(v).exists { m => lo = math.max(lo, m); hi = math.min(hi, m + 1); true }
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

  override def build(): Scan =
    new KeyedSketchScan(table, required, lo, hi, keySet, dropNullKey)
}

final class KeyedSketchScan(table: KeyedSketchWheelTable, required: StructType,
    lo: Long, hi: Long, keySet: Option[Set[Any]], dropNullKey: Boolean)
  extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    WheelStats.of(table.allEntries.iterator
      .count { case (k, s) => s >= lo && s < hi && keep(k) }.toLong,
      readSchema())

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"${table.name()} slots [$lo, $hi)" +
      keySet.map(s => s" keys ${s.size}").getOrElse("")

  private def keep(key: Any): Boolean =
    (!dropNullKey || key != null) && keySet.forall(_.contains(key))

  override def planInputPartitions(): Array[InputPartition] = {
    val allFields = table.schema().fieldNames
    val keepIdx = required.fieldNames.map(f => allFields.indexOf(f))
    val rows = table.allEntries.iterator
      .filter { case (k, s) => s >= lo && s < hi && keep(k) }
      .map { case (k, s) =>
        val full = SlotFields.toInternal(k) +: (s: Any) +: table.valuesAt(k, s)
        keepIdx.map(i => full(i))
      }.toArray
    val chunk = 8192
    if (rows.isEmpty) Array(WheelInputPartition(Array.empty))
    else rows.grouped(chunk).map(g => WheelInputPartition(g): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = WheelReaderFactory
}

private[sources] object SketchWheelTable {
  private val minuteMs = Tier.Minute.ms

  /** Runtime key-type inference for keyed sketch dirs (the sidecar
    * records column NAMES; the values carry the type). An unsupported
    * key class is a LOUD error (ADVICE r13) — a silent StringType
    * default would surface as a schema/value mismatch at scan time. */
  private def keyTypeOf(keys: Iterable[Any]): DataType =
    keys.headOption match {
      case Some(_: String) => StringType
      case Some(_: Long) => LongType
      case Some(_: Int) => IntegerType
      case Some(_: Double) => DoubleType
      case Some(other) => throw new IllegalArgumentException(
        s"keyed sketch table: unsupported key class " +
          s"${other.getClass.getName} (supported: String, Long, Int, Double)")
      case None => StringType // unreachable: callers require nonEmpty
    }

  def keyedTheta(name: String, dimCol: String, col: String,
      ws: Map[Any, graft.wheel.CohortWheel]): KeyedSketchWheelTable = {
    require(ws.nonEmpty, s"keyed theta table: no keys in $name")
    new KeyedSketchWheelTable(name, dimCol, keyTypeOf(ws.keys),
      Seq(StructField(s"distinct_$col", DoubleType, nullable = false)),
      ws.toSeq.sortBy(_._1.toString).flatMap { case (k, w) =>
        w.minuteSlotsMs.map(s => (k, s)) },
      (k, s) => Array[Any](ws(k).distinct(s, s + minuteMs)))
  }

  def keyedKll(name: String, dimCol: String, col: String,
      ws: Map[Any, graft.wheel.QuantileWheel],
      quantiles: Seq[Double]): KeyedSketchWheelTable = {
    require(ws.nonEmpty, s"keyed kll table: no keys in $name")
    new KeyedSketchWheelTable(name, dimCol, keyTypeOf(ws.keys),
      quantiles.map(q => StructField(s"${pName(q)}_$col", DoubleType, nullable = true)),
      ws.toSeq.sortBy(_._1.toString).flatMap { case (k, w) =>
        w.minuteSlotsMs.map(s => (k, s)) },
      (k, s) => ws(k).queryQuantiles(s, s + minuteMs, quantiles)
        .map(v => (if (v.isNaN) null else v): Any).toArray)
  }

  def keyedMg(name: String, dimCol: String, col: String,
      ws: Map[Any, graft.wheel.FrequencyWheel]): KeyedSketchWheelTable = {
    require(ws.nonEmpty, s"keyed mg table: no keys in $name")
    new KeyedSketchWheelTable(name, dimCol, keyTypeOf(ws.keys),
      Seq(StructField("top_key", LongType, nullable = true),
        StructField("top_est", LongType, nullable = true)),
      ws.toSeq.sortBy(_._1.toString).flatMap { case (k, w) =>
        w.minuteSlotsMs.map(s => (k, s)) },
      (k, s) => ws(k).topK(s, s + minuteMs, 1).headOption
        .map(t => Array[Any](t._1, t._2))
        .getOrElse(Array[Any](null, null)))
  }

  /** Column-name suffix for a quantile fraction: 0.5 → p50, 0.99 → p99,
    * 0.999 → p99_9 (dots are illegal in column names). */
  private def pName(q: Double): String = {
    val s = BigDecimal(q * 100).underlying.stripTrailingZeros.toPlainString
    "p" + s.replace(".", "_")
  }

  def theta(name: String, col: String, w: graft.wheel.CohortWheel): SketchWheelTable =
    new SketchWheelTable(name,
      Seq(StructField(s"distinct_$col", DoubleType, nullable = false)),
      w.minuteSlotsMs, s => Array[Any](w.distinct(s, s + minuteMs)))

  def hll(name: String, col: String, w: graft.wheel.DistinctWheel): SketchWheelTable =
    new SketchWheelTable(name,
      Seq(StructField(s"distinct_$col", DoubleType, nullable = false)),
      w.minuteSlotsMs, s => Array[Any](w.queryDistinct(s, s + minuteMs)))

  def kll(name: String, col: String, w: graft.wheel.QuantileWheel,
      quantiles: Seq[Double]): SketchWheelTable =
    new SketchWheelTable(name,
      quantiles.map(q => StructField(s"${pName(q)}_$col", DoubleType, nullable = true)),
      w.minuteSlotsMs,
      s => w.queryQuantiles(s, s + minuteMs, quantiles).map(v =>
        (if (v.isNaN) null else v): Any).toArray)

  def mg(name: String, col: String, w: graft.wheel.FrequencyWheel): SketchWheelTable =
    new SketchWheelTable(name,
      Seq(StructField("top_key", LongType, nullable = true),
        StructField("top_est", LongType, nullable = true)),
      w.minuteSlotsMs,
      s => w.topK(s, s + minuteMs, 1).headOption
        .map(t => Array[Any](t._1, t._2))
        .getOrElse(Array[Any](null, null)))
}
