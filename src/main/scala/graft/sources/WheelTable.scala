package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min, Sum}
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

  // lets DataFrameWriter hand the df schema straight to getTable — the
  // WRITE path (round 13); reads still infer via resolve()
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WheelTableProvider.resolve(options.asCaseSensitiveMap().asScala.toMap).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val lower = properties.asScala.toMap
      .map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
    // the `ts` option is the write-routing signal (reads never pass it):
    // `df.write.format("wheel").option("dir", …).option("ts", …)` lands
    // here with the DataFrame's schema
    if (WheelWriteTable.isWrite(lower)) WheelWriteTable.forWrite(lower, schema)
    else WheelTableProvider.resolve(properties.asScala.toMap)
  }
}

object WheelTableProvider {

  /** Resolve options to a concrete table: the registered in-memory
    * index or a persisted dir, unkeyed or (`option("keyed", "true")`)
    * the per-key family. Resolution happens at PLAN time on the
    * driver — all forms are already O(slots). */
  private[sources] def resolve(opts: Map[String, String]): Table = {
    val lower = opts.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
    val keyed = lower.get("keyed").exists(_.equalsIgnoreCase("true"))
    (lower.get("source"), lower.get("dir")) match {
      case (Some(src), None) if keyed =>
        val (keyCol, _, wheels) =
          graft.plans.WheelAcceleration.registeredKeyedWheels(src)
            .getOrElse(throw new IllegalArgumentException(
              s"wheel table: no KEYED in-memory registration for source '$src' " +
                "(WheelAcceleration.registerKeyed it first, or use option(\"dir\", …))"))
        new KeyedWheelTable(s"wheel:$src?keyed", keyCol, wheels,
          liveSource = Some(src))
      case (Some(src), None) =>
        val (_, wheels) = graft.plans.WheelAcceleration.registeredWheels(src)
          .getOrElse(throw new IllegalArgumentException(
            s"wheel table: no in-memory registration for source '$src' " +
              "(WheelAcceleration.register it first, or use option(\"dir\", …))"))
        new WheelTable(s"wheel:$src", wheels, liveSource = Some(src))
      case (None, Some(dir)) =>
        // dir mode dispatches on the persisted KIND (round 13, VERDICT
        // r12 #3): every family PersistentWheel can save now has a table
        // spelling — sum, keyed, keyedmulti (the live keyed ingest's
        // checkpoint format), and the four sketch dirs. The legacy
        // `keyed` option is validated against the kind rather than
        // driving resolution.
        val spark = SparkSession.active
        val P = graft.wheel.PersistentWheel
        val meta = P.peek(spark, dir).getOrElse(throw new IllegalArgumentException(
          s"wheel table: no readable persisted wheel at '$dir'"))
        val keyedKinds = Set(P.KeyedKind, P.KeyedMultiKind,
          P.KeyedThetaKind, P.KeyedKllKind, P.KeyedMgKind)
        require(!keyed || keyedKinds.contains(meta.kind),
          s"wheel table: option(\"keyed\") given but '$dir' holds a " +
            s"'${meta.kind}' wheel")
        // loads ride the build-once dir-load cache (round 18): resolve()
        // runs at PLAN time — inferSchema AND getTable both land here —
        // and each load is a full collect job of the saved partials. The
        // peek above re-reads the sidecar every resolution, and the cache
        // key is the sidecar's payload identity, so a re-saved dir always
        // loads fresh. The cache holds the loader's FULL (meta, payload)
        // tuple and column names come from the LOADED meta — names and
        // payload stay one consistent sidecar read even if the dir is
        // re-saved between the peek and the load (round-18 review
        // finding); the peeked meta only dispatches the kind and keys
        // the cache.
        val C = graft.wheel.WheelCatalog
        meta.kind match {
          case P.SumKind =>
            val (_, wheels) = C.cachedDirLoad(spark, dir, meta, "table-sum")(
              P.load(spark, dir))
            new WheelTable(s"wheel:$dir", wheels)
          case P.KeyedKind =>
            val (m, kw) = C.cachedDirLoad(spark, dir, meta, "table-keyed")(
              P.loadKeyed(spark, dir))
            new KeyedWheelTable(s"wheel:$dir?keyed", m.valueCols.head,
              Map(m.valueCols(1) -> kw))
          case P.KeyedMultiKind =>
            val (m, wheels) = C.cachedDirLoad(spark, dir, meta, "table-keyedmulti")(
              P.loadKeyedMulti(spark, dir))
            new KeyedWheelTable(s"wheel:$dir?keyedmulti", m.valueCols.head, wheels)
          case P.ThetaKind =>
            val (m, w) = C.cachedDirLoad(spark, dir, meta, "table-theta")(
              P.loadCohort(spark, dir))
            SketchWheelTable.theta(s"wheel:$dir?theta", m.valueCols.head, w)
          case P.HllKind =>
            val (m, w) = C.cachedDirLoad(spark, dir, meta, "table-hll")(
              P.loadDistinct(spark, dir))
            SketchWheelTable.hll(s"wheel:$dir?hll", m.valueCols.head, w)
          case P.KllKind =>
            val (m, w) = C.cachedDirLoad(spark, dir, meta, "table-kll")(
              P.loadQuantile(spark, dir))
            val qs = lower.get("quantiles")
              .map(_.split(",").map(_.trim.toDouble).toSeq)
              .getOrElse(Seq(0.5, 0.95, 0.99))
            SketchWheelTable.kll(s"wheel:$dir?kll", m.valueCols.head, w, qs)
          case P.MgKind =>
            val (m, w) = C.cachedDirLoad(spark, dir, meta, "table-mg")(
              P.loadFrequency(spark, dir))
            SketchWheelTable.mg(s"wheel:$dir?mg", m.valueCols.head, w)
          case P.KeyedThetaKind =>
            val (m, ws) = C.cachedDirLoad(spark, dir, meta, "table-keyedtheta")(
              P.loadKeyedCohort(spark, dir))
            SketchWheelTable.keyedTheta(s"wheel:$dir?keyedtheta",
              m.valueCols.head, m.valueCols(1), ws)
          case P.KeyedKllKind =>
            val (m, ws) = C.cachedDirLoad(spark, dir, meta, "table-keyedkll")(
              P.loadKeyedQuantile(spark, dir))
            val qs = lower.get("quantiles")
              .map(_.split(",").map(_.trim.toDouble).toSeq)
              .getOrElse(Seq(0.5, 0.95, 0.99))
            SketchWheelTable.keyedKll(s"wheel:$dir?keyedkll",
              m.valueCols.head, m.valueCols(1), ws, qs)
          case P.KeyedMgKind =>
            val (m, ws) = C.cachedDirLoad(spark, dir, meta, "table-keyedmg")(
              P.loadKeyedFrequency(spark, dir))
            SketchWheelTable.keyedMg(s"wheel:$dir?keyedmg",
              m.valueCols.head, m.valueCols(1), ws)
          case other => throw new IllegalArgumentException(
            s"wheel table: persisted kind '$other' at '$dir' has no table " +
              "spelling (supported: sum, keyed, keyedmulti, theta, hll, " +
              "kll, mg, keyedtheta, keyedkll, keyedmg)")
        }
      case _ => throw new IllegalArgumentException(
        "wheel table requires exactly one of option(\"source\", eventsPath) " +
          "or option(\"dir\", indexDir)")
    }
  }
}

/** Schema and value extraction for the per-measure partial columns —
  * shared by the unkeyed and keyed wheel tables so both emit identical
  * slot semantics. */
private[sources] object SlotFields {
  def measureSchema(measures: Seq[String]): Seq[StructField] =
    measures.flatMap(c => Seq(
      StructField(s"sum_$c", DoubleType, nullable = true),
      StructField(s"cnt_$c", LongType, nullable = false),
      StructField(s"min_$c", DoubleType, nullable = true),
      StructField(s"max_$c", DoubleType, nullable = true),
      StructField(s"m2_$c", DoubleType, nullable = true)))

  /** Value of a per-measure column (`sum_c/cnt_c/min_c/max_c/m2_c`). */
  def measureValue(field: String, aggs: Map[String, AllAggregate]): Any = {
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

  /** Catalyst-internal form of a slot/key value (string keys must ship
    * as UTF8String inside InternalRow). */
  def toInternal(v: Any): Any = v match {
    case s: String => org.apache.spark.unsafe.types.UTF8String.fromString(s)
    case x => x
  }
}

/** Shared accumulation for COMPLETE-pushdown aggregate scans — used by
  * the unkeyed and keyed wheel tables so both answer pushed
  * SUM/MIN/MAX/COUNT identically. Runs on the driver over the O(slots)
  * (or O(|keys|×slots)) walk at PLAN time; never touches the source. */
private[sources] object SlotAgg {

  private def lt(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Double, y: Double) => x < y
    case (x: Long, y: Long) => x < y
    case _ => false
  }

  private final class Acc(n: Int) {
    var rows = 0L // COUNT(*) of table rows in the group
    val nonNull = new Array[Long](n)
    val sumD = new Array[Double](n)
    val sumL = new Array[Long](n)
    val extreme = new Array[Any](n) // running min/max; null until a value
  }

  /** `input`: (group key values — already Catalyst-internal, empty when
    * ungrouped; column-value accessor). Output rows are group cols ++
    * one value per func, in first-seen group order (the deterministic
    * slot/key walk). Ungrouped → exactly ONE row even over an empty
    * input (SQL semantics: SUM/MIN/MAX NULL, COUNTs 0); grouped → one
    * row per populated group, globally unique because the whole index
    * is a single driver-resident artifact — which is what licenses
    * COMPLETE pushdown (no merge step is planned above the scan). */
  def aggregate(grouped: Boolean, input: Iterator[(Seq[Any], String => Any)],
      funcs: Seq[AggCol], isLongCol: String => Boolean): Array[Array[Any]] = {
    val fs = funcs.toArray
    val n = fs.length
    val groups = new java.util.LinkedHashMap[Seq[Any], Acc]()
    input.foreach { case (g, value) =>
      val acc = groups.computeIfAbsent(if (grouped) g else Nil, _ => new Acc(n))
      acc.rows += 1L
      var k = 0
      while (k < n) {
        val f = fs(k)
        if (f.col != null) {
          val v = value(f.col)
          if (v != null) {
            acc.nonNull(k) += 1L
            f.kind match {
              case "sum" => v match {
                case d: Double => acc.sumD(k) += d
                case l: Long => acc.sumL(k) += l
              }
              case "min" =>
                if (acc.extreme(k) == null || lt(v, acc.extreme(k))) acc.extreme(k) = v
              case "max" =>
                if (acc.extreme(k) == null || lt(acc.extreme(k), v)) acc.extreme(k) = v
              case _ => ()
            }
          }
        }
        k += 1
      }
    }
    if (!grouped && groups.isEmpty) groups.put(Nil, new Acc(n))
    val out = Array.newBuilder[Array[Any]]
    groups.forEach { (g, acc) =>
      out += (g ++ fs.zipWithIndex.map[Any] { case (f, k) =>
        f.kind match {
          case "count" => if (f.col == null) acc.rows else acc.nonNull(k)
          case "sum" =>
            if (acc.nonNull(k) == 0L) null
            else if (isLongCol(f.col)) acc.sumL(k) else acc.sumD(k)
          case _ => acc.extreme(k)
        }
      }).toArray[Any]
    }
    out.result()
  }
}

/** One pushed sort key: table column, direction, absolute null
  * placement (Spark's NullOrdering is independent of direction). */
private[sources] final case class SortKey(col: String, descending: Boolean,
    nullsFirst: Boolean)

/** A fully-pushed ORDER BY + LIMIT ([[SupportsPushDownTopN]]). */
private[sources] final case class TopNSpec(keys: Seq[SortKey], limit: Int)

private[sources] object TopNSpec {
  /** Total-order comparator over materialized rows; `idx` maps a sort
    * column to its position in the row array. */
  def comparator(keys: Seq[SortKey], idx: Map[String, Int]): java.util.Comparator[Array[Any]] =
    new java.util.Comparator[Array[Any]] {
      override def compare(a: Array[Any], b: Array[Any]): Int = {
        val it = keys.iterator
        var c = 0
        while (c == 0 && it.hasNext) {
          val k = it.next()
          val (x, y) = (a(idx(k.col)), b(idx(k.col)))
          c =
            if (x == null && y == null) 0
            else if (x == null) { if (k.nullsFirst) -1 else 1 }
            else if (y == null) { if (k.nullsFirst) 1 else -1 }
            else {
              val base = (x, y) match {
                case (p: Double, q: Double) => java.lang.Double.compare(p, q)
                case (p: Long, q: Long) => java.lang.Long.compare(p, q)
                case _ => 0
              }
              if (k.descending) -base else base
            }
        }
        c
      }
    }
}

final class WheelTable(tableName: String, wheels: Map[String, WheelIndex],
    private[sources] val liveSource: Option[String] = None)
  extends Table with SupportsRead {
  require(wheels.nonEmpty, "wheel table: empty index map")

  private[sources] val measures: Seq[String] = wheels.keys.toSeq.sorted
  private[sources] val any: WheelIndex = wheels(measures.head)
  require(wheels.valuesIterator.forall(w =>
    w.baseMs == any.baseMs && w.minuteSlotCount == any.minuteSlotCount),
    "wheel table: measure indexes disagree on the slot grid")

  override def name(): String = tableName
  // source-mode tables additionally stream slot DELTAS from the live
  // registration (round 14); dir-mode tables are immutable snapshots —
  // batch only
  override def capabilities(): java.util.Set[TableCapability] =
    if (liveSource.isDefined)
      java.util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.MICRO_BATCH_READ)
    else java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def schema(): StructType = StructType(
    Seq(StructField("slot_ms", LongType, nullable = false),
      StructField("rows", LongType, nullable = false)) ++
      SlotFields.measureSchema(measures))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WheelScanBuilder(this)

  private[sources] def wheelFor(measure: String): WheelIndex = wheels(measure)

  /** Value of table column `field` at minute slot `i` given the slot's
    * per-measure partials — shared by the row scan and the pushed-down
    * aggregate scan so both emit identical slot semantics. */
  private[sources] def fieldValue(field: String, i: Int,
      aggs: Map[String, AllAggregate]): Any = field match {
    case "slot_ms" => any.minuteSlotMs(i)
    case "rows" => aggs(measures.head).rows
    case _ => SlotFields.measureValue(field, aggs)
  }
}

/** Slot-range pushdown + column pruning + COMPLETE aggregate pushdown.
  * Accepted `slot_ms` filters are converted to an index range and
  * consumed COMPLETELY (they constrain a monotone generated column, so
  * the range is exact); everything else is left for Spark to evaluate
  * post-scan.
  *
  * Aggregate pushdown (round 12): `SUM/MIN/MAX/COUNT/COUNT(*)` over the
  * slot columns — ungrouped or `GROUP BY slot_ms` — are answered by the
  * source itself ([[SupportsPushDownAggregates]]). The plan then carries
  * NO Aggregate, NO Exchange, and ships exactly the answer rows: an
  * ungrouped `SELECT SUM(sum_value) … WHERE slot_ms ∈ range` is ONE row
  * from the driver-resident index, the 1000-executor cluster does zero
  * work. Pushdown only fires when every filter was consumed (Spark's
  * rule requires it) and every aggregate translates — anything else
  * falls back to the plain slot scan, still correct. */

/** DSv2 statistics for the wheel scans (round 15): report the REAL
  * time-bounded row count and width so Spark's join planning sees a
  * megabyte-scale side and broadcasts it — without stats a DSv2
  * relation defaults to `defaultSizeInBytes` (effectively infinite)
  * and a join against the index would shuffle both sides at 100 TB.
  * Counting costs one walk of the driver-resident slot arrays, the
  * same order of work `planInputPartitions` pays at execution. */
private[sources] object WheelStats {
  def of(rows: Long, schema: StructType)
      : org.apache.spark.sql.connector.read.Statistics = {
    val width = schema.defaultSize.toLong + 20L
    val n = math.max(rows, 0L)
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(math.max(1L, n * width))
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(n)
    }
  }

  /** COLUMN-level DSv2 statistics (round 17, VERDICT r16 #7): per-column
    * min/max/NDV/null-count off ONE walk of the driver-resident slot
    * rows — the same order of work `planInputPartitions` pays — so CBO
    * (`spark.sql.cbo.enabled` + `joinReorder.enabled`) can
    * selectivity-estimate filters and cost multi-way join orders
    * against wheel tables instead of treating every side as opaque.
    * min/max report only for numeric/timestamp columns (the types
    * Spark's estimation arithmetic consumes); NDV is exact up to a cap
    * (the walk is time-bounded, the set is memory-bounded). */
  def detailed(schema: StructType,
      walk: () => Iterator[String => Any])
      : org.apache.spark.sql.connector.read.Statistics = {
    import org.apache.spark.sql.connector.read.colstats.ColumnStatistics
    import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
    val fields = schema.fields
    val n = fields.length
    val numericish = fields.map(f => f.dataType match {
      case _: org.apache.spark.sql.types.NumericType => true
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType |
           org.apache.spark.sql.types.DateType => true
      case _ => false
    })
    // NDV is tracked only for the types a join/group key can be
    // (integral, string, timestamp) — hashing every per-slot DOUBLE
    // partial would tax planning for a statistic estimation never uses
    val trackNdv = fields.map(_.dataType match {
      case org.apache.spark.sql.types.DoubleType |
           org.apache.spark.sql.types.FloatType => false
      case _ => true
    })
    val mins = new Array[Any](n)
    val maxs = new Array[Any](n)
    val nulls = new Array[Long](n)
    val NdvCap = 1 << 16
    val ndv: Array[java.util.HashSet[Any]] =
      Array.tabulate(n)(i =>
        if (trackNdv(i)) new java.util.HashSet[Any]() else null)
    var rows = 0L
    walk().foreach { value =>
      rows += 1
      var i = 0
      while (i < n) {
        val v = value(fields(i).name)
        if (v == null) nulls(i) += 1
        else {
          if (numericish(i)) {
            val c = v.asInstanceOf[Comparable[Any]]
            if (mins(i) == null || c.compareTo(mins(i)) < 0) mins(i) = v
            if (maxs(i) == null || c.compareTo(maxs(i)) > 0) maxs(i) = v
          }
          val s = ndv(i)
          if (s != null && s.size < NdvCap) s.add(v)
        }
        i += 1
      }
    }
    val colStats = new java.util.HashMap[NamedReference, ColumnStatistics]()
    fields.zipWithIndex.foreach { case (f, i) =>
      val exactNdv = ndv(i) != null && ndv(i).size < NdvCap
      val (mn, mx, nc, dc) = (mins(i), maxs(i), nulls(i),
        if (exactNdv) Some(ndv(i).size.toLong) else None)
      colStats.put(Expressions.column(f.name), new ColumnStatistics {
        override def distinctCount(): java.util.OptionalLong =
          dc.map(java.util.OptionalLong.of)
            .getOrElse(java.util.OptionalLong.empty())
        override def min(): java.util.Optional[Object] =
          java.util.Optional.ofNullable(mn.asInstanceOf[Object])
        override def max(): java.util.Optional[Object] =
          java.util.Optional.ofNullable(mx.asInstanceOf[Object])
        override def nullCount(): java.util.OptionalLong =
          java.util.OptionalLong.of(nc)
      })
    }
    val width = schema.defaultSize.toLong + 20L
    val total = rows
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(math.max(1L, total * width))
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(total)
      override def columnStats()
          : java.util.Map[NamedReference, ColumnStatistics] = colStats
    }
  }
}

final class WheelScanBuilder(table: WheelTable)
  extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with SupportsPushDownTopN with SupportsPushDownLimit {

  private val minuteMs = graft.wheel.Tier.Minute.ms
  // half-open [lo, hi) bounds on slot_ms, tightened by pushed filters
  private var lo: Long = table.any.baseMs
  private var hi: Long = table.any.baseMs + table.any.minuteSlotCount.toLong * minuteMs
  // the PUSHED bounds alone (None = open): a streaming scan must not be
  // capped at the resolve-time span — the live horizon keeps extending
  private var loPushed: Option[Long] = None
  private var hiPushed: Option[Long] = None
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = table.schema()

  private def asMs(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case _ => None
  }

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
  private var pushedAgg: Option[WheelAggSpec] = None

  private def colOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case r: NamedReference if r.fieldNames.length == 1 &&
          table.schema().fieldNames.contains(r.fieldNames.head) =>
        Some(r.fieldNames.head)
      case _ => None
    }

  /** Translate one pushed function; None = not answerable, no pushdown. */
  private def funcOf(f: AggregateFunc): Option[AggCol] = f match {
    case _: CountStar => Some(AggCol("count", null))
    case c: Count if !c.isDistinct => colOf(c.column).map(AggCol("count", _))
    case s: Sum if !s.isDistinct => colOf(s.column).map(AggCol("sum", _))
    case m: Min => colOf(m.column).map(AggCol("min", _))
    case m: Max => colOf(m.column).map(AggCol("max", _))
    case _ => None
  }

  private def translate(agg: Aggregation): Option[WheelAggSpec] = {
    val group = agg.groupByExpressions() match {
      case Array() => Some(false)
      case Array(g) if colOf(g).contains("slot_ms") => Some(true)
      case _ => None
    }
    val funcs = agg.aggregateExpressions().map(funcOf)
    if (group.isEmpty || funcs.exists(_.isEmpty)) None
    else Some(WheelAggSpec(group.get, funcs.map(_.get).toSeq))
  }

  /** The index holds the FINAL per-slot values (and their total combine),
    * so every pushdown we accept is complete — one answer row per group,
    * globally unique groups, no merge step needed above. */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translate(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean = {
    val t = translate(agg)
    t.foreach(s => pushedAgg = Some(s))
    t.isDefined
  }

  // ---- ORDER BY + LIMIT pushdown (round 12) ----
  // "Top-k busiest slots" costs a bounded driver-side sort of the
  // already-materialized slot rows — the Sort+Limit (and its Exchange)
  // vanish from the plan. Fully consumed (isPartiallyPushed = false):
  // the scan emits exactly the k rows, in order.
  private var topN: Option[TopNSpec] = None
  private var limitN: Option[Int] = None

  private def sortKeyOf(
      o: org.apache.spark.sql.connector.expressions.SortOrder): Option[SortKey] =
    colOf(o.expression()).map { c =>
      import org.apache.spark.sql.connector.expressions.{NullOrdering, SortDirection}
      SortKey(c, o.direction() == SortDirection.DESCENDING,
        o.nullOrdering() == NullOrdering.NULLS_FIRST)
    }

  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      limit: Int): Boolean = {
    // every column is LONG or DOUBLE, so any resolved column sorts
    if (pushedAgg.isDefined) return false
    val keys = orders.toSeq.map(sortKeyOf)
    if (keys.exists(_.isEmpty)) false
    else { topN = Some(TopNSpec(keys.flatten, limit)); true }
  }

  override def pushLimit(limit: Int): Boolean =
    pushedAgg.isEmpty && { limitN = Some(limit); true }

  override def isPartiallyPushed(): Boolean = false

  override def build(): Scan = {
    // slot index range implied by [lo, hi): slot i covers
    // [base + i·m, base + (i+1)·m) and carries slot_ms = base + i·m
    val base = table.any.baseMs
    val n = table.any.minuteSlotCount
    val i0 = math.max(0L, math.min(n.toLong, ceilDiv(lo - base, minuteMs))).toInt
    val i1 = math.max(i0.toLong, math.min(n.toLong, ceilDiv(hi - base, minuteMs))).toInt
    pushedAgg match {
      case Some(spec) => new WheelAggScan(table, spec, i0, i1)
      case None =>
        new WheelScan(table, required, i0, i1, topN, limitN, loPushed, hiPushed)
    }
  }

  private def ceilDiv(a: Long, b: Long): Long =
    if (a <= 0) 0L else (a + b - 1) / b
}

/** One pushed aggregate call: `kind` ∈ sum/min/max/count over table
  * column `col` (`col == null` = `COUNT(*)`). */
private[sources] final case class AggCol(kind: String, col: String)

/** A fully-translated pushed [[Aggregation]]: optional `GROUP BY
  * slot_ms` plus the function list, in output order. */
private[sources] final case class WheelAggSpec(groupBySlot: Boolean, funcs: Seq[AggCol])

/** COMPLETE-pushdown scan: emits the final aggregate rows themselves.
  * Ungrouped → exactly ONE row (SQL semantics even over an empty slot
  * range: SUM/MIN/MAX NULL, COUNTs 0). Grouped by `slot_ms` → one row
  * per populated slot, globally unique because the index is a single
  * driver-resident artifact — which is what licenses complete pushdown
  * (no merge aggregation is planned above this scan). */
final class WheelAggScan(table: WheelTable, spec: WheelAggSpec, i0: Int, i1: Int)
  extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    WheelStats.of(if (spec.groupBySlot) populated.size.toLong else 1L,
      readSchema())

  private val colType: Map[String, DataType] =
    table.schema().fields.map(f => f.name -> f.dataType).toMap

  private def resultType(f: AggCol): DataType =
    if (f.kind == "count") LongType else colType(f.col)

  override def readSchema(): StructType = StructType(
    (if (spec.groupBySlot) Seq(StructField("slot_ms", LongType, nullable = false))
     else Nil) ++
      spec.funcs.zipWithIndex.map { case (f, i) =>
        StructField(s"agg_$i", resultType(f), nullable = f.kind != "count")
      })

  override def toBatch: Batch = this
  override def description(): String = {
    val fs = spec.funcs
      .map(f => s"${f.kind}(${Option(f.col).getOrElse("*")})").mkString(", ")
    s"${table.name()} PushedAggregates [$fs]" +
      (if (spec.groupBySlot) " GroupBy [slot_ms]" else "") + s" slots [$i0, $i1)"
  }

  /** Populated slots in range with their per-measure partials. */
  private def populated: Iterator[(Int, Map[String, AllAggregate])] =
    (i0 until i1).iterator
      .map(i => (i, table.measures.map(c => c -> table.wheelFor(c).minuteSlot(i)).toMap))
      .filter(_._2(table.measures.head).rows > 0L)

  override def planInputPartitions(): Array[InputPartition] = {
    val input = populated.map { case (i, aggs) =>
      (if (spec.groupBySlot) Seq[Any](table.any.minuteSlotMs(i)) else Nil,
        (f: String) => table.fieldValue(f, i, aggs))
    }
    Array(WheelInputPartition(SlotAgg.aggregate(
      spec.groupBySlot, input, spec.funcs, c => colType(c) == LongType)))
  }

  override def createReaderFactory(): PartitionReaderFactory = WheelReaderFactory
}

final class WheelScan(table: WheelTable, required: StructType, i0: Int, i1: Int,
    topN: Option[TopNSpec] = None, limitN: Option[Int] = None,
    loPushed: Option[Long] = None, hiPushed: Option[Long] = None)
  extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    cachedStats

  /** Computed once per scan: a pushed LIMIT/TopN caps to the plain
    * row-count stats (the walk would overstate), otherwise the full
    * column-stat walk (round 17) feeds CBO min/max/NDV per column. */
  private lazy val cachedStats: org.apache.spark.sql.connector.read.Statistics = {
    if (limitN.isDefined || topN.isDefined) {
      var n = 0L
      var i = i0
      val head = table.wheelFor(table.measures.head)
      while (i < i1) { if (head.minuteSlot(i).rows > 0L) n += 1; i += 1 }
      val capped = Seq(Some(n), limitN.map(_.toLong),
        topN.map(_.limit.toLong)).flatten.min
      WheelStats.of(capped, readSchema())
    } else WheelStats.detailed(required, () => {
      val head = table.wheelFor(table.measures.head)
      (i0 until i1).iterator
        .filter(i => head.minuteSlot(i).rows > 0L)
        .map { i =>
          lazy val aggs: Map[String, AllAggregate] = table.measures
            .map(c => c -> table.wheelFor(c).minuteSlot(i)).toMap
          (f: String) => table.fieldValue(f, i, aggs)
        }
    })
  }

  /** Streaming read (round 14): slot DELTAS from the live registration
    * — see [[WheelStreamBase]]. Only source-mode tables stream. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    val src = table.liveSource.getOrElse(throw new UnsupportedOperationException(
      s"${table.name()}: only option(\"source\", …) tables stream — a dir " +
        "is an immutable snapshot"))
    new WheelMicroBatchStream(src, required.fieldNames, loPushed, hiPushed)
  }
  override def description(): String =
    s"${table.name()} slots [$i0, $i1) of ${table.any.minuteSlotCount}" +
      topN.map(t => s" PushedTopN [${t.keys.map(k =>
        k.col + (if (k.descending) " DESC" else " ASC")).mkString(", ")}] " +
        s"LIMIT ${t.limit}").getOrElse("") +
      limitN.map(l => s" PushedLimit $l").getOrElse("")

  /** Chunked plan: each partition ships its PRE-SLICED slot rows
    * (time-bounded — never scales with source volume); chunks wholly
    * outside the pushed range were already pruned by [i0, i1). A pushed
    * LIMIT stops the walk at k rows; a pushed TopN sorts the bounded
    * range driver-side and emits exactly the k rows in order (one
    * partition, so the order survives) — the Sort, its Exchange and the
    * Limit all vanish from the plan. */
  override def planInputPartitions(): Array[InputPartition] = {
    val fields = topN match {
      // materialize sort columns alongside, project them away after
      case Some(t) =>
        required.fields.map(_.name) ++
          t.keys.map(_.col).filterNot(required.fieldNames.contains)
      case None => required.fields.map(_.name)
    }
    def materialize(s: Int, e: Int, cap: Int): Array[Array[Any]] = {
      val rows = Array.newBuilder[Array[Any]]
      var n = 0
      var i = s
      while (i < e && n < cap) {
        val aggs = table.measures.map(c => table.wheelFor(c).minuteSlot(i))
        if (aggs.head.rows > 0L) {
          val byMeasure = table.measures.zip(aggs).toMap
          rows += fields.map(f => table.fieldValue(f, i, byMeasure))
          n += 1
        }
        i += 1
      }
      rows.result()
    }
    (topN, limitN) match {
      case (Some(t), _) =>
        val idx = fields.zipWithIndex.toMap
        val all = materialize(i0, i1, Int.MaxValue)
        java.util.Arrays.sort(all, TopNSpec.comparator(t.keys, idx))
        val keep = required.fields.map(f => idx(f.name))
        val top = all.take(t.limit).map(r => keep.map(i => r(i)))
        Array(WheelInputPartition(top))
      case (None, Some(l)) =>
        Array(WheelInputPartition(materialize(i0, i1, l)))
      case _ =>
        val chunk = 8192
        (i0 until i1 by chunk).map { s =>
          WheelInputPartition(materialize(s, math.min(i1, s + chunk), Int.MaxValue))
            : InputPartition
        }.toArray
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
