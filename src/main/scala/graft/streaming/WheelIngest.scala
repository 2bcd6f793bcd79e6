package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.plans.WheelAcceleration
import graft.wheel.{KeyedWheelIndex, PersistentWheel, RollupBuilder, SourceFingerprint, WheelIndex}

/** Live ingest + query — the µWheel deployment story (the reference's
  * wheel is fed by an ingestion loop and queried concurrently,
  * /root/reference/src/main.rs:105–144 feeds, 205–225 queries) expressed
  * as one Structured Streaming sink that does BOTH halves:
  *
  *  1. appends each micro-batch to `path` as parquet (the durable
  *     table any scan-path query reads), and
  *  2. folds the batch's minute partials into a driver-side accumulator
  *     and swaps a rebuilt [[WheelIndex]] into [[WheelAcceleration]]'s
  *     registry — so plain SQL over `path` keeps folding to plan-time
  *     constants that INCLUDE the just-ingested rows.
  *
  * N measures ride one ingest (round 8): the accumulator holds one
  * sum/cnt/min/max block per measure per minute slot, fed by the same
  * single batch aggregation ([[RollupBuilder.minuteRollupMulti]]) the
  * batch side uses — mixed-measure SQL statements fold from the live
  * registration exactly as they do from a [[WheelAcceleration
  * .registerMulti]] batch build.
  *
  * Freshness never trades against correctness: the registration is
  * refreshed only AFTER the batch's files are committed and merged, and
  * the registry serves an index only while its recorded source
  * fingerprint matches the files on disk. The recorded fingerprint is
  * built from the COVERED-file set — the files provably folded into the
  * accumulator (the bootstrap listing plus each batch's before/after
  * listing delta), NOT a fresh listing taken at registration time — so
  * a file appended by a foreign writer while the ingest runs fails the
  * freshness check and takes the (correct) scan path instead of being
  * silently claimed as indexed (ADVICE r9). Readers should create
  * their DataFrame per query (`spark.read.parquet(path)`) — the normal
  * SQL-over-files pattern — so the scan fallback also sees the newest
  * files.
  *
  * Scale posture: the per-batch work added on top of the parquet write
  * is one map-side-combined aggregation of the BATCH (not the table) to
  * minute partials, a driver merge bounded by minutes-in-batch, two
  * file listings (metadata ops), and an O(total slots × measures) array
  * rebuild — all independent of accumulated data volume, the same
  * time-bounded guarantee the batch index relies on.
  *
  * Restart/replay: on [[start]] the accumulator bootstraps from the
  * parquet already at `path`, and a re-delivered micro-batch (same
  * `batchId` after a checkpoint recovery) is appended by the parquet
  * sink but merged into the accumulator only once — its files are then
  * NOT in the covered set, so folds stop (scan path, correct) until the
  * next restart re-aggregates them.
  *
  * With `persistDir` set (round 9, VERDICT r8 #4), the bootstrap is no
  * longer a full-table aggregation: after every committed batch the
  * accumulator's partials — O(slots), time-bounded — are written
  * through [[graft.wheel.PersistentWheel.savePartials]] together with
  * the covered-file fingerprint. On restart, if that fingerprint names
  * a SUBSET of the files now on disk, the persisted partials are merged
  * as-is and only the uncovered TAIL files are aggregated — a 100 TB
  * table restarts by scanning megabytes, not the table. Any mismatch
  * (changed file, foreign dir, different schema) — and any FAILURE to
  * read the persisted partials (torn checkpoint) — falls back to the
  * full-history aggregation, so the fast path can never trade
  * correctness.
  */
object WheelIngest {

  /** What a [[start]] bootstrap did — exposed per table path for tests
    * and operability (`tailFiles` is what the bootstrap aggregated;
    * `coveredFiles` came from the persisted partials; the `keyed*`
    * fields mirror them for the keyed family's own sidecar). */
  final case class BootstrapReport(coveredFiles: Int, tailFiles: Seq[String],
      keyedCoveredFiles: Int = 0, keyedTailFiles: Seq[String] = Seq.empty)

  // keyed per table path (ADVICE r9: a shared single slot let two
  // concurrently started ingests clobber each other's reports); each
  // report is built complete and published once
  private val bootstraps =
    new java.util.concurrent.ConcurrentHashMap[String, BootstrapReport]()

  /** The most recent bootstrap report for `path`'s ingest. */
  def lastBootstrap(path: String): Option[BootstrapReport] =
    Option(bootstraps.get(path))

  /** Late-data accounting (round 10, VERDICT r9 #8): per-batch and
    * cumulative counts of rows arriving BELOW the lateness horizon —
    * `ts` in a minute slot older than `maxSeenSlot − latenessHorizonMs`
    * as of the batch's start. The wheel merges such rows correctly by
    * slot (late data is first-class, never dropped), but an operator
    * watching skew wants to SEE it: a climbing `lateRows` means
    * upstream is delivering history, and scan-path readers with their
    * own watermarking may be dropping what the wheel kept. Computed
    * from the batch's already-collected minute partials — no extra
    * job, no `observe` pass over the raw rows. */
  final case class IngestStats(batches: Long, rows: Long, lateRows: Long,
      lastBatchRows: Long, lastBatchLateRows: Long, watermarkMs: Option[Long])

  private val stats =
    new java.util.concurrent.ConcurrentHashMap[String, IngestStats]()

  /** The running late-data stats for `path`'s ingest (None before the
    * first committed batch, or when `latenessHorizonMs` is unset). */
  def ingestStats(path: String): Option[IngestStats] = Option(stats.get(path))

  /** Which SKETCH wheels the ingest should maintain live (round 11):
    * per listed column, the batch's per-minute sketches — Theta for
    * `distinctCols`, KLL for `quantileCols`, Misra-Gries for
    * `freqCols` — merge into an accumulator after every committed
    * batch, and the rebuilt wheels refresh
    * [[graft.plans.WheelAcceleration.registerPrebuiltSketches]], so
    * the approximate SQL spellings (`approx_count_distinct` /
    * `percentile_approx` / `approx_top_k`) fold mid-ingest exactly
    * like the sum-family shapes. Sketch accumulators bootstrap from
    * the table's full history on start (one slotSketches aggregation
    * per family; they do not checkpoint — a restart re-aggregates,
    * while the SUM family keeps its tail-only persisted bootstrap). */
  final case class SketchSpec(distinctCols: Seq[String] = Nil,
      quantileCols: Seq[String] = Nil, freqCols: Seq[String] = Nil,
      // keyed variants (late round 11): per listed column the ingest
      // additionally maintains PER-DIMENSION sketch wheels over the
      // start() keyCol (required when any keyed list is non-empty), so
      // the KEYED approximate spellings — approx aggregates under
      // `GROUP BY keyCol, time-bucket` — fold mid-ingest too
      keyedDistinctCols: Seq[String] = Nil,
      keyedQuantileCols: Seq[String] = Nil,
      keyedFreqCols: Seq[String] = Nil) {
    def isEmpty: Boolean =
      distinctCols.isEmpty && quantileCols.isEmpty && freqCols.isEmpty &&
        !hasKeyed
    private[streaming] def hasKeyed: Boolean =
      keyedDistinctCols.nonEmpty || keyedQuantileCols.nonEmpty ||
        keyedFreqCols.nonEmpty
  }

  /** Per-slot accumulator state: one (sum, cnt, min, max, central m2)
    * block per measure, plus the shared all-rows count. The second
    * moment combines with Chan's parallel update off the PRE-merge
    * sums/counts (round 11, ADVICE r10) — exact at any conditioning,
    * matching the batch build's [[graft.wheel.AllAggregate.combine]]. */
  private final case class Slot(sums: Array[Double], cnts: Array[Long],
      mins: Array[Double], maxs: Array[Double], m2s: Array[Double],
      rows: Long) {
    def merge(o: Slot): Slot = Slot(
      Array.tabulate(sums.length)(i => sums(i) + o.sums(i)),
      Array.tabulate(cnts.length)(i => cnts(i) + o.cnts(i)),
      Array.tabulate(mins.length)(i => math.min(mins(i), o.mins(i))),
      Array.tabulate(maxs.length)(i => math.max(maxs(i), o.maxs(i))),
      Array.tabulate(m2s.length) { i =>
        if (cnts(i) == 0L) o.m2s(i)
        else if (o.cnts(i) == 0L) m2s(i)
        else {
          val d = o.sums(i) / o.cnts(i) - sums(i) / cnts(i)
          m2s(i) + o.m2s(i) +
            d * d * (cnts(i).toDouble * o.cnts(i).toDouble /
              (cnts(i) + o.cnts(i)).toDouble)
        }
      },
      rows + o.rows)
  }

  /** `keyCol` (round 9) additionally maintains live KEYED wheels over
    * EVERY `valueCols` measure (N measures since round 10): each
    * batch's keyed minute partials — one keyedRollupMulti aggregation
    * shared by all measures — merge into a per-(key, slot) accumulator
    * and refresh the keyed registration, so `GROUP BY (key, time-slot)`
    * SQL over `path` folds live for any measure mix exactly like the
    * unkeyed shapes. State is |keys| × minutes × measures — the same
    * dimension-bounded contract as the batch keyed index, enforced by
    * its build guard. With `persistDir` set the keyed family
    * checkpoints through its own sidecar NESTED under the checkpoint
    * dir (`persistDir/keyed`, kind `keyedmulti`), stamped with the same
    * covered-file fingerprint, and restarts tail-only exactly like the
    * unkeyed family (full |keys| × minutes re-aggregation only when
    * coverage cannot be proven). */
  def start(stream: DataFrame, path: String, checkpoint: String,
      tsCol: String = "ts",
      valueCols: Seq[String] = Seq("value"),
      persistDir: Option[String] = None,
      keyCol: Option[String] = None,
      latenessHorizonMs: Option[Long] = None,
      sketches: SketchSpec = SketchSpec()): StreamingQuery = {
    require(valueCols.nonEmpty, "need at least one measure column")
    require(latenessHorizonMs.forall(_ > 0), "lateness horizon must be positive")
    require(!sketches.hasKeyed || keyCol.nonEmpty,
      "keyed sketch columns need a keyCol — the dimension the per-key " +
        "wheels are built over")
    val spark = stream.sparkSession
    val n = valueCols.size

    // late-data accounting state: the newest minute slot the
    // accumulator has seen (bootstrap included), advanced after every
    // merge — the reference point the lateness horizon hangs off
    @volatile var maxSeenSlotMs = Long.MinValue

    // one accumulator per ingest: minute slot -> per-measure blocks
    val acc = new java.util.concurrent.ConcurrentHashMap[Long, Slot]()
    @volatile var lastMergedBatch = -1L

    // the files PROVABLY folded into the accumulator, as fingerprint
    // tokens: initialized to the bootstrap listing (every file there is
    // aggregated — via persisted partials or the tail scan), extended
    // by each committed batch's listing delta. This set — not a fresh
    // listing — is what registrations and checkpoints are stamped with.
    val coveredTokens = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    def coveredFingerprint(): String =
      coveredTokens.toArray(new Array[String](0)).sorted.mkString("|")

    // minuteRollupMulti shape: slot_ms, (sum/cnt/min/max/m2)×measure, rows
    val partialCols =
      "slot_ms" +: valueCols.flatMap(c =>
        Seq(s"sum_$c", s"cnt_$c", s"min_$c", s"max_$c", s"m2_$c")) :+ "rows"
    val fi: String => Int = partialCols.zipWithIndex.toMap

    def mergeRows(rows: Array[Row]): Unit = rows.foreach { r =>
      // never-null-ts contract (round 11), same as the batch builds: a
      // null timestamp belongs to no slot, and the no-predicate
      // full-span fold relies on the live wheel covering every row
      require(!r.isNullAt(fi("slot_ms")),
        "ts column has NULLs in ingested batch; a time-bounded index " +
          "cannot cover null timestamps")
      val all = r.getLong(fi("rows"))
      // nullable measures (round 11): an all-null slot partial arrives
      // with null sum/min/max/m2 — encode the combine identities so
      // the merge and snapshot stay null-free (rows carries COUNT(*))
      val slot = Slot(
        Array.tabulate(n)(i => if (r.isNullAt(1 + 5 * i)) 0.0 else r.getDouble(1 + 5 * i)),
        Array.tabulate(n)(i => r.getLong(2 + 5 * i)),
        Array.tabulate(n)(i =>
          if (r.isNullAt(3 + 5 * i)) Double.PositiveInfinity else r.getDouble(3 + 5 * i)),
        Array.tabulate(n)(i =>
          if (r.isNullAt(4 + 5 * i)) Double.NegativeInfinity else r.getDouble(4 + 5 * i)),
        Array.tabulate(n)(i => if (r.isNullAt(5 + 5 * i)) 0.0 else r.getDouble(5 + 5 * i)),
        all)
      acc.merge(r.getLong(0), slot, (a, b) => a.merge(b))
      if (r.getLong(0) > maxSeenSlotMs) maxSeenSlotMs = r.getLong(0)
    }

    def snapshotRows(): Array[Row] = {
      val it = acc.entrySet().iterator()
      val buf = Array.newBuilder[Row]
      while (it.hasNext) {
        val e = it.next()
        val s = e.getValue
        val vals = Seq.tabulate(n)(i =>
          Seq[Any](s.sums(i), s.cnts(i), s.mins(i), s.maxs(i), s.m2s(i))).flatten
        buf += Row.fromSeq(e.getKey.longValue() +: vals :+ s.rows)
      }
      buf.result()
    }

    def refresh(): Unit = if (!acc.isEmpty) {
      val wheels = WheelIndex.fromMultiPartials(
        snapshotRows(), fi, valueCols, Map.empty,
        // residue over the CURRENT files: re-read per call, so the
        // fallback always scans what is on disk now
        c => Some((a, b) => WheelIndex.scanFallback(
          spark.read.parquet(path), tsCol, c)(a, b)))
      WheelAcceleration.registerPrebuilt(spark, path, tsCol, wheels,
        Some(coveredFingerprint()))
    }

    // live KEYED accumulator (N measures since round 10): (key, minute
    // slot) -> the same per-measure Slot blocks the unkeyed family uses
    val keyedAcc = new java.util.concurrent.ConcurrentHashMap[(Any, Long), Slot]()
    val keyType = keyCol.map(k => stream.schema(k).dataType)
    // keyedRollupMulti shape: key, slot_ms, blocks×measure, rows
    val keyedPartialCols: Seq[String] = keyCol.toSeq.flatMap(k =>
      k +: "slot_ms" +: valueCols.flatMap(c =>
        Seq(s"sum_$c", s"cnt_$c", s"min_$c", s"max_$c", s"m2_$c")) :+ "rows")
    val kfi: String => Int = keyedPartialCols.zipWithIndex.toMap
    def mergeKeyedRows(rows: Array[Row]): Unit = rows.foreach { r =>
      val all = r.getLong(kfi("rows"))
      // same nullable-measure identity encoding as the unkeyed merge
      val slot = Slot(
        Array.tabulate(n)(i => if (r.isNullAt(2 + 5 * i)) 0.0 else r.getDouble(2 + 5 * i)),
        Array.tabulate(n)(i => r.getLong(3 + 5 * i)),
        Array.tabulate(n)(i =>
          if (r.isNullAt(4 + 5 * i)) Double.PositiveInfinity else r.getDouble(4 + 5 * i)),
        Array.tabulate(n)(i =>
          if (r.isNullAt(5 + 5 * i)) Double.NegativeInfinity else r.getDouble(5 + 5 * i)),
        Array.tabulate(n)(i => if (r.isNullAt(6 + 5 * i)) 0.0 else r.getDouble(6 + 5 * i)),
        all)
      keyedAcc.merge((r.get(0), r.getLong(1)), slot, (a, b) => a.merge(b))
    }
    def keyedSnapshotRows(): Array[Row] = {
      val it = keyedAcc.entrySet().iterator()
      val buf = Array.newBuilder[Row]
      while (it.hasNext) {
        val e = it.next()
        val ((key, slotMs), s) = (e.getKey, e.getValue)
        val vals = Seq.tabulate(n)(i =>
          Seq[Any](s.sums(i), s.cnts(i), s.mins(i), s.maxs(i), s.m2s(i))).flatten
        buf += Row.fromSeq(key +: slotMs +: vals :+ s.rows)
      }
      buf.result()
    }
    def refreshKeyed(): Unit = keyCol.foreach { k =>
      if (!keyedAcc.isEmpty) {
        val wheels = KeyedWheelIndex.fromMultiPartialRows(
          keyedSnapshotRows(), kfi, k, keyType.get, valueCols)
        WheelAcceleration.registerPrebuiltKeyed(
          spark, path, k, tsCol, wheels, Some(coveredFingerprint()))
      }
    }
    def keyedPartials(src: DataFrame): Array[Row] =
      RollupBuilder.keyedRollupMulti(
        RollupBuilder.normalizeTs(src, tsCol), keyCol.get, tsCol, valueCols,
        graft.wheel.Tier.Minute)
        .select(keyedPartialCols.head, keyedPartialCols.tail: _*)
        .collect()

    // LIVE SKETCH accumulators (round 11): per (family, column) a
    // minute-slot -> serialized-sketch map, merged by each family's
    // associative mergeBytes — the same mergeable-partials contract the
    // batch builds rely on, fed by the batch-only slotSketches jobs
    import graft.wheel.{CohortWheel, FrequencyWheel, QuantileWheel}
    type SketchAcc = java.util.concurrent.ConcurrentHashMap[Long, Array[Byte]]
    val thetaAcc = sketches.distinctCols.map(c => c -> new SketchAcc()).toMap
    val kllAcc = sketches.quantileCols.map(c => c -> new SketchAcc()).toMap
    val mgAcc = sketches.freqCols.map(c => c -> new SketchAcc()).toMap
    def mergeSketchRows(accM: SketchAcc, rows: Array[Row],
        mergeF: (Array[Byte], Array[Byte]) => Array[Byte]): Unit =
      rows.foreach(r => accM.merge(r.getLong(0), r.getAs[Array[Byte]](1),
        (a, b) => mergeF(a, b)))
    // KEYED sketch accumulators (late round 11): (dim, slot) -> bytes,
    // fed by KeyedSketchWheels' batch-only (dim, slot) sketch jobs
    type KeyedSketchAcc =
      java.util.concurrent.ConcurrentHashMap[(Any, Long), Array[Byte]]
    val kThetaAcc = sketches.keyedDistinctCols.map(c => c -> new KeyedSketchAcc()).toMap
    val kKllAcc = sketches.keyedQuantileCols.map(c => c -> new KeyedSketchAcc()).toMap
    val kMgAcc = sketches.keyedFreqCols.map(c => c -> new KeyedSketchAcc()).toMap
    def mergeKeyedSketchRows(accM: KeyedSketchAcc, rows: Array[Row],
        mergeF: (Array[Byte], Array[Byte]) => Array[Byte]): Unit =
      rows.foreach(r => accM.merge((r.get(0), r.getLong(1)),
        r.getAs[Array[Byte]](2), (a, b) => mergeF(a, b)))
    /** Per-dim `(slot_ms, sk)` rows — each family's fromMinuteSketches
      * input, grouped from the flat (dim, slot) accumulator. */
    def keyedSketchSnapshot(accM: KeyedSketchAcc): Map[Any, Array[Row]] = {
      val buf = scala.collection.mutable.Map.empty[Any, scala.collection.mutable.ArrayBuffer[Row]]
      val it = accM.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        buf.getOrElseUpdate(e.getKey._1, scala.collection.mutable.ArrayBuffer.empty) +=
          Row(e.getKey._2, e.getValue)
      }
      buf.view.mapValues(_.toArray).toMap
    }
    def aggregateSketches(src: DataFrame): Unit = if (!sketches.isEmpty) {
      val norm = RollupBuilder.normalizeTs(src, tsCol)
      sketches.distinctCols.foreach(c => mergeSketchRows(thetaAcc(c),
        CohortWheel.slotSketches(norm, tsCol, c).collect(), CohortWheel.mergeBytes))
      sketches.quantileCols.foreach(c => mergeSketchRows(kllAcc(c),
        QuantileWheel.slotSketches(norm, tsCol, c).collect(), QuantileWheel.mergeBytes))
      sketches.freqCols.foreach(c => mergeSketchRows(mgAcc(c),
        FrequencyWheel.slotSketches(norm, tsCol, c).collect(), FrequencyWheel.mergeBytes))
      keyCol.filter(_ => sketches.hasKeyed).foreach { dim =>
        sketches.keyedDistinctCols.foreach(c => mergeKeyedSketchRows(kThetaAcc(c),
          graft.wheel.KeyedSketchWheels.cohortSlotSketches(src, dim, tsCol, c)
            .collect(), CohortWheel.mergeBytes))
        sketches.keyedQuantileCols.foreach(c => mergeKeyedSketchRows(kKllAcc(c),
          graft.wheel.KeyedSketchWheels.quantileSlotSketches(src, dim, tsCol, c)
            .collect(), QuantileWheel.mergeBytes))
        sketches.keyedFreqCols.foreach(c => mergeKeyedSketchRows(kMgAcc(c),
          graft.wheel.KeyedSketchWheels.frequencySlotSketches(src, dim, tsCol, c)
            .collect(), FrequencyWheel.mergeBytes))
      }
    }
    def sketchSnapshot(accM: SketchAcc): Array[Row] = {
      val it = accM.entrySet().iterator()
      val buf = Array.newBuilder[Row]
      while (it.hasNext) {
        val e = it.next()
        buf += Row(e.getKey.longValue(), e.getValue)
      }
      buf.result()
    }
    def refreshSketches(): Unit = if (!sketches.isEmpty) {
      val distinct = sketches.distinctCols.filterNot(c => thetaAcc(c).isEmpty)
        .map(c => c -> CohortWheel.fromMinuteSketches(
          sketchSnapshot(thetaAcc(c)), Map.empty)).toMap
      val quantile = sketches.quantileCols.filterNot(c => kllAcc(c).isEmpty)
        .map(c => c -> QuantileWheel.fromMinuteSketches(
          sketchSnapshot(kllAcc(c)), Map.empty)).toMap
      val freq = sketches.freqCols.filterNot(c => mgAcc(c).isEmpty)
        .map(c => c -> FrequencyWheel.fromMinuteSketches(
          sketchSnapshot(mgAcc(c)), Map.empty)).toMap
      if (distinct.nonEmpty || quantile.nonEmpty || freq.nonEmpty)
        WheelAcceleration.registerPrebuiltSketches(spark, path, tsCol,
          distinct, quantile, freq, Some(coveredFingerprint()))
      keyCol.filter(_ => sketches.hasKeyed).foreach { dim =>
        val kd = sketches.keyedDistinctCols.filterNot(c => kThetaAcc(c).isEmpty)
          .map(c => c -> keyedSketchSnapshot(kThetaAcc(c)).map { case (k, rows) =>
            k -> CohortWheel.fromMinuteSketches(rows, Map.empty) }).toMap
        val kq = sketches.keyedQuantileCols.filterNot(c => kKllAcc(c).isEmpty)
          .map(c => c -> keyedSketchSnapshot(kKllAcc(c)).map { case (k, rows) =>
            k -> QuantileWheel.fromMinuteSketches(rows, Map.empty) }).toMap
        val kf = sketches.keyedFreqCols.filterNot(c => kMgAcc(c).isEmpty)
          .map(c => c -> keyedSketchSnapshot(kMgAcc(c)).map { case (k, rows) =>
            k -> FrequencyWheel.fromMinuteSketches(rows, Map.empty) }).toMap
        if (kd.nonEmpty || kq.nonEmpty || kf.nonEmpty)
          WheelAcceleration.registerPrebuiltKeyedSketches(spark, path, dim,
            tsCol, kd, kq, kf, Some(coveredFingerprint()))
      }
    }

    val hadoopConf = spark.sessionState.newHadoopConf()

    // accumulator → PersistentWheel dir: O(slots) rows stamped with the
    // COVERED-file fingerprint (what the accumulator provably holds),
    // so the next start() can prove exactly which files these partials
    // cover — a foreign file appended mid-batch is never claimed
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    val partialSchema = StructType(
      StructField("slot_ms", LongType, nullable = false) +:
        valueCols.flatMap(c => Seq(
          StructField(s"sum_$c", DoubleType, nullable = false),
          StructField(s"cnt_$c", LongType, nullable = false),
          StructField(s"min_$c", DoubleType, nullable = false),
          StructField(s"max_$c", DoubleType, nullable = false),
          StructField(s"m2_$c", DoubleType, nullable = false))) :+
        StructField("rows", LongType, nullable = false))
    def persistAccumulator(): Unit = persistDir.foreach { d =>
      val fp = coveredFingerprint()
      if (!acc.isEmpty) {
        val df = spark.createDataFrame(
          java.util.Arrays.asList(snapshotRows(): _*), partialSchema)
        PersistentWheel.savePartials(spark, d, df, tsCol, valueCols, fp, path)
      }
      // keyed family: its own index dir NESTED under the checkpoint
      // (single-family sidecar contract), same fingerprint stamp; the
      // payload is the N-measure keyedRollupMulti shape under its own
      // sidecar kind (keyedmulti)
      keyCol.foreach { k =>
        if (!keyedAcc.isEmpty) {
          val keyedSchema = StructType(
            StructField(k, keyType.get, nullable = true) +:
              StructField("slot_ms", LongType, nullable = false) +:
              valueCols.flatMap(c => Seq(
                StructField(s"sum_$c", DoubleType, nullable = false),
                StructField(s"cnt_$c", LongType, nullable = false),
                StructField(s"min_$c", DoubleType, nullable = false),
                StructField(s"max_$c", DoubleType, nullable = false),
                StructField(s"m2_$c", DoubleType, nullable = false))) :+
              StructField("rows", LongType, nullable = false))
          val df = spark.createDataFrame(
            java.util.Arrays.asList(keyedSnapshotRows(): _*), keyedSchema)
          PersistentWheel.savePartialsKeyedMulti(spark, s"$d/keyed", df, tsCol,
            k, valueCols, fp, path)
        }
      }
    }

    // Listing of the table's data files as (fingerprint token, full
    // path) — the same token dialect SourceFingerprint speaks, so the
    // coverage diff and the registry's wholesale check agree (shared
    // with the persisted tail refresh since late round 10).
    def listTokens(): Seq[(String, String)] =
      SourceFingerprint.listTokens(path, hadoopConf)
    def tokenRel(tok: String): String = SourceFingerprint.tokenRel(tok)

    // Bootstrap: fold the pre-existing table history into the
    // accumulator so a restarted ingest serves the full span, not just
    // post-restart batches. With a persisted checkpoint whose recorded
    // fingerprint names a SUBSET of the files now on disk, merge the
    // persisted partials directly and aggregate ONLY the uncovered tail
    // files; otherwise — including a checkpoint that proves coverage
    // but fails to READ (torn slots parquet) — aggregate the whole
    // table once. The fast path can never trade correctness.
    val current = listTokens()
    val currentTokens = current.map(_._1).toSet
    // every bootstrap file ends up folded (persisted-covered or tail
    // scan, or the full aggregation) — all of them are covered
    currentTokens.foreach(coveredTokens.add)
    if (current.nonEmpty) {
      var report = BootstrapReport(0, Seq.empty)
      def aggregate(src: DataFrame): Unit =
        mergeRows(RollupBuilder.minuteRollupMulti(
          RollupBuilder.normalizeTs(src, tsCol), tsCol, valueCols)
          .select(partialCols.head, partialCols.tail: _*).collect())
      val covered: Set[String] = persistDir
        .flatMap(d => PersistentWheel.peek(spark, d))
        .filter(m => m.kind == PersistentWheel.SumKind &&
          m.tsCol == tsCol && m.valueCols == valueCols)
        .map(_.sourceFingerprint.split('|').toSet.filter(t =>
          SourceFingerprint.isDataToken(tokenRel(t))))
        .getOrElse(Set.empty)
      // torn checkpoints throw from loadPartials — collect inside the
      // Try so a failure leaves the accumulator untouched for the
      // full-aggregation fallback
      val persistedRows: Option[Array[Row]] =
        if (covered.nonEmpty && covered.subsetOf(currentTokens))
          scala.util.Try(
            PersistentWheel.loadPartials(spark, persistDir.get)._2
              .select(partialCols.head, partialCols.tail: _*).collect()).toOption
        else None
      persistedRows match {
        case Some(rows) =>
          mergeRows(rows)
          val tail = current.collect { case (tok, p) if !covered(tok) => p }
          if (tail.nonEmpty) aggregate(spark.read.parquet(tail: _*))
          report = BootstrapReport(covered.size, tail)
        case None =>
          aggregate(spark.read.parquet(path))
          report = BootstrapReport(0, current.map(_._2))
      }
      // keyed family: same coverage diff against ITS sidecar (nested
      // under the checkpoint dir) — tail-only when provably covered
      // AND readable, full |keys| × minutes aggregation otherwise
      keyCol.foreach { k =>
        val keyedDir = persistDir.map(d => s"$d/keyed")
        val kCovered: Set[String] = keyedDir
          .flatMap(d => PersistentWheel.peek(spark, d))
          .filter(m => m.kind == PersistentWheel.KeyedMultiKind &&
            m.tsCol == tsCol && m.valueCols == k +: valueCols)
          .map(_.sourceFingerprint.split('|').toSet.filter(t =>
            SourceFingerprint.isDataToken(tokenRel(t))))
          .getOrElse(Set.empty)
        val kPersisted: Option[Array[Row]] =
          if (kCovered.nonEmpty && kCovered.subsetOf(currentTokens))
            scala.util.Try(
              PersistentWheel.loadPartialsKeyedMulti(spark, keyedDir.get)._2
                .select(keyedPartialCols.head, keyedPartialCols.tail: _*)
                .collect()).toOption
          else None
        kPersisted match {
          case Some(rows) =>
            mergeKeyedRows(rows)
            val tail = current.collect { case (tok, p) if !kCovered(tok) => p }
            if (tail.nonEmpty)
              mergeKeyedRows(keyedPartials(spark.read.parquet(tail: _*)))
            report = report.copy(
              keyedCoveredFiles = kCovered.size, keyedTailFiles = tail)
          case None =>
            mergeKeyedRows(keyedPartials(spark.read.parquet(path)))
            report = report.copy(
              keyedCoveredFiles = 0, keyedTailFiles = current.map(_._2))
        }
      }
      // sketch families bootstrap from the full history (one
      // slotSketches aggregation per family — no persisted checkpoint;
      // the sum family's tail-only bootstrap is the fast path)
      aggregateSketches(spark.read.parquet(path))
      bootstraps.put(path, report)
      refresh()
      refreshKeyed()
      refreshSketches()
      persistAccumulator()
    } else bootstraps.put(path, BootstrapReport(0, Seq.empty))

    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        try {
          // listing delta around the append attributes the files this
          // batch's write created — those, and only those, join the
          // covered set once the batch is merged below
          val before = listTokens().map(_._1).toSet
          // (1) durable first: the table is the source of truth
          batch.write.mode("append").parquet(path)
          val delta = listTokens().map(_._1).toSet -- before
          // (2) fold the batch's partials (aggregation of the BATCH only)
          if (batchId > lastMergedBatch) {
            val partials = RollupBuilder.minuteRollupMulti(
              RollupBuilder.normalizeTs(batch, tsCol), tsCol, valueCols)
              .select(partialCols.head, partialCols.tail: _*).collect()
            // late-data accounting BEFORE the merge advances the max
            // slot: rows below (maxSeenSlot − horizon) as of batch start
            latenessHorizonMs.foreach { h =>
              val wm = if (maxSeenSlotMs == Long.MinValue) None
                else Some(maxSeenSlotMs - h)
              val batchRows = partials.iterator.map(_.getLong(fi("rows"))).sum
              val late = wm.map(w => partials.iterator
                .filter(_.getLong(0) < w).map(_.getLong(fi("rows"))).sum)
                .getOrElse(0L)
              stats.compute(path, (_, old) =>
                if (old == null) IngestStats(1L, batchRows, late, batchRows, late, wm)
                else IngestStats(old.batches + 1, old.rows + batchRows,
                  old.lateRows + late, batchRows, late, wm))
            }
            mergeRows(partials)
            keyCol.foreach(_ => mergeKeyedRows(keyedPartials(batch)))
            aggregateSketches(batch)
            lastMergedBatch = batchId
            delta.foreach(coveredTokens.add)
          }
          // (3) swap in the rebuilt index, stamped with the covered
          // set — queries planned from here fold WITH this batch
          refresh()
          refreshKeyed()
          refreshSketches()
          // (4) checkpoint the partials (O(slots), time-bounded): the
          // next restart bootstraps from here instead of re-scanning
          persistAccumulator()
        } finally batch.unpersist()
        ()
      }
      .start()
  }
}
