package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared plumbing for the declared query inventory (SURVEY.md §2.6).
  *
  * Every query is `(SparkSession, sfDir) => DataFrame` and obeys the
  * determinism rules of SURVEY.md §5.3: total ORDER BY, ROUND around
  * floating aggregates, explicit casts, UTC, half-open time ranges
  * (the reference uses `>= start AND < end` everywhere —
  * /root/reference/src/main.rs:252–256).
  */
object Q {
  type Fn = (SparkSession, String) => DataFrame

  /** Load a TESTDATA table (TESTDATA.md: `{dir}/{name}.parquet`).
    *
    * `events.ts` has shipped in two physical spellings across driver
    * testdata generations, so the read adapts to the file's own schema:
    *
    *  - parquet TIMESTAMP(NANOS), which Spark 4 refuses outright
    *    ([PARQUET_TYPE_ILLEGAL]): read as a nanos long
    *    (`spark.sql.legacy.parquet.nanosAsLong`) and floor-truncate to
    *    a µs TimestampType column — the same ns→µs→ms truncation chain
    *    DuckDB's `epoch_ms` applies, so oracle predicates agree at
    *    boundaries;
    *  - parquet timestamp[µs] with no zone (Spark TIMESTAMP_NTZ): cast
    *    to TimestampType, value-identity under the UTC session zone
    *    every entry point pins (and the zone DuckDB's `epoch_ms` uses).
    *
    * Either way queries downstream see one canonical `ts`:
    * µs-precision TimestampType, UTC reading. */
  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    val path = s"$dir/$name.parquet"
    if (name == "events") {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = s.read.parquet(path)
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => df
      }
    } else s.read.parquet(path)
  }

  /** Fan a CPU-dense scan out to the session's full parallelism.
    *
    * Spark sizes file splits by BYTES (`maxPartitionBytes`, floored by
    * `openCostInBytes` and capped at parquet row-group granularity), which
    * starves CPU-bound stages over small-but-expensive tables: the
    * single-row-group documents/embeddings files plan as 1–2 splits, so
    * per-row regex/shingle/dot-product work runs on 2 of 32 cores
    * (measured: the LSH bucket stage alone dropped 21.5 s → 1.4 s at
    * sf1 under this fan-out). The repartition is GATED on the scan
    * actually under-splitting: at production scale the same table is
    * thousands of splits and this is a no-op — no shuffle is ever added
    * to a well-split scan. */
  def fanOut(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** The documents table, fanned out and persisted once per (session,
    * dir) — the same materialize-once discipline as the similarity
    * family's normalized-embeddings cache: ~30 queries run per-row CPU
    * (regex, shingling, hashing) over this table, and each reference
    * would otherwise re-scan and re-shuffle it. At production scale
    * this is the written, well-partitioned table the whole pipeline
    * reads; persist() is its single-process analogue. */
  def docs(s: SparkSession, dir: String): DataFrame = {
    docsCache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    graft.wheel.SessionSweeper.track(s)
    docsCache.computeIfAbsent((s, dir), _ => fanOut(t(s, dir, "documents")).persist())
  }
  private val docsCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  graft.wheel.SessionSweeper.addSweep(() =>
    docsCache.keySet.removeIf(k => k._1.sparkContext.isStopped))

  // Epoch-ms anchors into the events table's span [2024-01-01, 2024-01-31)
  // (FIXTURES.md). All minute-aligned, half-open.
  val Jan1: Long = 1704067200000L // 2024-01-01T00:00:00Z
  val Minute = 60000L
  val Hour = 3600000L
  val Day = 86400000L

  /** Flagship fixed range: [2024-01-05, 2024-01-12) (FIXTURES.md). */
  val R1Start: Long = Jan1 + 4 * Day
  val R1End: Long = Jan1 + 11 * Day

  /** Wheel-path range exercising minute+hour+day runs:
    * [2024-01-03T07:26, 2024-01-28T18:43). */
  val R2Start: Long = Jan1 + 2 * Day + 7 * Hour + 26 * Minute
  val R2End: Long = Jan1 + 27 * Day + 18 * Hour + 43 * Minute

  /** Auto-rewrite (optimizer-rule) demo range:
    * [2024-01-02T00:15, 2024-01-20T11:04). */
  val R3Start: Long = Jan1 + 1 * Day + 15 * Minute
  val R3End: Long = Jan1 + 19 * Day + 11 * Hour + 4 * Minute

  /** UNALIGNED range (sub-minute residue at both edges) for the
    * index + edge-scan fallback path: [R2Start+23s, R2End−41s). */
  val RuStart: Long = R2Start + 23000L
  val RuEnd: Long = R2End - 41000L

  /** SMALL range for the sketch wheels' exact regimes:
    * [2024-01-10T00:00, 2024-01-10T10:00) — ≤150 rows at the verify SF
    * (under the KLL k=200 exact buffer), non-empty at every SF. */
  val RqStart: Long = Jan1 + 9 * Day
  val RqEnd: Long = RqStart + 10 * Hour

  /** Sliding-series day: every minute of 2024-01-10. */
  val RsStart: Long = Jan1 + 9 * Day
  val RsEnd: Long = RsStart + Day

  /** SUB-MINUTE split instant inside the sliding day — the
    * per-aggregate condition boundary for the sliding conditional
    * hybrid (round 17): deliberately not minute-aligned. */
  val RsMid: Long = RsStart + 12 * Hour + 7123L

  /** Landmark-window anchor (lower bound only — "everything since
    * 2024-01-20"): the wheel answers [RlStart, horizon). */
  val RlStart: Long = Jan1 + 19 * Day

  /** lineitem shipdate range for the multi-measure wheel (TPC-H ship
    * dates span 1992–1998): [1994-01-01, 1996-07-01), day-aligned. */
  val LiMStart: Long = 757382400000L  // 1994-01-01T00:00:00Z
  val LiMEnd: Long = 836179200000L    // 1996-07-01T00:00:00Z

  /** UNALIGNED-to-month lineitem range for the calendar-grid fold —
    * both edge months are partial, so the rewrite must clip the first
    * and last slots: [1994-02-15, 1996-05-10), day-aligned. */
  val LiUStart: Long = 761270400000L  // 1994-02-15T00:00:00Z
  val LiUEnd: Long = 831686400000L    // 1996-05-10T00:00:00Z

  /** ZONE-WALKED fold fixture (round 14): events shifted +68 days land
    * the span on [2024-03-09, 2024-04-07), straddling the US
    * spring-forward (2024-03-10T07:00Z — the 23-hour New York day). */
  val TzShiftMs: Long = 68 * Day
  val TzStart: Long = Jan1 + TzShiftMs           // 2024-03-09T00:00:00Z
  val TzEnd: Long = TzStart + 14 * Day           // 2024-03-23T00:00:00Z
}
