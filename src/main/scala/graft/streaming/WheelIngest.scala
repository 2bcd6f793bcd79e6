package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.plans.WheelAcceleration
import graft.wheel.{RollupBuilder, WheelIndex}

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
  * Freshness never trades against correctness: the registration is
  * refreshed only AFTER the batch's files are committed and merged, and
  * the registry serves an index only while its recorded source
  * fingerprint matches the files on disk. A query planned in the window
  * between file commit and refresh sees a fingerprint mismatch and takes
  * the (correct) scan path; after the refresh it folds again. Readers
  * should create their DataFrame per query (`spark.read.parquet(path)`)
  * — the normal SQL-over-files pattern — so the scan fallback also sees
  * the newest files.
  *
  * Scale posture: the per-batch work added on top of the parquet write
  * is one map-side-combined aggregation of the BATCH (not the table) to
  * minute partials, a driver merge bounded by minutes-in-batch, and an
  * O(total slots) array rebuild — all independent of accumulated data
  * volume, the same time-bounded guarantee the batch index relies on.
  *
  * Restart/replay: on [[start]] the accumulator bootstraps from the
  * parquet already at `path` (one time-bounded aggregation of the
  * history), and a re-delivered micro-batch (same `batchId` after a
  * checkpoint recovery) is appended by the idempotent parquet sink
  * semantics but merged into the accumulator only once.
  */
object WheelIngest {

  def start(stream: DataFrame, path: String, checkpoint: String,
      tsCol: String = "ts", valueCol: String = "value"): StreamingQuery = {
    val spark = stream.sparkSession

    // one accumulator per ingest: minute slot -> (sum, cnt, min, max)
    val acc = new java.util.concurrent.ConcurrentHashMap[Long, (Double, Long, Double, Double)]()
    @volatile var lastMergedBatch = -1L

    def mergeRows(rows: Array[Row]): Unit = rows.foreach { r =>
      // minuteRollup shape: slot_ms, sum_v, cnt, min_v, max_v, rows
      require(r.getLong(2) == r.getLong(5),
        s"measure column '$valueCol' has NULLs in ingested batch (slot " +
          s"${r.getLong(0)}); the wheel index requires a never-null measure")
      val (slot, s, c, mn, mx) =
        (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      acc.merge(slot, (s, c, mn, mx), (a, b) =>
        (a._1 + b._1, a._2 + b._2, math.min(a._3, b._3), math.max(a._4, b._4)))
    }

    def refresh(): Unit = if (!acc.isEmpty) {
      val fi = Map("slot_ms" -> 0, s"sum_$valueCol" -> 1, s"cnt_$valueCol" -> 2,
        s"min_$valueCol" -> 3, s"max_$valueCol" -> 4, "rows" -> 5)
      val rows = acc.entrySet().iterator()
      val buf = Array.newBuilder[Row]
      while (rows.hasNext) {
        val e = rows.next()
        val (s, c, mn, mx) = e.getValue
        buf += Row(e.getKey.longValue(), s, c, mn, mx, c)
      }
      val wheels = WheelIndex.fromMultiPartials(
        buf.result(), fi, Seq(valueCol), Map.empty,
        // residue over the CURRENT files: re-read per call, so the
        // fallback always scans what is on disk now
        _ => Some((a, b) => WheelIndex.scanFallback(
          spark.read.parquet(path), tsCol, valueCol)(a, b)))
      WheelAcceleration.registerPrebuilt(spark, path, tsCol, wheels)
    }

    // bootstrap: fold any pre-existing table history into the
    // accumulator (one time-bounded aggregation), so a restarted ingest
    // serves the full span, not just post-restart batches
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(new org.apache.hadoop.fs.Path(path)) &&
        fs.listStatus(new org.apache.hadoop.fs.Path(path)).nonEmpty) {
      mergeRows(RollupBuilder.minuteRollup(
        RollupBuilder.normalizeTs(spark.read.parquet(path), tsCol), tsCol, valueCol)
        .select("slot_ms", "sum_v", "cnt", "min_v", "max_v", "rows").collect())
      refresh()
    }

    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(0L))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        try {
          // (1) durable first: the table is the source of truth
          batch.write.mode("append").parquet(path)
          // (2) fold the batch's partials (aggregation of the BATCH only)
          if (batchId > lastMergedBatch) {
            mergeRows(RollupBuilder.minuteRollup(
              RollupBuilder.normalizeTs(batch, tsCol), tsCol, valueCol)
              .select("slot_ms", "sum_v", "cnt", "min_v", "max_v", "rows").collect())
            lastMergedBatch = batchId
          }
          // (3) swap in the rebuilt index, fingerprinting the files as
          // committed — queries planned from here fold WITH this batch
          refresh()
        } finally batch.unpersist()
        ()
      }
      .start()
  }
}
