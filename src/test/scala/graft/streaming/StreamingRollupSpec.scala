package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.wheel.RollupBuilder

/** Streaming-vs-batch rollup parity and the late-data drop policy
  * (SURVEY.md §2.5 / §7.6 M5; internal only — the driver oracle is
  * batch-only). */
class StreamingRollupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val T0 = 1704067200000L // 2024-01-01T00:00:00Z

  private def ts(offsetMs: Long) = new Timestamp(T0 + offsetMs)

  test("streaming minute rollup equals batch rollup on the same data") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val streamDf = mem.toDF().toDF("ts", "value")
    val q = StreamingRollup.minuteRollup(streamDf, "ts", "value")
      .writeStream.outputMode("complete")
      .format("memory").queryName("rollup_parity_sink").start()
    try {
      val data = Seq(
        (ts(0), 1.5), (ts(10_000), 2.5),           // minute 0
        (ts(61_000), 4.0),                         // minute 1
        (ts(3_600_000), 8.0), (ts(3_661_000), 1.0) // hour 1
      )
      mem.addData(data)
      q.processAllAvailable()
      val streamed = spark.table("rollup_parity_sink")
        .orderBy("slot_ms").collect().map(_.toString).toSeq
      val batch = RollupBuilder
        .minuteRollup(data.toDF("ts", "value"), "ts", "value")
        .orderBy("slot_ms").collect().map(_.toString).toSeq
      assert(streamed == batch)
      assert(streamed.size == 4)
    } finally q.stop()
  }

  test("sliding windows overlap: one event lands in size/slide windows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val q = StreamingRollup
      .slidingRollup(mem.toDF().toDF("ts", "value"), "ts", "value",
        "2 minutes", "1 minute")
      .writeStream.outputMode("complete")
      .format("memory").queryName("rollup_sliding_sink").start()
    try {
      mem.addData(Seq((ts(90_000), 5.0))) // minute 1.5 → windows [0,2) and [1,3)
      q.processAllAvailable()
      val rows = spark.table("rollup_sliding_sink")
        .orderBy("slot_ms").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
      assert(rows == Seq((T0, 5.0, 1L), (T0 + 60_000L, 5.0, 1L)))
    } finally q.stop()
  }

  test("sliding rollup equals the batch sliding window, out-of-order row in both overlaps") {
    // VERDICT r6 #5: session + tumbling streaming parity existed;
    // sliding was the untested half of SURVEY §2.5's window(ts, size,
    // slide) row. Full parity vs the batch groupBy(window(size, slide))
    // over the same multiset, with an out-of-order row (arriving after
    // a later-stamped one, within the watermark delay) that must land
    // in BOTH overlapping windows.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val q = StreamingRollup
      .slidingRollup(mem.toDF().toDF("ts", "value"), "ts", "value",
        "2 minutes", "1 minute")
      .writeStream.outputMode("complete")
      .format("memory").queryName("rollup_sliding_parity_sink").start()
    try {
      val batches = Seq(
        Seq((ts(5 * 60_000), 1.0)),                // later-stamped row first
        Seq((ts(90_000), 5.0), (ts(30_000), 2.0)), // out of order, within delay
        Seq((ts(2 * 60_000 + 10_000), 3.0)))
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      def norm(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
      val streamed = norm(spark.table("rollup_sliding_parity_sink")
        .orderBy("slot_ms").collect())
      val batch = norm(batches.flatten.toDF("ts", "value")
        .groupBy(window(col("ts"), "2 minutes", "1 minute").as("w"))
        .agg(sum(col("value")).as("sum_v"), count(col("value")).as("cnt"))
        .select(unix_millis(col("w.start")).as("slot_ms"), col("sum_v"), col("cnt"))
        .orderBy("slot_ms").collect())
      assert(streamed == batch)
      // the out-of-order 90 s row sits in [0, 2) AND [1, 3)
      val bySlot = streamed.map(x => (x._1, (x._2, x._3))).toMap
      assert(bySlot(T0) == ((7.0, 2L)), s"window [0,2): $streamed")         // 2.0 + 5.0
      assert(bySlot(T0 + 60_000L) == ((8.0, 2L)), s"window [1,3): $streamed") // 5.0 + 3.0
    } finally q.stop()
  }

  test("session windows close after the inactivity gap, per key") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val q = StreamingRollup
      .sessionRollup(mem.toDF().toDF("ts", "user_id", "value"),
        "ts", "user_id", "value", "5 minutes")
      .writeStream.outputMode("complete")
      .format("memory").queryName("rollup_session_sink").start()
    try {
      mem.addData(Seq(
        (ts(0), 1L, 1.0), (ts(60_000), 1L, 2.0),   // user 1, one session
        (ts(3_600_000), 1L, 4.0),                  // user 1, > gap later → new session
        (ts(30_000), 2L, 8.0)))                    // user 2
      q.processAllAvailable()
      val rows = spark.table("rollup_session_sink")
        .orderBy("user_id", "session_start_ms").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getLong(4))).toSeq
      assert(rows == Seq(
        (1L, T0, 3.0, 2L),
        (1L, T0 + 3_600_000L, 4.0, 1L),
        (2L, T0 + 30_000L, 8.0, 1L)))
    } finally q.stop()
  }

  test("out-of-order ingest converges to the batch rollup (write-ahead parity)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // The reference stages future-dated inserts in a write-ahead buffer
    // and applies them as the clock advances (src/main.rs:102, 128–140);
    // the streaming analogue: rows arriving in ANY order within the
    // watermark delay land in their correct slots, so the final state
    // equals the batch rollup over the same multiset of rows.
    val mem = MemoryStream[(Timestamp, Double)]
    val q = StreamingRollup.minuteRollup(mem.toDF().toDF("ts", "value"), "ts", "value")
      .writeStream.outputMode("complete")
      .format("memory").queryName("rollup_ooo_sink").start()
    try {
      val batches = Seq(
        Seq((ts(10 * 60_000), 7.0)),               // future-dated first
        Seq((ts(2 * 60_000), 1.0), (ts(60_000), 2.0)), // then earlier, out of order
        Seq((ts(3 * 60_000), 4.0), (ts(10 * 60_000 + 30_000), 3.0)))
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      val streamed = spark.table("rollup_ooo_sink")
        .orderBy("slot_ms").collect().map(_.toString).toSeq
      val batch = RollupBuilder
        .minuteRollup(batches.flatten.toDF("ts", "value"), "ts", "value")
        .orderBy("slot_ms").collect().map(_.toString).toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("future-dated rows stage until the watermark reaches them (append mode)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val q = StreamingRollup.minuteRollup(mem.toDF().toDF("ts", "value"), "ts", "value")
      .writeStream.outputMode("append")
      .format("memory").queryName("rollup_stage_sink").start()
    try {
      mem.addData(Seq((ts(10 * 60_000), 7.0))) // ahead of the watermark
      q.processAllAvailable()
      assert(spark.table("rollup_stage_sink").isEmpty,
        "future-dated slot emitted before the watermark reached it")
      mem.addData(Seq((ts(25 * 60_000), 1.0))) // advances watermark to min 15
      q.processAllAvailable()
      val emitted = spark.table("rollup_stage_sink")
        .select("slot_ms", "sum_v").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(emitted == Seq((T0 + 10 * 60_000L, 7.0)),
        s"staged slot should emit exactly once finalized: $emitted")
    } finally q.stop()
  }

  test("rows below the watermark are dropped (µWheel late-data policy)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val streamDf = mem.toDF().toDF("ts", "value")
    val q = StreamingRollup.minuteRollup(streamDf, "ts", "value", "0 seconds")
      .writeStream.outputMode("update")
      .format("memory").queryName("rollup_late_sink").start()
    try {
      mem.addData(Seq((ts(3_600_000), 5.0))) // watermark advances to T0+1h
      q.processAllAvailable()
      mem.addData(Seq((ts(0), 99.0)))        // one hour late → dropped
      q.processAllAvailable()
      val slots = spark.table("rollup_late_sink")
        .select("slot_ms").collect().map(_.getLong(0)).toSet
      assert(slots == Set(T0 + 3_600_000L), s"late row leaked: $slots")
    } finally q.stop()
  }
}
