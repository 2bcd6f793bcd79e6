package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.wheel.Retention

/** The live streaming-fed wheel (µWheel's insert→advance→query loop,
  * /root/reference/src/main.rs:105–144, as Structured Streaming):
  * in-flight queryability, batch parity, late-row drop, and bounded
  * sliding-window retention. */
class StreamingWheelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val T0 = 1704067200000L // 2024-01-01T00:00:00Z
  private def ts(offsetMs: Long) = new Timestamp(T0 + offsetMs)
  private val Min = 60000L

  test("live wheel answers range queries while the stream runs; parity with arrival") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val (q, live) = StreamingWheel.start(
      mem.toDF().toDF("ts", "value"), "ts", "value")
    try {
      mem.addData(Seq((ts(0), 1.5), (ts(10_000), 2.5), (ts(Min), 4.0)))
      q.processAllAvailable()
      assert(live.querySum(T0, T0 + Min) == 4.0)       // minute 0
      assert(live.querySum(T0, T0 + 2 * Min) == 8.0)   // minutes 0–1
      assert(live.query(T0, T0 + 2 * Min).count == 3L)

      // a second batch UPDATES minute 1 and adds minute 2: the live view
      // must reflect the re-aggregated totals, not appended duplicates
      mem.addData(Seq((ts(Min + 5_000), 6.0), (ts(2 * Min), 10.0)))
      q.processAllAvailable()
      assert(live.querySum(T0 + Min, T0 + 2 * Min) == 10.0) // 4 + 6
      assert(live.querySum(T0, T0 + 3 * Min) == 24.0)
      val all = live.query(T0, T0 + 3 * Min)
      assert(all.count == 5L && all.min == 1.5 && all.max == 10.0)
      // the live slots carry the second moment too (round 10): the
      // streamed variance equals a direct computation over the values
      val vals = Seq(1.5, 2.5, 4.0, 6.0, 10.0)
      val mean = vals.sum / vals.size
      val expectVar = vals.map(v => (v - mean) * (v - mean)).sum / vals.size
      assert(math.abs(all.varPop - expectVar) < 1e-9, all.toString)

      // introspection parity with the batch family (round 7): watermark,
      // retained-slot occupancy, footprint, and the expanded combine plan
      val ex = live.explain(T0, T0 + 3 * Min)
      assert(ex.startsWith("LiveWheel(All) watermark=2024-01-01T00:02:00Z"), ex)
      assert(ex.contains("3 slots retained") && ex.contains("sizeBytes=168"), ex)
      assert(ex.contains("3 minute probes"), ex)
    } finally q.stop()
  }

  test("keyed live wheel tracks per-key slots independently") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, Double)]
    val (w, live) = StreamingWheel.keyedWriter(
      mem.toDF().toDF("k", "ts", "value"), "k", "ts", "value")
    val q = w.start()
    try {
      mem.addData(Seq(("click", ts(0), 1.0), ("view", ts(0), 10.0),
        ("click", ts(Min), 2.0)))
      q.processAllAvailable()
      assert(live.keys == Set("click", "view"))
      assert(live.query("click", T0, T0 + 2 * Min).sum == 3.0)
      assert(live.query("view", T0, T0 + 2 * Min).sum == 10.0)
      assert(live.query("purchase", T0, T0 + 2 * Min).count == 0L)
      // an update batch re-aggregates, never double-counts
      mem.addData(Seq(("view", ts(10_000), 5.0)))
      q.processAllAvailable()
      assert(live.query("view", T0, T0 + Min).sum == 15.0)
      assert(live.query("view", T0, T0 + Min).count == 2L)
      // live TopN (the uwheel TopN aggregator on the streaming path):
      // ranked by range sum, deterministic tie-break by key
      assert(live.topN(T0, T0 + 2 * Min, 2) ==
        Seq("view" -> 15.0, "click" -> 3.0))
      assert(live.topN(T0 + Min, T0 + 2 * Min, 5) == Seq("click" -> 2.0))
      // introspection parity (round 7)
      val ex = live.explain(T0, T0 + 2 * Min)
      assert(ex.startsWith("KeyedLiveWheel(keys=2)"), ex)
      assert(ex.contains("sizeBytes=") && live.sizeBytes > 0L, ex)
      assert(ex.contains("2 minute probes"), ex)
    } finally q.stop()
  }

  test("live distinct wheel estimates per-range cardinality while streaming") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val (w, live) = StreamingWheel.distinctWriter(
      mem.toDF().toDF("ts", "user_id"), "ts", "user_id")
    val q = w.start()
    try {
      mem.addData(Seq((ts(0), 1L), (ts(1000), 2L), (ts(2000), 1L), (ts(Min), 3L)))
      q.processAllAvailable()
      assert(math.round(live.queryDistinct(T0, T0 + Min)) == 2L)      // users {1,2}
      assert(math.round(live.queryDistinct(T0, T0 + 2 * Min)) == 3L)  // {1,2,3}
      // re-aggregation on update, cross-slot union dedupes user 1
      mem.addData(Seq((ts(Min + 500), 1L)))
      q.processAllAvailable()
      assert(math.round(live.queryDistinct(T0 + Min, T0 + 2 * Min)) == 2L) // {3,1}
      assert(math.round(live.queryDistinct(T0, T0 + 2 * Min)) == 3L)       // still {1,2,3}
      // introspection parity (round 7): the sketch footprint is the
      // EXACT serialized byte total, not an estimate
      val ex = live.explain(T0, T0 + 2 * Min)
      assert(ex.startsWith("LiveDistinctWheel(HLL) watermark="), ex)
      assert(ex.contains("2 slots retained") && live.sizeBytes > 0L, ex)
    } finally q.stop()
  }

  test("late rows below the watermark never reach the live wheel") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val (q, live) = StreamingWheel.start(
      mem.toDF().toDF("ts", "value"), "ts", "value", "0 seconds")
    try {
      mem.addData(Seq((ts(3_600_000), 5.0))) // advance watermark to T0+1h
      q.processAllAvailable()
      mem.addData(Seq((ts(0), 99.0)))        // an hour late → dropped
      q.processAllAvailable()
      assert(live.querySum(T0, T0 + Min) == 0.0, "late row leaked into the index")
      assert(live.querySum(T0 + 3_600_000L, T0 + 3_600_000L + Min) == 5.0)
    } finally q.stop()
  }

  test("live quantile wheel: cross-batch accumulation, rank parity, retention") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val (w, live) = StreamingWheel.quantileWriter(
      mem.toDF().toDF("ts", "value"), "ts", "value", Retention.KeepN(100))
    val q = w.start()
    try {
      // 200 values across two minutes, split over two micro-batches so
      // slot 0 accumulates across batches (merge, not replace)
      val batch1 = (0 until 100).map(i => (ts(i % 2 * Min), i.toDouble))
      val batch2 = (100 until 200).map(i => (ts(i % 2 * Min), i.toDouble))
      mem.addData(batch1)
      q.processAllAvailable()
      mem.addData(batch2)
      q.processAllAvailable()
      // n=200 < k=200 ⇒ the sketch is exact: check true order statistics
      val both = live.queryQuantiles(T0, T0 + 2 * Min, Seq(0.5, 1.0))
      assert(both(1) == 199.0, s"max ${both(1)}")
      assert(math.abs(both(0) - 99.0) <= 1.0, s"p50 ${both(0)}")
      // single-slot query sees only that minute's (even) values
      val evens = live.queryQuantile(T0, T0 + Min, 1.0)
      assert(evens == 198.0, s"slot-0 max $evens")
      // empty range → NaN
      assert(live.queryQuantile(T0 + 10 * Min, T0 + 11 * Min, 0.5).isNaN)
      assert(live.retainedSlots == 2)
    } finally q.stop()
  }

  test("live frequency wheel: cross-batch accumulation, exact-regime topK") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val (w, live) = StreamingWheel.frequencyWriter(
      mem.toDF().toDF("ts", "user_id"), "ts", "user_id", Retention.KeepN(100))
    val q = w.start()
    try {
      // user 7 is hot in minute 0 across two micro-batches (merge, not
      // replace); user 9 only in minute 1
      mem.addData(Seq((ts(0), 7L), (ts(0), 7L), (ts(0), 5L), (ts(Min), 9L)))
      q.processAllAvailable()
      mem.addData(Seq((ts(0), 7L), (ts(Min), 9L), (ts(Min), 7L)))
      q.processAllAvailable()
      assert(live.estimate(7L, T0, T0 + Min) == 3L)
      assert(live.estimate(7L, T0, T0 + 2 * Min) == 4L)
      assert(live.topK(T0, T0 + 2 * Min, 2) == Seq(7L -> 4L, 9L -> 2L))
      // single-slot query sees only that minute
      assert(live.topK(T0 + Min, T0 + 2 * Min, 3) == Seq(9L -> 2L, 7L -> 1L))
      assert(live.topK(T0 + 10 * Min, T0 + 11 * Min, 3).isEmpty)
      assert(live.retainedSlots == 2)
    } finally q.stop()
  }

  test("live cohort wheel: cross-batch union, live retention between windows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val (w, live) = StreamingWheel.cohortWriter(
      mem.toDF().toDF("ts", "user_id"), "ts", "user_id")
    val q = w.start()
    try {
      // window A (minute 0): users 1,2,3; window B (minute 1): 2,3,4 —
      // across two micro-batches so slot sketches accumulate by union
      mem.addData(Seq((ts(0), 1L), (ts(0), 2L), (ts(Min), 2L)))
      q.processAllAvailable()
      mem.addData(Seq((ts(0), 3L), (ts(Min), 3L), (ts(Min), 4L)))
      q.processAllAvailable()
      assert(live.distinct(T0, T0 + Min).round == 3L)
      assert(live.distinct(T0 + Min, T0 + 2 * Min).round == 3L)
      // retention: users 2 and 3 appear in both windows
      assert(live.intersectCount(
        (T0, T0 + Min), (T0 + Min, T0 + 2 * Min)).round == 2L)
      assert(live.retainedSlots == 2)
    } finally q.stop()
  }

  test("KeepN retention keeps the live state a bounded sliding window") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val (q, live) = StreamingWheel.start(
      mem.toDF().toDF("ts", "value"), "ts", "value", "0 seconds",
      Retention.KeepN(10)) // keep only the last 10 minutes
    try {
      mem.addData((0 until 30).map(i => (ts(i * Min), 1.0)))
      q.processAllAvailable()
      assert(live.retainedSlots <= 11, s"evicted slots linger: ${live.retainedSlots}")
      // recent window answers; evicted span reads as absent
      assert(live.querySum(T0 + 25 * Min, T0 + 30 * Min) == 5.0)
      assert(live.querySum(T0, T0 + 5 * Min) == 0.0)
    } finally q.stop()
  }
}
