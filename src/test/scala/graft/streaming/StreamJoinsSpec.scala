package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class StreamJoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val T0 = 1704067200000L
  private def ts(offsetMs: Long) = new Timestamp(T0 + offsetMs)

  test("stream-static enrichment joins every arriving row against the dim") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = StreamJoins.enrichWithStatic(
      mem.toDF().toDF("user_id", "value"), dim, "user_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("enrich_sink").start()
    try {
      mem.addData(Seq((1L, 10.0), (2L, 20.0), (3L, 30.0))) // 3 has no dim row
      q.processAllAvailable()
      val rows = spark.table("enrich_sink")
        .orderBy("user_id").collect()
        .map(r => (r.getLong(0), r.getString(2))).toSeq
      assert(rows == Seq((1L, "gold"), (2L, "basic")))
    } finally q.stop()
  }

  test("stream-stream interval join pairs events within the window only") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp, Double)]
    val q = StreamJoins.intervalJoin(
      clicks.toDF().toDF("user_id", "click_ts"),
      buys.toDF().toDF("user_id", "buy_ts", "amount"),
      key = "user_id", leftTs = "click_ts", rightTs = "buy_ts",
      withinMs = 3600_000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("interval_sink").start()
    try {
      clicks.addData(Seq((1L, ts(0)), (2L, ts(0))))
      buys.addData(Seq(
        (1L, ts(30 * 60_000), 9.99),   // within the hour → joins
        (2L, ts(2 * 3600_000), 5.0)))  // two hours later → no join
      q.processAllAvailable()
      val rows = spark.table("interval_sink").collect()
        .map(r => (r.getLong(0), r.getDouble(4))).toSeq
      assert(rows == Seq((1L, 9.99)), s"got $rows")
    } finally q.stop()
  }
}
