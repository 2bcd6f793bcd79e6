package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Streaming exact-dedup: first occurrence wins, duplicates drop across
  * micro-batches, distinct texts all pass. */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val T0 = 1704067200000L
  private def ts(offsetMs: Long) = new Timestamp(T0 + offsetMs)

  test("exact duplicates are dropped across micro-batches; firsts survive") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val q = StreamingDedup.dedup(
      mem.toDF().toDF("ts", "doc_id", "text"), "ts", "text")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_sink").start()
    try {
      mem.addData(Seq(
        (ts(0), 1L, "alpha beta"),
        (ts(1_000), 2L, "alpha beta"),   // same batch duplicate
        (ts(2_000), 3L, "gamma delta")))
      q.processAllAvailable()
      mem.addData(Seq(
        (ts(60_000), 4L, "alpha beta"),  // cross-batch duplicate (in watermark)
        (ts(61_000), 5L, "epsilon zeta")))
      q.processAllAvailable()
      val ids = spark.table("dedup_sink")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 3L, 5L), s"got $ids")
      // payload columns pass through untouched; helper column is dropped
      assert(spark.table("dedup_sink").columns.toSeq == Seq("ts", "doc_id", "text"))
    } finally q.stop()
  }
}
