package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Sessionization semantics on synthetic data — the sf fixtures can't
  * exercise timestamp ties or exact gap boundaries deliberately. */
class WindowsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q_sessionize splits exactly at the gap and keeps ties together") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.{Row, types => T}
    val T0 = 1704067200000L
    val gap = 6L * 3600000L
    // Q.t rebuilds the events ts from an epoch-NANOS long (the fixture
    // tables' physical type), so the synthetic table matches that shape
    def ns(ms: Long) = ms * 1000000L
    val rows = Seq(
      Row(ns(T0), 1L, 1.0),
      Row(ns(T0), 1L, 2.0),               // tie with the first row
      Row(ns(T0 + gap), 1L, 4.0),         // exactly the gap → SAME session
      Row(ns(T0 + 2 * gap + 1), 1L, 8.0), // gap exceeded → new session
      Row(ns(T0 + 1000), 2L, 16.0))       // other user
    val schema = T.StructType(Seq(
      T.StructField("ts", T.LongType, nullable = false),
      T.StructField("user_id", T.LongType, nullable = false),
      T.StructField("value", T.DoubleType, nullable = false)))
    val tmp = "target/test-fixtures/sessions"
    spark.createDataFrame(rows.asJava, schema)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = Windows.queries("q_sessionize")(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5))).toSeq
    assert(got == Seq(
      (1L, 1L, 3L, 7.0),  // user 1 session 1: tie pair + at-gap row
      (1L, 2L, 1L, 8.0),  // user 1 session 2: past the gap
      (2L, 1L, 1L, 16.0)))
  }
}
