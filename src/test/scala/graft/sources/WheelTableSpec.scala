package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.Q
import graft.plans.WheelAcceleration

/** The DSv2 wheel table (round 12): schema, value parity with the scan,
  * slot-range pushdown pruning, NULL semantics for all-null measure
  * slots, and the option error modes. */
class WheelTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001
  private val path = s"$dir/events.parquet"
  private val Minute = 60000L

  private def registered(): Unit =
    WheelAcceleration.register(spark, path, Q.t(spark, dir, "events"))

  private def table = spark.read.format("wheel").option("source", path).load()

  test("minute partial rows match the scan's per-minute aggregates exactly") {
    registered()
    val got = table
      .select(col("slot_ms"), col("rows"), col("sum_value"), col("cnt_value"),
        col("min_value"), col("max_value"))
      .orderBy("slot_ms")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).toSeq
    val exp = Q.t(spark, dir, "events")
      .groupBy(expr(s"(unix_millis(ts) div $Minute) * $Minute").as("slot_ms"))
      .agg(count(lit(1)).as("rows"), sum("value").as("s"), count("value").as("c"),
        min("value").as("mn"), max("value").as("mx"))
      .orderBy("slot_ms")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got.size == exp.size)
    got.zip(exp).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._4 == e._4, s"$g vs $e")
      assert(math.abs(g._3 - e._3) < 1e-6 && g._5 == e._5 && g._6 == e._6,
        s"$g vs $e")
    }
  }

  test("slot_ms range filters are pushed down and prune chunks at plan time") {
    registered()
    val full = table
    val day = Q.Jan1 + 9 * 86400000L
    val pruned = table.filter(col("slot_ms") >= day && col("slot_ms") < day + 86400000L)
    // pushed range: the scan's input partitions carry only in-range rows
    val prunedRows = pruned.collect()
    assert(prunedRows.nonEmpty)
    assert(prunedRows.forall { r =>
      val s = r.getAs[Long]("slot_ms"); s >= day && s < day + 86400000L
    })
    // plan-time pruning is observable as fewer scanned rows than the
    // full table (the pushed filter is consumed by the source, so the
    // executed plan's scan emits exactly the pruned row count)
    val scanRowsPruned = pruned.queryExecution.executedPlan.collectLeaves()
      .head.metrics("numOutputRows")
    assert(full.count() > prunedRows.length.toLong)
    assert(scanRowsPruned.value == prunedRows.length.toLong)
    // and the pushed filters are reported on the scan description
    val desc = pruned.queryExecution.executedPlan.toString
    assert(!desc.contains("FileScan"), desc)
  }

  test("column pruning: projecting two fields materializes a two-field schema") {
    registered()
    val df = table.select("slot_ms", "sum_value")
    assert(df.schema.fieldNames.toSeq == Seq("slot_ms", "sum_value"))
    assert(df.count() > 0)
  }

  test("all-null measure slots read as SQL NULLs; rows still counted") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-wheel-nulls").toString
    val base = Q.Jan1
    // minute 0: two real values; minute 1: only a NULL measure row
    Seq((base + 1000L, Some(2.0)), (base + 2000L, Some(4.0)),
      (base + Minute + 1000L, None: Option[Double]))
      .toDF("ms", "v")
      .select(timestamp_millis(col("ms")).as("ts"), col("v").as("value"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val idx = s"$tmp/idx"
    WheelAcceleration.registerPersisted(
      spark, s"$tmp/events.parquet", idx, spark.read.parquet(s"$tmp/events.parquet"))
    val rows = spark.read.format("wheel").option("dir", idx).load()
      .orderBy("slot_ms").collect()
    assert(rows.length == 2)
    val r0 = rows(0); val r1 = rows(1)
    assert(r0.getAs[Long]("rows") == 2 && r0.getAs[Double]("sum_value") == 6.0)
    assert(r1.getAs[Long]("rows") == 1 && r1.getAs[Long]("cnt_value") == 0)
    assert(r1.isNullAt(r1.fieldIndex("sum_value")))
    assert(r1.isNullAt(r1.fieldIndex("min_value")))
    WheelAcceleration.unregister(s"$tmp/events.parquet")
  }

  test("SQL DDL access: CREATE TEMPORARY VIEW ... USING wheel") {
    registered()
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW wheel_slots " +
      s"USING wheel OPTIONS (source '$path')")
    val n = spark.sql(
      s"SELECT COUNT(*) AS n, ROUND(SUM(sum_value), 2) AS s FROM wheel_slots " +
        s"WHERE slot_ms >= ${Q.R1Start} AND slot_ms < ${Q.R1End}").collect()(0)
    val exp = Q.t(spark, dir, "events")
      .filter(unix_millis(col("ts")) >= Q.R1Start && unix_millis(col("ts")) < Q.R1End)
      .agg(round(sum("value"), 2)).collect()(0).getDouble(0)
    assert(n.getLong(0) > 0 && n.getDouble(1) == exp)
    spark.sql("DROP VIEW wheel_slots")
  }

  test("the wheel table serves the LIVE ingest registration mid-stream") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    System.setProperty("graft.wheel.fingerprint.ttlMs", "0")
    val tmp = Files.createTempDirectory("graft-wheel-live").toString
    val p = s"$tmp/events.parquet"
    val t0 = Q.Jan1
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val q = graft.streaming.WheelIngest.start(
      mem.toDF().toDF("ts", "value"), p, s"$tmp/ckpt")
    try {
      mem.addData((new java.sql.Timestamp(t0), 1.0),
        (new java.sql.Timestamp(t0 + Minute), 2.0))
      q.processAllAvailable()
      val first = spark.read.format("wheel").option("source", p).load()
        .orderBy("slot_ms").collect()
      assert(first.map(_.getAs[Double]("sum_value")).toSeq == Seq(1.0, 2.0))
      // a later batch refreshes the registration; a FRESH read serves it
      mem.addData((new java.sql.Timestamp(t0 + 1), 10.0))
      q.processAllAvailable()
      val second = spark.read.format("wheel").option("source", p).load()
        .orderBy("slot_ms").collect()
      assert(second.map(_.getAs[Double]("sum_value")).toSeq == Seq(11.0, 2.0))
      assert(second.head.getAs[Long]("cnt_value") == 2L)
    } finally {
      q.stop()
      WheelAcceleration.unregister(p)
    }
  }

  test("option error modes: unregistered source / missing options fail loudly") {
    WheelAcceleration.clear()
    val e1 = intercept[Exception] {
      spark.read.format("wheel").option("source", "/no/such/source").load()
    }
    assert(e1.getMessage.contains("no in-memory registration"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.read.format("wheel").load()
    }
    assert(e2.getMessage.contains("exactly one of"), e2.getMessage)
  }
}
