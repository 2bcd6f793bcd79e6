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

  test("aggregate pushdown: ungrouped SUM/MIN/MAX/COUNT come straight from the source") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    registered()
    val df = table
      .filter(col("slot_ms") >= Q.R1Start && col("slot_ms") < Q.R1End)
      .agg(sum("sum_value").as("s"), sum("cnt_value").as("n"),
        min("min_value").as("mn"), max("max_value").as("mx"),
        count(lit(1)).as("slots"), count(col("sum_value")).as("nonnull"),
        min("slot_ms").as("first_slot"), max("slot_ms").as("last_slot"))
    // COMPLETE pushdown: no Aggregate left in the optimized plan, no
    // HashAggregate (and no Exchange) in the physical plan — the source
    // ships exactly one answer row
    assert(df.queryExecution.optimizedPlan.collect { case a: Aggregate => a }.isEmpty,
      df.queryExecution.optimizedPlan.treeString)
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("HashAggregate") && !phys.contains("Exchange"), phys)
    val got = df.collect()(0)
    // parity baseline: the un-pushed slot rows aggregated in Scala
    val slots = table.filter(col("slot_ms") >= Q.R1Start && col("slot_ms") < Q.R1End)
      .select("slot_ms", "sum_value", "cnt_value", "min_value", "max_value")
      .collect()
    assert(slots.nonEmpty)
    assert(math.abs(got.getDouble(0) - slots.map(_.getDouble(1)).sum) < 1e-9)
    assert(got.getLong(1) == slots.map(_.getLong(2)).sum)
    assert(got.getDouble(2) == slots.map(_.getDouble(3)).min)
    assert(got.getDouble(3) == slots.map(_.getDouble(4)).max)
    assert(got.getLong(4) == slots.length.toLong)
    assert(got.getLong(5) == slots.count(!_.isNullAt(1)).toLong)
    assert(got.getLong(6) == slots.map(_.getLong(0)).min)
    assert(got.getLong(7) == slots.map(_.getLong(0)).max)
  }

  test("aggregate pushdown: empty slot range still yields the SQL one-row answer") {
    registered()
    val end = table.agg(max("slot_ms")).collect()(0).getLong(0)
    val df = table.filter(col("slot_ms") > end)
      .agg(sum("sum_value").as("s"), count(lit(1)).as("n"))
    val r = df.collect()(0)
    assert(r.isNullAt(0) && r.getLong(1) == 0L, r)
  }

  test("aggregate pushdown: GROUP BY slot_ms ships final per-slot rows, no shuffle") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    registered()
    val df = table
      .filter(col("slot_ms") >= Q.R1Start && col("slot_ms") < Q.R1End)
      .groupBy("slot_ms")
      .agg(sum("sum_value").as("s"), count(lit(1)).as("n"))
      .orderBy("slot_ms")
    assert(df.queryExecution.optimizedPlan.collect { case a: Aggregate => a }.isEmpty,
      df.queryExecution.optimizedPlan.treeString)
    val got = df.collect()
    val exp = table.filter(col("slot_ms") >= Q.R1Start && col("slot_ms") < Q.R1End)
      .select("slot_ms", "sum_value").orderBy("slot_ms").collect()
    assert(got.length == exp.length && got.nonEmpty)
    got.zip(exp).foreach { case (g, e) =>
      assert(g.getLong(0) == e.getLong(0) && g.getDouble(1) == e.getDouble(1) &&
        g.getLong(2) == 1L, s"$g vs $e")
    }
  }

  test("aggregate pushdown: AVG splits to pushed SUM/COUNT partials and stays exact") {
    registered()
    val df = table
      .filter(col("slot_ms") >= Q.R1Start && col("slot_ms") < Q.R1End)
      .agg(avg("sum_value").as("a"))
    val slots = table.filter(col("slot_ms") >= Q.R1Start && col("slot_ms") < Q.R1End)
      .select("sum_value").collect().map(_.getDouble(0))
    assert(math.abs(df.collect()(0).getDouble(0) - slots.sum / slots.length) < 1e-9)
  }

  test("keyed mode: per-(key, slot) rows match the keyed minute aggregates") {
    WheelAcceleration.registerKeyed(spark, path, Q.t(spark, dir, "events"), "event_type")
    val got = spark.read.format("wheel").option("source", path)
      .option("keyed", "true").load()
      .select("event_type", "slot_ms", "rows", "sum_value", "cnt_value")
      .orderBy("event_type", "slot_ms")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSeq
    val exp = Q.t(spark, dir, "events")
      .groupBy(col("event_type"),
        expr(s"(unix_millis(ts) div $Minute) * $Minute").as("slot_ms"))
      .agg(count(lit(1)).as("rows"), sum("value").as("s"), count("value").as("c"))
      .orderBy("event_type", "slot_ms")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSeq
    assert(got.size == exp.size && got.nonEmpty)
    got.zip(exp).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3 && g._5 == e._5, s"$g vs $e")
      assert(math.abs(g._4 - e._4) < 1e-6, s"$g vs $e")
    }
  }

  test("keyed mode: key equality and slot range are consumed by the source") {
    import org.apache.spark.sql.execution.FilterExec
    WheelAcceleration.registerKeyed(spark, path, Q.t(spark, dir, "events"), "event_type")
    val keyed = spark.read.format("wheel").option("source", path)
      .option("keyed", "true").load()
    val aKey = keyed.select("event_type").orderBy("event_type").first().getString(0)
    val day = Q.Jan1 + 9 * 86400000L
    val df = keyed.filter(col("event_type") === aKey &&
      col("slot_ms") >= day && col("slot_ms") < day + 86400000L)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val s = r.getAs[Long]("slot_ms")
      r.getAs[String]("event_type") == aKey && s >= day && s < day + 86400000L
    })
    // every pushed predicate is consumed: no post-scan Filter remains,
    // and the scan emits exactly the filtered rows
    val plan = df.queryExecution.executedPlan
    assert(plan.collect { case f: FilterExec => f }.isEmpty, plan.toString)
    assert(plan.collectLeaves().head.metrics("numOutputRows").value == rows.length.toLong)
  }

  test("keyed persisted dir mode: O(keys × slots) load, no registration needed") {
    val tmp = Files.createTempDirectory("graft-wheel-keyed-dir").toString
    graft.wheel.PersistentWheel.saveKeyed(spark, tmp, Q.t(spark, dir, "events"),
      "event_type", "ts", "value",
      graft.wheel.SourceFingerprint.of(path, spark.sessionState.newHadoopConf()))
    val got = spark.read.format("wheel").option("dir", tmp)
      .option("keyed", "true").load()
      .groupBy("event_type").agg(round(sum("sum_value"), 2).as("s"))
      .orderBy("event_type").collect()
    val exp = Q.t(spark, dir, "events")
      .groupBy("event_type").agg(round(sum("value"), 2).as("s"))
      .orderBy("event_type").collect()
    assert(got.length == exp.length && got.nonEmpty)
    got.zip(exp).foreach { case (g, e) =>
      assert(g.getString(0) == e.getString(0) && g.getDouble(1) == e.getDouble(1))
    }
  }

  test("keyedmulti dir mode: N-measure keyed dirs serve all measures (round 13)") {
    val tmp = Files.createTempDirectory("graft-wheel-keyedmulti-dir").toString
    val ev = Q.t(spark, dir, "events").withColumn("v2", col("value") * 2)
    graft.wheel.PersistentWheel.saveKeyedMulti(spark, tmp, ev,
      "event_type", "ts", Seq("value", "v2"),
      graft.wheel.SourceFingerprint.of(path, spark.sessionState.newHadoopConf()))
    // kind-dispatched resolution: no `keyed` option needed (but allowed)
    val got = spark.read.format("wheel").option("dir", tmp).load()
      .groupBy("event_type")
      .agg(round(sum("sum_value"), 2).as("s1"), round(sum("sum_v2"), 2).as("s2"),
        sum("cnt_value").as("n"))
      .orderBy("event_type").collect()
    val exp = ev.groupBy("event_type")
      .agg(round(sum("value"), 2).as("s1"), round(sum("v2"), 2).as("s2"),
        count("value").as("n"))
      .orderBy("event_type").collect()
    assert(got.length == exp.length && got.nonEmpty)
    got.zip(exp).foreach { case (g, e) =>
      assert(g.getString(0) == e.getString(0) && g.getDouble(1) == e.getDouble(1) &&
        g.getDouble(2) == e.getDouble(2) && g.getLong(3) == e.getLong(3),
        s"$g vs $e")
    }
  }

  test("theta sketch dir mode: per-slot distinct_<col> exact under the nominal (round 13)") {
    val tmp = Files.createTempDirectory("graft-wheel-theta-dir").toString
    graft.wheel.PersistentWheel.saveCohort(spark, tmp, Q.t(spark, dir, "events"),
      "ts", "user_id",
      graft.wheel.SourceFingerprint.of(path, spark.sessionState.newHadoopConf()))
    val t = spark.read.format("wheel").option("dir", tmp).load()
    assert(t.schema.fieldNames.toSeq == Seq("slot_ms", "distinct_user_id"))
    val got = t.orderBy("slot_ms").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val exp = Q.t(spark, dir, "events")
      .groupBy(expr(s"(unix_millis(ts) div $Minute) * $Minute").as("slot_ms"))
      .agg(countDistinct("user_id").as("d")).orderBy("slot_ms").collect()
      .map(r => r.getLong(0) -> r.getLong(1).toDouble).toSeq
    assert(got == exp, s"first diff: ${got.zip(exp).find(p => p._1 != p._2)}")
    // slot range pushdown prunes the walk
    val day = Q.Jan1 + 9 * 86400000L
    val pruned = t.filter(col("slot_ms") >= day && col("slot_ms") < day + 86400000L)
    val rows = pruned.collect()
    assert(rows.nonEmpty && rows.length < got.length)
    assert(pruned.queryExecution.executedPlan.collectLeaves()
      .head.metrics("numOutputRows").value == rows.length.toLong)
  }

  test("kll and mg sketch dir modes serve quantile / top-key slot series (round 13)") {
    val fp = graft.wheel.SourceFingerprint.of(path, spark.sessionState.newHadoopConf())
    val kllDir = Files.createTempDirectory("graft-wheel-kll-dir").toString
    graft.wheel.PersistentWheel.saveQuantile(spark, kllDir,
      Q.t(spark, dir, "events"), "ts", "value", fp)
    val kll = spark.read.format("wheel").option("dir", kllDir).load()
    assert(kll.schema.fieldNames.toSeq ==
      Seq("slot_ms", "p50_value", "p95_value", "p99_value"))
    val kllRows = kll.collect()
    assert(kllRows.nonEmpty)
    kllRows.foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(3),
        s"quantiles out of order: $r")
    }
    // custom quantile set via option
    val q9 = spark.read.format("wheel").option("dir", kllDir)
      .option("quantiles", "0.9").load()
    assert(q9.schema.fieldNames.toSeq == Seq("slot_ms", "p90_value"))
    assert(q9.count() == kllRows.length.toLong)

    val mgDir = Files.createTempDirectory("graft-wheel-mg-dir").toString
    graft.wheel.PersistentWheel.saveFrequency(spark, mgDir,
      Q.t(spark, dir, "events"), "ts", "user_id", fp)
    val mg = spark.read.format("wheel").option("dir", mgDir).load()
    assert(mg.schema.fieldNames.toSeq == Seq("slot_ms", "top_key", "top_est"))
    val mgRows = mg.collect()
    assert(mgRows.nonEmpty && mgRows.forall(r => r.getLong(2) >= 1L))
  }

  test("keyedtheta sketch dir mode: per-(key, slot) distinct series, key pushdown (round 13)") {
    val tmp = Files.createTempDirectory("graft-wheel-keyedtheta-dir").toString
    graft.wheel.PersistentWheel.saveKeyedCohort(spark, tmp,
      Q.t(spark, dir, "events"), "event_type", "ts", "user_id",
      graft.wheel.SourceFingerprint.of(path, spark.sessionState.newHadoopConf()))
    val t = spark.read.format("wheel").option("dir", tmp).load()
    assert(t.schema.fieldNames.toSeq ==
      Seq("event_type", "slot_ms", "distinct_user_id"))
    // theta exact under the nominal: per-(key, minute) distincts match
    val got = t.filter(col("event_type") === "click")
      .orderBy("slot_ms").collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toSeq
    val exp = Q.t(spark, dir, "events").filter(col("event_type") === "click")
      .groupBy(expr(s"(unix_millis(ts) div $Minute) * $Minute").as("slot_ms"))
      .agg(countDistinct("user_id").as("d")).orderBy("slot_ms").collect()
      .map(r => r.getLong(0) -> r.getLong(1).toDouble).toSeq
    assert(got == exp)
    // the key filter was CONSUMED: the scan emits only that key's rows
    val pruned = t.filter(col("event_type") === "click")
    val n = pruned.collect().length
    assert(pruned.queryExecution.executedPlan.collectLeaves()
      .head.metrics("numOutputRows").value == n.toLong)
    assert(n.toLong < t.count())
  }

  test("write path: df.write.format(\"wheel\") persists a servable sum dir (round 13)") {
    val tmp = s"${Files.createTempDirectory("graft-wheel-write").toString}/idx"
    // an arbitrary DERIVED DataFrame — a filtered view, not a source path
    val ev = Q.t(spark, dir, "events")
      .filter(col("event_type") =!= "purchase")
      .select(col("ts"), col("value"))
    ev.write.format("wheel").option("dir", tmp).option("ts", "ts")
      .option("fingerprint", "spec-fp").mode("overwrite").save()
    // fingerprint sidecar records the caller's provenance token
    val meta = graft.wheel.PersistentWheel.peek(spark, tmp).get
    assert(meta.kind == graft.wheel.PersistentWheel.SumKind)
    assert(meta.sourceFingerprint == "spec-fp" && meta.valueCols == Seq("value"))
    // the written dir round-trips through the kind-dispatched table read
    val got = spark.read.format("wheel").option("dir", tmp).load()
      .agg(round(sum("sum_value"), 2).as("s"), sum("cnt_value").as("n")).collect()(0)
    val exp = ev.agg(round(sum("value"), 2).as("s"), count("value").as("n")).collect()(0)
    assert(got.getDouble(0) == exp.getDouble(0) && got.getLong(1) == exp.getLong(1))
    // append to an existing dir refuses loudly; overwrite replaces
    val err = intercept[Exception] {
      ev.write.format("wheel").option("dir", tmp).option("ts", "ts")
        .mode("append").save()
    }
    assert(err.getMessage.contains("overwrite"), err.getMessage)
    ev.filter(col("event_type") === "click")
      .write.format("wheel").option("dir", tmp).option("ts", "ts")
      .mode("overwrite").save()
    // append refuses on ANY non-empty dir (ADVICE r13): a corrupt /
    // half-written index — unreadable by peek — must not be silently
    // replaced under mode("append")
    val torn = s"${Files.createTempDirectory("graft-wheel-torn").toString}/idx"
    Files.createDirectories(java.nio.file.Paths.get(torn))
    Files.writeString(java.nio.file.Paths.get(s"$torn/meta.graft"),
      "{not json")
    assert(graft.wheel.PersistentWheel.peek(spark, torn).isEmpty)
    val tornErr = intercept[Exception] {
      ev.write.format("wheel").option("dir", torn).option("ts", "ts")
        .mode("append").save()
    }
    assert(tornErr.getMessage.contains("not empty"), tornErr.getMessage)
    // overwrite still replaces the torn dir with a good index
    ev.write.format("wheel").option("dir", torn).option("ts", "ts")
      .mode("overwrite").save()
    assert(graft.wheel.PersistentWheel.peek(spark, torn).isDefined)
  }

  test("write path: option(\"key\") persists a keyedmulti dir served keyed (round 13)") {
    val tmp = s"${Files.createTempDirectory("graft-wheel-write-keyed").toString}/idx"
    val ev = Q.t(spark, dir, "events")
      .select(col("ts"), col("event_type"), col("value"))
    ev.write.format("wheel").option("dir", tmp).option("ts", "ts")
      .option("key", "event_type").mode("overwrite").save()
    val meta = graft.wheel.PersistentWheel.peek(spark, tmp).get
    assert(meta.kind == graft.wheel.PersistentWheel.KeyedMultiKind)
    val got = spark.read.format("wheel").option("dir", tmp).load()
      .groupBy("event_type").agg(round(sum("sum_value"), 2).as("s"))
      .orderBy("event_type").collect()
    val exp = ev.groupBy("event_type").agg(round(sum("value"), 2).as("s"))
      .orderBy("event_type").collect()
    assert(got.length == exp.length && got.nonEmpty)
    got.zip(exp).foreach { case (g, e) =>
      assert(g.getString(0) == e.getString(0) && g.getDouble(1) == e.getDouble(1))
    }
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

  test("SQL DDL write: CREATE TABLE ... USING wheel AS SELECT round-trips (round 14)") {
    // the pure-SQL spelling of the round-13 write path: CTAS routes
    // through the same V1Write fallback as df.write.format("wheel"),
    // builds the index off the SELECT (one rollup job), and the created
    // dir serves through the existing kind-dispatched table read
    val tmp = s"${Files.createTempDirectory("graft-wheel-ctas").toString}/idx"
    Q.t(spark, dir, "events").createOrReplaceTempView("ev_ctas")
    spark.sql("DROP TABLE IF EXISTS wheel_ctas")
    spark.sql(
      s"""CREATE TABLE wheel_ctas USING wheel
         |OPTIONS (dir '$tmp', ts 'ts')
         |AS SELECT ts, value FROM ev_ctas WHERE event_type <> 'purchase'
         |""".stripMargin)
    try {
      val meta = graft.wheel.PersistentWheel.peek(spark, tmp).get
      assert(meta.kind == graft.wheel.PersistentWheel.SumKind)
      val got = spark.read.format("wheel").option("dir", tmp).load()
        .agg(round(sum("sum_value"), 2).as("s"), sum("cnt_value").as("n"))
        .collect()(0)
      val exp = Q.t(spark, dir, "events")
        .filter(col("event_type") =!= "purchase")
        .agg(round(sum("value"), 2).as("s"), count("value").as("n"))
        .collect()(0)
      assert(got.getDouble(0) == exp.getDouble(0) &&
        got.getLong(1) == exp.getLong(1))
    } finally spark.sql("DROP TABLE IF EXISTS wheel_ctas")
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

  test("the KEYED wheel table serves the live ingest registration mid-stream (round 13)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    System.setProperty("graft.wheel.fingerprint.ttlMs", "0")
    val tmp = Files.createTempDirectory("graft-wheel-live-keyed").toString
    val p = s"$tmp/events.parquet"
    val t0 = Q.Jan1
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val q = graft.streaming.WheelIngest.start(
      mem.toDF().toDF("ts", "event_type", "value"), p, s"$tmp/ckpt",
      keyCol = Some("event_type"))
    try {
      mem.addData(
        (new java.sql.Timestamp(t0), "click", 1.0),
        (new java.sql.Timestamp(t0), "view", 5.0),
        (new java.sql.Timestamp(t0 + Minute), "click", 2.0))
      q.processAllAvailable()
      def keyedRows() = spark.read.format("wheel").option("source", p)
        .option("keyed", "true").load()
        .orderBy("event_type", "slot_ms").collect()
        .map(r => (r.getString(0), r.getLong(1) - t0,
          r.getAs[Double]("sum_value"))).toSeq
      assert(keyedRows() == Seq(
        ("click", 0L, 1.0), ("click", Minute, 2.0), ("view", 0L, 5.0)))
      // a later micro-batch refreshes the keyed registration; a FRESH
      // table read reflects it per (key, slot)
      mem.addData((new java.sql.Timestamp(t0 + 1), "view", 10.0))
      q.processAllAvailable()
      assert(keyedRows() == Seq(
        ("click", 0L, 1.0), ("click", Minute, 2.0),
        ("view", 0L, 15.0)))
    } finally {
      q.stop()
      WheelAcceleration.unregister(p)
    }
  }

  test("keyed aggregate pushdown: GROUP BY key ships |keys| final rows, no Aggregate") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    WheelAcceleration.registerKeyed(spark, path, Q.t(spark, dir, "events"), "event_type")
    val keyed = spark.read.format("wheel").option("source", path)
      .option("keyed", "true").load()
      .filter(col("slot_ms") >= Q.R1Start && col("slot_ms") < Q.R1End)
    val df = keyed.groupBy("event_type")
      .agg(sum("sum_value").as("s"), sum("cnt_value").as("n"),
        min("min_value").as("mn"), max("max_value").as("mx"),
        count(lit(1)).as("pairs"))
      .orderBy("event_type")
    assert(df.queryExecution.optimizedPlan.collect { case a: Aggregate => a }.isEmpty,
      df.queryExecution.optimizedPlan.treeString)
    assert(!df.queryExecution.executedPlan.toString.contains("HashAggregate"))
    val got = df.collect()
    // parity baseline: the plain keyed slot rows aggregated in Scala
    val slots = keyed.select("event_type", "sum_value", "cnt_value",
      "min_value", "max_value").collect()
      .groupBy(_.getString(0)).toSeq.sortBy(_._1)
    assert(got.length == slots.length && got.nonEmpty)
    got.zip(slots).foreach { case (g, (k, rs)) =>
      assert(g.getString(0) == k)
      assert(math.abs(g.getDouble(1) - rs.map(_.getDouble(1)).sum) < 1e-9)
      assert(g.getLong(2) == rs.map(_.getLong(2)).sum)
      assert(g.getDouble(3) == rs.map(_.getDouble(3)).min)
      assert(g.getDouble(4) == rs.map(_.getDouble(4)).max)
      assert(g.getLong(5) == rs.length.toLong)
    }
  }

  test("keyed aggregate pushdown: GROUP BY (slot_ms, key) + IN filter, both consumed") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    WheelAcceleration.registerKeyed(spark, path, Q.t(spark, dir, "events"), "event_type")
    val keyed = spark.read.format("wheel").option("source", path)
      .option("keyed", "true").load()
    val keys = keyed.select("event_type").distinct()
      .orderBy("event_type").collect().map(_.getString(0)).take(2)
    val df = keyed
      .filter(col("slot_ms") >= Q.R1Start && col("slot_ms") < Q.R1End &&
        col("event_type").isin(keys.toSeq: _*))
      .groupBy(col("slot_ms"), col("event_type")) // reversed col order vs schema
      .agg(sum("sum_value").as("s"))
      .orderBy("slot_ms", "event_type")
    assert(df.queryExecution.optimizedPlan.collect { case a: Aggregate => a }.isEmpty,
      df.queryExecution.optimizedPlan.treeString)
    val got = df.collect()
    val exp = keyed
      .filter(col("slot_ms") >= Q.R1Start && col("slot_ms") < Q.R1End &&
        col("event_type").isin(keys.toSeq: _*))
      .select("slot_ms", "event_type", "sum_value")
      .orderBy("slot_ms", "event_type").collect()
    assert(got.length == exp.length && got.nonEmpty)
    got.zip(exp).foreach { case (g, e) =>
      assert(g.getLong(0) == e.getLong(0) && g.getString(1) == e.getString(1) &&
        math.abs(g.getDouble(2) - e.getDouble(2)) < 1e-9, s"$g vs $e")
    }
  }

  test("keyed aggregate pushdown: ungrouped total; string MIN falls back correctly") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    WheelAcceleration.registerKeyed(spark, path, Q.t(spark, dir, "events"), "event_type")
    val keyed = spark.read.format("wheel").option("source", path)
      .option("keyed", "true").load()
      .filter(col("slot_ms") >= Q.R1Start && col("slot_ms") < Q.R1End)
    val total = keyed.agg(sum("sum_value").as("s"), count(lit(1)).as("pairs"))
    assert(total.queryExecution.optimizedPlan.collect { case a: Aggregate => a }.isEmpty)
    val r = total.collect()(0)
    val slots = keyed.select("sum_value").collect().map(_.getDouble(0))
    assert(math.abs(r.getDouble(0) - slots.sum) < 1e-9 &&
      r.getLong(1) == slots.length.toLong)
    // MIN over the STRING key column is not pushable (no numeric order
    // in the source) — the Aggregate must survive and stay correct
    val fb = keyed.agg(min("event_type").as("mn"))
    assert(fb.queryExecution.optimizedPlan.collect { case a: Aggregate => a }.nonEmpty,
      fb.queryExecution.optimizedPlan.treeString)
    val expMin = keyed.select("event_type").collect().map(_.getString(0)).min
    assert(fb.collect()(0).getString(0) == expMin)
  }

  test("TopN pushdown: ORDER BY + LIMIT consumed — no Sort in the plan, rows pre-sorted") {
    registered()
    val in = table.filter(col("slot_ms") >= Q.R1Start && col("slot_ms") < Q.R1End)
    val df = in.orderBy(col("rows").desc, col("slot_ms"))
      .limit(3)
      .select(col("slot_ms"), col("rows"))
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("PushedTopN") || !phys.contains("Sort"), phys)
    assert(!phys.contains("TakeOrderedAndProject"), phys)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val exp = in.select("slot_ms", "rows").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (s, n) => (-n, s) }.take(3).toSeq
    assert(got == exp)
  }

  test("TopN pushdown: sorting a column the projection drops still works") {
    registered()
    val in = table.filter(col("slot_ms") >= Q.R1Start && col("slot_ms") < Q.R1End)
    // sum_value is the sort key but NOT in the output
    val df = in.orderBy(col("sum_value").asc, col("slot_ms"))
      .limit(4).select("slot_ms")
    val got = df.collect().map(_.getLong(0)).toSeq
    val exp = in.select("slot_ms", "sum_value").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (s, v) => (v, s) }.take(4).map(_._1).toSeq
    assert(got == exp)
  }

  test("LIMIT pushdown: the slot walk stops at k rows") {
    registered()
    val df = table.filter(col("slot_ms") >= Q.R1Start && col("slot_ms") < Q.R1End)
      .limit(4)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("PushedLimit") || phys.contains("limit=4"), phys)
    val rows = df.collect()
    assert(rows.length == 4)
    assert(rows.forall { r =>
      val s = r.getAs[Long]("slot_ms"); s >= Q.R1Start && s < Q.R1End
    })
  }

  test("write path error modes: bad ts / no measures / explicit measures (round 13)") {
    val base = Files.createTempDirectory("graft-wheel-write-err").toString
    val ev = Q.t(spark, dir, "events").select(col("ts"), col("value"))
    // ts names a missing column → loud refusal naming the columns
    val badTs = intercept[Exception] {
      ev.write.format("wheel").option("dir", s"$base/a")
        .option("ts", "nope").mode("overwrite").save()
    }
    assert(badTs.getMessage.contains("nope"), badTs.getMessage)
    // no numeric measure columns → loud refusal
    val noMeasure = intercept[Exception] {
      ev.select("ts").write.format("wheel").option("dir", s"$base/b")
        .option("ts", "ts").mode("overwrite").save()
    }
    assert(noMeasure.getMessage.contains("measure"), noMeasure.getMessage)
    // explicit measures subset: only the listed column is indexed
    val ev2 = Q.t(spark, dir, "events")
      .select(col("ts"), col("value"), (col("value") * 3).as("v3"))
    ev2.write.format("wheel").option("dir", s"$base/c").option("ts", "ts")
      .option("measures", "v3").mode("overwrite").save()
    val meta = graft.wheel.PersistentWheel.peek(spark, s"$base/c").get
    assert(meta.valueCols == Seq("v3"))
    val got = spark.read.format("wheel").option("dir", s"$base/c").load()
      .agg(round(sum("sum_v3"), 2)).collect()(0).getDouble(0)
    val exp = ev2.agg(round(sum("v3"), 2)).collect()(0).getDouble(0)
    assert(got == exp)
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

  test("wheel scans report real time-bounded statistics; joins broadcast (round 15)") {
    registered()
    // the relation's planning stats are slot-count scale, not Spark's
    // infinite defaultSizeInBytes for stats-less DSv2 relations
    val day = Q.Jan1 + 9 * 86400000L
    val pruned = table.filter(col("slot_ms") >= day && col("slot_ms") < day + 86400000L)
    val stats = pruned.queryExecution.optimizedPlan.stats
    assert(stats.sizeInBytes < 10L * 1024 * 1024, s"sizeInBytes=${stats.sizeInBytes}")
    assert(stats.rowCount.forall(_ <= 1440), stats.rowCount)
    // pruning must shrink the estimate: one day of slots < the full span
    val full = table.queryExecution.optimizedPlan.stats
    assert(stats.sizeInBytes < full.sizeInBytes,
      s"${stats.sizeInBytes} !< ${full.sizeInBytes}")
    // the payoff: raw events (big side) JOIN wheel table (small side)
    // broadcasts the index side with no hint
    val ev = Q.t(spark, dir, "events")
      .withColumn("slot_ms", expr("(unix_millis(ts) div 60000) * 60000"))
    val j = ev.join(table.select(col("slot_ms"), col("rows")), "slot_ms")
    assert(j.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      j.queryExecution.executedPlan.toString)
    // every event's minute has a populated slot — the join keeps all rows
    assert(j.count() == ev.count())
    WheelAcceleration.clear()
  }

  test("wheel catalog: SHOW TABLES / SELECT / CTAS / DROP over a warehouse (round 15)") {
    // VERDICT r14 #4 — the deployment spelling of the dir mode: a
    // session-catalog plugin resolves catalog-qualified names inside
    // one warehouse root, no per-query option("dir", …) plumbing.
    val root = Files.createTempDirectory("graft_wheel_catalog").toString
    val ev = Q.t(spark, dir, "events")
    graft.wheel.PersistentWheel.save(spark, s"$root/events_minutes", ev,
      "ts", Seq("value"), "spec-fp")
    graft.wheel.PersistentWheel.saveKeyed(spark, s"$root/by_type", ev,
      "event_type", "ts", "value", "spec-fp")
    // a non-wheel child dir must not list
    Files.createDirectories(java.nio.file.Paths.get(s"$root/not_a_wheel"))
    spark.conf.set("spark.sql.catalog.wheelspec",
      "graft.sources.WheelTableCatalog")
    spark.conf.set("spark.sql.catalog.wheelspec.root", root)
    try {
      val shown = spark.sql("SHOW TABLES IN wheelspec")
        .select("tableName").collect().map(_.getString(0)).toSet
      assert(shown == Set("events_minutes", "by_type"), shown)
      // catalog-qualified read = the dir-mode read, kind-dispatched
      val got = spark.sql("SELECT ROUND(SUM(sum_value), 2) AS s, " +
        "SUM(cnt_value) AS n FROM wheelspec.events_minutes").collect()(0)
      val exp = ev.agg(round(sum("value"), 2), count("value")).collect()(0)
      assert(got.getDouble(0) == exp.getDouble(0) &&
        got.getLong(1) == exp.getLong(1))
      val keyedRows = spark.sql(
        "SELECT COUNT(DISTINCT event_type) AS k FROM wheelspec.by_type")
        .collect()(0).getLong(0)
      assert(keyedRows == ev.select("event_type").distinct().count())
      // CTAS builds and persists an index through the DSv2 write path
      ev.filter(col("event_type") =!= "purchase")
        .createOrReplaceTempView("ev_catalog_src")
      spark.sql("CREATE TABLE wheelspec.no_purchase AS " +
        "SELECT ts, value FROM ev_catalog_src")
      val meta = graft.wheel.PersistentWheel.peek(spark, s"$root/no_purchase").get
      assert(meta.kind == graft.wheel.PersistentWheel.SumKind)
      val got2 = spark.sql("SELECT ROUND(SUM(sum_value), 2) AS s " +
        "FROM wheelspec.no_purchase").collect()(0).getDouble(0)
      val exp2 = ev.filter(col("event_type") =!= "purchase")
        .agg(round(sum("value"), 2)).collect()(0).getDouble(0)
      assert(got2 == exp2)
      // duplicate CTAS refuses; DROP removes the dir and the listing
      val dup = intercept[Exception] {
        spark.sql("CREATE TABLE wheelspec.no_purchase AS " +
          "SELECT ts, value FROM ev_catalog_src")
      }
      assert(dup.getMessage.toLowerCase.contains("already exists"), dup.getMessage)
      spark.sql("DROP TABLE wheelspec.no_purchase")
      assert(graft.wheel.PersistentWheel.peek(spark, s"$root/no_purchase").isEmpty)
      val shown2 = spark.sql("SHOW TABLES IN wheelspec")
        .select("tableName").collect().map(_.getString(0)).toSet
      assert(shown2 == Set("events_minutes", "by_type"), shown2)
      // unknown names fail as missing tables, inside the root only
      val missing = intercept[Exception] {
        spark.sql("SELECT * FROM wheelspec.nope").collect()
      }
      assert(missing.getMessage.toLowerCase.contains("cannot be found") ||
        missing.getMessage.toLowerCase.contains("not found"), missing.getMessage)
      val traversal = intercept[Exception] {
        spark.sql("SELECT * FROM wheelspec.`../escape`").collect()
      }
      // round 16 (VERDICT r15 #3): malformed names are UNRESOLVABLE —
      // the analyzer-friendly TABLE_OR_VIEW_NOT_FOUND, not a bare
      // require failure mid-analysis; escape from the root still
      // impossible
      assert(traversal.getMessage.toLowerCase.contains("cannot be found") ||
        traversal.getMessage.toLowerCase.contains("not found"),
        traversal.getMessage)
    } finally {
      spark.conf.unset("spark.sql.catalog.wheelspec")
      spark.conf.unset("spark.sql.catalog.wheelspec.root")
    }
  }

  test("wheel catalog: staged CTAS — empty CREATE rejected, failed CTAS " +
      "aborts clean, junk dirs swept, REPLACE swaps (round 16, ADVICE r15)") {
    val root = Files.createTempDirectory("graft_wheel_stage").toString
    val ev = Q.t(spark, dir, "events")
    ev.createOrReplaceTempView("ev_stage_src")
    spark.conf.set("spark.sql.catalog.wheelstage",
      "graft.sources.WheelTableCatalog")
    spark.conf.set("spark.sql.catalog.wheelstage.root", root)
    def childDirs(): Set[String] = {
      val f = new java.io.File(root)
      Option(f.list()).map(_.toSet).getOrElse(Set.empty)
    }
    try {
      // plain CREATE TABLE has no query to index — rejected loudly,
      // nothing persisted, the name stays free
      val empty = intercept[Exception] {
        spark.sql("CREATE TABLE wheelstage.t1 (ts TIMESTAMP, value DOUBLE)")
      }
      assert(empty.getMessage.contains("cannot be created empty"),
        empty.getMessage)
      assert(childDirs().isEmpty, childDirs())
      // a FAILED CTAS (source has no ts column) aborts: no final dir,
      // no staging leftovers, and the name is NOT bricked — the same
      // CTAS with a fixed query then succeeds
      intercept[Exception] {
        spark.sql("CREATE TABLE wheelstage.t1 AS SELECT value FROM ev_stage_src")
      }
      assert(childDirs().isEmpty, childDirs())
      spark.sql("CREATE TABLE wheelstage.t1 AS SELECT ts, value FROM ev_stage_src")
      assert(graft.wheel.PersistentWheel.peek(spark, s"$root/t1").isDefined)
      assert(childDirs() == Set("t1"), childDirs())
      // a junk (non-wheel) dir at a name does not brick it: tableExists
      // says no, and CTAS sweeps the unreadable leftovers first
      Files.createDirectories(java.nio.file.Paths.get(s"$root/t2/partial"))
      assert(!spark.catalog.tableExists("wheelstage.t2"))
      spark.sql("CREATE TABLE wheelstage.t2 AS SELECT ts, value FROM ev_stage_src")
      assert(graft.wheel.PersistentWheel.peek(spark, s"$root/t2").isDefined)
      // REPLACE stages the new build and swaps on commit
      spark.sql("REPLACE TABLE wheelstage.t1 AS " +
        "SELECT ts, value FROM ev_stage_src WHERE event_type = 'click'")
      val gotReplaced = spark.sql(
        "SELECT SUM(cnt_value) AS n FROM wheelstage.t1").collect()(0).getLong(0)
      val expReplaced = ev.filter(col("event_type") === "click")
        .filter(col("value").isNotNull).count()
      assert(gotReplaced == expReplaced, s"$gotReplaced vs $expReplaced")
      // no staging remnants anywhere after the dance
      assert(childDirs() == Set("t1", "t2"), childDirs())
    } finally {
      spark.conf.unset("spark.sql.catalog.wheelstage")
      spark.conf.unset("spark.sql.catalog.wheelstage.root")
    }
  }

  test("DSv2 COLUMN statistics feed CBO: attribute stats visible, " +
      "multi-way join REORDERED by estimated cardinality " +
      "(round 17, VERDICT r16 #7)") {
    import spark.implicits._
    // three wheel tables of very different slot counts (distinct
    // minutes): big=2000, mid=400, small=6
    def mk(nm: String, minutes: Int): String = {
      val src = new java.io.File(
        s"target/test-fixtures/wheel/cbo_$nm.parquet").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(src))
      (0 until minutes)
        .map(i => (new java.sql.Timestamp(Q.Jan1 + i * Minute), 1.0 + i))
        .toDF("ts", "value").repartition(2)
        .write.mode("overwrite").parquet(src)
      WheelAcceleration.register(spark, src, spark.read.parquet(src))
      src
    }
    val (big, mid, small) = (mk("big", 2000), mk("mid", 400), mk("small", 6))
    def tbl(p: String) =
      spark.read.format("wheel").option("source", p).load()
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // column stats surface on the relation: rowCount + per-attribute
      // min/max/NDV for slot_ms (what join-cardinality estimation eats)
      val lone = tbl(big)
      val stats = lone.queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(2000)), stats.rowCount)
      val slotStat = stats.attributeStats.find(_._1.name == "slot_ms")
      assert(slotStat.isDefined, stats.attributeStats)
      val cs = slotStat.get._2
      assert(cs.distinctCount.contains(BigInt(2000)), cs)
      assert(cs.min.contains(Q.Jan1) &&
        cs.max.contains(Q.Jan1 + 1999L * Minute), cs)
      // a 3-way join written big ⋈ mid ⋈ small: cost-based reorder must
      // move SMALL before MID (the big⋈small intermediate is ~6 rows vs
      // ~400) — provable from the leaf order of the optimized join tree
      val b = tbl(big).select(col("slot_ms").as("bs"), col("sum_value").as("bv"))
      val m = tbl(mid).select(col("slot_ms").as("ms"), col("sum_value").as("mv"))
      val s = tbl(small).select(col("slot_ms").as("ss"), col("sum_value").as("sv"))
      val j = b.join(m, col("bs") === col("ms"))
        .join(s, col("bs") === col("ss"))
        .groupBy().agg(count(lit(1)).as("n"))
      val leaves = j.queryExecution.optimizedPlan.collectLeaves()
      // identify each leaf by its reported row count
      val order = leaves.map(_.stats.rowCount.map(_.toLong).getOrElse(-1L))
      assert(order.size == 3 && order.toSet == Set(2000L, 400L, 6L), order)
      assert(order.indexOf(6L) < order.indexOf(400L),
        s"join order not cost-reordered (leaf row counts in tree order: $order)")
      // and the reordered join still answers correctly
      assert(j.collect()(0).getLong(0) == 6L)
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.conf.unset("spark.sql.cbo.joinReorder.enabled")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      WheelAcceleration.clear()
    }
  }

  test("wheel catalog: TWO SESSIONS share one warehouse by name " +
      "(round 17, VERDICT r16 #3)") {
    val root = Files.createTempDirectory("graft_wheel_share").toString
    val a = spark.newSession()
    val b = spark.newSession()
    for (s <- Seq(a, b)) {
      s.conf.set("spark.sql.catalog.wheelshare",
        "graft.sources.WheelTableCatalog")
      s.conf.set("spark.sql.catalog.wheelshare.root", root)
    }
    // session A creates by CTAS (staged, atomic)...
    Q.t(a, dir, "events").createOrReplaceTempView("ev_share_a")
    a.sql("CREATE TABLE wheelshare.shared AS SELECT ts, value FROM ev_share_a")
    // ...and session B — which never registered anything, shares only
    // the catalog conf — reads it BY NAME and lists it
    assert(b.sql("SHOW TABLES IN wheelshare").collect()
      .map(_.getString(1)).toSeq == Seq("shared"))
    val nB = b.sql("SELECT SUM(cnt_value) AS n FROM wheelshare.shared")
      .collect()(0).getLong(0)
    val exp = Q.t(spark, dir, "events")
      .filter(col("value").isNotNull).count()
    assert(nB == exp, s"$nB vs $exp")
    // B REPLACEs the table; A observes the new contents by name
    Q.t(b, dir, "events").createOrReplaceTempView("ev_share_b")
    b.sql("REPLACE TABLE wheelshare.shared AS " +
      "SELECT ts, value FROM ev_share_b WHERE event_type = 'click'")
    val nA = a.sql("SELECT SUM(cnt_value) AS n FROM wheelshare.shared")
      .collect()(0).getLong(0)
    val expClick = Q.t(spark, dir, "events")
      .filter(col("event_type") === "click")
      .filter(col("value").isNotNull).count()
    assert(nA == expClick, s"$nA vs $expClick")
    // the REPLACE left no tombstone/staging remnants
    val leftovers = Option(new java.io.File(root).list())
      .map(_.toSet).getOrElse(Set.empty)
    assert(leftovers == Set("shared"), leftovers)
    // B drops; A's SHOW TABLES observes the drop immediately
    b.sql("DROP TABLE wheelshare.shared")
    assert(a.sql("SHOW TABLES IN wheelshare").collect().isEmpty)
    assert(!a.catalog.tableExists("wheelshare.shared"))
  }

  test("wheel catalog: staging sweep is AGE-GUARDED — a concurrent " +
      "session's fresh staging dir survives, stale ones sweep " +
      "(round 17, ADVICE r16)") {
    val root = Files.createTempDirectory("graft_wheel_sweep").toString
    Q.t(spark, dir, "events").createOrReplaceTempView("ev_sweep_src")
    spark.conf.set("spark.sql.catalog.wheelsweep",
      "graft.sources.WheelTableCatalog")
    spark.conf.set("spark.sql.catalog.wheelsweep.root", root)
    try {
      // a FRESH foreign staging dir = another session's in-flight CTAS
      // for the same name; a STALE one = a crashed session; likewise a
      // stale REPLACE tombstone
      val fresh = new java.io.File(s"$root/.stage_t_fresh111")
      val stale = new java.io.File(s"$root/.stage_t_stale222")
      val tombStale = new java.io.File(s"$root/.old_t_stale333")
      Seq(fresh, stale, tombStale).foreach(f => assert(f.mkdirs()))
      val old = System.currentTimeMillis() - 2L * 60 * 60 * 1000
      assert(stale.setLastModified(old) && tombStale.setLastModified(old))
      spark.sql("CREATE TABLE wheelsweep.t AS SELECT ts, value FROM ev_sweep_src")
      val left = Option(new java.io.File(root).list())
        .map(_.toSet).getOrElse(Set.empty)
      // stale staging + stale tombstone swept; the CONCURRENT (fresh)
      // staging dir untouched; the table landed
      assert(left == Set("t", ".stage_t_fresh111"), left)
      // dot-dirs never list as tables
      assert(spark.sql("SHOW TABLES IN wheelsweep").collect()
        .map(_.getString(1)).toSeq == Seq("t"))
    } finally {
      spark.conf.unset("spark.sql.catalog.wheelsweep")
      spark.conf.unset("spark.sql.catalog.wheelsweep.root")
    }
  }
}
