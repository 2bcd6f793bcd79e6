package graft.streaming

import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.plans.WheelAcceleration
import graft.queries.Q

/** Live ingest + query (WheelIngest): each committed micro-batch both
  * lands in the parquet table AND refreshes the registered wheel, so
  * plain SQL keeps folding to plan-time constants that include the
  * just-ingested rows — µWheel's concurrent insert/advance + query
  * lifecycle (reference main.rs:105–144 / 205–225) on Structured
  * Streaming. */
class WheelIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixture(name: String): String = {
    val f = new java.io.File(s"target/test-fixtures/wheel-ingest/$name")
    org.apache.commons.io.FileUtils.deleteQuietly(f)
    f.getAbsolutePath
  }

  private val Min = 60000L

  private def rangeSql(path: String, a: Long, b: Long) = {
    // per-query read, the normal SQL-over-files pattern: both the fold
    // and the scan fallback see the newest committed files
    spark.read.parquet(path).createOrReplaceTempView("live_events")
    spark.sql("SELECT SUM(value) AS s, COUNT(*) AS n FROM live_events " +
      s"WHERE unix_millis(ts) >= $a AND unix_millis(ts) < $b")
  }

  private def folded(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan.collect { case l: LocalRelation => l }.nonEmpty

  test("SQL folds from the live index after every micro-batch, out-of-order included") {
    import spark.implicits._
    System.setProperty("graft.wheel.fingerprint.ttlMs", "0")
    val path = fixture("live/events.parquet")
    val ckpt = fixture("live/ckpt")
    val t0 = Q.Jan1

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val q = WheelIngest.start(mem.toDF().toDF("ts", "value"), path, ckpt)
    try {
      mem.addData((new java.sql.Timestamp(t0), 1.0),
        (new java.sql.Timestamp(t0 + Min), 2.0))
      q.processAllAvailable()
      val first = rangeSql(path, t0, t0 + 3 * Min)
      assert(folded(first), first.queryExecution.optimizedPlan.treeString)
      val r1 = first.collect()(0)
      assert(r1.getDouble(0) == 3.0 && r1.getLong(1) == 2L)

      // second batch: a new minute AND an out-of-order row landing in
      // the first batch's minute — the accumulator merges by slot, so
      // late data is first-class, not an error
      mem.addData((new java.sql.Timestamp(t0 + 2 * Min), 4.0),
        (new java.sql.Timestamp(t0 + 1), 10.0))
      q.processAllAvailable()
      val second = rangeSql(path, t0, t0 + 3 * Min)
      assert(folded(second))
      val r2 = second.collect()(0)
      assert(r2.getDouble(0) == 17.0 && r2.getLong(1) == 4L)

      // grouped folding works off the same live registration
      spark.read.parquet(path).createOrReplaceTempView("live_events")
      val grouped = spark.sql(
        s"SELECT (unix_millis(ts) div $Min) * $Min AS slot_ms, SUM(value) AS s, " +
          "STDDEV_POP(value) AS sd " +
          s"FROM live_events WHERE unix_millis(ts) >= $t0 " +
          s"AND unix_millis(ts) < ${t0 + 3 * Min} GROUP BY 1 ORDER BY 1")
      assert(folded(grouped))
      // the ingest accumulator carries the second moment too (round
      // 10): minute 0 holds {1.0, 10.0} merged ACROSS batches (the
      // late row), so its streamed stddev is exactly 4.5
      assert(grouped.collect().map(r =>
        (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq ==
        Seq((t0, 11.0, 4.5), (t0 + Min, 2.0, 0.0), (t0 + 2 * Min, 4.0, 0.0)))

      // an unaligned range folds HYBRID (round 9): whole-minute interior
      // from the live index, the sub-minute edge from a bounded scan of
      // the CURRENT files — still correct
      val unaligned = rangeSql(path, t0, t0 + 2 * Min + 1)
      assert(folded(unaligned), unaligned.queryExecution.optimizedPlan.treeString)
      assert(unaligned.collect()(0).getDouble(0) == 17.0)

      // per-aggregate CONDITIONAL windows fold off the STREAM-BUILT
      // wheel too (round 17, VERDICT r16 #8): the rewrite families are
      // registry-wide, so the batch-proven conditional fold serves a
      // live ingest registration unchanged
      spark.read.parquet(path).createOrReplaceTempView("live_events")
      val cond = spark.sql(
        s"SELECT SUM(CASE WHEN unix_millis(ts) < ${t0 + Min} THEN value END) AS w1, " +
          s"SUM(value) FILTER (WHERE unix_millis(ts) >= ${t0 + Min}) AS w2, " +
          "COUNT(*) AS n FROM live_events " +
          s"WHERE unix_millis(ts) >= $t0 AND unix_millis(ts) < ${t0 + 3 * Min}")
      assert(folded(cond), cond.queryExecution.optimizedPlan.treeString)
      val rc = cond.collect()(0)
      assert(rc.getDouble(0) == 11.0 && rc.getDouble(1) == 6.0 &&
        rc.getLong(2) == 4L, rc.toString)
      // ... and the GROUPED conditional with a SUB-MINUTE per-aggregate
      // edge rides the round-17 grouped residue hybrid over the live
      // index: minute partials from the accumulator, the sliver from a
      // bounded scan of the CURRENT files. Minute t0 holds {1.0@t0,
      // 10.0@t0+1ms}: the window [t0+1ms, …) keeps only the late row.
      val gcond = spark.sql(
        s"SELECT (unix_millis(ts) div $Min) * $Min AS slot_ms, " +
          s"SUM(CASE WHEN unix_millis(ts) >= ${t0 + 1} " +
          s"AND unix_millis(ts) < ${t0 + 2 * Min - 1} THEN value END) AS w, " +
          "COUNT(*) AS n FROM live_events " +
          s"WHERE unix_millis(ts) >= $t0 AND unix_millis(ts) < ${t0 + 3 * Min} " +
          "GROUP BY 1 ORDER BY 1")
      assert(folded(gcond), gcond.queryExecution.optimizedPlan.treeString)
      assert(gcond.collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getDouble(1), r.getLong(2))).toSeq ==
        Seq((t0, 10.0, 2L), (t0 + Min, 2.0, 1L), (t0 + 2 * Min, null, 1L)))

      // the SLIDING window() spelling folds off the same live
      // registration (round 10) — the rewrite surface is registry-wide,
      // not batch-build-specific
      spark.read.parquet(path).createOrReplaceTempView("live_events")
      val sliding = spark.sql(
        "SELECT unix_millis(window.start) AS ws, SUM(value) AS s, COUNT(*) AS n " +
          s"FROM live_events WHERE unix_millis(ts) >= $t0 " +
          s"AND unix_millis(ts) < ${t0 + 3 * Min} " +
          "GROUP BY window(ts, '2 minutes', '1 minute') ORDER BY 1")
      assert(folded(sliding), sliding.queryExecution.optimizedPlan.treeString)
      assert(sliding.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq ==
        Seq((t0 - Min, 11.0, 2L), (t0, 13.0, 3L), (t0 + Min, 6.0, 2L),
          (t0 + 2 * Min, 4.0, 1L)))

      // ... and the SLIDING CONDITIONAL hybrid (round 17) serves the
      // live registration too: a SUB-MINUTE per-aggregate condition
      // (≥ t0+1ms) folds interior minutes from the stream-built
      // accumulator and the [t0+1ms, t0+1min) sliver from a bounded
      // scan of the CURRENT files — the late 10.0@t0+1ms row sits
      // exactly ON the condition edge
      val slidingCond = spark.sql(
        "SELECT unix_millis(window.start) AS ws, " +
          s"SUM(value) FILTER (WHERE unix_millis(ts) >= ${t0 + 1}) AS w, " +
          "COUNT(*) AS n " +
          s"FROM live_events WHERE unix_millis(ts) >= $t0 " +
          s"AND unix_millis(ts) < ${t0 + 3 * Min} " +
          "GROUP BY window(ts, '2 minutes', '1 minute') ORDER BY 1")
      assert(folded(slidingCond),
        slidingCond.queryExecution.optimizedPlan.treeString)
      assert(slidingCond.collect().map(r =>
        (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq ==
        Seq((t0 - Min, 10.0, 2L), (t0, 12.0, 3L), (t0 + Min, 6.0, 2L),
          (t0 + 2 * Min, 4.0, 1L)))

      // ABOVE-CAP sliding with SUB-MINUTE edges folds hybrid-distributed
      // off the same live registration (late round 11): the live
      // minute state ships through the original Expand as the interior
      // union leg, the edge rows re-expand over a bounded scan of the
      // CURRENT files
      spark.conf.set("spark.graft.wheel.rewrite.maxFoldRows", "1")
      try {
        val hybridCap = spark.sql(
          "SELECT unix_millis(window.start) AS ws, SUM(value) AS s, COUNT(*) AS n " +
            s"FROM live_events WHERE unix_millis(ts) >= ${t0 + 1} " +
            s"AND unix_millis(ts) < ${t0 + 3 * Min - 1} " +
            "GROUP BY window(ts, '2 minutes', '1 minute') ORDER BY 1")
        assert(folded(hybridCap), hybridCap.queryExecution.optimizedPlan.treeString)
        assert(hybridCap.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq ==
          Seq((t0 - Min, 10.0, 1L), (t0, 12.0, 2L), (t0 + Min, 6.0, 2L),
            (t0 + 2 * Min, 4.0, 1L)))
      } finally spark.conf.unset("spark.graft.wheel.rewrite.maxFoldRows")

      // the NO-PREDICATE full-span fold (round 11) holds MID-INGEST:
      // the live span [base, horizon) covers exactly the committed
      // batches (covered-file tokens), so `SELECT agg FROM t` with no
      // WHERE folds to the running totals — and keeps up as the
      // horizon advances with the next batch
      spark.read.parquet(path).createOrReplaceTempView("live_events")
      val total = spark.sql(
        "SELECT SUM(value) AS s, COUNT(*) AS n FROM live_events")
      assert(folded(total), total.queryExecution.optimizedPlan.treeString)
      val rt = total.collect()(0)
      assert(rt.getDouble(0) == 17.0 && rt.getLong(1) == 4L)

      mem.addData((new java.sql.Timestamp(t0 + 10 * Min), 100.0))
      q.processAllAvailable()
      spark.read.parquet(path).createOrReplaceTempView("live_events")
      val total2 = spark.sql(
        "SELECT SUM(value) AS s, COUNT(*) AS n FROM live_events")
      assert(folded(total2), total2.queryExecution.optimizedPlan.treeString)
      val rt2 = total2.collect()(0)
      assert(rt2.getDouble(0) == 117.0 && rt2.getLong(1) == 5L)
    } finally {
      q.stop()
      WheelAcceleration.unregister(path)
    }
  }

  test("a 2-measure ingest folds mixed-measure SQL from the live registration (round 8)") {
    import spark.implicits._
    System.setProperty("graft.wheel.fingerprint.ttlMs", "0")
    val path = fixture("multi/events.parquet")
    val ckpt = fixture("multi/ckpt")
    val t0 = Q.Jan1

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double, Double)]
    val q = WheelIngest.start(mem.toDF().toDF("ts", "value", "qty"), path, ckpt,
      valueCols = Seq("value", "qty"))
    def mixedSql() = {
      spark.read.parquet(path).createOrReplaceTempView("live_events")
      spark.sql("SELECT SUM(value) AS s, AVG(qty) AS aq, MAX(qty) AS mq, " +
        s"COUNT(*) AS n FROM live_events WHERE unix_millis(ts) >= $t0 " +
        s"AND unix_millis(ts) < ${t0 + 3 * Min}")
    }
    try {
      mem.addData((new java.sql.Timestamp(t0), 1.0, 10.0),
        (new java.sql.Timestamp(t0 + Min), 2.0, 20.0))
      q.processAllAvailable()
      val first = mixedSql()
      assert(folded(first), first.queryExecution.optimizedPlan.treeString)
      val r1 = first.collect()(0)
      assert(r1.getDouble(0) == 3.0 && r1.getDouble(1) == 15.0 &&
        r1.getDouble(2) == 20.0 && r1.getLong(3) == 2L)

      // the next batch must advance BOTH measures' wheels
      mem.addData((new java.sql.Timestamp(t0 + 2 * Min), 4.0, 40.0))
      q.processAllAvailable()
      val second = mixedSql()
      assert(folded(second))
      val r2 = second.collect()(0)
      assert(r2.getDouble(0) == 7.0 && r2.getDouble(1) == 70.0 / 3 &&
        r2.getDouble(2) == 40.0 && r2.getLong(3) == 3L)
    } finally {
      q.stop()
      WheelAcceleration.unregister(path)
    }
  }

  test("a restarted ingest bootstraps the accumulated history from the table") {
    import spark.implicits._
    System.setProperty("graft.wheel.fingerprint.ttlMs", "0")
    val path = fixture("restart/events.parquet")
    val t0 = Q.Jan1

    implicit val sc = spark.sqlContext
    val mem1 = MemoryStream[(java.sql.Timestamp, Double)]
    val q1 = WheelIngest.start(mem1.toDF().toDF("ts", "value"), path, fixture("restart/ckpt1"))
    try {
      mem1.addData((new java.sql.Timestamp(t0), 1.0),
        (new java.sql.Timestamp(t0 + Min), 2.0))
      q1.processAllAvailable()
    } finally q1.stop()
    WheelAcceleration.unregister(path)

    // a NEW ingest over the same table must serve [history + new rows]
    val mem2 = MemoryStream[(java.sql.Timestamp, Double)]
    val q2 = WheelIngest.start(mem2.toDF().toDF("ts", "value"), path, fixture("restart/ckpt2"))
    try {
      // bootstrap alone already serves the history
      val boot = rangeSql(path, t0, t0 + 3 * Min)
      assert(folded(boot))
      assert(boot.collect()(0).getDouble(0) == 3.0)

      mem2.addData((new java.sql.Timestamp(t0 + 2 * Min), 4.0))
      q2.processAllAvailable()
      val after = rangeSql(path, t0, t0 + 3 * Min)
      assert(folded(after))
      val r = after.collect()(0)
      assert(r.getDouble(0) == 7.0 && r.getLong(1) == 3L)
    } finally {
      q2.stop()
      WheelAcceleration.unregister(path)
    }
  }

  test("a persisted ingest restarts by aggregating ONLY the tail files (round 9)") {
    import spark.implicits._
    System.setProperty("graft.wheel.fingerprint.ttlMs", "0")
    val path = fixture("persist/events.parquet")
    val persistDir = fixture("persist/index")
    val t0 = Q.Jan1

    implicit val sc = spark.sqlContext
    val mem1 = MemoryStream[(java.sql.Timestamp, Double)]
    val q1 = WheelIngest.start(mem1.toDF().toDF("ts", "value"), path,
      fixture("persist/ckpt1"), persistDir = Some(persistDir))
    try {
      mem1.addData((new java.sql.Timestamp(t0), 1.0),
        (new java.sql.Timestamp(t0 + Min), 2.0))
      q1.processAllAvailable()
    } finally q1.stop()
    WheelAcceleration.unregister(path)

    // downtime writes: rows landing in the table while no ingest runs —
    // the restart must pick them up WITHOUT re-reading the history
    val preFiles = listDataFiles(path)
    Seq((new java.sql.Timestamp(t0 + 2 * Min), 4.0))
      .toDF("ts", "value").write.mode("append").parquet(path)
    val tailFiles = listDataFiles(path) -- preFiles

    val mem2 = MemoryStream[(java.sql.Timestamp, Double)]
    val q2 = WheelIngest.start(mem2.toDF().toDF("ts", "value"), path,
      fixture("persist/ckpt2"), persistDir = Some(persistDir))
    try {
      // the bootstrap proved coverage and read ONLY the downtime files
      val report = WheelIngest.lastBootstrap(path).get
      assert(report.coveredFiles > 0, report)
      assert(report.tailFiles.toSet == tailFiles, report)

      // and the served answer still spans [history + downtime rows]
      val boot = rangeSql(path, t0, t0 + 3 * Min)
      assert(folded(boot))
      val r0 = boot.collect()(0)
      assert(r0.getDouble(0) == 7.0 && r0.getLong(1) == 3L)

      // live batches keep extending the restarted index
      mem2.addData((new java.sql.Timestamp(t0 + 2 * Min), 8.0))
      q2.processAllAvailable()
      val after = rangeSql(path, t0, t0 + 3 * Min)
      assert(folded(after))
      val r = after.collect()(0)
      assert(r.getDouble(0) == 15.0 && r.getLong(1) == 4L)
    } finally {
      q2.stop()
      WheelAcceleration.unregister(path)
    }

    // no usable checkpoint (absent dir) → the start falls back to the
    // full-history aggregation: the fast path never trades correctness
    val meta = graft.wheel.PersistentWheel.peek(spark, persistDir).get
    assert(meta.valueCols == Seq("value"))
    val mem3 = MemoryStream[(java.sql.Timestamp, Double)]
    val q3 = WheelIngest.start(mem3.toDF().toDF("ts", "value"), path,
      fixture("persist/ckpt3"), valueCols = Seq("value"),
      persistDir = Some(fixture("persist/absent-index")))
    try {
      val report = WheelIngest.lastBootstrap(path).get
      assert(report.coveredFiles == 0, report)
      assert(report.tailFiles.toSet == listDataFiles(path), report)
      val boot = rangeSql(path, t0, t0 + 3 * Min)
      assert(folded(boot))
      val r = boot.collect()(0)
      assert(r.getDouble(0) == 15.0 && r.getLong(1) == 4L)
    } finally {
      q3.stop()
      WheelAcceleration.unregister(path)
    }
  }

  test("the ingest checkpoint doubles as a batch registerPersisted dir (interop)") {
    import spark.implicits._
    System.setProperty("graft.wheel.fingerprint.ttlMs", "0")
    val path = fixture("interop/events.parquet")
    val persistDir = fixture("interop/index")
    val t0 = Q.Jan1

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val q = WheelIngest.start(mem.toDF().toDF("ts", "value"), path,
      fixture("interop/ckpt"), persistDir = Some(persistDir))
    try {
      mem.addData((new java.sql.Timestamp(t0), 1.0),
        (new java.sql.Timestamp(t0 + Min), 2.0))
      q.processAllAvailable()
    } finally q.stop()
    WheelAcceleration.unregister(path)

    // a BATCH session registers from the ingest's checkpoint: the
    // fingerprint matches the files the last persist covered, so this
    // is a pure O(slots) load — no source aggregation — and SQL folds
    val wheels = WheelAcceleration.registerPersisted(
      spark, path, persistDir, spark.read.parquet(path))
    assert(wheels.contains("value"))
    val meta = graft.wheel.PersistentWheel.peek(spark, persistDir).get
    assert(meta.sourcePath == path)
    try {
      val df = rangeSql(path, t0, t0 + 2 * Min)
      assert(folded(df), df.queryExecution.optimizedPlan.treeString)
      val r = df.collect()(0)
      assert(r.getDouble(0) == 3.0 && r.getLong(1) == 2L)
    } finally WheelAcceleration.unregister(path)
  }

  test("a keyed ingest folds GROUP BY (key, slot) SQL live, incl. restart (round 9)") {
    import spark.implicits._
    System.setProperty("graft.wheel.fingerprint.ttlMs", "0")
    val path = fixture("keyed/events.parquet")
    val t0 = Q.Jan1

    def keyedSql() = {
      spark.read.parquet(path).createOrReplaceTempView("live_events")
      spark.sql(
        s"SELECT event_type, (unix_millis(ts) div $Min) * $Min AS slot_ms, " +
          s"SUM(value) AS s, COUNT(*) AS n FROM live_events " +
          s"WHERE unix_millis(ts) >= $t0 AND unix_millis(ts) < ${t0 + 3 * Min} " +
          s"GROUP BY 1, 2 ORDER BY 1, 2")
    }

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val q = WheelIngest.start(mem.toDF().toDF("ts", "event_type", "value"),
      path, fixture("keyed/ckpt"), keyCol = Some("event_type"))
    try {
      mem.addData((new java.sql.Timestamp(t0), "click", 1.0),
        (new java.sql.Timestamp(t0 + Min), "view", 2.0))
      q.processAllAvailable()
      val first = keyedSql()
      assert(folded(first), first.queryExecution.optimizedPlan.treeString)
      assert(first.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq ==
        Seq(("click", t0, 1.0, 1L), ("view", t0 + Min, 2.0, 1L)))

      // a second batch extends an existing key AND adds a new one
      mem.addData((new java.sql.Timestamp(t0 + Min + 1), "click", 4.0),
        (new java.sql.Timestamp(t0 + 2 * Min), "purchase", 8.0))
      q.processAllAvailable()
      val second = keyedSql()
      assert(folded(second))
      assert(second.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq ==
        Seq(("click", t0, 1.0, 1L), ("click", t0 + Min, 4.0, 1L),
          ("purchase", t0 + 2 * Min, 8.0, 1L), ("view", t0 + Min, 2.0, 1L)))

      // the UNKEYED live registration still serves ungrouped folds
      val ungrouped = rangeSql(path, t0, t0 + 3 * Min)
      assert(folded(ungrouped))
      val r = ungrouped.collect()(0)
      assert(r.getDouble(0) == 15.0 && r.getLong(1) == 4L)

      // KEYED-GROUPED conditional with a sub-minute per-aggregate edge
      // folds off the LIVE keyed registration too (round 17): the
      // (key, minute) partials from the streaming accumulator + the
      // sliver from a bounded scan of the CURRENT files. The window
      // starts at t0+Min+1ms: click's late row (exactly there) is kept,
      // view's row at exactly t0+Min falls 1 ms short — per-key NULLs.
      spark.read.parquet(path).createOrReplaceTempView("live_events")
      val kcond = spark.sql(
        s"SELECT event_type, (unix_millis(ts) div $Min) * $Min AS slot_ms, " +
          s"SUM(CASE WHEN unix_millis(ts) >= ${t0 + Min + 1} " +
          s"THEN value END) AS w, COUNT(*) AS n FROM live_events " +
          s"WHERE unix_millis(ts) >= $t0 AND unix_millis(ts) < ${t0 + 3 * Min} " +
          "GROUP BY 1, 2 ORDER BY 1, 2")
      assert(folded(kcond), kcond.queryExecution.optimizedPlan.treeString)
      assert(kcond.collect().map(r2 => (r2.getString(0), r2.getLong(1),
        if (r2.isNullAt(2)) null else r2.getDouble(2), r2.getLong(3))).toSeq ==
        Seq(("click", t0, null, 1L), ("click", t0 + Min, 4.0, 1L),
          ("purchase", t0 + 2 * Min, 8.0, 1L), ("view", t0 + Min, null, 1L)))
    } finally {
      q.stop()
      WheelAcceleration.unregister(path)
    }

    // restart: the keyed bootstrap re-aggregates the table history
    val mem2 = MemoryStream[(java.sql.Timestamp, String, Double)]
    val q2 = WheelIngest.start(mem2.toDF().toDF("ts", "event_type", "value"),
      path, fixture("keyed/ckpt2"), keyCol = Some("event_type"))
    try {
      val boot = keyedSql()
      assert(folded(boot), boot.queryExecution.optimizedPlan.treeString)
      assert(boot.collect().length == 4)
    } finally {
      q2.stop()
      WheelAcceleration.unregister(path)
    }
  }

  test("a persisted KEYED ingest also restarts tail-only (round 9)") {
    import spark.implicits._
    System.setProperty("graft.wheel.fingerprint.ttlMs", "0")
    val path = fixture("keyed-persist/events.parquet")
    val persistDir = fixture("keyed-persist/index")
    val t0 = Q.Jan1

    implicit val sc = spark.sqlContext
    val mem1 = MemoryStream[(java.sql.Timestamp, String, Double)]
    val q1 = WheelIngest.start(mem1.toDF().toDF("ts", "event_type", "value"),
      path, fixture("keyed-persist/ckpt1"),
      persistDir = Some(persistDir), keyCol = Some("event_type"))
    try {
      mem1.addData((new java.sql.Timestamp(t0), "click", 1.0),
        (new java.sql.Timestamp(t0 + Min), "view", 2.0))
      q1.processAllAvailable()
    } finally q1.stop()
    WheelAcceleration.unregister(path)
    // both sidecars exist: the sum family at the top, keyed nested
    assert(graft.wheel.PersistentWheel.peek(spark, persistDir).get.kind ==
      graft.wheel.PersistentWheel.SumKind)
    assert(graft.wheel.PersistentWheel.peek(spark, s"$persistDir/keyed").get.kind ==
      graft.wheel.PersistentWheel.KeyedMultiKind)

    // downtime write, then restart: BOTH families read only the tail
    val preFiles = listDataFiles(path)
    Seq((new java.sql.Timestamp(t0 + 2 * Min), "click", 4.0))
      .toDF("ts", "event_type", "value").write.mode("append").parquet(path)
    val tailFiles = listDataFiles(path) -- preFiles

    val mem2 = MemoryStream[(java.sql.Timestamp, String, Double)]
    val q2 = WheelIngest.start(mem2.toDF().toDF("ts", "event_type", "value"),
      path, fixture("keyed-persist/ckpt2"),
      persistDir = Some(persistDir), keyCol = Some("event_type"))
    try {
      val report = WheelIngest.lastBootstrap(path).get
      assert(report.coveredFiles > 0 && report.keyedCoveredFiles > 0, report)
      assert(report.tailFiles.toSet == tailFiles, report)
      assert(report.keyedTailFiles.toSet == tailFiles, report)

      spark.read.parquet(path).createOrReplaceTempView("live_events")
      val keyed = spark.sql(
        s"SELECT event_type, (unix_millis(ts) div $Min) * $Min AS slot_ms, " +
          s"SUM(value) AS s FROM live_events " +
          s"WHERE unix_millis(ts) >= $t0 AND unix_millis(ts) < ${t0 + 3 * Min} " +
          s"GROUP BY 1, 2 ORDER BY 1, 2")
      assert(folded(keyed), keyed.queryExecution.optimizedPlan.treeString)
      assert(keyed.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
        Seq(("click", t0, 1.0), ("click", t0 + 2 * Min, 4.0),
          ("view", t0 + Min, 2.0)))
    } finally {
      q2.stop()
      WheelAcceleration.unregister(path)
    }
  }

  test("a 2-measure KEYED ingest folds mixed-measure GROUP BY (key, slot) live (round 10)") {
    import spark.implicits._
    System.setProperty("graft.wheel.fingerprint.ttlMs", "0")
    val path = fixture("keyed-multi/events.parquet")
    val t0 = Q.Jan1

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double, Double)]
    val q = WheelIngest.start(
      mem.toDF().toDF("ts", "event_type", "value", "qty"),
      path, fixture("keyed-multi/ckpt"),
      valueCols = Seq("value", "qty"), keyCol = Some("event_type"))
    def mixedKeyedSql() = {
      spark.read.parquet(path).createOrReplaceTempView("live_events")
      spark.sql(
        s"SELECT event_type, (unix_millis(ts) div $Min) * $Min AS slot_ms, " +
          "SUM(value) AS s, AVG(qty) AS aq, MAX(qty) AS mq, COUNT(*) AS n " +
          s"FROM live_events WHERE unix_millis(ts) >= $t0 " +
          s"AND unix_millis(ts) < ${t0 + 3 * Min} GROUP BY 1, 2 ORDER BY 1, 2")
    }
    try {
      mem.addData((new java.sql.Timestamp(t0), "click", 1.0, 10.0),
        (new java.sql.Timestamp(t0 + Min), "view", 2.0, 20.0))
      q.processAllAvailable()
      val first = mixedKeyedSql()
      assert(folded(first), first.queryExecution.optimizedPlan.treeString)
      assert(first.collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5))).toSeq ==
        Seq(("click", t0, 1.0, 10.0, 10.0, 1L),
          ("view", t0 + Min, 2.0, 20.0, 20.0, 1L)))

      // a second batch extends a key's minute with BOTH measures live
      mem.addData((new java.sql.Timestamp(t0 + 1000), "click", 4.0, 30.0))
      q.processAllAvailable()
      val second = mixedKeyedSql()
      assert(folded(second))
      assert(second.collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5))).toSeq ==
        Seq(("click", t0, 5.0, 20.0, 30.0, 2L),
          ("view", t0 + Min, 2.0, 20.0, 20.0, 1L)))
    } finally {
      q.stop()
      WheelAcceleration.unregister(path)
    }
  }

  test("approx SQL spellings fold LIVE from the sketch accumulators (round 11)") {
    import spark.implicits._
    System.setProperty("graft.wheel.fingerprint.ttlMs", "0")
    val path = fixture("sketch/events.parquet")
    val ckpt = fixture("sketch/ckpt")
    val t0 = Q.Jan1
    def ts(ms: Long) = new java.sql.Timestamp(ms)

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double, Long)]
    val q = WheelIngest.start(mem.toDF().toDF("ts", "value", "user_id"),
      path, ckpt,
      sketches = WheelIngest.SketchSpec(
        distinctCols = Seq("user_id"), quantileCols = Seq("value"),
        freqCols = Seq("user_id")))
    def sql(stmt: String) = {
      spark.read.parquet(path).createOrReplaceTempView("live_sk")
      spark.sql(stmt)
    }
    try {
      mem.addData((ts(t0), 1.0, 101L), (ts(t0 + Min), 2.0, 102L))
      q.processAllAvailable()
      val d1 = sql("SELECT approx_count_distinct(user_id) AS u FROM live_sk " +
        s"WHERE unix_millis(ts) >= $t0 AND unix_millis(ts) < ${t0 + 3 * Min}")
      assert(folded(d1), d1.queryExecution.optimizedPlan.treeString)
      assert(d1.collect()(0).getLong(0) == 2L)

      // second batch: a repeat user and a new one — the next fold must
      // reflect the just-ingested rows
      mem.addData((ts(t0 + 2 * Min), 4.0, 101L),
        (ts(t0 + 2 * Min + 1000), 10.0, 103L))
      q.processAllAvailable()
      val d2 = sql("SELECT approx_count_distinct(user_id) AS u FROM live_sk " +
        s"WHERE unix_millis(ts) >= $t0 AND unix_millis(ts) < ${t0 + 3 * Min}")
      assert(folded(d2))
      assert(d2.collect()(0).getLong(0) == 3L)

      // live Misra-Gries top-k: 101 appears twice across batches
      val tk = sql("SELECT t.item AS user_id, t.count AS n " +
        "FROM (SELECT explode(approx_top_k(user_id, 2)) AS t FROM live_sk " +
        s"WHERE unix_millis(ts) >= $t0 AND unix_millis(ts) < ${t0 + 3 * Min}) " +
        "ORDER BY n DESC, user_id")
      assert(folded(tk), tk.queryExecution.optimizedPlan.treeString)
      assert(tk.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
        Seq((101L, 2L), (102L, 1L)))

      // live KLL median (exact regime) vs percentile_disc over the files
      val p = sql("SELECT percentile_approx(value, 0.5) AS p50 FROM live_sk " +
        s"WHERE unix_millis(ts) >= $t0 AND unix_millis(ts) < ${t0 + 3 * Min}")
      assert(folded(p))
      val disc = spark.read.parquet(path)
        .filter(org.apache.spark.sql.functions.unix_millis(
          org.apache.spark.sql.functions.col("ts")).between(t0, t0 + 3 * Min - 1))
        .select(org.apache.spark.sql.functions.expr(
          "percentile_disc(0.5) WITHIN GROUP (ORDER BY value)"))
        .collect()(0).getDouble(0)
      assert(p.collect()(0).getDouble(0) == disc)
    } finally {
      q.stop()
      WheelAcceleration.unregister(path)
    }
  }

  test("KEYED approx spellings fold LIVE from keyed sketch accumulators (late round 11)") {
    import spark.implicits._
    System.setProperty("graft.wheel.fingerprint.ttlMs", "0")
    val path = fixture("keyedsketch/events.parquet")
    val t0 = Q.Jan1

    def keyedSql() = {
      spark.read.parquet(path).createOrReplaceTempView("live_ksk")
      spark.sql(
        s"SELECT event_type AS g0, (unix_millis(ts) div $Min) * $Min AS g1, " +
          "approx_count_distinct(user_id) AS u, COUNT(*) AS n FROM live_ksk " +
          s"WHERE unix_millis(ts) >= $t0 AND unix_millis(ts) < ${t0 + 3 * Min} " +
          "GROUP BY 1, 2 ORDER BY 1, 2")
    }

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double, Long)]
    val q = WheelIngest.start(
      mem.toDF().toDF("ts", "event_type", "value", "user_id"),
      path, fixture("keyedsketch/ckpt"), keyCol = Some("event_type"),
      sketches = WheelIngest.SketchSpec(keyedDistinctCols = Seq("user_id")))
    try {
      mem.addData(
        (new java.sql.Timestamp(t0), "click", 1.0, 101L),
        (new java.sql.Timestamp(t0 + 1000), "click", 2.0, 102L),
        (new java.sql.Timestamp(t0 + Min), "view", 3.0, 101L))
      q.processAllAvailable()
      val first = keyedSql()
      assert(folded(first), first.queryExecution.optimizedPlan.treeString)
      assert(first.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
        Seq(("click", t0, 2L, 2L), ("view", t0 + Min, 1L, 1L)))

      // second batch: a repeat user for click (distinct unchanged) and
      // a brand-new key — the next fold must reflect BOTH live
      mem.addData(
        (new java.sql.Timestamp(t0 + 2000), "click", 4.0, 101L),
        (new java.sql.Timestamp(t0 + 2 * Min), "purchase", 8.0, 103L))
      q.processAllAvailable()
      val second = keyedSql()
      assert(folded(second), second.queryExecution.optimizedPlan.treeString)
      assert(second.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
        Seq(("click", t0, 2L, 3L), ("purchase", t0 + 2 * Min, 1L, 1L),
          ("view", t0 + Min, 1L, 1L)))
    } finally {
      q.stop()
      WheelAcceleration.unregister(path)
    }
  }

  test("a TORN ingest checkpoint falls back to the full-history aggregation (round 10)") {
    import spark.implicits._
    System.setProperty("graft.wheel.fingerprint.ttlMs", "0")
    val path = fixture("torn/events.parquet")
    val persistDir = fixture("torn/index")
    val t0 = Q.Jan1

    implicit val sc = spark.sqlContext
    val mem1 = MemoryStream[(java.sql.Timestamp, Double)]
    val q1 = WheelIngest.start(mem1.toDF().toDF("ts", "value"), path,
      fixture("torn/ckpt1"), persistDir = Some(persistDir))
    try {
      mem1.addData((new java.sql.Timestamp(t0), 1.0),
        (new java.sql.Timestamp(t0 + Min), 2.0))
      q1.processAllAvailable()
    } finally q1.stop()
    WheelAcceleration.unregister(path)

    // tear the checkpoint: wipe the CURRENT slots payload (resolved via
    // the sidecar — round 11's atomic save names it slots-<uuid>) but
    // leave the sidecar — a disk-loss/tamper shape the atomic swap
    // cannot prevent; the coverage PROOF still validates, but the
    // partials cannot load
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      s"$persistDir/${graft.wheel.PersistentWheel.peek(spark, persistDir).get.slotsDir}"))

    val mem2 = MemoryStream[(java.sql.Timestamp, Double)]
    val q2 = WheelIngest.start(mem2.toDF().toDF("ts", "value"), path,
      fixture("torn/ckpt2"), persistDir = Some(persistDir))
    try {
      // the bootstrap fell back: nothing counted as covered, the whole
      // table re-aggregated — and the served answer is still right
      val report = WheelIngest.lastBootstrap(path).get
      assert(report.coveredFiles == 0, report)
      assert(report.tailFiles.toSet == listDataFiles(path), report)
      val boot = rangeSql(path, t0, t0 + 3 * Min)
      assert(folded(boot))
      val r = boot.collect()(0)
      assert(r.getDouble(0) == 3.0 && r.getLong(1) == 2L)
    } finally {
      q2.stop()
      WheelAcceleration.unregister(path)
    }
  }

  test("a file appended by a FOREIGN writer mid-ingest is never claimed covered (round 10)") {
    import spark.implicits._
    System.setProperty("graft.wheel.fingerprint.ttlMs", "0")
    val path = fixture("foreign/events.parquet")
    val persistDir = fixture("foreign/index")
    val t0 = Q.Jan1

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val q = WheelIngest.start(mem.toDF().toDF("ts", "value"), path,
      fixture("foreign/ckpt"), persistDir = Some(persistDir))
    try {
      mem.addData((new java.sql.Timestamp(t0), 1.0))
      q.processAllAvailable()
      // a foreign writer appends rows the accumulator never folded
      Seq((new java.sql.Timestamp(t0 + Min), 100.0))
        .toDF("ts", "value").write.mode("append").parquet(path)

      // the live registration's fingerprint is the COVERED set, which
      // excludes the foreign file → freshness fails → scan path → the
      // answer INCLUDES the foreign rows (correct, not fast)
      val df = rangeSql(path, t0, t0 + 3 * Min)
      assert(!folded(df), df.queryExecution.optimizedPlan.treeString)
      val r = df.collect()(0)
      assert(r.getDouble(0) == 101.0 && r.getLong(1) == 2L)
    } finally {
      q.stop()
      WheelAcceleration.unregister(path)
    }

    // restart: the persisted fingerprint likewise excludes the foreign
    // file, so it lands in the TAIL and is aggregated — never skipped
    val mem2 = MemoryStream[(java.sql.Timestamp, Double)]
    val q2 = WheelIngest.start(mem2.toDF().toDF("ts", "value"), path,
      fixture("foreign/ckpt2"), persistDir = Some(persistDir))
    try {
      val report = WheelIngest.lastBootstrap(path).get
      assert(report.coveredFiles > 0 && report.tailFiles.nonEmpty, report)
      val boot = rangeSql(path, t0, t0 + 3 * Min)
      assert(folded(boot), boot.queryExecution.optimizedPlan.treeString)
      val r = boot.collect()(0)
      assert(r.getDouble(0) == 101.0 && r.getLong(1) == 2L)
    } finally {
      q2.stop()
      WheelAcceleration.unregister(path)
    }
  }

  test("a 2-measure KEYED ingest restarts tail-only through the keyedmulti sidecar (round 10)") {
    import spark.implicits._
    System.setProperty("graft.wheel.fingerprint.ttlMs", "0")
    val path = fixture("keyed-multi-persist/events.parquet")
    val persistDir = fixture("keyed-multi-persist/index")
    val t0 = Q.Jan1

    implicit val sc = spark.sqlContext
    val mem1 = MemoryStream[(java.sql.Timestamp, String, Double, Double)]
    val q1 = WheelIngest.start(
      mem1.toDF().toDF("ts", "event_type", "value", "qty"),
      path, fixture("keyed-multi-persist/ckpt1"),
      valueCols = Seq("value", "qty"),
      persistDir = Some(persistDir), keyCol = Some("event_type"))
    try {
      mem1.addData((new java.sql.Timestamp(t0), "click", 1.0, 10.0),
        (new java.sql.Timestamp(t0 + Min), "view", 2.0, 20.0))
      q1.processAllAvailable()
    } finally q1.stop()
    WheelAcceleration.unregister(path)
    val meta = graft.wheel.PersistentWheel.peek(spark, s"$persistDir/keyed").get
    assert(meta.kind == graft.wheel.PersistentWheel.KeyedMultiKind)
    assert(meta.valueCols == Seq("event_type", "value", "qty"))

    // downtime write, then restart: the keyed family proves coverage
    // and reads only the tail, with BOTH measures live after
    val preFiles = listDataFiles(path)
    Seq((new java.sql.Timestamp(t0 + 2 * Min), "click", 4.0, 40.0))
      .toDF("ts", "event_type", "value", "qty")
      .write.mode("append").parquet(path)
    val tailFiles = listDataFiles(path) -- preFiles

    val mem2 = MemoryStream[(java.sql.Timestamp, String, Double, Double)]
    val q2 = WheelIngest.start(
      mem2.toDF().toDF("ts", "event_type", "value", "qty"),
      path, fixture("keyed-multi-persist/ckpt2"),
      valueCols = Seq("value", "qty"),
      persistDir = Some(persistDir), keyCol = Some("event_type"))
    try {
      val report = WheelIngest.lastBootstrap(path).get
      assert(report.keyedCoveredFiles > 0, report)
      assert(report.keyedTailFiles.toSet == tailFiles, report)

      spark.read.parquet(path).createOrReplaceTempView("live_events")
      val mixed = spark.sql(
        s"SELECT event_type, (unix_millis(ts) div $Min) * $Min AS slot_ms, " +
          "SUM(value) AS s, MAX(qty) AS mq, COUNT(*) AS n FROM live_events " +
          s"WHERE unix_millis(ts) >= $t0 AND unix_millis(ts) < ${t0 + 3 * Min} " +
          "GROUP BY 1, 2 ORDER BY 1, 2")
      assert(folded(mixed), mixed.queryExecution.optimizedPlan.treeString)
      assert(mixed.collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getLong(4))).toSeq ==
        Seq(("click", t0, 1.0, 10.0, 1L), ("click", t0 + 2 * Min, 4.0, 40.0, 1L),
          ("view", t0 + Min, 2.0, 20.0, 1L)))
    } finally {
      q2.stop()
      WheelAcceleration.unregister(path)
    }
  }

  test("a keyed ingest checkpoint doubles as a batch registerPersistedKeyedMulti dir (round 10)") {
    import spark.implicits._
    System.setProperty("graft.wheel.fingerprint.ttlMs", "0")
    val path = fixture("keyed-interop/events.parquet")
    val persistDir = fixture("keyed-interop/index")
    val t0 = Q.Jan1

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double, Double)]
    val q = WheelIngest.start(
      mem.toDF().toDF("ts", "event_type", "value", "qty"),
      path, fixture("keyed-interop/ckpt"),
      valueCols = Seq("value", "qty"),
      persistDir = Some(persistDir), keyCol = Some("event_type"))
    try {
      mem.addData((new java.sql.Timestamp(t0), "click", 1.0, 10.0),
        (new java.sql.Timestamp(t0 + Min), "view", 2.0, 20.0))
      q.processAllAvailable()
    } finally q.stop()
    WheelAcceleration.unregister(path)

    // a BATCH session registers every measure's keyed wheel straight
    // from the ingest's nested keyed sidecar: fingerprint matches the
    // covered files, so this is a pure O(slots) load — and to PROVE the
    // disk copy is what serves, tamper it consistently first
    val (meta, persisted) =
      graft.wheel.PersistentWheel.loadPartialsKeyedMulti(spark, s"$persistDir/keyed")
    val schema = persisted.schema
    val doubled = persisted.collect().map { r =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq.zipWithIndex.map {
        case (v: Double, i) if schema(i).name == "sum_value" => v * 2
        case (v, _) => v
      })
    }
    graft.wheel.PersistentWheel.savePartialsKeyedMulti(spark, s"$persistDir/keyed",
      spark.createDataFrame(
        spark.sparkContext.parallelize(doubled.toIndexedSeq), schema),
      meta.tsCol, meta.valueCols.head, meta.valueCols.tail,
      meta.sourceFingerprint, meta.sourcePath)

    val wheels = WheelAcceleration.registerPersistedKeyedMulti(
      spark, path, s"$persistDir/keyed", spark.read.parquet(path),
      "event_type", "ts", Seq("value", "qty"))
    assert(wheels.keySet == Set("value", "qty"))
    try {
      spark.read.parquet(path).createOrReplaceTempView("live_events")
      val df = spark.sql(
        s"SELECT event_type, (unix_millis(ts) div $Min) * $Min AS slot_ms, " +
          "SUM(value) AS s, MAX(qty) AS mq FROM live_events " +
          s"WHERE unix_millis(ts) >= $t0 AND unix_millis(ts) < ${t0 + 2 * Min} " +
          "GROUP BY 1, 2 ORDER BY 1, 2")
      assert(folded(df), df.queryExecution.optimizedPlan.treeString)
      // doubled sums (disk copy!), untouched qty
      assert(df.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq ==
        Seq(("click", t0, 2.0, 10.0), ("view", t0 + Min, 4.0, 20.0)))
    } finally WheelAcceleration.unregister(path)
  }

  test("late rows below the lateness horizon are merged AND counted (round 10)") {
    import spark.implicits._
    System.setProperty("graft.wheel.fingerprint.ttlMs", "0")
    val path = fixture("late/events.parquet")
    val t0 = Q.Jan1
    val Hour = 3600000L

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val q = WheelIngest.start(mem.toDF().toDF("ts", "value"), path,
      fixture("late/ckpt"), latenessHorizonMs = Some(Hour))
    try {
      // batch 0: no history yet -> nothing can be late
      mem.addData((new java.sql.Timestamp(t0 + 2 * Hour), 1.0))
      q.processAllAvailable()
      val s0 = WheelIngest.ingestStats(path).get
      assert(s0.batches == 1L && s0.rows == 1L && s0.lateRows == 0L, s0)
      assert(s0.watermarkMs.isEmpty, s0)

      // batch 1: one on-time row, two rows >1h older than the max seen
      // slot (t0+2h) — merged by slot as always, but now VISIBLE
      mem.addData(
        (new java.sql.Timestamp(t0 + 2 * Hour + Min), 2.0),
        (new java.sql.Timestamp(t0), 10.0),
        (new java.sql.Timestamp(t0 + Min), 20.0))
      q.processAllAvailable()
      val s1 = WheelIngest.ingestStats(path).get
      assert(s1.batches == 2L && s1.rows == 4L, s1)
      assert(s1.lastBatchRows == 3L && s1.lastBatchLateRows == 2L, s1)
      assert(s1.lateRows == 2L, s1)
      assert(s1.watermarkMs.contains(t0 + Hour), s1)

      // the late rows ARE in the served answer (never dropped)
      val df = rangeSql(path, t0, t0 + 3 * Hour)
      assert(folded(df))
      val r = df.collect()(0)
      assert(r.getDouble(0) == 33.0 && r.getLong(1) == 4L)
    } finally {
      q.stop()
      WheelAcceleration.unregister(path)
    }
  }

  test("streaming READ of the wheel table: a dashboard sees just-ingested slot deltas (round 14)") {
    import spark.implicits._
    System.setProperty("graft.wheel.fingerprint.ttlMs", "0")
    val path = fixture("stream-read/events.parquet")
    val ckpt = fixture("stream-read/ckpt")
    val outCkpt = fixture("stream-read/out-ckpt")
    val t0 = Q.Jan1
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val ingest = WheelIngest.start(mem.toDF().toDF("ts", "value"), path, ckpt)
    var dash: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      mem.addData((new java.sql.Timestamp(t0), 1.0),
        (new java.sql.Timestamp(t0 + Min), 2.0))
      ingest.processAllAvailable()
      // subscribe to the LIVE registration: the push counterpart of the
      // batch re-read — each micro-batch carries the slots whose row
      // count changed, with their CURRENT cumulative partials
      val stream = spark.readStream.format("wheel")
        .option("source", path).load()
        .select("slot_ms", "rows", "sum_value")
      dash = stream.writeStream.format("memory").queryName("wheel_dash")
        .option("checkpointLocation", outCkpt).start()
      dash.processAllAvailable()
      val snap1 = spark.sql(
        "SELECT slot_ms, rows, sum_value FROM wheel_dash ORDER BY slot_ms")
        .collect()
      assert(snap1.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
        Seq((t0, 1L, 1.0), (t0 + Min, 1L, 2.0)), snap1.mkString(", "))

      // second ingest batch: a NEW slot plus a LATE row into slot 0 —
      // the dashboard must see exactly the two CHANGED slots re-emitted
      // (slot 0 with its updated cumulative partials), and slot 1 not
      mem.addData((new java.sql.Timestamp(t0 + 2 * Min), 4.0),
        (new java.sql.Timestamp(t0 + 1), 10.0))
      ingest.processAllAvailable()
      dash.processAllAvailable()
      val emits = spark.sql(
        "SELECT slot_ms, rows, sum_value FROM wheel_dash " +
          "ORDER BY slot_ms, rows").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(emits == Seq(
        (t0, 1L, 1.0), (t0, 2L, 11.0), // slot 0: initial, then the delta
        (t0 + Min, 1L, 2.0), // unchanged — emitted once
        (t0 + 2 * Min, 1L, 4.0)), emits.mkString(", "))

      // upsert view (latest emission per slot) == the live index state
      val latest = spark.sql(
        """SELECT slot_ms, max_by(sum_value, rows) AS s FROM wheel_dash
          |GROUP BY slot_ms ORDER BY slot_ms""".stripMargin).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(latest == Seq((t0, 11.0), (t0 + Min, 2.0), (t0 + 2 * Min, 4.0)))
    } finally {
      if (dash != null) dash.stop()
      ingest.stop()
      WheelAcceleration.unregister(path)
    }
  }

  test("end-to-end dashboard: foreachBatch upsert over the stream converges to the batch snapshot (round 15)") {
    // VERDICT r14 #6 — the eventually-consistent contract stated in
    // WheelStream.scala, asserted END-TO-END: ingest → streaming read →
    // foreachBatch upsert by slot_ms → the upsert table equals the
    // batch wheel-table snapshot after every round (≥3 micro-batches,
    // late-data slot re-emit included), and a dashboard RESTART from
    // its checkpoint re-emits state the upsert absorbs unchanged.
    import spark.implicits._
    System.setProperty("graft.wheel.fingerprint.ttlMs", "0")
    val path = fixture("stream-e2e/events.parquet")
    val ckpt = fixture("stream-e2e/ckpt")
    val outCkpt = fixture("stream-e2e/out-ckpt")
    val t0 = Q.Jan1
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val ingest = WheelIngest.start(mem.toDF().toDF("ts", "value"), path, ckpt)
    val upserts = new java.util.concurrent.ConcurrentHashMap[Long, (Long, Double)]()
    var dash: org.apache.spark.sql.streaming.StreamingQuery = null
    def startDash(): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream.format("wheel").option("source", path).load()
        .select("slot_ms", "rows", "sum_value")
        .writeStream.option("checkpointLocation", outCkpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          // sequential per-batch upsert — exactly what a dashboard's
          // key-value store does with the delta feed
          df.collect().foreach { r =>
            upserts.put(r.getLong(0), (r.getLong(1), r.getDouble(2)))
          }
          ()
        }.start()
    def batchSnapshot(): Map[Long, (Long, Double)] =
      spark.read.format("wheel").option("source", path).load()
        .select("slot_ms", "rows", "sum_value").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def upsertView(): Map[Long, (Long, Double)] = {
      import scala.jdk.CollectionConverters._
      upserts.asScala.toMap
    }
    try {
      def round(data: (java.sql.Timestamp, Double)*): Unit = {
        mem.addData(data: _*)
        ingest.processAllAvailable()
        dash.processAllAvailable()
        assert(upsertView() == batchSnapshot(),
          s"upsert diverged: ${upsertView()} vs ${batchSnapshot()}")
      }
      // the stream resolves the LIVE registration, which exists after
      // the first committed ingest batch — seed it, then subscribe
      mem.addData((new java.sql.Timestamp(t0), 1.0),
        (new java.sql.Timestamp(t0 + Min), 2.0))
      ingest.processAllAvailable()
      dash = startDash()
      dash.processAllAvailable()
      assert(upsertView() == batchSnapshot())
      round((new java.sql.Timestamp(t0 + 2 * Min), 4.0))
      // LATE row into slot 0: the changed slot re-emits with its new
      // cumulative partials and the upsert replaces, not adds
      round((new java.sql.Timestamp(t0 + 1), 10.0),
        (new java.sql.Timestamp(t0 + 3 * Min), 8.0))
      assert(upsertView()(t0) == (2L, 11.0), upsertView()(t0))
      // dashboard restart: the checkpointed reader re-emits the full
      // populated state once; the upsert absorbs it (still converged)
      dash.stop()
      dash = startDash()
      round((new java.sql.Timestamp(t0 + Min + 1), 0.5)) // 4th batch, late into slot 1
      assert(upsertView()(t0 + Min) == (2L, 2.5), upsertView()(t0 + Min))
    } finally {
      if (dash != null) dash.stop()
      ingest.stop()
      WheelAcceleration.unregister(path)
    }
  }

  test("streaming READ of the KEYED wheel table with pushed key membership (round 14)") {
    import spark.implicits._
    System.setProperty("graft.wheel.fingerprint.ttlMs", "0")
    val path = fixture("stream-read-keyed/events.parquet")
    val ckpt = fixture("stream-read-keyed/ckpt")
    val outCkpt = fixture("stream-read-keyed/out-ckpt")
    val t0 = Q.Jan1
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val ingest = WheelIngest.start(mem.toDF().toDF("ts", "event_type", "value"),
      path, ckpt, keyCol = Some("event_type"))
    var dash: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      mem.addData((new java.sql.Timestamp(t0), "a", 1.0),
        (new java.sql.Timestamp(t0), "b", 5.0))
      ingest.processAllAvailable()
      val stream = spark.readStream.format("wheel")
        .option("source", path).option("keyed", "true").load()
        .filter(org.apache.spark.sql.functions.col("event_type") === "a")
        .select("event_type", "slot_ms", "sum_value")
      dash = stream.writeStream.format("memory").queryName("wheel_dash_k")
        .option("checkpointLocation", outCkpt).start()
      dash.processAllAvailable()
      mem.addData((new java.sql.Timestamp(t0 + Min), "a", 3.0),
        (new java.sql.Timestamp(t0 + Min), "b", 7.0))
      ingest.processAllAvailable()
      dash.processAllAvailable()
      val emits = spark.sql(
        "SELECT event_type, slot_ms, sum_value FROM wheel_dash_k " +
          "ORDER BY slot_ms").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      // only key 'a' rows flow (the key filter is honored); both its
      // slots arrive as deltas
      assert(emits == Seq(("a", t0, 1.0), ("a", t0 + Min, 3.0)),
        emits.mkString(", "))
    } finally {
      if (dash != null) dash.stop()
      ingest.stop()
      WheelAcceleration.unregister(path)
    }
  }

  /** Basenames of the table's data files (committer markers excluded). */
  private def listDataFiles(path: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val it = fs.listFiles(p, true)
    val buf = scala.collection.mutable.Set.empty[String]
    while (it.hasNext) {
      val f = it.next()
      val n = f.getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) buf += f.getPath.toString
    }
    buf.toSet
  }
}
