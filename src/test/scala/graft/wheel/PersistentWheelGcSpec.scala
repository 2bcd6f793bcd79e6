package graft.wheel

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Warehouse hygiene (round 9, VERDICT r8 #7): a long-lived deployment
  * accumulates one index dir per (source, family); [[PersistentWheel
  * .inventory]] lists them with per-entry staleness judged against each
  * dir's own recorded source, and [[PersistentWheel.gc]] drops exactly
  * the provably-stale ones — never legacy sidecars (no recorded
  * source), never foreign directories. */
class PersistentWheelGcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def fixture(name: String): String = {
    val f = new java.io.File(s"target/test-fixtures/pwheel-gc/$name")
    org.apache.commons.io.FileUtils.deleteQuietly(f)
    f.getAbsolutePath
  }

  private def writeSource(path: String, rows: Seq[(Long, Double)]): Unit = {
    import spark.implicits._
    rows.toDF("ms", "value")
      .select(org.apache.spark.sql.functions.timestamp_millis(
        org.apache.spark.sql.functions.col("ms")).as("ts"),
        org.apache.spark.sql.functions.col("value"))
      .write.mode("append").parquet(path)
  }

  test("inventory judges staleness per entry; gc drops exactly the stale ones") {
    val warehouse = fixture("warehouse")
    val srcFresh = fixture("src-fresh")
    val srcStale = fixture("src-stale")
    val t0 = graft.queries.Q.Jan1
    writeSource(srcFresh, Seq((t0, 1.0), (t0 + 60000L, 2.0)))
    writeSource(srcStale, Seq((t0, 3.0)))

    val conf = spark.sessionState.newHadoopConf()
    def fp(p: String) = SourceFingerprint.of(p, conf)

    // entry 1: fresh — source unchanged after save
    PersistentWheel.save(spark, s"$warehouse/fresh",
      spark.read.parquet(srcFresh), "ts", Seq("value"), fp(srcFresh), srcFresh)
    // entry 2: stale — source appended after save
    PersistentWheel.save(spark, s"$warehouse/stale",
      spark.read.parquet(srcStale), "ts", Seq("value"), fp(srcStale), srcStale)
    writeSource(srcStale, Seq((t0 + 120000L, 4.0)))
    // entry 3: legacy — sidecar without a recorded source (pre-round-9)
    PersistentWheel.save(spark, s"$warehouse/legacy",
      spark.read.parquet(srcFresh), "ts", Seq("value"), fp(srcFresh))
    // a foreign subdirectory (no sidecar) must be invisible to both
    val foreign = new java.io.File(s"$warehouse/foreign")
    foreign.mkdirs()
    assert(new java.io.File(foreign, "data.txt").createNewFile())

    val inv = PersistentWheel.inventory(spark, warehouse)
    assert(inv.map(e => new java.io.File(e.dir).getName).sorted ==
      Seq("fresh", "legacy", "stale"))
    val byName = inv.map(e => new java.io.File(e.dir).getName -> e).toMap
    assert(byName("fresh").stale.contains(false))
    assert(byName("stale").stale.contains(true))
    assert(byName("legacy").stale.isEmpty)
    assert(byName("stale").meta.sourcePath == srcStale)

    // dryRun reports but deletes nothing
    val (keptDry, droppedDry) = PersistentWheel.gc(spark, warehouse, dryRun = true)
    assert(droppedDry.map(e => new java.io.File(e.dir).getName) == Seq("stale"))
    assert(keptDry.size == 2)
    assert(new java.io.File(s"$warehouse/stale").exists())

    // real gc drops the stale entry, keeps fresh + legacy + foreign
    val (kept, dropped) = PersistentWheel.gc(spark, warehouse)
    assert(dropped.map(e => new java.io.File(e.dir).getName) == Seq("stale"))
    assert(!new java.io.File(s"$warehouse/stale").exists())
    assert(new java.io.File(s"$warehouse/fresh").exists())
    assert(new java.io.File(s"$warehouse/legacy").exists())
    assert(new java.io.File(s"$warehouse/foreign/data.txt").exists())
    assert(kept.map(e => new java.io.File(e.dir).getName).sorted ==
      Seq("fresh", "legacy"))

    // the surviving fresh entry still loads and answers
    val (_, wheels) = PersistentWheel.load(spark, s"$warehouse/fresh")
    val a = wheels("value").query(t0, t0 + 120000L)
    assert(a.sum == 3.0 && a.count == 2L)

    // an empty / absent warehouse is a no-op, not an error
    assert(PersistentWheel.inventory(spark, fixture("missing")).isEmpty)
    assert(PersistentWheel.gc(spark, fixture("missing")) == ((Seq.empty, Seq.empty)))
  }

  test("inventory descends into an ingest checkpoint's nested keyed sidecar (round 10)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val warehouse = fixture("warehouse-ckpt")
    val tablePath = s"${fixture("ckpt-src")}/events.parquet"
    val persistDir = s"$warehouse/ingest-ckpt"
    val t0 = graft.queries.Q.Jan1

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val q = graft.streaming.WheelIngest.start(
      mem.toDF().toDF("ts", "event_type", "value"), tablePath,
      fixture("ckpt-ckpt"), persistDir = Some(persistDir),
      keyCol = Some("event_type"))
    try {
      mem.addData((new java.sql.Timestamp(t0), "click", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    graft.plans.WheelAcceleration.unregister(tablePath)

    // both family sidecars listed: the sum checkpoint AND its nested
    // keyed sidecar; both fresh (source unchanged since the persist)
    val inv = PersistentWheel.inventory(spark, warehouse)
    assert(inv.map(e => new java.io.File(e.dir).getName).sorted ==
      Seq("ingest-ckpt", "keyed"), inv)
    assert(inv.forall(_.stale.contains(false)), inv)
    assert(inv.find(_.dir.endsWith("keyed")).get.meta.kind ==
      PersistentWheel.KeyedMultiKind)

    // append to the TABLE -> both entries go stale, gc sweeps the
    // whole checkpoint (nested keyed goes with its parent)
    Seq((new java.sql.Timestamp(t0 + 60000L), "view", 2.0))
      .toDF("ts", "event_type", "value").write.mode("append").parquet(tablePath)
    val inv2 = PersistentWheel.inventory(spark, warehouse)
    assert(inv2.forall(_.stale.contains(true)), inv2)
    val (_, dropped) = PersistentWheel.gc(spark, warehouse)
    assert(dropped.size == 2, dropped)
    assert(!new java.io.File(persistDir).exists())
  }

  test("inventory sees a persisted-sketch BASE dir whose sidecars live one level down (round 11)") {
    val warehouse = fixture("warehouse-sketch")
    val src = s"${fixture("sketch-src")}/events.parquet"
    val t0 = graft.queries.Q.Jan1
    import spark.implicits._
    Seq((new java.sql.Timestamp(t0), 1.0, 3L),
      (new java.sql.Timestamp(t0 + 60000L), 2.0, 4L))
      .toDF("ts", "value", "user_id").write.parquet(src)

    // registerPersistedSketches lays out theta_/kll_ subdirs under the
    // base dir — the base itself carries NO sidecar
    graft.plans.WheelAcceleration.registerPersistedSketches(spark, src,
      s"$warehouse/events-sketch", spark.read.parquet(src),
      distinctCols = Seq("user_id"), quantileCols = Seq("value"))
    graft.plans.WheelAcceleration.unregister(src)

    val inv = PersistentWheel.inventory(spark, warehouse)
    assert(inv.map(e => new java.io.File(e.dir).getName).sorted ==
      Seq("kll_value", "theta_user_id"), inv)
    assert(inv.forall(_.stale.contains(false)), inv)

    // source appended -> both sketch dirs provably stale, gc reclaims
    // them even though their parent has no sidecar of its own
    Seq((new java.sql.Timestamp(t0 + 120000L), 3.0, 5L))
      .toDF("ts", "value", "user_id").write.mode("append").parquet(src)
    val (kept, dropped) = PersistentWheel.gc(spark, warehouse)
    assert(kept.isEmpty, kept)
    assert(dropped.map(e => new java.io.File(e.dir).getName).sorted ==
      Seq("kll_value", "theta_user_id"), dropped)
    assert(!new java.io.File(s"$warehouse/events-sketch/theta_user_id").exists())
  }
}
