package graft.wheel

import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.plans.WheelAcceleration
import graft.queries.Q

/** Disk-persisted wheel index: save → load parity, fingerprint-gated
  * reuse, stale-source rebuild, and the SQL rewrite serving a LOADED
  * index. The load path must never touch the source (proved by
  * tampering the persisted partials and observing the tampered answer). */
class PersistentWheelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001
  private val eventsPath = s"$dir/events.parquet"
  private def events = Q.t(spark, dir, "events")

  private def fixtureDir(name: String): String =
    new java.io.File(s"target/test-fixtures/pwheel/$name").getAbsolutePath

  test("save -> load round trip: loaded index answers exactly like a fresh build") {
    val idxDir = fixtureDir("roundtrip")
    val fresh = WheelIndex.buildMulti(events, "ts", Seq("value"))("value")
    val saved = PersistentWheel.save(
      spark, idxDir, events, "ts", Seq("value"), sourceFingerprint = "fp-roundtrip")
    val (meta, loaded) = PersistentWheel.load(spark, idxDir, Some(events))

    assert(meta.sourceFingerprint == "fp-roundtrip")
    assert(meta.tsCol == "ts" && meta.valueCols == Seq("value"))

    for (idx <- Seq(saved("value"), loaded("value"))) {
      assert(idx.baseMs == fresh.baseMs && idx.horizonMs == fresh.horizonMs)
      // aligned ranges: pure index reads on both sides, bit-identical
      for ((a, b) <- Seq((Q.R1Start, Q.R1End), (Q.R2Start, Q.R2End),
          (fresh.baseMs, fresh.horizonMs))) {
        assert(idx.query(a, b) == fresh.query(a, b), s"[$a,$b)")
      }
      // unaligned range: the residue fallback re-armed from the source
      val got = idx.query(Q.R1Start + 500, Q.R1End - 500)
      val want = fresh.query(Q.R1Start + 500, Q.R1End - 500)
      assert(got == want)
    }
    // without a residue source, aligned ranges still answer...
    val (_, bare) = PersistentWheel.load(spark, idxDir)
    assert(bare("value").query(Q.R1Start, Q.R1End) == fresh.query(Q.R1Start, Q.R1End))
    // ...and unaligned ones fail loudly instead of guessing
    intercept[IllegalArgumentException] {
      bare("value").query(Q.R1Start + 500, Q.R1End)
    }
  }

  test("registerPersisted serves the DISK copy when the fingerprint matches (no rebuild)") {
    import spark.implicits._
    System.setProperty("graft.wheel.fingerprint.ttlMs", "0")
    val src = fixtureDir("srv/events.parquet")
    val idxDir = fixtureDir("srv/index")
    Seq((new java.sql.Timestamp(Q.Jan1), 1.5),
      (new java.sql.Timestamp(Q.Jan1 + 60000L), 2.5))
      .toDF("ts", "value").write.mode("overwrite").parquet(src)
    def q() = {
      spark.read.parquet(src).createOrReplaceTempView("ev_pers")
      spark.sql("SELECT SUM(value) AS s, COUNT(*) AS n FROM ev_pers " +
        s"WHERE unix_millis(ts) >= ${Q.Jan1} AND unix_millis(ts) < ${Q.Jan1 + 120000L}")
    }
    def folded(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect { case l: LocalRelation => l }.nonEmpty

    // first call: nothing persisted yet -> build + save
    WheelAcceleration.registerPersisted(spark, src, idxDir, spark.read.parquet(src))
    val first = q()
    assert(folded(first) && first.collect()(0).getDouble(0) == 4.0)

    // tamper the persisted partials (double every sum; counts untouched);
    // the source and its fingerprint are unchanged, so the next
    // registration MUST serve the tampered disk copy — the only way that
    // answer appears is the load path, never a rebuild
    val slots = spark.read.parquet(s"$idxDir/slots.parquet").collect()
    val schema = spark.read.parquet(s"$idxDir/slots.parquet").schema
    val doubled = slots.map { r =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq.zipWithIndex.map {
        case (v: Double, i) if schema(i).name == "sum_value" => v * 2
        case (v, _) => v
      })
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(doubled.toIndexedSeq), schema)
      .coalesce(1).write.mode("overwrite").parquet(s"$idxDir/slots.parquet")

    WheelAcceleration.clear()
    WheelAcceleration.registerPersisted(spark, src, idxDir, spark.read.parquet(src))
    val served = q()
    assert(folded(served))
    assert(served.collect()(0).getDouble(0) == 8.0, "must come from the disk copy")
    assert(served.collect()(0).getLong(1) == 2L)
    WheelAcceleration.clear()
  }

  test("stale recorded fingerprint -> rebuild from source and re-save") {
    import spark.implicits._
    System.setProperty("graft.wheel.fingerprint.ttlMs", "0")
    val src = fixtureDir("stale/events.parquet")
    val idxDir = fixtureDir("stale/index")
    def write(v: Double): Unit =
      Seq((new java.sql.Timestamp(Q.Jan1), v), (new java.sql.Timestamp(Q.Jan1 + 60000L), v))
        .toDF("ts", "value").write.mode("overwrite").parquet(src)
    def sumNow(): Double = {
      spark.read.parquet(src).createOrReplaceTempView("ev_stale_p")
      spark.sql("SELECT SUM(value) AS s FROM ev_stale_p " +
        s"WHERE unix_millis(ts) >= ${Q.Jan1} AND unix_millis(ts) < ${Q.Jan1 + 120000L}")
        .collect()(0).getDouble(0)
    }

    write(1.0)
    WheelAcceleration.registerPersisted(spark, src, idxDir, spark.read.parquet(src))
    assert(sumNow() == 2.0)
    val fpBefore = PersistentWheel.peek(spark, idxDir).get.sourceFingerprint

    Thread.sleep(10) // distinguishable mtime
    write(5.0)
    WheelAcceleration.clear()
    // recorded fingerprint no longer matches the files -> rebuild path
    WheelAcceleration.registerPersisted(spark, src, idxDir, spark.read.parquet(src))
    assert(sumNow() == 10.0)
    val fpAfter = PersistentWheel.peek(spark, idxDir).get.sourceFingerprint
    assert(fpAfter != fpBefore, "re-save must record the new source fingerprint")
    WheelAcceleration.clear()
  }

  test("SQL range aggregates fold from a persisted registration of the events fixture") {
    val idxDir = fixtureDir("events-sql")
    WheelAcceleration.registerPersisted(spark, eventsPath, idxDir, events)
    events.createOrReplaceTempView("events_pwheel")
    def sql() = spark.sql(
      "SELECT ROUND(SUM(value), 2) AS s, COUNT(*) AS n, " +
        "ROUND(MIN(value), 2) AS mn, ROUND(MAX(value), 2) AS mx FROM events_pwheel " +
        s"WHERE unix_millis(ts) >= ${Q.R3Start} AND unix_millis(ts) < ${Q.R3End}")
    val accel = sql()
    assert(accel.queryExecution.optimizedPlan.collect {
      case l: LocalRelation => l
    }.nonEmpty, accel.queryExecution.optimizedPlan.treeString)
    val got = accel.collect().map(_.toString).toSeq
    WheelAcceleration.clear()
    val scan = sql().collect().map(_.toString).toSeq
    assert(got == scan)

    // second registration in the same state reuses the registry entry
    // (same fingerprint) — and a fresh one after clear() takes the load
    // path against the same dir, still correct
    WheelAcceleration.registerPersisted(spark, eventsPath, idxDir, events)
    assert(sql().collect().map(_.toString).toSeq == scan)
    WheelAcceleration.clear()
  }
}
