package graft.wheel

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.queries.Q

/** Dual-execution + property tests for the wheel index (SURVEY.md §5.2):
  * the reference compares index vs full scan by eye
  * (/root/reference/src/main.rs:214–224, 275–276); here it is asserted. */
class WheelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val events = Q.t(spark, TestSpark.Sf0001, "events")
  private lazy val idx = WheelIndex.build(events, "ts", "value")

  private val Jan1 = Q.Jan1
  private val SpanMinutes = 30 * 24 * 60 // events cover [2024-01-01, 2024-01-31)

  private def scanSum(a: Long, b: Long): Double = {
    val r = events
      .filter(unix_millis(col("ts")) >= a && unix_millis(col("ts")) < b)
      .agg(sum(col("value"))).collect()(0)
    if (r.isNullAt(0)) 0.0 else r.getDouble(0)
  }

  private def assertClose(x: Double, y: Double): Unit =
    assert(math.abs(x - y) <= 1e-6 * math.max(1.0, math.max(math.abs(x), math.abs(y))),
      s"$x vs $y")

  test("decompose covers [a,b) exactly with disjoint aligned runs") {
    val gen = for {
      a <- Gen.choose(0L, SpanMinutes.toLong - 1)
      len <- Gen.choose(1L, SpanMinutes.toLong - a)
    } yield (Jan1 + a * 60000L, Jan1 + (a + len) * 60000L)
    val prop = Prop.forAll(gen) { case (a, b) =>
      val runs = Decompose(a, b)
      val contiguous = runs.sliding(2).forall {
        case Seq(x, y) => x.endMs == y.startMs
        case _ => true
      }
      runs.head.startMs == a && runs.last.endMs == b && contiguous &&
        runs.forall(r => r.startMs % r.tier.ms == 0 && r.endMs % r.tier.ms == 0) &&
        runs.map(_.slots).sum <= (b - a) / 60000L
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("decompose uses coarse tiers: full day is a single day run") {
    val runs = Decompose(Jan1, Jan1 + 86400000L)
    assert(runs == Seq(Run(Tier.Day, Jan1, Jan1 + 86400000L)))
  }

  test("wheel query equals full scan on random minute-aligned ranges") {
    val r = new scala.util.Random(42)
    (1 to 50).foreach { _ =>
      val a = r.nextInt(SpanMinutes - 1)
      val len = 1 + r.nextInt(SpanMinutes - a - 1)
      val lo = Jan1 + a * 60000L
      val hi = lo + len * 60000L
      assertClose(idx.querySum(lo, hi), scanSum(lo, hi))
    }
  }

  test("prefix fast path equals the tier walk on random aligned ranges") {
    val r = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val a = r.nextInt(SpanMinutes - 1)
      val len = 1 + r.nextInt(SpanMinutes - a - 1)
      val lo = Jan1 + a * 60000L
      val hi = lo + len * 60000L
      // querySum/queryCount take the O(1) prefix path (minute tier fully
      // retained); query() always tier-walks. The prefix DIFFERENCE is
      // not a reordering of the walk's addends — subtracting accumulated
      // prefixes carries cancellation error bounded by an ulp of the
      // FULL-SPAN running total (WheelIndex.minutePrefix), which is what
      // assertClose absorbs; counts are integers and must match exactly
      val walk = idx.query(lo, hi)
      assertClose(idx.querySum(lo, hi), walk.sum)
      assert(idx.queryCount(lo, hi) == walk.count)
    }
    // ranges clamped past the span
    assert(idx.queryCount(Jan1 - 86400000L, idx.horizonMs + 86400000L) ==
      idx.query(Jan1, idx.horizonMs).count)
  }

  test("tier walk clamps past the span (parity with the prefix path)") {
    // round 7: query() used to throw from Decompose on pre-base starts
    // (caught by the multi-measure SQL rewrite, whose ranges are user
    // SQL, not fixture-derived); outside-span slots are identity
    val wide = idx.query(Jan1 - 86400000L, idx.horizonMs + 86400000L)
    val full = idx.query(Jan1, idx.horizonMs)
    assert(wide.count == full.count)
    assertClose(wide.sum, full.sum)
    assert(idx.query(Jan1 - 2 * 86400000L, Jan1 - 86400000L).count == 0L)
  }

  test("prefix path is bypassed under minute retention (falls back to tiers)") {
    val bounded = WheelIndex.build(events, "ts", "value",
      Map(Tier.Minute -> Retention.KeepN(24 * 60)))
    // historical day-aligned range: minutes evicted, coarse tiers answer
    val lo = Jan1
    val hi = Jan1 + 86400000L
    assertClose(bounded.querySum(lo, hi), idx.querySum(lo, hi))
    assert(bounded.queryCount(lo, hi) == idx.queryCount(lo, hi))
  }

  test("range additivity: query(a,b) + query(b,c) == query(a,c)") {
    val a = Jan1
    val b = Jan1 + 86400000L * 7 + 3600000L * 5
    val c = Jan1 + 86400000L * 20 + 60000L * 17
    assertClose(idx.querySum(a, b) + idx.querySum(b, c), idx.querySum(a, c))
  }

  test("empty range is identity; count matches scan") {
    assert(idx.querySum(Jan1, Jan1) == 0.0)
    val all = idx.query(Jan1, Jan1 + 31L * 86400000L)
    assert(all.count == events.count())
  }

  test("All aggregate (min/max/avg) matches scan aggregates") {
    val lo = Jan1 + 3 * 86400000L
    val hi = Jan1 + 11 * 86400000L
    val got = idx.query(lo, hi)
    val want = events
      .filter(unix_millis(col("ts")) >= lo && unix_millis(col("ts")) < hi)
      .agg(min(col("value")), max(col("value")), count(lit(1)), avg(col("value")))
      .collect()(0)
    assert(got.min == want.getDouble(0))
    assert(got.max == want.getDouble(1))
    assert(got.count == want.getLong(2))
    assertClose(got.avg, want.getDouble(3))
  }

  test("distributed rollup query path agrees with driver-local index") {
    val rollups = RollupBuilder.buildAll(events, "ts", "value")
    val lo = Jan1 + 2 * 86400000L + 7 * 3600000L + 26 * 60000L
    val hi = Jan1 + 27 * 86400000L + 18 * 3600000L + 43 * 60000L
    val row = WheelIndex.queryDistributed(rollups, lo, hi).collect()(0)
    val local = idx.query(lo, hi)
    assertClose(row.getDouble(0), local.sum)
    assert(row.getLong(1) == local.count)
    assert(row.getDouble(2) == local.min)
    assert(row.getDouble(3) == local.max)
  }

  test("unaligned ranges fall back to residue scans and equal full scan") {
    val r = new scala.util.Random(7)
    val spanMs = SpanMinutes.toLong * 60000L
    (1 to 6).foreach { _ =>
      val a = Jan1 + (r.nextDouble() * (spanMs - 4L * 86400000L)).toLong
      val len = 1L + (r.nextDouble() * 3L * 86400000L).toLong
      val b = a + len
      assertClose(idx.querySum(a, b), scanSum(a, b))
    }
    // entirely inside one minute slot (no aligned interior at all)
    val a = Jan1 + 5 * 86400000L + 12 * 60000L + 13_250L
    assertClose(idx.querySum(a, a + 7_000L), scanSum(a, a + 7_000L))
  }

  test("KeepN eviction: old fine slots gone, coarser tiers still answer") {
    val bounded = WheelIndex.build(events, "ts", "value",
      Map(Tier.Minute -> Retention.KeepN(24 * 60))) // last day of minutes
    // recent sub-hour range: needs the minute tier, which is retained there
    val lo = bounded.horizonMs - 86400000L + 3600000L + 60000L
    val hi = lo + 17 * 60000L
    assertClose(bounded.querySum(lo, hi), scanSum(lo, hi))
    // old sub-hour range: minute slots evicted, no coarser tier aligns
    intercept[IllegalStateException] {
      bounded.querySum(Jan1 + 60000L, Jan1 + 120000L)
    }
    // old but hour/day-aligned: answered exactly from retained coarse tiers
    assertClose(bounded.querySum(Jan1, Jan1 + 86400000L), scanSum(Jan1, Jan1 + 86400000L))
    assertClose(bounded.querySum(Jan1 + 3600000L, Jan1 + 7200000L),
      scanSum(Jan1 + 3600000L, Jan1 + 7200000L))
    assert(bounded.retainedStartMs(Tier.Minute) == bounded.horizonMs - 86400000L)
    assert(bounded.retainedStartMs(Tier.Day) == bounded.baseMs)
  }

  test("single-measure build indexes a nullable measure (COUNT(*)/COUNT(col) split)") {
    import spark.implicits._
    val df = Seq(
      (new java.sql.Timestamp(Jan1), Some(1.0)),
      (new java.sql.Timestamp(Jan1 + 1000L), Option.empty[Double]))
      .toDF("ts", "value")
    val idx = WheelIndex.build(df, "ts", "value")
    val all = idx.query(Jan1, Jan1 + 60000L)
    assert(all.rows == 2L && all.count == 1L && all.sum == 1.0, all)
    // sub-second range hits the residue scan over just the null row
    val nullOnly = idx.query(Jan1 + 1000L, Jan1 + 2000L)
    assert(nullOnly.rows == 1L && nullOnly.count == 0L, nullOnly)
  }

  test("incremental merge of disjoint partition rollups equals the full build") {
    val mid = Jan1 + 15 * 86400000L
    val firstHalf = events.filter(unix_millis(col("ts")) < mid)
    val secondHalf = events.filter(unix_millis(col("ts")) >= mid)
    val merged = RollupBuilder.merge(
      RollupBuilder.minuteRollup(firstHalf, "ts", "value"),
      RollupBuilder.minuteRollup(secondHalf, "ts", "value"))
      .orderBy("slot_ms").collect().map(_.toString).toSeq
    val full = RollupBuilder.minuteRollup(events, "ts", "value")
      .orderBy("slot_ms").collect().map(_.toString).toSeq
    assert(merged == full)
  }

  test("serialized index still answers aligned ranges; unaligned explains itself") {
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(idx); oos.close()
      bos.toByteArray
    }
    val revived = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bytes)).readObject().asInstanceOf[WheelIndex]
    val lo = Jan1 + 2 * 86400000L
    val hi = Jan1 + 9 * 86400000L + 3600000L + 17 * 60000L
    assertClose(revived.querySum(lo, hi), idx.querySum(lo, hi))
    // the residue-scan fallback is driver-state (@transient): a revived
    // index must fail unaligned queries with the documented message,
    // not a NullPointerException
    val e = intercept[IllegalArgumentException] {
      revived.querySum(lo + 1, hi)
    }
    assert(e.getMessage.contains("residue"), e.getMessage)
  }

  test("sliding series equals per-range queries and clamps at the base") {
    val windowMs = 3600000L
    // first day: early windows reach before the base and must clamp
    val series = idx.slidingSeries(Jan1, Jan1 + 86400000L, windowMs)
    assert(series.nonEmpty)
    series.foreach { case (slot, s, n) =>
      val end = slot + 60000L
      val wStart = math.max(idx.baseMs, end - windowMs)
      val want = idx.query(wStart, end)
      assertClose(s, want.sum)
      assert(n == want.count)
    }
    // exactly the non-empty minutes of the day, in order
    val expectSlots = (0 until 1440).map(i => Jan1 + i * 60000L)
      .filter(sl => idx.queryCount(sl, sl + 60000L) > 0L)
    assert(series.map(_._1) == expectSlots)
  }

  test("sliding series under minute retention takes the walk path and agrees") {
    val bounded = WheelIndex.build(events, "ts", "value",
      Map(Tier.Minute -> Retention.KeepN(24 * 60)))
    // start 1h into the retained day so every trailing window stays retained
    val dayStart = bounded.horizonMs - 86400000L + 3600000L
    val s1 = bounded.slidingSeries(dayStart, bounded.horizonMs, 3600000L)
    val s2 = idx.slidingSeries(dayStart, idx.horizonMs, 3600000L)
    assert(s1.map(x => (x._1, x._3)) == s2.map(x => (x._1, x._3)))
    s1.zip(s2).foreach { case ((_, a, _), (_, b, _)) => assertClose(a, b) }
  }

  test("slidingSeries clamps to the retained minute span under KeepN (no throw)") {
    // ADVICE r6: a full-span series request on a KeepN wheel used to hit
    // evicted minute slots and throw from Decompose; series points and
    // window starts now clamp to retainedStartMs(Minute) — evicted
    // minutes contribute nothing, retained points answer exactly.
    val bounded = WheelIndex.build(events, "ts", "value",
      Map(Tier.Minute -> Retention.KeepN(24 * 60)))
    val floor = bounded.retainedStartMs(Tier.Minute)
    val s = bounded.slidingSeries(Jan1, bounded.horizonMs, 3600000L)
    assert(s.nonEmpty && s.forall(_._1 >= floor), "evicted slots leaked")
    // every emitted point equals the clamped-window per-point query,
    // including the first hour whose windows truncate at the floor
    s.take(90).foreach { case (slot, sumV, n) =>
      val a = bounded.query(math.max(floor, slot + 60000L - 3600000L), slot + 60000L)
      assertClose(sumV, a.sum)
      assert(n == a.count)
    }
  }

  test("explain names the tier decomposition") {
    val s = idx.explain(Jan1 + 60000L, Jan1 + 2 * 86400000L + 3600000L + 120000L)
    assert(s.contains("minute") && s.contains("hour") && s.contains("day"))
    assert(s.contains("runs"))
  }

  test("explain + sizeBytes parity across the whole index family") {
    // VERDICT r6 #3: a user debugging a slow keyed or sketch query must
    // see the same tier breakdown the sum wheel prints — decomposition,
    // per-tier slot/occupancy counts, and the footprint, for all six
    // index types.
    val range = (Jan1 + 60000L, Jan1 + 2 * 86400000L + 3600000L + 120000L)
    // the mixed-tier cover for this range: minutes → hours → days → hour
    val runLines = Seq("minute[", "hour[", "day[")
    val dw = DistinctWheel.build(events, "ts", "user_id")
    val qw = QuantileWheel.build(events, "ts", "value")
    val fw = FrequencyWheel.build(events, "ts", "user_id")
    val cw = CohortWheel.build(events, "ts", "user_id")
    val fam: Seq[(String, String, Long)] = Seq(
      ("WheelIndex(All)", idx.explain(range._1, range._2), idx.sizeBytes),
      ("DistinctWheel(HLL)", dw.explain(range._1, range._2), dw.sizeBytes),
      ("QuantileWheel(KLL)", qw.explain(range._1, range._2), qw.sizeBytes),
      ("FrequencyWheel(MisraGries)", fw.explain(range._1, range._2), fw.sizeBytes),
      ("CohortWheel(Theta)", cw.explain(range._1, range._2), cw.sizeBytes))
    fam.foreach { case (kind, s, bytes) =>
      assert(s.startsWith(kind), s"$kind explain header:\n$s")
      assert(s.contains("sizeBytes=") && bytes > 0L, s"$kind footprint:\n$s")
      Tier.all.foreach(t => assert(s.contains(s"tier ${t.name}:"),
        s"$kind missing ${t.name} occupancy line:\n$s"))
      assert(s.contains("non-empty"), s"$kind occupancy:\n$s")
      runLines.foreach(r => assert(s.contains(r),
        s"$kind combine plan missing $r run:\n$s"))
      assert(s.contains("runs,"), s"$kind combine summary:\n$s")
    }
    // the keyed wheel (round 7: tiered like the rest of the family)
    val keyed = KeyedWheelIndex.build(events, "event_type", "ts", "value")
    val ks = keyed.explain(Jan1, Jan1 + 86400000L)
    assert(ks.startsWith("KeyedWheelIndex(key=event_type"), ks)
    assert(ks.contains("sizeBytes=") && keyed.sizeBytes > 0L, ks)
    Tier.all.foreach(t => assert(ks.contains(s"tier ${t.name}:"),
      s"keyed missing ${t.name} occupancy line:\n$ks"))
    // a full day decomposes to ONE day probe per key, not 1 440 minutes
    assert(ks.contains("1 runs, 1 slot combines") && ks.contains("day["), ks)
    // footprint tracks |keys| x slots: it must exceed the raw entry count
    assert(keyed.sizeBytes > keyed.sizeSlots.toLong, ks)
  }

  test("keyed wheel tier decomposition equals the per-key scan") {
    // round 7: the keyed wheel gained hour/day tiers — every range must
    // still answer exactly what a per-key scan answers, through any mix
    // of tier runs.
    val keyed = KeyedWheelIndex.build(events, "event_type", "ts", "value")
    val r = new scala.util.Random(5)
    (1 to 10).foreach { _ =>
      val a = r.nextInt(SpanMinutes - 1)
      val len = 1 + r.nextInt(SpanMinutes - a - 1)
      val (lo, hi) = (Jan1 + a * 60000L, Jan1 + (a + len) * 60000L)
      keyed.keys.foreach { k =>
        val exp = events
          .filter(col("event_type") === k &&
            unix_millis(col("ts")) >= lo && unix_millis(col("ts")) < hi)
          .agg(sum(col("value")), count(col("value")),
            min(col("value")), max(col("value"))).collect()(0)
        val got = keyed.query(k, lo, hi)
        if (exp.isNullAt(0)) assert(got.count == 0L, s"$k [$lo,$hi)")
        else {
          assertClose(got.sum, exp.getDouble(0))
          assert(got.count == exp.getLong(1), s"$k [$lo,$hi)")
          assertClose(got.min, exp.getDouble(2))
          assertClose(got.max, exp.getDouble(3))
        }
      }
    }
  }

  test("explain is retention-aware: evicted minutes route through coarse tiers") {
    val bounded = WheelIndex.build(events, "ts", "value",
      Map(Tier.Minute -> Retention.KeepN(24 * 60)))
    // a historical day: its minutes are evicted, so the printed plan
    // must take the day tier, exactly like query() does
    val s = bounded.explain(Jan1, Jan1 + 86400000L)
    assert(s.contains("1 runs, 1 slot combines"), s)
    assert(s.contains("day["), s)
    assert(!s.contains("minute["), s)
  }

  test("buildMulti(3) schedules the jobs of ONE build; 3 singles schedule 3x (round 10)") {
    // the noise-free statement of "N measures share one aggregation
    // job / one source read" (VERDICT r9 #4): job counts are scheduler
    // facts, identical on every run — unlike wall-clock under CPU
    // steal. AQE may split one aggregation into >1 job, so the
    // invariant is RELATIVE: multi == single, three-singles == 3x.
    val li = Q.t(spark, graft.TestSpark.Sf0001, "lineitem")
      .withColumn("l_ship_ts", col("l_shipdate").cast("timestamp"))
    val measures = Seq("l_quantity", "l_discount", "l_tax")
    val one = JobMetrics.measure(spark) {
      WheelIndex.buildMulti(li, "l_ship_ts", Seq("l_quantity"))
    }
    val multi = JobMetrics.measure(spark) {
      WheelIndex.buildMulti(li, "l_ship_ts", measures)
    }
    val singles = JobMetrics.measure(spark) {
      measures.foreach(c => WheelIndex.build(li, "l_ship_ts", c))
    }
    assert(one.jobs > 0)
    assert(multi.jobs == one.jobs, s"multi=${multi.jobs} one=${one.jobs}")
    assert(singles.jobs == 3 * one.jobs, s"singles=${singles.jobs} one=${one.jobs}")
    // and the bytes actually read off the source: one scan vs three
    // (exact equality is parquet-reader-batch dependent; 3x within 20%)
    assert(one.inputBytes > 0)
    assert(math.abs(multi.inputBytes - one.inputBytes).toDouble / one.inputBytes < 0.2,
      s"multi read ${multi.inputBytes} vs single ${one.inputBytes}")
    assert(math.abs(singles.inputBytes - 3.0 * one.inputBytes) / (3.0 * one.inputBytes) < 0.2,
      s"3 singles read ${singles.inputBytes} vs 3x single ${3 * one.inputBytes}")
  }

  test("multi-measure build: per-measure wheels equal the single-measure builds") {
    // VERDICT r6 #4: N measures share ONE aggregation job and ONE slot
    // walk; the resulting indexes must be indistinguishable from N
    // separate builds — same sums/counts/extremes on aligned ranges AND
    // the same residue-scan fallback on unaligned ones.
    val li = Q.t(spark, graft.TestSpark.Sf0001, "lineitem")
      .withColumn("l_ship_ts", col("l_shipdate").cast("timestamp"))
    val measures = Seq("l_quantity", "l_discount", "l_tax")
    val multi = WheelIndex.buildMulti(li, "l_ship_ts", measures)
    assert(multi.keySet == measures.toSet)
    val singles = measures.map(c => c -> WheelIndex.build(li, "l_ship_ts", c)).toMap
    val base = multi("l_quantity").baseMs
    val horizon = multi("l_quantity").horizonMs
    val r = new scala.util.Random(11)
    val spanDays = ((horizon - base) / 86400000L).toInt
    (1 to 20).foreach { _ =>
      val a = r.nextInt(spanDays - 1)
      val len = 1 + r.nextInt(spanDays - a - 1)
      val (lo, hi) = (base + a * 86400000L, base + (a + len) * 86400000L)
      measures.foreach { c =>
        val m = multi(c).query(lo, hi)
        val s = singles(c).query(lo, hi)
        assertClose(m.sum, s.sum)
        assert(m.count == s.count)
        assertClose(m.min, s.min)
        assertClose(m.max, s.max)
      }
    }
    // unaligned range exercises the per-measure residue-scan fallback
    val (ua, ub) = (base + 86400000L + 23000L, base + 5 * 86400000L - 41000L)
    measures.foreach { c =>
      assertClose(multi(c).query(ua, ub).sum, singles(c).query(ua, ub).sum)
    }
  }

  test("nullable measures: rows carries COUNT(*), count the non-null values (round 11)") {
    import spark.implicits._
    val df = Seq(
      (new java.sql.Timestamp(Jan1), Some(1.0), 2.0),
      (new java.sql.Timestamp(Jan1 + 60000L), None, 4.0),
      (new java.sql.Timestamp(Jan1 + 60000L), None, 6.0),
      (new java.sql.Timestamp(Jan1 + 120000L), Some(5.0), 8.0))
      .toDF("ts", "a", "b")
    val wheels = WheelIndex.buildMulti(df, "ts", Seq("a", "b"))
    val a = wheels("a").query(Jan1, Jan1 + 180000L)
    // COUNT(*) sees all 4 rows; the measure stats cover the 2 non-nulls
    assert(a.rows == 4L, a)
    assert(a.count == 2L, a)
    assert(a.sum == 6.0 && a.min == 1.0 && a.max == 5.0, a)
    // the never-null sibling keeps rows == count
    val b = wheels("b").query(Jan1, Jan1 + 180000L)
    assert(b.rows == 4L && b.count == 4L && b.sum == 20.0, b)
    // a range covering ONLY the all-null minute: COUNT(*) positive,
    // measure aggregates empty (SQL NULL at the fold layer)
    val mid = wheels("a").query(Jan1 + 60000L, Jan1 + 120000L)
    assert(mid.rows == 2L && mid.count == 0L, mid)
    // unaligned edges route through the residue scan with the same split
    val edge = wheels("a").query(Jan1 + 30000L, Jan1 + 90000L)
    assert(edge.rows == 2L && edge.count == 0L, edge)
  }

  test("index footprint is time-bounded, not row-bounded") {
    // 30 days: 43 200 min + 720 h + 30 d slots × 6 arrays × 8 B ≈ 2.1 MB
    assert(idx.sizeBytes < 3 * 1024 * 1024)
    assert(idx.slotCounts(Tier.Minute) == 30 * 24 * 60)
  }
}
