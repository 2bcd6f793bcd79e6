package graft.wheel

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{TestSpark, queries}

/** Misra-Gries frequency wheel (fourth sketch generalization): exact
  * parity with per-key counts while the key set fits the counter budget
  * (every test SF), NO_FALSE_NEGATIVES bounds beyond it, the retention
  * contract shared with the other wheels, and split-build merge parity. */
class FrequencyWheelSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  private lazy val idx =
    FrequencyWheel.build(queries.Q.t(spark, dir, "events"), "ts", "user_id")

  /** Exact per-key counts over [a, b) from a scan. */
  private def exactCounts(a: Long, b: Long): Map[Long, Long] =
    queries.Q.t(spark, dir, "events")
      .filter(unix_millis(col("ts")) >= a && unix_millis(col("ts")) < b)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("exact regime: estimates equal true counts across range shapes") {
    val ranges = Seq(
      (queries.Q.Jan1, queries.Q.Jan1 + 30L * 24 * 3600000),          // whole month
      (queries.Q.Jan1, queries.Q.Jan1 + 86400000L),                   // one day
      (queries.Q.Jan1 + 90 * 60000L, queries.Q.Jan1 + 1000 * 60000L)) // odd minutes
    for ((a, b) <- ranges) {
      val exact = exactCounts(a, b)
      assert(exact.nonEmpty, s"empty test range [$a,$b)")
      assert(idx.maximumError(a, b) == 0L, "fixture should be in the exact regime")
      exact.foreach { case (key, n) =>
        val (est, lb, ub) = idx.estimate(key, a, b)
        assert(est == n && lb == n && ub == n, s"key $key in [$a,$b)")
      }
      assert(idx.estimate(-1L, a, b)._1 == 0L) // absent key
      // top-5 matches the exact ranking (count desc, key asc tie-break)
      val want = exact.toSeq.sortBy { case (k, n) => (-n, k) }.take(5)
      assert(idx.topK(a, b, 5).map(t => (t._1, t._2)) == want)
    }
  }

  test("split-build merge parity: two half-corpus sketches equal one build") {
    val mid = queries.Q.Jan1 + 15L * 86400000L
    val events = queries.Q.t(spark, dir, "events")
    val first = FrequencyWheel.build(
      events.filter(unix_millis(col("ts")) < mid), "ts", "user_id")
    val second = FrequencyWheel.build(
      events.filter(unix_millis(col("ts")) >= mid), "ts", "user_id")
    val whole = (queries.Q.Jan1, queries.Q.Jan1 + 30L * 24 * 3600000)
    exactCounts(whole._1, whole._2).take(20).foreach { case (key, n) =>
      val a = first.estimate(key, first.baseMs, first.horizonMs)._1
      val b = second.estimate(key, second.baseMs, second.horizonMs)._1
      assert(a + b == n, s"key $key: $a + $b != $n")
    }
  }

  test("approximate regime: planted heavy hitter survives with valid bounds") {
    import spark.implicits._
    // 6000 distinct keys in one minute (> 0.75 × 4096 counter budget)
    // plus one key appearing 500× — eviction must start, the heavy key
    // must be reported (no false negatives) with lb ≤ true ≤ ub.
    val t0 = queries.Q.Jan1
    val rows = (0 until 6000).map(i => (new Timestamp(t0), i.toLong + 1000L)) ++
      (0 until 500).map(_ => (new Timestamp(t0), 7L))
    val w = FrequencyWheel.build(rows.toDF("ts", "user_id"), "ts", "user_id")
    val (a, b) = (t0, t0 + 60000L)
    assert(w.maximumError(a, b) > 0L, "should be in the approximate regime")
    val (est, lb, ub) = w.estimate(7L, a, b)
    assert(lb <= 500L && 500L <= ub && est >= lb && est <= ub)
    val top = w.topK(a, b, 1)
    assert(top.nonEmpty && top.head._1 == 7L, s"heavy hitter lost: $top")
  }

  test("KeepN retention mirrors the family contract") {
    val bounded = FrequencyWheel.build(
      queries.Q.t(spark, dir, "events"), "ts", "user_id",
      Map(Tier.Minute -> Retention.KeepN(24 * 60)))
    val day = (queries.Q.Jan1, queries.Q.Jan1 + 86400000L)
    assert(bounded.topK(day._1, day._2, 5) == idx.topK(day._1, day._2, 5))
    intercept[IllegalStateException] {
      bounded.topK(queries.Q.Jan1 + 60000L, queries.Q.Jan1 + 120000L, 5)
    }
    val lo = bounded.horizonMs - 86400000L + 60000L
    assert(bounded.topK(lo, lo + 720 * 60000L, 5).nonEmpty)
    assert(bounded.retainedStartMs(Tier.Minute) == bounded.horizonMs - 86400000L)
    assert(bounded.retainedStartMs(Tier.Day) == bounded.baseMs)
  }

  test("mergeBytes preserves frequency bounds on random splits (ScalaCheck)") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test => CTest}
    import org.apache.datasketches.frequencies.LongsSketch
    // small counter budget so eviction actually happens at these sizes
    def sketchOf(xs: Seq[Long]): Array[Byte] = {
      val s = new LongsSketch(64)
      xs.foreach(s.update)
      s.toByteArray
    }
    val keys = Gen.listOf(Gen.choose(0L, 100L))
    val prop = forAll(keys, keys) { (a, b) =>
      val merged = org.apache.datasketches.frequencies.LongsSketch.getInstance(
        org.apache.datasketches.memory.Memory.wrap(
          FrequencyWheel.mergeBytes(sketchOf(a), sketchOf(b))))
      val trueCounts = (a ++ b).groupBy(identity).view.mapValues(_.size.toLong)
      trueCounts.forall { case (k, n) =>
        merged.getLowerBound(k) <= n && n <= merged.getUpperBound(k)
      }
    }
    val res = CTest.check(CTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("non-integral key column fails fast at build") {
    val e = intercept[IllegalArgumentException] {
      FrequencyWheel.build(queries.Q.t(spark, dir, "events"), "ts", "event_type")
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
  }

  test("misaligned range rejected; empty range is empty") {
    intercept[IllegalArgumentException] {
      idx.topK(queries.Q.Jan1 + 1, queries.Q.Jan1 + 60001, 5)
    }
    assert(idx.topK(queries.Q.Jan1, queries.Q.Jan1, 5).isEmpty)
  }
}
