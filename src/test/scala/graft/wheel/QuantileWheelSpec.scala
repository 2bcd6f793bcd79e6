package graft.wheel

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{TestSpark, queries}

/** KLL quantile wheel: rank-error parity vs exact percentiles across
  * range shapes (the DistinctWheel test discipline applied to the third
  * sketch generalization). KLL k=200 guarantees ~1.65% one-sided rank
  * error at 99% confidence; we assert a looser 3% end-to-end bound to
  * absorb tier-merge accumulation. */
class QuantileWheelSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  private lazy val idx =
    QuantileWheel.build(queries.Q.t(spark, dir, "events"), "ts", "value")

  /** True rank of `v` among the range's values (inclusive). */
  private def rankOf(values: Array[Double], v: Double): Double =
    values.count(_ <= v).toDouble / values.length

  test("estimated p50/p95/p99 land within 3% rank error, across range shapes") {
    val ranges = Seq(
      (queries.Q.Jan1, queries.Q.Jan1 + 30L * 24 * 3600000),          // whole month
      (queries.Q.Jan1, queries.Q.Jan1 + 3600000L),                    // one hour
      (queries.Q.Jan1 + 86400000L, queries.Q.Jan1 + 2 * 86400000L),   // one day
      (queries.Q.Jan1 + 90 * 60000L, queries.Q.Jan1 + 1000 * 60000L)) // odd minutes
    for ((a, b) <- ranges) {
      val values = queries.Q.t(spark, dir, "events")
        .filter(unix_millis(col("ts")) >= a && unix_millis(col("ts")) < b)
        .select(col("value")).collect().map(_.getDouble(0)).sorted
      assert(values.nonEmpty, s"empty test range [$a,$b)")
      val qs = Seq(0.5, 0.95, 0.99)
      val est = idx.queryQuantiles(a, b, qs)
      // inclusive-rank semantics return the smallest value whose rank
      // reaches q, so the achieved rank can legitimately overshoot by
      // one rank step (1/n) — on top of the sketch's 3% bound
      val tol = 0.03 + 1.0 / values.length
      qs.zip(est).foreach { case (q, e) =>
        val r = rankOf(values, e)
        assert(math.abs(r - q) <= tol,
          s"range [$a,$b) q=$q: estimate $e has true rank $r (tol $tol)")
      }
    }
  }

  test("empty range yields NaN, misaligned range is rejected") {
    val est = idx.queryQuantile(queries.Q.Jan1, queries.Q.Jan1, 0.5)
    assert(est.isNaN)
    intercept[IllegalArgumentException] {
      idx.queryQuantile(queries.Q.Jan1 + 1, queries.Q.Jan1 + 60001, 0.5)
    }
  }

  test("KeepN retention: coarse tiers answer history, evicted minutes throw") {
    val bounded = QuantileWheel.build(
      queries.Q.t(spark, dir, "events"), "ts", "value",
      Map(Tier.Minute -> Retention.KeepN(24 * 60)))
    // historical day-aligned range: decomposes through the retained day
    // tier — identical merge inputs to the unbounded wheel
    val day = (queries.Q.Jan1, queries.Q.Jan1 + 86400000L)
    assert(bounded.queryQuantile(day._1, day._2, 0.5) ==
      idx.queryQuantile(day._1, day._2, 0.5))
    // historical minute-granularity range: slots evicted, no cover
    intercept[IllegalStateException] {
      bounded.queryQuantile(queries.Q.Jan1 + 60000L, queries.Q.Jan1 + 120000L, 0.5)
    }
    // recent minute-offset range: inside the retained window, still
    // answers (half a day wide so the sparse sf0.001 fixture has data)
    val lo = bounded.horizonMs - 86400000L + 60000L
    assert(!bounded.queryQuantile(lo, lo + 720 * 60000L, 0.5).isNaN)
    assert(bounded.retainedStartMs(Tier.Minute) == bounded.horizonMs - 86400000L)
    assert(bounded.retainedStartMs(Tier.Day) == bounded.baseMs)
  }

  test("DistinctWheel KeepN retention mirrors the same contract") {
    val bounded = DistinctWheel.build(
      queries.Q.t(spark, dir, "events"), "ts", "user_id",
      Map(Tier.Minute -> Retention.KeepN(24 * 60)))
    val full = DistinctWheel.build(
      queries.Q.t(spark, dir, "events"), "ts", "user_id")
    val day = (queries.Q.Jan1, queries.Q.Jan1 + 86400000L)
    assert(bounded.queryDistinct(day._1, day._2) ==
      full.queryDistinct(day._1, day._2))
    intercept[IllegalStateException] {
      bounded.queryDistinct(queries.Q.Jan1 + 60000L, queries.Q.Jan1 + 120000L)
    }
    val lo = bounded.horizonMs - 86400000L + 60000L
    assert(bounded.queryDistinct(lo, lo + 10 * 60000L) >= 0.0)
  }

  test("quantiles are monotone in the rank") {
    val qs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val est = idx.queryQuantiles(queries.Q.Jan1,
      queries.Q.Jan1 + 30L * 24 * 3600000, qs)
    est.sliding(2).foreach { case Seq(a, b) => assert(a <= b) }
  }
}
