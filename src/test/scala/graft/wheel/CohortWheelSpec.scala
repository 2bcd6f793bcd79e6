package graft.wheel

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{TestSpark, queries}

/** Theta cohort wheel (fifth sketch generalization): set-algebra
  * exactness vs scan-computed sets while entries fit the nominal,
  * bounded estimates beyond it, the family retention contract, and
  * split-build union parity. */
class CohortWheelSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001
  private val Day = 86400000L

  private lazy val idx =
    CohortWheel.build(queries.Q.t(spark, dir, "events"), "ts", "user_id")

  /** Exact user set of [a, b) from a scan. */
  private def userSet(a: Long, b: Long): Set[Long] =
    queries.Q.t(spark, dir, "events")
      .filter(unix_millis(col("ts")) >= a && unix_millis(col("ts")) < b)
      .select(col("user_id")).distinct()
      .collect().map(_.getLong(0)).toSet

  test("exact regime: distinct/intersect/diff equal scan-computed sets") {
    val a = (queries.Q.Jan1, queries.Q.Jan1 + 7 * Day)
    val b = (queries.Q.Jan1 + 7 * Day, queries.Q.Jan1 + 14 * Day)
    val (sa, sb) = (userSet(a._1, a._2), userSet(b._1, b._2))
    assert(sa.nonEmpty && sb.nonEmpty)
    assert(idx.distinct(a._1, a._2).round == sa.size)
    assert(idx.distinct(b._1, b._2).round == sb.size)
    assert(idx.intersectCount(a, b).round == (sa intersect sb).size)
    assert(idx.diffCount(a, b).round == (sa diff sb).size)
    // identities: |A| = |A∩B| + |A\B|; self-intersection is |A|
    assert(idx.intersectCount(a, a).round == sa.size)
    assert(idx.diffCount(a, a).round == 0L)
  }

  test("approximate regime: estimates carry valid bounds past the nominal") {
    import spark.implicits._
    // 20k distinct keys in one minute — past the 4096 nominal, the
    // sketch samples; the estimate must bracket the truth within the
    // sketch's own bounds
    val t0 = queries.Q.Jan1
    val rows = (0 until 20000).map(i => (new Timestamp(t0), i.toLong))
    val w = CohortWheel.build(rows.toDF("ts", "user_id"), "ts", "user_id")
    val sk = w.rangeSketch(t0, t0 + 60000L)
    assert(sk.isEstimationMode)
    assert(sk.getLowerBound(2) <= 20000.0 && 20000.0 <= sk.getUpperBound(2),
      s"bounds [${sk.getLowerBound(2)}, ${sk.getUpperBound(2)}] miss 20000")
  }

  test("split-build union parity: two half-corpus wheels equal one build") {
    val mid = queries.Q.Jan1 + 15L * Day
    val events = queries.Q.t(spark, dir, "events")
    val first = CohortWheel.build(
      events.filter(unix_millis(col("ts")) < mid), "ts", "user_id")
    val second = CohortWheel.build(
      events.filter(unix_millis(col("ts")) >= mid), "ts", "user_id")
    val u = org.apache.datasketches.theta.SetOperation.builder().buildUnion()
    u.union(first.rangeSketch(first.baseMs, first.horizonMs))
    u.union(second.rangeSketch(second.baseMs, second.horizonMs))
    assert(u.getResult.getEstimate.round ==
      idx.distinct(idx.baseMs, idx.horizonMs).round)
  }

  test("KeepN retention mirrors the family contract") {
    val bounded = CohortWheel.build(
      queries.Q.t(spark, dir, "events"), "ts", "user_id",
      Map(Tier.Minute -> Retention.KeepN(24 * 60)))
    val day = (queries.Q.Jan1, queries.Q.Jan1 + Day)
    assert(bounded.distinct(day._1, day._2) == idx.distinct(day._1, day._2))
    intercept[IllegalStateException] {
      bounded.distinct(queries.Q.Jan1 + 60000L, queries.Q.Jan1 + 120000L)
    }
    assert(bounded.retainedStartMs(Tier.Minute) == bounded.horizonMs - Day)
    assert(bounded.retainedStartMs(Tier.Day) == bounded.baseMs)
  }

  test("misaligned range rejected; empty range has zero estimate; string key fails fast") {
    intercept[IllegalArgumentException] {
      idx.distinct(queries.Q.Jan1 + 1, queries.Q.Jan1 + 60001)
    }
    assert(idx.distinct(queries.Q.Jan1, queries.Q.Jan1) == 0.0)
    intercept[IllegalArgumentException] {
      CohortWheel.build(queries.Q.t(spark, dir, "events"), "ts", "event_type")
    }
  }
}
