package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** Value checks for the round-12 folded-series analytics family: each
  * analytic is recomputed in Scala from the SAME daily/hourly scan
  * series the SQL folds, so a fold that drifted from the scan (or an
  * analytic with wrong window semantics) fails here before the driver
  * oracle sees it. */
class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  private val Day = 86400000L
  private val FStart = Q.Jan1
  private val FEnd = Q.Jan1 + 30 * Day

  private def run(name: String, d: String = dir) = {
    graft.plans.WheelAcceleration.clear()
    Analytics.queries(name)(spark, d).collect()
  }

  /** The scan-truth daily series (slot_ms → ROUND(SUM(value),2)),
    * computed with plain DataFrame ops and NO registration. */
  private def scanDaily(d: String = dir): Seq[(Long, Double)] = {
    graft.plans.WheelAcceleration.clear()
    Q.t(spark, d, "events")
      .filter(unix_millis(col("ts")) >= FStart && unix_millis(col("ts")) < FEnd)
      .groupBy(expr(s"(unix_millis(ts) div $Day) * $Day").as("slot_ms"))
      .agg(round(sum("value"), 2).as("sv"))
      .orderBy("slot_ms")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
  }

  test("q_wheel_anomaly_sql: z-scores of the scan-truth daily series") {
    val daily = scanDaily()
    val xs = daily.map(_._2)
    val mean = xs.sum / xs.size
    val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / (xs.size - 1))
    val expected = daily.map { case (s, v) =>
      (s, v, math.rint((v - mean) / sd * 100) / 100) }
    val got = run("q_wheel_anomaly_sql").map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(got.size == daily.size)
    got.zip(expected).foreach { case ((gs, gv, gz), (es, ev, ez)) =>
      assert(gs == es && gv == ev)
      assert(math.abs(gz - ez) <= 0.01, s"z at $gs: $gz vs $ez")
    }
  }

  test("q_wheel_pct_change_sql: LAG growth over the scan-truth series") {
    val daily = scanDaily()
    val expected = daily.sliding(2).map { case Seq((_, p), (s, v)) =>
      (s, v, math.rint(100.0 * (v - p) / p * 100) / 100) }.toSeq
    val got = run("q_wheel_pct_change_sql").map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(got.size == daily.size - 1)
    got.zip(expected).foreach { case ((gs, gv, gp), (es, ev, ep)) =>
      assert(gs == es && gv == ev)
      assert(math.abs(gp - ep) <= 0.01, s"pct at $gs: $gp vs $ep")
    }
  }

  test("q_wheel_ewma_sql: adjusted EWMA recurrence over the scan-truth series") {
    val daily = scanDaily()
    // adjusted EWMA: s_t = Σ 0.8^(t-i) x_i / Σ 0.8^(t-i)
    var wsum = 0.0; var w = 0.0
    val expected = daily.map { case (s, v) =>
      wsum = 0.8 * wsum + v; w = 0.8 * w + 1.0
      (s, v, wsum / w)
    }
    val got = run("q_wheel_ewma_sql").map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(got.size == daily.size)
    // first slot's EWMA is the value itself
    assert(got.head._3 == got.head._2)
    got.zip(expected).foreach { case ((gs, gv, ge), (es, ev, ee)) =>
      assert(gs == es && gv == ev)
      assert(math.abs(ge - ee) <= 0.01, s"ewma at $gs: $ge vs $ee")
    }
  }

  test("q_wheel_topdays_sql: the 5 largest scan-truth days, measure-desc") {
    val daily = scanDaily()
    val expected = daily.sortBy { case (s, v) => (-v, s) }.take(5)
    val got = run("q_wheel_topdays_sql").map(r =>
      (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expected)
  }

  test("q_wheel_having_sql: exactly the days whose exact count clears the bar") {
    // sf0.01: ~330 rows/day, so the integer HAVING genuinely splits
    val d = TestSpark.Sf001
    graft.plans.WheelAcceleration.clear()
    val counts = Q.t(spark, d, "events")
      .filter(unix_millis(col("ts")) >= FStart && unix_millis(col("ts")) < FEnd)
      .groupBy(expr(s"(unix_millis(ts) div $Day) * $Day").as("slot_ms"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = run("q_wheel_having_sql", d).map(r => (r.getLong(0), r.getLong(2)))
    assert(got.nonEmpty && got.length < counts.size, "the bar must split the days")
    got.foreach { case (s, n) => assert(n == counts(s) && n > 330) }
    assert(got.map(_._1).toSet == counts.filter(_._2 > 330).keySet)
  }

  test("q_wheel_hourofday_sql: 24 buckets conserving the range's row count") {
    val got = run("q_wheel_hourofday_sql")
    assert(got.map(_.getInt(0)).toSeq == (0 until 24))
    graft.plans.WheelAcceleration.clear()
    val total = Q.t(spark, dir, "events")
      .filter(unix_millis(col("ts")) >= FStart && unix_millis(col("ts")) < FEnd)
      .count()
    assert(got.map(_.getLong(2)).sum == total)
  }

  test("q_wheel_two_table_sql: both sources present, each matching its own scan") {
    val got = run("q_wheel_two_table_sql")
    val (ev, li) = got.partition(_.getString(0) == "events")
    assert(ev.length == 7, s"7 event days, got ${ev.length}") // R1 = 7 days
    assert(li.length == 6, s"6 lineitem months, got ${li.length}")
    graft.plans.WheelAcceleration.clear()
    val evExp = Q.t(spark, dir, "events")
      .filter(unix_millis(col("ts")) >= Q.R1Start && unix_millis(col("ts")) < Q.R1End)
      .groupBy(expr(s"(unix_millis(ts) div $Day) * $Day").as("slot_ms"))
      .agg(round(sum("value"), 2).as("m"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    ev.foreach(r => assert(evExp(r.getLong(1)) == r.getDouble(2)))
  }

  test("q_wheel_share_sql: shares sum to 1 per slot; sums match the keyed scan") {
    val got = run("q_wheel_share_sql")
    assert(got.nonEmpty)
    got.groupBy(_.getLong(1)).foreach { case (slot, rs) =>
      val s = rs.map(_.getDouble(3)).sum
      assert(math.abs(s - 1.0) < 0.01, s"slot $slot shares sum to $s")
    }
    graft.plans.WheelAcceleration.clear()
    val exp = Q.t(spark, dir, "events")
      .filter(unix_millis(col("ts")) >= Q.R1Start && unix_millis(col("ts")) < Q.R1End)
      .groupBy(col("event_type"),
        expr(s"(unix_millis(ts) div $Day) * $Day").as("slot_ms"))
      .agg(round(sum("value"), 2).as("sv"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.length == exp.size)
    got.foreach(r =>
      assert(exp((r.getString(0), r.getLong(1))) == r.getDouble(2)))
  }

  test("q_gopher_quality: every survivor satisfies all integer rules; gate splits") {
    val all = Q.docs(spark, dir).count()
    val got = Text.queries("q_gopher_quality")(spark, dir).collect()
    assert(got.nonEmpty && got.length < all, "gate must genuinely split the corpus")
    got.foreach { r =>
      val w = r.getLong(1); val mwl = r.getDouble(2); val ttr = r.getDouble(3)
      assert(w >= 40)
      assert(mwl > 3.75 && mwl < 5.25) // the exact integer band, unrounded
      assert(ttr >= 0.4 - 1e-9)
    }
  }
}
