package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Internal checks for the approximate aggregates (no SQL oracle —
  * SURVEY.md §2.6): HLL distinct bounds and quantile-sketch rank error. */
class AggregatesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  test("q_approx_quantile: reported quantiles have small rank error vs exact") {
    val rows = Aggregates.queries("q_approx_quantile")(spark, dir).collect()
    assert(rows.nonEmpty)
    val byType = Q.t(spark, dir, "events")
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    rows.foreach { r =>
      val vals = byType(r.getString(0))
      def rankOf(v: Double): Double = vals.count(_ <= v).toDouble / vals.length
      Seq(1 -> 0.5, 2 -> 0.95, 3 -> 0.99).foreach { case (i, p) =>
        val got = r.getDouble(i)
        // with accuracy 10000 on small groups the sketch is near-exact;
        // allow a loose ±5% rank window plus the discrete-rank step
        val step = 1.0 / vals.length
        assert(math.abs(rankOf(got) - p) <= 0.05 + step,
          s"${r.getString(0)} p$p: value $got at rank ${rankOf(got)}")
      }
      assert(r.getDouble(1) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(3))
    }
  }

  test("q_approx_distinct stays within HLL error bounds of the exact counts") {
    val approx = Aggregates.queries("q_approx_distinct")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Q.t(spark, dir, "events")
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n) <= math.max(2.0, 0.05 * n),
        s"$k: approx ${approx(k)} vs exact $n")
    }
  }
}
