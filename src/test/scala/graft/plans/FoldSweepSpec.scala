package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.Q

/** Fold/scan EQUIVALENCE SWEEP (late round 10): the rewrite's one
  * binding contract is that acceleration never changes an answer. The
  * per-shape specs prove it pointwise; this sweep crosses aggregate
  * mixes × grouping spellings × range shapes (aligned / minute /
  * sub-minute hybrid) and asserts, for every combination, that the
  * registered plan and the cleared-registry scan return identical
  * rows. It also counts how many combinations actually folded, so a
  * regression that silently bails everything (correct but useless)
  * fails loudly too. */
class FoldSweepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001
  private val path = s"$dir/events.parquet"
  private def events = Q.t(spark, dir, "events")

  test("every agg-mix × grouping × range combination matches the scan") {
    WheelAcceleration.register(spark, path, events)
    WheelAcceleration.registerKeyed(spark, path, events, "event_type")
    events.createOrReplaceTempView("ev_sweep")

    // raw (unrounded) aggregates: the compare below is typed, with a
    // relative tolerance on doubles — rounding first would turn benign
    // last-ulp differences (algebraic vs Welford variance on groups
    // whose exact value sits ON a decimal rounding boundary, which
    // 2-decimal source data hits constantly for 2-row groups) into
    // false divergences
    val aggMixes = Seq(
      "SUM(value) AS a1",
      "COUNT(*) AS a1",
      "AVG(value) AS a1, MIN(value) AS a2",
      "MAX(value) AS a1, STDDEV_POP(value) AS a2",
      "VAR_SAMP(value) AS a1, COUNT(value) AS a2",
      // scalar expression over two folded aggregates
      "SUM(value) / COUNT(*) AS a1")
    // (grouping select-expr or "", group-by clause or "")
    val groupings = Seq(
      ("", ""),
      ("(unix_millis(ts) div 60000) * 60000 AS g0, ", "GROUP BY 1"),
      ("(unix_millis(ts) div 3600000) * 3600000 AS g0, ", "GROUP BY 1"),
      ("(unix_millis(ts) div 86400000) * 86400000 AS g0, ", "GROUP BY 1"),
      ("date_trunc('hour', ts) AS g0, ", "GROUP BY 1"),
      ("date_trunc('month', ts) AS g0, ", "GROUP BY 1"),
      ("window(ts, '2 hours') AS g0, ", "GROUP BY window(ts, '2 hours')"),
      ("window(ts, '1 hour', '30 minutes') AS g0, ",
        "GROUP BY window(ts, '1 hour', '30 minutes')"),
      // non-divisible slide: the membership-filtered Expand shape
      ("window(ts, '3 minutes', '2 minutes') AS g0, ",
        "GROUP BY window(ts, '3 minutes', '2 minutes')"),
      ("date_trunc('quarter', ts) AS g0, ", "GROUP BY 1"),
      ("event_type AS g0, (unix_millis(ts) div 3600000) * 3600000 AS g1, ",
        "GROUP BY 1, 2"))
    val ranges = Seq(
      (Q.R1Start, Q.R1End),                   // day-aligned week
      (Q.R1Start + 60000L, Q.R1End - 60000L), // minute-aligned interior
      (Q.R1Start + 30123L, Q.R1End - 7001L))  // sub-minute hybrid edges

    var folded = 0
    var total = 0
    // the CAP dimension (round 11): the same full matrix under a
    // forced plan-time ceiling of 3, so every above-cap fallback —
    // grouped/keyed minute-state partials, the sliding re-rooted
    // Expand — is equivalence-checked across all agg mixes and
    // grouping spellings, not just its pointwise specs. Above-cap
    // shapes that still produce a LocalRelation (the distributed
    // plans) count as folded; the one declared scan shape (above-cap
    // sliding with sub-minute edges) just has to stay correct.
    val capKnob = "spark.graft.wheel.rewrite.maxFoldRows"
    for {
      cap <- Seq(None, Some("3"))
      agg <- aggMixes
      (gSel, gBy) <- groupings
      (a, b) <- ranges
    } {
      cap match {
        case Some(c) => spark.conf.set(capKnob, c)
        case None => spark.conf.unset(capKnob)
      }
      val order =
        if (gSel.isEmpty) ""
        else if (gBy == "GROUP BY 1, 2") " ORDER BY 1, 2" else " ORDER BY 1"
      val sql = s"SELECT $gSel$agg FROM ev_sweep " +
        s"WHERE unix_millis(ts) >= $a AND unix_millis(ts) < $b $gBy$order"
      total += 1
      val acc = spark.sql(sql)
      if (acc.queryExecution.optimizedPlan.collect {
        case l: LocalRelation => l }.nonEmpty) folded += 1
      val got = acc.collect()
      WheelAcceleration.clear()
      val want = spark.sql(sql).collect()
      WheelAcceleration.register(spark, path, events)
      WheelAcceleration.registerKeyed(spark, path, events, "event_type")
      assert(got.length == want.length,
        s"row-count divergence (${got.length} vs ${want.length}) for: $sql")
      got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
        assert(g.length == w.length, s"arity divergence for: $sql")
        (0 until g.length).foreach { j =>
          (if (g.isNullAt(j)) null else g.get(j),
            if (w.isNullAt(j)) null else w.get(j)) match {
            case (null, null) => ()
            case (x: java.lang.Double, y: java.lang.Double) =>
              assert(math.abs(x - y) <= 1e-9 * (1.0 + math.abs(y)),
                s"cell ($i,$j): $x vs $y for: $sql")
            case (x, y) =>
              assert(x == y, s"cell ($i,$j): $x vs $y for: $sql")
          }
        }
      }
    }
    // the sweep is about equivalence, but a silent bail-everything
    // regression must fail too: the aligned and minute-aligned ranges
    // fold for every grouping here (distributed plans included under
    // the forced cap), and the hybrids fold for all but the above-cap
    // sliding edges — well over half the matrix
    assert(folded * 2 >= total, s"only $folded/$total combinations folded")
    spark.conf.unset(capKnob)
    WheelAcceleration.clear()
  }
}
