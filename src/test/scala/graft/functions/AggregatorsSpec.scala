package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.{Aggregates, Q}

/** The Aggregator typeclass surface (SURVEY.md §2.2 / §7.5): µWheel's
  * All and TopN re-expressed as `Aggregator[IN, BUF, OUT]` UDAFs. */
class AggregatorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  test("graft_all equals the built-in multi-aggregate") {
    Aggregators.register(spark)
    val r = Q.t(spark, dir, "events")
      .agg(expr("graft_all(value)").as("r"))
      .select("r.sum_v", "r.cnt", "r.min_v", "r.max_v", "r.avg_v")
      .collect()(0)
    val e = Q.t(spark, dir, "events")
      .agg(sum("value"), count(lit(1)), min("value"), max("value"), avg("value"))
      .collect()(0)
    assert(math.abs(r.getDouble(0) - e.getDouble(0)) < 1e-6)
    assert(r.getLong(1) == e.getLong(1))
    assert(r.getDouble(2) == e.getDouble(2))
    assert(r.getDouble(3) == e.getDouble(3))
    assert(math.abs(r.getDouble(4) - e.getDouble(4)) < 1e-9)
  }

  test("graft_topn equals the window top-n per group") {
    val got = Aggregates.queries("q_topn_udaf")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc)
      Q.t(spark, dir, "orders")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("rk").cast("long"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rk"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    }
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) => assert(g == e, s"$g != $e") }
  }

  test("TopKPairs dedupes ids, ranks by (score desc, id), stays bounded") {
    val t = Aggregators.TopKPairs(3)
    var b = t.zero
    Seq((7L, 0.9), (2L, 0.5), (7L, 0.9), (9L, 0.7), (1L, 0.5), (4L, 0.3))
      .foreach(v => b = t.reduce(b, v))
    assert(b == Seq((7L, 0.9), (9L, 0.7), (1L, 0.5))) // dup 7 ignored; tie 0.5 → smaller id
    // merge is order-insensitive and keeps the bound
    val other = Seq((3L, 0.95), (7L, 0.9))
    assert(t.merge(b, other) == t.merge(other, b))
    assert(t.merge(b, other) == Seq((3L, 0.95), (7L, 0.9), (9L, 0.7)))
    assert(t.merge(b, other).length <= 3)
  }

  test("TopKPairs merge laws hold on random inputs (ScalaCheck)") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test}
    val t = Aggregators.TopKPairs(3)
    // contract: a candidate id has ONE true score (duplicates arrive
    // from different LSH tables with identical scores) — derive the
    // score from the id; coarse values force cross-id ties
    val pair = Gen.choose(0L, 20L).map(id => (id, (id % 7).toDouble / 10.0))
    val pairs = Gen.listOf(pair)
    def fold(xs: Seq[(Long, Double)]) = xs.foldLeft(t.zero)(t.reduce)
    val prop = forAll(pairs, pairs) { (a, b) =>
      val m = t.merge(fold(a), fold(b))
      // commutative, bounded, sorted by (score desc, id), distinct ids,
      // and equal to folding everything sequentially
      m == t.merge(fold(b), fold(a)) &&
        m.length <= 3 &&
        m == m.sortBy { case (id, s) => (-s, id) } &&
        m.map(_._1).distinct.length == m.length &&
        m == fold(a ++ b)
    }
    val res = Test.check(Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("BoundedCollect merge never exceeds cap+1 and keeps the overflow marker (ScalaCheck)") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test}
    val cap = 5
    val t = Aggregators.BoundedCollect(cap)
    val ids = Gen.listOf(Gen.choose(0L, 100L))
    def fold(xs: Seq[Long]) = xs.foldLeft(t.zero)(t.reduce)
    val prop = forAll(ids, ids) { (a, b) =>
      val m = t.merge(fold(a), fold(b))
      m.length <= cap + 1 &&
        // overflow marker iff the true union count exceeds the cap
        ((a.length + b.length > cap) == (m.length == cap + 1) ||
          a.length + b.length <= cap + 1)
    }
    val res = Test.check(Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("TopN merge is bounded and order-insensitive") {
    val t = Aggregators.TopN(3)
    val a = Seq(5.0, 3.0, 1.0)
    val b = Seq(4.0, 2.0)
    assert(t.merge(a, b) == Seq(5.0, 4.0, 3.0))
    assert(t.merge(b, a) == Seq(5.0, 4.0, 3.0))
    assert(t.merge(t.zero, a) == a)
    assert(t.reduce(a, 6.0) == Seq(6.0, 5.0, 3.0))
    assert(t.reduce(a, 0.5) == a)
  }
}
