package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Time-interleaving correctness for [[AsOfJoin]] on synthetic data —
  * the sf fixtures' orders all predate the events, so the oracle-checked
  * q_join_asof alone can't distinguish "latest at-or-before" from
  * "latest overall"; this spec can. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("picks the most recent right row at-or-before each left time") {
    import spark.implicits._
    val quotes = Seq( // (sym, t, px)
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0)).toDF("sym", "t", "px")
    val trades = Seq( // (sym, t, id)
      ("A", 5L, 1), // before any quote -> unmatched
      ("A", 10L, 2), // tie: at-or-before includes the t=10 quote
      ("A", 25L, 3), // between quotes -> t=20 quote
      ("A", 99L, 4), // after all -> t=30 quote
      ("B", 14L, 5), // before B's quote -> unmatched
      ("B", 16L, 6)).toDF("sym", "t", "id")

    val inner = AsOfJoin(trades, quotes, "sym", "t", Seq("px"))
      .orderBy("id").collect().map(r => (r.getInt(2), r.getDouble(3)))
    assert(inner.toSeq == Seq((2, 1.0), (3, 2.0), (4, 3.0), (6, 9.0)))

    val left = AsOfJoin(trades, quotes, "sym", "t", Seq("px"), keepUnmatched = true)
      .orderBy("id").collect()
      .map(r => (r.getInt(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(left.toSeq == Seq((1, None), (2, Some(1.0)), (3, Some(2.0)),
      (4, Some(3.0)), (5, None), (6, Some(9.0))))
  }

  test("right rows tied on (key, time) resolve to the greatest payload, deterministically") {
    import spark.implicits._
    val quotes = Seq(
      ("A", 10L, 1.0), ("A", 10L, 5.0), ("A", 10L, 3.0)).toDF("sym", "t", "px")
    val trades = Seq(("A", 10L, 1), ("A", 11L, 2)).toDF("sym", "t", "id")
    (1 to 3).foreach { _ =>
      val got = AsOfJoin(trades, quotes, "sym", "t", Seq("px"))
        .orderBy("id").collect().map(_.getDouble(3)).toSeq
      assert(got == Seq(5.0, 5.0), got)
    }
  }

  test("multi-column payload travels as one struct") {
    import spark.implicits._
    val right = Seq((1L, 10L, "x", 7.0)).toDF("k", "t", "tag_v", "num_v")
    val leftDf = Seq((1L, 11L)).toDF("k", "t")
    val row = AsOfJoin(leftDf, right, "k", "t", Seq("tag_v", "num_v")).collect()(0)
    assert(row.getString(2) == "x" && row.getDouble(3) == 7.0)
  }
}
