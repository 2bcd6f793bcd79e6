package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** BPE exactness: the learned merge table against the hand-derived
  * Sennrich et al. 2016 example, encode against an INDEPENDENT
  * quadratic reference implementation, and run-to-run determinism. */
class BpeSpec extends AnyFunSuite {

  // ---- independent reference (deliberately naive, different code
  // path): list-of-strings symbols, full recount each step ----
  private def refTrain(wc: Seq[(String, Long)], n: Int): Seq[(String, String)] = {
    var words: Seq[(List[String], Long)] =
      wc.map { case (w, c) => (w.map(_.toString).toList :+ Bpe.Eow, c) }
    val out = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var stop = false
    while (out.size < n && !stop) {
      val counts = words.flatMap { case (ss, c) =>
        ss.zip(ss.drop(1)).map(p => (p, c))
      }.groupMapReduce(_._1)(_._2)(_ + _)
      if (counts.isEmpty) stop = true
      else {
        // max count; ties -> lexicographically smallest pair
        val best = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.head
        if (best._2 < 2L) stop = true
        else {
          val (a, b) = best._1
          out += ((a, b))
          def m(ss: List[String]): List[String] = ss match {
            case x :: y :: rest if x == a && y == b => (a + b) :: m(rest)
            case x :: rest => x :: m(rest)
            case Nil => Nil
          }
          words = words.map { case (ss, c) => (m(ss), c) }
        }
      }
    }
    out.toList
  }

  private def refEncode(word: String,
      merges: Seq[(String, String)]): List[String] = {
    var ss: List[String] = word.map(_.toString).toList :+ Bpe.Eow
    // apply merges in training order, each to saturation — equivalent
    // to rank-order lowest-first application
    merges.foreach { case (a, b) =>
      var changed = true
      while (changed) {
        def m(xs: List[String]): List[String] = xs match {
          case x :: y :: rest if x == a && y == b => (a + b) :: m(rest)
          case x :: rest => x :: m(rest)
          case Nil => Nil
        }
        val next = m(ss)
        changed = next != ss
        ss = next
      }
    }
    ss
  }

  private val sennrich =
    Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("the Sennrich example learns the hand-derived merge sequence") {
    val merges = Bpe.train(sennrich, 5)
    // (e,s): 9 (newest+widest); (es,t): 9; (est,</w>): 9; (l,o): 7;
    // (lo,w): 7 — each hand-computable from the four word counts
    assert(merges == Seq(("e", "s"), ("es", "t"), ("est", Bpe.Eow),
      ("l", "o"), ("lo", "w")), merges)
  }

  test("encode matches the independent reference on trained and OOV words") {
    val merges = Bpe.train(sennrich, 10)
    val ranks = merges.zipWithIndex.toMap
    // OOV composition: 'lowest' was never a training word but its
    // pieces were — classic BPE generalization
    assert(Bpe.encode("lowest", ranks) == Vector("low", "est" + Bpe.Eow))
    for (w <- Seq("low", "lower", "newest", "widest", "lowest", "wi",
        "stew", "zzz", "l", ""))
      assert(Bpe.encode(w, ranks) == refEncode(w, merges).toVector, w)
  }

  test("train matches the independent reference on a varied corpus") {
    val corpus = Seq(("aaab", 4L), ("aabb", 3L), ("abab", 5L), ("baaa", 2L),
      ("cabba", 7L), ("bacca", 1L), ("abc", 9L), ("ccc", 2L))
    val got = Bpe.train(corpus, 12)
    val exp = refTrain(corpus, 12)
    assert(got == exp, s"\ngot $got\nexp $exp")
    val ranks = got.zipWithIndex.toMap
    for ((w, _) <- corpus)
      assert(Bpe.encode(w, ranks) == refEncode(w, got).toVector, w)
  }

  test("training is deterministic and token counts drop the bare marker") {
    val a = Bpe.train(sennrich, 10)
    val b = Bpe.train(sennrich, 10)
    assert(a == b)
    val ranks = a.zipWithIndex.toMap
    // 'lowest' -> [low, est</w>] = 2; 'zzz' -> z z z </w>, marker alone
    // carries no text -> 3
    assert(Bpe.countWordTokens("lowest", ranks) == 2)
    assert(Bpe.countWordTokens("zzz", ranks) == 3)
    val counter = new BpeCounter(ranks)
    assert(counter.tokens("lowest  zzz\nlowest") == 2 + 3 + 2)
    assert(counter.tokens(null) == 0L)
  }
}
